package graft

import graft.functions.DotProduct
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native dot-product expression: bit-identical to the portable HOF
  * spelling (same left-fold order), same null semantics, codegen'd.
  */
class DotProductSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def hofDot = (a: String, b: String) =>
    expr(s"aggregate(zip_with($a, $b, (x, y) -> x * y), 0D, (acc, x) -> acc + x)")

  test("matches the HOF fold bit-for-bit on dense vectors") {
    val df = spark.range(1000).select(
      transform(sequence(lit(1), lit(64)),
        j => (col("id") + j.cast("double")) / 7.0).as("a"),
      transform(sequence(lit(1), lit(64)),
        j => (col("id") * j.cast("double")) / 3.0).as("b"))
    val got = df.select(
      DotProduct.dot_product(col("a"), col("b")).as("nat"),
      hofDot("a", "b").as("hof"))
    // exact double equality — same fold order must give the same bits;
    // null-SAFE compare (an all-NULL native result must fail, not slip
    // through a three-valued filter) plus a non-null anchor
    assert(got.filter(!(col("nat") <=> col("hof"))).count() == 0)
    assert(got.filter(col("nat").isNotNull).count() == 1000)
  }

  test("null semantics match zip_with/aggregate") {
    val df = Seq(
      (Seq(1.0, 2.0), Seq(3.0, 4.0)),        // 11.0
      (Seq.empty[Double], Seq.empty[Double])  // 0.0
    ).toDF("a", "b")
    val r = df.select(DotProduct.dot_product(col("a"), col("b"))).collect()
    assert(r(0).getDouble(0) == 11.0 && r(1).getDouble(0) == 0.0)
    // length mismatch → null (zip_with pads with null, sum absorbs it)
    val mismatch = Seq((Seq(1.0, 2.0), Seq(3.0))).toDF("a", "b")
      .select(DotProduct.dot_product(col("a"), col("b"))).head()
    assert(mismatch.isNullAt(0))
    val hofMismatch = Seq((Seq(1.0, 2.0), Seq(3.0))).toDF("a", "b")
      .select(hofDot("a", "b")).head()
    assert(hofMismatch.isNullAt(0)) // the twin agrees
  }

  test("stays inside whole-stage codegen (no CodegenFallback)") {
    val df = spark.range(10).select(
      transform(sequence(lit(1), lit(4)), j => j.cast("double")).as("a"))
      .select(DotProduct.dot_product(col("a"), col("a")).as("d"))
    val plan = df.queryExecution.executedPlan.toString
    // the '*(n)' prefix marks operators inside a WholeStageCodegen stage;
    // a CodegenFallback expression would strip it from its Project
    assert(plan.linesIterator.exists(l =>
      l.contains("graft_dot") && l.trim.startsWith("*")), plan)
    assert(df.agg(sum("d")).head().getDouble(0) == 300.0) // 10 × (1+4+9+16)
  }
}
