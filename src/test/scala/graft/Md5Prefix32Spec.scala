package graft

import graft.functions.Md5Prefix32
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Md5Prefix32Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("native md5_prefix32 == conv(substring(md5,1,8),16,10) and stays codegen'd") {
    val df = (Seq("", "a", "abc", "r&d", "0_web page crawl") ++
      (0 until 1000).map(i => s"doc-$i")).toDF("s")
    val chain = conv(substring(md5(col("s").cast("binary")), 1, 8), 16, 10)
      .cast("long")
    val diff = df.select(
      Md5Prefix32.md5_prefix32(col("s")).as("fused"), chain.as("chain"))
      .filter(!(col("fused") <=> col("chain"))).count() // null-safe
    assert(diff == 0)
    // known value: md5("abc") = 900150983c... → 0x90015098
    val v = df.filter(col("s") === "abc")
      .select(Md5Prefix32.md5_prefix32(col("s"))).head().getLong(0)
    assert(v == 0x90015098L)
    // whole-stage codegen keeps the expression inline (no fallback node)
    val plan = spark.range(10)
      .select(Md5Prefix32.md5_prefix32(col("id").cast("string")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project")) // "*" = inside WholeStageCodegen
  }
}
