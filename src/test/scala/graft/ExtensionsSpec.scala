package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions: SQL-surface function registration + the md5-prefix
  * fusion optimizer rule, installed via SparkSessionExtensions.
  */
class ExtensionsSpec extends AnyFunSuite {

  /** A session with the extensions, sharing TestSpark's SparkContext.
    * getOrCreate() would return the existing extension-less session, so
    * the active/default session is cleared first and restored after.
    */
  private def withExtSession[A](f: SparkSession => A): A = {
    val base = TestSpark.spark // ensure the shared context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .config("spark.sql.shuffle.partitions", "4")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      f(s)
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }

  test("md5_prefix32 is callable from SQL via spark.sql.extensions") {
    withExtSession { s =>
      val got = s.sql("SELECT md5_prefix32('web') AS h").head().getLong(0)
      val want = s.sql(
        "SELECT CAST(conv(substring(md5(CAST('web' AS BINARY)), 1, 8), 16, 10) AS BIGINT)")
        .head().getLong(0)
      assert(got == want)
    }
  }

  test("FuseMd5Prefix rewrites the portable conv(substring(md5)) idiom " +
    "to the native expression with identical results") {
    withExtSession { s =>
      val df = s.range(100).selectExpr(
        "conv(substring(md5(CAST(CONCAT('k', id) AS BINARY)), 1, 8), 16, 10) AS h")
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("md5_prefix32"),
        s"fusion rule did not fire:\n$optimized")
      // results identical to an extension-less session evaluating the idiom
      val want = TestSpark.spark.range(100).selectExpr(
        "conv(substring(md5(CAST(CONCAT('k', id) AS BINARY)), 1, 8), 16, 10) AS h")
        .collect().map(_.getString(0)).toSeq
      assert(df.collect().map(_.getString(0)).toSeq == want)
    }
  }
}
