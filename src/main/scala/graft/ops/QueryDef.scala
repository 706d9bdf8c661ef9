package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: a Spark implementation over the testdata
  * parquet tables plus (optionally) an equivalent ANSI SQL string the
  * driver runs in DuckDB over the same tables. Column names must match
  * exactly between the two (the driver sorts columns by name and hashes
  * values).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Tables {
  /** All queries read driver-generated parquet from `dir` (TESTDATA.md). */
  def tbl(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
