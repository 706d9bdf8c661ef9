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

  /** `tbl` spread over the cluster by a unique key before a CPU-heavy
    * per-row stage. The driver testdata ships each table as ONE parquet
    * row group, so a heavy map (minhash over shingles, simhash votes)
    * would otherwise run on a single core regardless of cluster size.
    * At production scale the source's own splits provide the
    * parallelism and the exchange coalesces away under AQE; here it
    * moves a few MB once and unlocks every core.
    */
  def tblSpread(spark: SparkSession, dir: String, name: String,
      key: String): DataFrame =
    tbl(spark, dir, name)
      .repartition(org.apache.spark.sql.functions.col(key))
}
