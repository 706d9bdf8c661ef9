package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-micro-batch latest-per-key dedup — the CDC core (SURVEY.md §2.6 W1;
  * reference: `arrange(desc(DATETIME)) %>% group_by(key) %>% slice(1)`,
  * /root/reference/project_setup/round3_setup/extract_submission_files.R:96-99).
  *
  * Three physical strategies, same semantics (newest (orderCols) per key
  * wins, ties broken by the last ordering column = LSN):
  *
  *  - `latestPerKeyWindow`: the literal Catalyst window. One full shuffle
  *    of every event on `key`; a hot key serializes into one task.
  *  - `latestPerKeySalted`: two-phase window for hot keys — phase 1 dedups
  *    within (key, salt) spreading a hot key over S tasks, phase 2 reduces
  *    the ≤S survivors per key. The north star's "salted repartitioning".
  *  - `latestPerKeyAgg` (default for MERGE): groupBy(key).max(struct(order
  *    ++ payload)). Hash aggregation gets map-side partial combine, so a
  *    key with 10^6 duplicates ships ~numPartitions pre-combined rows
  *    through the shuffle instead of 10^6 — skew-immune without salting,
  *    and the plan Spark picks stays whole-stage-codegen.
  */
object Dedup {

  /** The window/salt strategies add internal working columns; a payload
    * that already uses those names would be silently overwritten by
    * withColumn and then dropped — reject loudly instead (round-3
    * review). `_m` is safe: it only exists inside the agg projection.
    */
  private def requireNoReserved(df: DataFrame): Unit = {
    val clash = df.columns.filter(Set("_rn", "_salt").contains)
    require(clash.isEmpty,
      s"Dedup reserves column name(s) ${clash.mkString(", ")} — rename them")
  }

  /** struct field order makes max() = latest (warc_ts, lsn). */
  private def packed(df: DataFrame, key: String, orderCols: Seq[String]): Column = {
    val payload = df.columns.filterNot(c => c == key || orderCols.contains(c))
    struct((orderCols ++ payload).map(col): _*)
  }

  def latestPerKeyWindow(df: DataFrame, key: String = "url",
      orderCols: Seq[String] = Seq("warc_ts", "lsn")): DataFrame = {
    requireNoReserved(df)
    val w = Window.partitionBy(key).orderBy(orderCols.map(col(_).desc): _*)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  def latestPerKeySalted(df: DataFrame, key: String = "url",
      orderCols: Seq[String] = Seq("warc_ts", "lsn"),
      numSalts: Int = 16): DataFrame = {
    requireNoReserved(df)
    // deterministic salt from the total ordering column (LSN): spreads a
    // hot key's events uniformly without RNG (replay-stable, §7.4 #2)
    val salted = df.withColumn("_salt",
      pmod(xxhash64(col(orderCols.last)), lit(numSalts)))
    val w1 = Window.partitionBy(col(key), col("_salt"))
      .orderBy(orderCols.map(col(_).desc): _*)
    val phase1 = salted.withColumn("_rn", row_number().over(w1))
      .filter(col("_rn") === 1).drop("_rn", "_salt")
    latestPerKeyWindow(phase1, key, orderCols)
  }

  def latestPerKeyAgg(df: DataFrame, key: String = "url",
      orderCols: Seq[String] = Seq("warc_ts", "lsn")): DataFrame = {
    val payload = df.columns.filterNot(c => c == key || orderCols.contains(c))
    val cols = orderCols ++ payload
    df.groupBy(col(key))
      .agg(max(packed(df, key, orderCols)).as("_m"))
      .select(col(key) +: cols.map(c => col(s"_m.$c").as(c)): _*)
      // restore original column order
      .select(df.columns.map(col).toSeq: _*)
  }
}
