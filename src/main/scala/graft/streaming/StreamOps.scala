package graft.streaming

import graft.cdc.CdcStream
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Structured-Streaming analytics over the change log, beyond the MERGE
  * path (SURVEY.md §2.11): a watermarked event-time windowed aggregation
  * (the streaming twin of the batch `w5_time_window_agg`) and a
  * flatMapGroupsWithState per-key state machine. Both read the same
  * append-only binlog directory the CDC tail consumes, with their own
  * checkpoints — observability pipelines run BESIDE the ingest, not
  * inside it.
  */
object StreamOps {

  /** Per-key running state of the version-chain tracker. */
  final case class UrlState(nEvents: Long, lastTsMs: Long, lastLsn: Long,
      outOfOrder: Long)

  /** Emitted once per key per trigger (update mode). */
  final case class UrlStats(url: String, n_events: Long, last_lsn: Long,
      out_of_order: Long)

  private[streaming] final case class Ev(url: String, tsMs: Long, lsn: Long)

  /** Watermarked tumbling-window throughput stats over the change log,
    * appended to a parquet sink: one row per (1-hour window, lang) once
    * the event-time watermark (1 hour of allowed lateness) closes the
    * window. Append mode means the sink only ever receives FINAL window
    * values — late events inside the lateness bound revise state before
    * emission; events later than that are dropped from these stats (the
    * MERGE path, by contrast, accepts them — upsert is late-tolerant —
    * and counts them in the `late-keys` lineage).
    */
  def windowedStats(spark: SparkSession, logDir: String, outDir: String,
      checkpointDir: String, schemaVersion: Int = 3,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val events = spark.readStream
      .schema(CdcStream.chunkSchema(schemaVersion))
      .option("maxFilesPerTrigger", 1)
      .parquet(logDir)
    events
      .withWatermark("warc_ts", "1 hour")
      .groupBy(window(col("warc_ts"), "1 hour").as("w"), col("lang"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("op") === "D", 1L).otherwise(0L)).as("n_deletes"),
        max("lsn").as("max_lsn"))
      .select(col("w.start").as("window_start"), col("lang"),
        col("n_events"), col("n_deletes"), col("max_lsn"))
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append())
      .trigger(trigger)
      .start()
  }

  /** The same window aggregation as a BATCH plan over a drained log —
    * the oracle the streaming test compares finalized windows against.
    */
  def windowedStatsBatch(spark: SparkSession, logDir: String,
      schemaVersion: Int = 3): DataFrame =
    spark.read.schema(CdcStream.chunkSchema(schemaVersion)).parquet(logDir)
      .groupBy(window(col("warc_ts"), "1 hour").as("w"), col("lang"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("op") === "D", 1L).otherwise(0L)).as("n_deletes"),
        max("lsn").as("max_lsn"))
      .select(col("w.start").as("window_start"), col("lang"),
        col("n_events"), col("n_deletes"), col("max_lsn"))

  /** Per-url version-chain tracker via flatMapGroupsWithState (the
    * custom-state escape hatch the built-in window agg cannot express):
    * state = running event count, last (warc_ts, lsn), out-of-order
    * count (an event whose warc_ts precedes the last seen one — binlog
    * reorder detection). Emits each touched key's updated stats per
    * trigger (update mode). State is partitioned by url — the same key
    * distribution as the MERGE, so the state store shards evenly under
    * the zipf key skew (hot DOMAINS spread across their pages).
    */
  def urlStatsStream(spark: SparkSession, logDir: String,
      schemaVersion: Int = 3): DataFrame = {
    import spark.implicits._
    val events = spark.readStream
      .schema(CdcStream.chunkSchema(schemaVersion))
      .option("maxFilesPerTrigger", 1)
      .parquet(logDir)
      .select(col("url"), unix_millis(col("warc_ts").cast("timestamp")).as("tsMs"),
        col("lsn"))
      .as[Ev]
    events
      .groupByKey(_.url)
      .flatMapGroupsWithState[UrlState, UrlStats](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (url: String, evs: Iterator[Ev], state: GroupState[UrlState]) =>
          // SINGLE-PASS fold, streaming through the iterator: an event is
          // out-of-order iff it precedes the chain head AS OF BATCH START
          // (provably what a sorted in-batch fold counts too — a sorted
          // event can only precede the running head via the old head — so
          // this is both order-independent/deterministic AND O(1) memory;
          // materializing a hot url's whole batch to sort it would OOM
          // under the zipf skew this engine is built for, round-3 review)
          val s0 = state.getOption.getOrElse(UrlState(0L, Long.MinValue, -1L, 0L))
          var n = s0.nEvents; var maxTs = s0.lastTsMs
          var maxLsn = s0.lastLsn; var ooo = s0.outOfOrder
          evs.foreach { e =>
            n += 1
            if (e.tsMs < s0.lastTsMs) ooo += 1
            if (e.tsMs > maxTs) maxTs = e.tsMs
            if (e.lsn > maxLsn) maxLsn = e.lsn
          }
          val s = UrlState(n, maxTs, maxLsn, ooo)
          state.update(s)
          Iterator(UrlStats(url, s.nEvents, s.lastLsn, s.outOfOrder))
      }
      .toDF()
  }
}
