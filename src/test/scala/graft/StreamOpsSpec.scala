package graft

import graft.streaming.StreamOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Streaming analytics beside the CDC tail: watermarked windowed agg
  * (finalized-window emission, bounded lateness, too-late drop) and the
  * flatMapGroupsWithState version-chain tracker.
  */
class StreamOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  /** One single-file chunk; mtime orders the file-source delivery. */
  private def writeChunk(logDir: String, n: Int,
      rows: Seq[(Long, String, String, java.sql.Timestamp)]): Unit = {
    val tmp = TestSpark.tempDir(s"sops-chunk$n")
    rows.map { case (lsn, op, url, t) =>
      (lsn, op, url, t, null: Array[Byte], s"text $lsn", "en", 7L, 3)
    }.toDF("lsn", "op", "url", "warc_ts", "html", "text", "lang",
        "content_len", "schema_version")
      .withColumn("lang", when(col("url").contains("de"), "de").otherwise("en"))
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = graft.core.Fs.list(Paths.get(tmp))
      .find(_.getFileName.toString.endsWith(".parquet")).get
    val dst = Paths.get(logDir, f"chunk-$n%03d.parquet")
    Files.move(part, dst)
    Files.setLastModifiedTime(dst,
      java.nio.file.attribute.FileTime.fromMillis(1700000000000L + n * 1000L))
  }

  test("watermarked windowed agg emits finalized windows only; late-in-" +
    "bound events count, too-late events drop") {
    val logDir = TestSpark.tempDir("sops-log")
    // chunk 0: hour-0 events (2 en, 1 de)
    writeChunk(logDir, 0, Seq(
      (1L, "U", "http://en/a", ts("2024-01-01 00:10:00")),
      (2L, "U", "http://en/b", ts("2024-01-01 00:20:00")),
      (3L, "U", "http://de/c", ts("2024-01-01 00:30:00"))))
    // chunk 1: hour-2 event + a LATE hour-0 event still inside the 1h
    // lateness bound (watermark after chunk 0 = 23:30 prev day)
    writeChunk(logDir, 1, Seq(
      (4L, "U", "http://en/d", ts("2024-01-01 02:10:00")),
      (5L, "U", "http://en/e", ts("2024-01-01 00:40:00"))))
    // chunk 2: hour-5 event pushes the watermark to 04:00
    writeChunk(logDir, 2, Seq(
      (6L, "U", "http://en/f", ts("2024-01-01 05:00:00"))))
    // chunk 3: a TOO-LATE hour-0 event (watermark 04:00 — far beyond the
    // bound, and the hour-0 window state is long evicted: dropped)
    writeChunk(logDir, 3, Seq(
      (7L, "U", "http://en/g", ts("2024-01-01 00:50:00")),
      (8L, "U", "http://en/h", ts("2024-01-01 05:30:00"))))

    val outDir = TestSpark.tempDir("sops-out")
    val q = StreamOps.windowedStats(spark, logDir, outDir,
      TestSpark.tempDir("sops-ck"))
    q.awaitTermination()
    val got = spark.read.parquet(outDir)
      .select("window_start", "lang", "n_events", "max_lsn")
      .collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    // finalized: hour-0 (incl. the in-bound late lsn 5, excl. the
    // too-late lsn 7) and hour-2; hour-5 stays open past the final
    // watermark and must NOT have been emitted
    assert(got == Set(
      ("2024-01-01 00:00:00.0", "en", 3L, 5L),
      ("2024-01-01 00:00:00.0", "de", 1L, 3L),
      ("2024-01-01 02:00:00.0", "en", 1L, 4L)), got.toString)

    // the batch twin over the drained log sees everything (incl. the
    // dropped event and the open window) — the difference IS the
    // watermark contract
    val batch = StreamOps.windowedStatsBatch(spark, logDir)
    assert(batch.agg(sum("n_events")).head().getLong(0) == 8L)
  }

  test("flatMapGroupsWithState tracks per-url version chains with " +
    "out-of-order detection across triggers") {
    val logDir = TestSpark.tempDir("sops-state-log")
    // url X: ts goes BACKWARD between chunk 0 and chunk 1 (binlog reorder)
    writeChunk(logDir, 0, Seq(
      (10L, "U", "http://x", ts("2024-01-01 10:00:00")),
      (11L, "U", "http://y", ts("2024-01-01 10:00:00"))))
    writeChunk(logDir, 1, Seq(
      (12L, "U", "http://x", ts("2024-01-01 09:00:00")), // reordered
      (13L, "U", "http://y", ts("2024-01-01 11:00:00"))))
    val q = StreamOps.urlStatsStream(spark, logDir)
      .writeStream.format("memory").queryName("sops_url_stats")
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", TestSpark.tempDir("sops-state-ck"))
      .start()
    q.awaitTermination()
    // update mode appends one row per touched key per trigger — the
    // final state per url is the row with the highest event count
    val fin = spark.sql(
      """SELECT url, max_by(n_events, n_events) n, max_by(last_lsn, n_events) l,
        |       max_by(out_of_order, n_events) o
        |FROM sops_url_stats GROUP BY url""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(fin == Set(
      ("http://x", 2L, 12L, 1L), // chunk-1 event is behind the chain head
      ("http://y", 2L, 13L, 0L)))
  }
}
