package graft

import graft.cdc.Merge
import graft.lake.{LakeTable, Maintenance}
import org.scalatest.funsuite.AnyFunSuite

/** Incremental read / CDC OUT (LakeTable.changesBetween): the changelog a
  * downstream replica applies to mirror the table between two snapshots.
  */
class ChangesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val cols = Seq("lsn", "op", "url", "warc_ts", "html", "text",
    "lang", "content_len")
  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private def ev(lsn: Long, op: String, url: String, t: java.sql.Timestamp,
      text: String) =
    (lsn, op, url, t, null: Array[Byte], text, "en",
      Option(text).map(_.length.toLong).getOrElse(0L))

  private def changeSet(t: LakeTable, from: Int, to: Int): Set[(String, String, Long)] =
    t.changesBetween(from, to).select("url", "_op", "_lsn")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet

  test("changelog: upserts + delete events between snapshots, unchanged keys absent") {
    val dir = TestSpark.tempDir("changes-table")
    val t = LakeTable.create(spark, dir, schemaId = 3, numBuckets = 4)
    // v1: initial inserts
    val b0 = Seq(
      ev(1, "U", "http://a", ts("2024-01-01 00:00:00"), "a v1"),
      ev(2, "U", "http://b", ts("2024-01-01 00:00:01"), "b v1"),
      ev(3, "U", "http://d", ts("2024-01-01 00:00:02"), "d v1")).toDF(cols: _*)
    assert(Merge.applyBatch(spark, t, b0, 0, 3).applied)
    // v2: update a, delete b, insert c; d untouched
    val b1 = Seq(
      ev(4, "U", "http://a", ts("2024-01-02 00:00:00"), "a v2"),
      ev(5, "D", "http://b", ts("2024-01-02 00:00:01"), null),
      ev(6, "U", "http://c", ts("2024-01-02 00:00:02"), "c v1")).toDF(cols: _*)
    assert(Merge.applyBatch(spark, t, b1, 1, 3).applied)

    // last delta: exactly the keys epoch 1 changed, as to-side state
    assert(changeSet(t, 1, 2) == Set(
      ("http://a", "U", 4L), ("http://b", "D", 5L), ("http://c", "U", 6L)))
    // full range: every live key + the delete event
    assert(changeSet(t, 0, 2) == Set(
      ("http://a", "U", 4L), ("http://b", "D", 5L),
      ("http://c", "U", 6L), ("http://d", "U", 3L)))
    // empty ranges
    assert(t.changesBetween(2, 2).count() == 0)
    assert(t.changesBetween(0, 0).count() == 0)
    // replica convergence: applying the 0->2 changelog as a change batch
    // to an EMPTY table reproduces the live state exactly
    val mirror = LakeTable.create(spark, TestSpark.tempDir("changes-mirror"),
      schemaId = 3, numBuckets = 4)
    val feed = t.changesBetween(0, 2)
      .withColumnRenamed("_lsn", "lsn").withColumnRenamed("_op", "op")
    assert(Merge.applyBatch(spark, mirror, feed, 0, 3).applied)
    val live = (d: LakeTable) => d.readUser().select("url", "text")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(live(mirror) == live(t))

    // a compaction rewrites files without changing rows: file-level
    // change detection fires, the (url, _lsn) anti-join reports nothing
    Maintenance.compact(spark, t)
    assert(t.currentVersion == 3)
    assert(t.changesBetween(2, 3).count() == 0)
    assert(changeSet(t, 1, 3) == changeSet(t, 1, 2))

    val e = intercept[IllegalArgumentException] { t.changesBetween(3, 1) }
    assert(e.getMessage.contains("from"))
  }
}
