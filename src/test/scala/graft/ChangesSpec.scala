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

  test("changelog contract: initial bootstrap, expired range, purge-tombstones fence") {
    val dir = TestSpark.tempDir("changes-contract")
    val t = LakeTable.create(spark, dir, schemaId = 3, numBuckets = 4)
    val b0 = Seq(
      ev(1, "U", "http://a", ts("2024-01-01 00:00:00"), "a v1"),
      ev(2, "U", "http://b", ts("2024-01-01 00:00:01"), "b v1")).toDF(cols: _*)
    assert(Merge.applyBatch(spark, t, b0, 0, 3).applied)

    // initial changelog: from = -1 emits the full snapshot (the fresh-
    // replica bootstrap), and the FIRST commit's delta is observable
    // through it instead of collapsing to an empty from==to range
    assert(changeSet(t, -1, 1) == Set(("http://a", "U", 1L), ("http://b", "U", 2L)))

    // delete b, then purge its tombstone via compaction
    val b1 = Seq(ev(3, "D", "http://b", ts("2024-01-02 00:00:00"), null))
      .toDF(cols: _*)
    assert(Merge.applyBatch(spark, t, b1, 1, 3).applied)
    Maintenance.compact(spark, t, purgeTombstones = true) // v3 = purge
    val b2 = Seq(ev(4, "U", "http://c", ts("2024-01-03 00:00:00"), "c v1"))
      .toDF(cols: _*)
    assert(Merge.applyBatch(spark, t, b2, 3, 3).applied) // v4

    // a range CROSSING the purge must refuse (the purged delete of b
    // would silently vanish from the delta), even from versions that
    // still exist; ranges starting AT the purge version are valid, and
    // the purge watermark survives later commits
    val purgeErr = intercept[IllegalStateException] { t.changesBetween(1, 4) }
    assert(purgeErr.getMessage.contains("purge"))
    intercept[IllegalStateException] { t.changesBetween(2, 4) }
    assert(changeSet(t, 3, 4) == Set(("http://c", "U", 4L)))
    // bootstrap stays valid across the purge — it is to-state, not a delta
    assert(changeSet(t, -1, 4) ==
      Set(("http://a", "U", 1L), ("http://c", "U", 4L)))

    // retention breach: expire everything but the current snapshot — an
    // expired `from` raises a clear re-bootstrap error, not a file error
    Maintenance.expireSnapshots(t, keepLast = 1)
    val gone = intercept[IllegalArgumentException] { t.changesBetween(3, 4) }
    assert(gone.getMessage.contains("expired") &&
      gone.getMessage.contains("re-bootstrap"))
  }

  test("change feed: a tailing replica converges while merges keep landing") {
    import graft.cdc.ChangeFeed
    val dir = TestSpark.tempDir("feed-table")
    val t = LakeTable.create(spark, dir, schemaId = 3, numBuckets = 4)
    val mirrorDir = TestSpark.tempDir("feed-mirror")
    val mirror = LakeTable.create(spark, mirrorDir, schemaId = 3, numBuckets = 4)
    val ck = TestSpark.tempDir("feed-ck") + "/feed.v"

    // writer thread: 6 epochs of inserts/updates/deletes landing live
    val epochs: Seq[Seq[(Long, String, String, java.sql.Timestamp, Array[Byte], String, String, Long)]] =
      (0 until 6).map { e =>
        val base = e * 10
        Seq(
          ev(base + 1, "U", s"http://k${e % 3}", ts(f"2024-01-0${e + 1}%d 00:00:00"), s"k${e % 3} @e$e"),
          ev(base + 2, if (e == 3) "D" else "U", "http://hot",
            ts(f"2024-01-0${e + 1}%d 00:00:01"), if (e == 3) null else s"hot @e$e"))
      }
    @volatile var writerDone = false
    val writer = new Thread(() => {
      try epochs.zipWithIndex.foreach { case (rows, e) =>
        assert(Merge.applyBatch(spark, t, rows.toDF(cols: _*), e, 3).applied)
        Thread.sleep(120)
      } finally writerDone = true
    })

    // the replica applies each emission through the argmax merge, keyed
    // by the emitted `to` version — so a re-emitted delta (crash between
    // consume and checkpoint) gates out idempotently. from == -1 would
    // mean replace-state; here the mirror starts empty so merge == replace.
    def applyDelta(from: Int, to: Int, df: org.apache.spark.sql.DataFrame): Long = {
      val batch = df.withColumnRenamed("_lsn", "lsn").withColumnRenamed("_op", "op")
      val s = Merge.applyBatch(spark, mirror, batch, to.toLong, 3)
      s.rowsApplied
    }
    writer.start()
    val emitted = ChangeFeed.follow(spark, dir, ck, applyDelta,
      intervalMs = 60, until = () => writerDone)
    writer.join()

    assert(emitted.nonEmpty && emitted.head.from == -1) // bootstrap first
    // emissions chain contiguously and the checkpoint landed at the head
    emitted.sliding(2).foreach {
      case Seq(a, b) => assert(b.from == a.to); case _ => ()
    }
    assert(ChangeFeed.lastEmitted(ck) == t.currentVersion)
    // convergence: the tailing mirror's live state equals the source's
    val live = (d: LakeTable) => d.readUser().select("url", "text")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(live(mirror) == live(t))
    // the feed actually TAILED (several incremental emissions), not one
    // catch-up batch — the writer sleeps between epochs to guarantee it
    assert(emitted.size >= 2)

    // caught-up feed: another poll emits nothing and moves nothing
    assert(ChangeFeed.pollOnce(spark, dir, ck, applyDelta).isEmpty)
    assert(ChangeFeed.lastEmitted(ck) == t.currentVersion)
  }

  test("replicate crash between apply and checkpoint: the re-emitted delta gates out") {
    import graft.cdc.{ChangeFeed, Metrics}
    val src = TestSpark.tempDir("crash-src")
    val rep = TestSpark.tempDir("crash-rep") + "/replica"
    val ck = TestSpark.tempDir("crash-ck") + "/rep.v"
    val t = LakeTable.create(spark, src, schemaId = 3, numBuckets = 4)
    assert(Merge.applyBatch(spark, t, Seq(
      ev(1, "U", "http://a", ts("2024-01-01 00:00:00"), "a v1")).toDF(cols: _*), 0, 3).applied)
    ChangeFeed.replicate(spark, src, rep, ck, intervalMs = 10L, until = () => true)
    assert(Merge.applyBatch(spark, t, Seq(
      ev(2, "U", "http://b", ts("2024-01-02 00:00:00"), "b v1")).toDF(cols: _*), 1, 3).applied)
    ChangeFeed.replicate(spark, src, rep, ck, intervalMs = 10L, until = () => true)
    val replica = LakeTable.load(spark, rep)
    val state = replica.readUser().select("url", "text").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val version = replica.currentVersion
    val lineage = Metrics.read(rep).size
    // crash simulation: the last delta's merge COMMITTED on the replica
    // but the feed checkpoint never advanced — rewind it one emission
    val prev = ChangeFeed.lastEmitted(ck) - 1
    java.nio.file.Files.writeString(java.nio.file.Paths.get(ck), prev.toString)
    ChangeFeed.replicate(spark, src, rep, ck, intervalMs = 10L, until = () => true)
    val after = LakeTable.load(spark, rep)
    // the re-emitted range gated out: no new replica commit, no duplicate
    // lineage line, identical state, checkpoint back at the head
    assert(after.currentVersion == version)
    assert(Metrics.read(rep).size == lineage)
    assert(after.readUser().select("url", "text").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet == state)
    assert(ChangeFeed.lastEmitted(ck) == t.currentVersion)
  }
}
