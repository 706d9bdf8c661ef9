package graft

import graft.cdc.Merge
import graft.lake.{LakeTable, Maintenance}
import org.scalatest.funsuite.AnyFunSuite

/** Change-data-feed read (LakeTable.changesBetweenCdf): the changelog
  * WITH before images — what a derived-aggregate maintainer needs for
  * retraction, which after-image deltas cannot provide.
  */
class CdfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val cols = Seq("lsn", "op", "url", "warc_ts", "html", "text",
    "lang", "content_len")
  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private def ev(lsn: Long, op: String, url: String, t: java.sql.Timestamp,
      text: String, lang: String = "en") =
    (lsn, op, url, t, null: Array[Byte], text, lang,
      Option(text).map(_.length.toLong).getOrElse(0L))

  private def cdf(t: LakeTable, from: Int, to: Int): Set[(String, String, String)] =
    t.changesBetweenCdf(from, to).select("url", "text", "_change_type")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet

  test("cdf: insert / update pre+post / delete-with-payload / churn suppressed") {
    val dir = TestSpark.tempDir("cdf-table")
    val t = LakeTable.create(spark, dir, schemaId = 3, numBuckets = 4)
    // v1: initial inserts
    val b0 = Seq(
      ev(1, "U", "http://a", ts("2024-01-01 00:00:00"), "a v1"),
      ev(2, "U", "http://b", ts("2024-01-01 00:00:01"), "b v1"),
      ev(3, "U", "http://d", ts("2024-01-01 00:00:02"), "d v1")).toDF(cols: _*)
    assert(Merge.applyBatch(spark, t, b0, 0, 3).applied)
    // v2: update a, delete b, insert c, delete never-seen e; d untouched
    val b1 = Seq(
      ev(4, "U", "http://a", ts("2024-01-02 00:00:00"), "a v2"),
      ev(5, "D", "http://b", ts("2024-01-02 00:00:01"), null),
      ev(6, "U", "http://c", ts("2024-01-02 00:00:02"), "c v1"),
      ev(7, "D", "http://e", ts("2024-01-02 00:00:03"), null)).toDF(cols: _*)
    assert(Merge.applyBatch(spark, t, b1, 1, 3).applied)

    // delete rows carry the BEFORE payload; e (tombstone of a never-seen
    // key: no visible transition) emits nothing; d untouched emits nothing
    assert(cdf(t, 1, 2) == Set(
      ("http://a", "a v1", "update_preimage"),
      ("http://a", "a v2", "update_postimage"),
      ("http://b", "b v1", "delete"),
      ("http://c", "c v1", "insert")))
    // the preimage's _lsn is the OLD version, the postimage's the new
    val byType = t.changesBetweenCdf(1, 2)
      .filter($"url" === "http://a")
      .select("_change_type", "_lsn").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == Map("update_preimage" -> 1L, "update_postimage" -> 4L))
    // _commit_version stamps the range end
    assert(t.changesBetweenCdf(1, 2).select("_commit_version")
      .distinct().collect().map(_.getInt(0)).toSeq == Seq(2))

    // v3: undelete b — an insert (tombstone -> live has no visible before)
    val b2 = Seq(
      ev(8, "U", "http://b", ts("2024-01-03 00:00:00"), "b v2")).toDF(cols: _*)
    assert(Merge.applyBatch(spark, t, b2, 2, 3).applied)
    assert(cdf(t, 2, 3) == Set(("http://b", "b v2", "insert")))

    // coarse range collapses churn to the net transition: b went
    // live("b v1") -> live("b v2") across (1, 3] = one update
    assert(cdf(t, 1, 3) == Set(
      ("http://a", "a v1", "update_preimage"),
      ("http://a", "a v2", "update_postimage"),
      ("http://b", "b v1", "update_preimage"),
      ("http://b", "b v2", "update_postimage"),
      ("http://c", "c v1", "insert")))

    // bootstrap (-1): the visible state as inserts, tombstones excluded
    assert(cdf(t, -1, 3) == Set(
      ("http://a", "a v2", "insert"), ("http://b", "b v2", "insert"),
      ("http://c", "c v1", "insert"), ("http://d", "d v1", "insert")))

    // empty ranges keep the cdf schema
    val empty = t.changesBetweenCdf(3, 3)
    assert(empty.count() == 0)
    assert(empty.columns.contains("_change_type")
      && empty.columns.contains("_commit_version")
      && !empty.columns.contains(graft.core.Schemas.OpCol))

    // a purge-tombstones compaction fences cdf ranges too (shared fence)
    Maintenance.compact(spark, t, purgeTombstones = true)
    val err = intercept[IllegalStateException] { t.changesBetweenCdf(2, 4) }
    assert(err.getMessage.contains("purge"))
  }

  test("cdf across a schema-evolution boundary aligns preimages to the to-schema") {
    val dir = TestSpark.tempDir("cdf-evolve")
    val t = LakeTable.create(spark, dir, schemaId = 1, numBuckets = 4)
    // epoch 0 at registry v1 (no lang / content_len)
    val b0 = Seq((1L, "U", "http://a", ts("2024-01-01 00:00:00"),
      null: Array[Byte], "a v1"))
      .toDF("lsn", "op", "url", "warc_ts", "html", "text")
    assert(Merge.applyBatch(spark, t, b0, 0, batchSchemaVersion = 1).applied)
    // epoch 1 at v3: update a — the table evolves (add lang/content_len,
    // widen); the preimage is a v1 row that must null-backfill/widen to
    // the to-schema instead of failing column resolution
    val b1 = Seq(ev(2, "U", "http://a", ts("2024-01-02 00:00:00"), "a v2"))
      .toDF(cols: _*)
    assert(Merge.applyBatch(spark, t, b1, 1, batchSchemaVersion = 3).applied)
    val rows = t.changesBetweenCdf(1, 2)
      .select("url", "text", "lang", "content_len", "_change_type")
      .collect().map(r => (r.getString(0), r.getString(1),
        Option(r.getString(2)), if (r.isNullAt(3)) None else Some(r.getLong(3)),
        r.getString(4))).toSet
    assert(rows == Set(
      ("http://a", "a v1", None, None, "update_preimage"),
      ("http://a", "a v2", Some("en"), Some(4L), "update_postimage")))
  }

  test("property: state(from) + cdf(from,to) reconstructs state(to) for every version pair") {
    val dir = TestSpark.tempDir("cdf-prop")
    val t = LakeTable.create(spark, dir, schemaId = 3, numBuckets = 4)
    val rnd = new scala.util.Random(23)
    val urls = (0 until 25).map(i => s"http://u$i")
    var lsn = 0L
    (0 until 6).foreach { e =>
      val batch = Seq.tabulate(15) { i =>
        lsn += 1
        val url = urls(rnd.nextInt(urls.size))
        if (rnd.nextInt(4) == 0)
          ev(lsn, "D", url, ts(f"2024-01-0${e + 1} 00:00:${i % 60}%02d"), null)
        else ev(lsn, "U", url, ts(f"2024-01-0${e + 1} 00:00:${i % 60}%02d"), s"t$lsn")
      }.toDF(cols: _*)
      assert(Merge.applyBatch(spark, t, batch, e.toLong, 3).applied)
    }
    // visible state of a version: url -> (text, lsn)
    def visible(v: Int): Map[String, (String, Long)] =
      t.changesBetweenCdf(-1, v).select("url", "text", "_lsn").collect()
        .map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    val states = (1 to t.currentVersion).map(v => v -> visible(v)).toMap
    for (from <- 1 until t.currentVersion; to <- (from + 1) to t.currentVersion) {
      var st = states(from)
      val delta = t.changesBetweenCdf(from, to)
        .select("url", "text", "_lsn", "_change_type").collect()
      // apply: preimages must MATCH the current state exactly (the
      // retraction contract), then deletes remove, posts/inserts upsert
      delta.filter(_.getString(3) == "update_preimage").foreach { r =>
        assert(st.get(r.getString(0)).contains((r.getString(1), r.getLong(2))),
          s"preimage mismatch for ${r.getString(0)} in ($from,$to]")
      }
      delta.filter(_.getString(3) == "delete").foreach { r =>
        assert(st.contains(r.getString(0)), s"delete of absent key in ($from,$to]")
        st -= r.getString(0)
      }
      delta.filter(r => r.getString(3) == "insert"
          || r.getString(3) == "update_postimage").foreach { r =>
        st += r.getString(0) -> (r.getString(1), r.getLong(2))
      }
      assert(st == states(to), s"reconstruction diverged for ($from,$to]")
    }
  }

  test("cdf maintains a derived aggregate by retraction, converging with recompute") {
    val dir = TestSpark.tempDir("cdf-agg")
    val t = LakeTable.create(spark, dir, schemaId = 3, numBuckets = 4)
    val rnd = new scala.util.Random(7)
    val urls = (0 until 40).map(i => s"http://u$i")
    var lsn = 0L
    // 5 epochs of random churn: upserts with shifting lang + deletes
    val batches = (0 until 5).map { e =>
      Seq.tabulate(25) { i =>
        lsn += 1
        val url = urls(rnd.nextInt(urls.size))
        if (rnd.nextInt(5) == 0) ev(lsn, "D", url, ts(f"2024-01-0${e + 1} 00:00:${i % 60}%02d"), null)
        else ev(lsn, "U", url, ts(f"2024-01-0${e + 1} 00:00:${i % 60}%02d"),
          s"t$lsn", lang = s"l${rnd.nextInt(3)}")
      }.toDF(cols: _*)
    }
    batches.zipWithIndex.foreach { case (b, e) =>
      assert(Merge.applyBatch(spark, t, b, e.toLong, 3).applied)
    }
    // Incremental maintenance: fold each per-commit cdf delta into
    // (count, sum(content_len)) per lang — postimages/inserts add,
    // preimages/deletes retract. This is the operation $changes cannot
    // support (no before images).
    var agg = Map.empty[String, (Long, Long)]
    for (v <- 1 to t.currentVersion) {
      t.changesBetweenCdf(v - 1, v)
        .select("lang", "content_len", "_change_type").collect().foreach { r =>
          val (lang, len, ct) = (r.getString(0), r.getLong(1), r.getString(2))
          val sign = if (ct == "insert" || ct == "update_postimage") 1L else -1L
          val (c0, s0) = agg.getOrElse(lang, (0L, 0L))
          agg = agg.updated(lang, (c0 + sign, s0 + sign * len))
        }
    }
    val recomputed = t.readUser().groupBy("lang")
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("c"),
        org.apache.spark.sql.functions.sum("content_len").as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(agg.filter(_._2._1 != 0L) == recomputed)
  }
}
