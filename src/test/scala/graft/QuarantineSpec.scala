package graft

import graft.cdc.Merge
import graft.core.TextHtml
import graft.lake.LakeTable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** T4 dead-letter routing + F10 schema assertion + K7 metadata commit. */
class QuarantineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val cols = Seq("lsn", "op", "url", "warc_ts", "html", "text",
    "lang", "content_len", "schema_version")
  private val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
  private val ts2 = java.sql.Timestamp.valueOf("2024-02-01 00:00:00")

  private def ev(lsn: Long, url: String, t: java.sql.Timestamp, text: String,
      corrupt: Boolean) = {
    val html = s"<html><head><title>$url</title></head><body><p>" +
      (if (corrupt) "GARBAGE" else text) + "</p></body></html>"
    (lsn, "U", url, t, html.getBytes("UTF-8"), text, "en", 1L, 3)
  }

  test("poison events are quarantined, keep prior state, and are counted") {
    val dir = TestSpark.tempDir("qtable")
    val qdir = TestSpark.tempDir("qside") + "/dead"
    val t = LakeTable.create(spark, dir, schemaId = 3, numBuckets = 2)
    // batch 0: good event
    val b0 = Seq(ev(1, "u1", ts, "good one", corrupt = false)).toDF(cols: _*)
    val s0 = Merge.applyBatch(spark, t, b0, 0, 3, quarantineDir = Some(qdir))
    assert(s0.quarantined == 0)
    // batch 1: newer but CORRUPT update for u1 + good insert for u2
    val b1 = Seq(
      ev(2, "u1", ts2, "evil", corrupt = true),
      ev(3, "u2", ts, "fine", corrupt = false)).toDF(cols: _*)
    val s1 = Merge.applyBatch(spark, t, b1, 1, 3, quarantineDir = Some(qdir))
    assert(s1.quarantined == 1)
    // u1 keeps its previous (verified) state; u2 inserted
    val rows = t.readUser().select("url", "text").orderBy("url")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSeq == Seq(("u1", "good one"), ("u2", "fine")))
    // the dead-letter table holds exactly the poison event
    val dead = spark.read.parquet(qdir)
    assert(dead.count() == 1 && dead.select("lsn").head().getLong(0) == 2L)
    // snapshot lineage records the quarantine
    assert(t.currentSnapshot.summary("quarantine-count") == "1")
    // invariant holds for everything in the table (null-safe compare —
    // see CdcEngineSpec; here html is non-null for every live row)
    assert(t.readUser().filter(
      !(TextHtml.extractText(col("html")) <=> col("text"))).count() == 0)
  }

  test("F10: batch missing a required column is rejected with the column names") {
    val dir = TestSpark.tempDir("qtable2")
    val t = LakeTable.create(spark, dir, schemaId = 3, numBuckets = 2)
    val bad = Seq((1L, "u1", ts)).toDF("lsn", "url", "warc_ts") // no op
    val e = intercept[IllegalArgumentException] {
      Merge.applyBatch(spark, t, bad, 0, 3)
    }
    assert(e.getMessage.contains("missing required columns")
      && e.getMessage.contains("op"))
  }

  test("K7: metadata-only commit bumps the version, keeps data untouched") {
    val dir = TestSpark.tempDir("qtable3")
    val t = LakeTable.create(spark, dir, schemaId = 3, numBuckets = 2)
    val b0 = Seq(ev(1, "u1", ts, "x", corrupt = false)).toDF(cols: _*)
    Merge.applyBatch(spark, t, b0, 0, 3)
    val v = t.currentVersion
    val files = t.currentSnapshot.files
    t.updateProperties(Map("reannotated" -> "true"))
    assert(t.currentVersion == v + 1)
    assert(t.currentSnapshot.files == files)
    assert(t.currentSnapshot.summary("reannotated") == "true")
    assert(t.readUser().count() == 1)
  }
}
