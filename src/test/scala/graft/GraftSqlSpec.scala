package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The SQL surface: graft lake tables addressed from `spark.sql` via the
  * DSv2 catalog — CREATE TABLE DDL, SELECT reads of the current snapshot,
  * and the canonical CDC `MERGE INTO` lowering to Merge.applyBatch
  * (round-1 verdict next-round item 9; SURVEY.md §4.2).
  */
class GraftSqlSpec extends AnyFunSuite {

  private def withSqlSession[A](f: SparkSession => A): A = {
    val base = TestSpark.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.catalog.graft", "graft.sql.GraftCatalog")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      f(s)
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }

  private def mergeSql(dir: String, sourceSql: String): String =
    s"""MERGE INTO graft.`$dir` AS t
       |USING ($sourceSql) AS s
       |ON t.url = s.url
       |WHEN MATCHED AND s.op = 'D' THEN DELETE
       |WHEN MATCHED THEN UPDATE SET *
       |WHEN NOT MATCHED THEN INSERT *""".stripMargin

  test("MERGE INTO + SELECT drive the lake table end to end through SQL") {
    withSqlSession { s =>
      val dir = TestSpark.tempDir("sqlmerge")
      graft.lake.LakeTable.create(s, dir, schemaId = 3, numBuckets = 4)

      // epoch 0: two inserts
      val src0 = """SELECT * FROM VALUES
        |  (1L, 'U', 'http://a', TIMESTAMP '2024-01-01 00:00:00', CAST(NULL AS BINARY), 'text a', 'en', 6L),
        |  (2L, 'U', 'http://b', TIMESTAMP '2024-01-01 00:00:01', CAST(NULL AS BINARY), 'text b', 'en', 6L)
        |AS v(lsn, op, url, warc_ts, html, text, lang, content_len)""".stripMargin
      val r0 = s.sql(mergeSql(dir, src0)).collect().head
      assert(r0.getAs[Boolean]("applied") && r0.getAs[Long]("events_in") == 2
        && r0.getAs[Long]("rows_applied") == 2)

      // epoch 1: update a, delete b, insert c — incl. an out-of-order
      // duplicate for a that must LOSE (older warc_ts)
      val src1 = """SELECT * FROM VALUES
        |  (3L, 'U', 'http://a', TIMESTAMP '2024-01-02 00:00:00', CAST(NULL AS BINARY), 'text a v2', 'en', 9L),
        |  (4L, 'U', 'http://a', TIMESTAMP '2023-12-31 00:00:00', CAST(NULL AS BINARY), 'stale', 'en', 5L),
        |  (5L, 'D', 'http://b', TIMESTAMP '2024-01-02 00:00:01', CAST(NULL AS BINARY), NULL, NULL, NULL),
        |  (6L, 'U', 'http://c', TIMESTAMP '2024-01-02 00:00:02', CAST(NULL AS BINARY), 'text c', 'de', 6L)
        |AS v(lsn, op, url, warc_ts, html, text, lang, content_len)""".stripMargin
      val r1 = s.sql(mergeSql(dir, src1)).collect().head
      assert(r1.getAs[Long]("events_in") == 4 && r1.getAs[Long]("conflicts") == 1
        && r1.getAs[Long]("deletes") == 1)

      // SELECT through the catalog reads the merged snapshot
      val rows = s.sql(s"SELECT url, text, lang FROM graft.`$dir` ORDER BY url")
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      assert(rows.toSeq == Seq(
        ("http://a", "text a v2", "en"),
        ("http://c", "text c", "de")))
      // predicates + aggregates compose over the lowered scan
      assert(s.sql(s"SELECT count(*) FROM graft.`$dir` WHERE lang = 'en'")
        .head().getLong(0) == 1L)

      // exactly-once: replay of epoch 1 via explicit epoch conf no-ops
      s.conf.set("graft.merge.epoch", "1")
      try {
        val r2 = s.sql(mergeSql(dir, src1)).collect().head
        assert(!r2.getAs[Boolean]("applied"))
      } finally s.conf.unset("graft.merge.epoch")

      // SQL time travel: v1 = state after epoch 0 (b not yet deleted,
      // a not yet updated); v0 = the empty created table
      val v1 = s.sql(s"SELECT url, text FROM graft.`$dir` VERSION AS OF 1 ORDER BY url")
        .collect().map(r => (r.getString(0), r.getString(1)))
      assert(v1.toSeq == Seq(("http://a", "text a"), ("http://b", "text b")))
      assert(s.sql(s"SELECT count(*) FROM graft.`$dir` VERSION AS OF 0")
        .head().getLong(0) == 0L)
    }
  }

  test("CREATE TABLE DDL mints a lake table from a registry schema") {
    withSqlSession { s =>
      val wh = TestSpark.tempDir("sqlwh")
      s.conf.set("spark.sql.catalog.graft.warehouse", wh)
      s.sql("""CREATE TABLE graft.pages (
        |  url STRING NOT NULL, warc_ts TIMESTAMP NOT NULL, html BINARY,
        |  text STRING, lang STRING, content_len BIGINT)""".stripMargin)
      assert(graft.lake.LakeTable.exists(s"$wh/pages"))
      val r = s.sql(mergeSql(s"$wh/pages",
        """SELECT 1L AS lsn, 'U' AS op, 'http://x' AS url,
          |TIMESTAMP '2024-01-01 00:00:00' AS warc_ts,
          |CAST(NULL AS BINARY) AS html, 'hello' AS text,
          |'en' AS lang, 5L AS content_len""".stripMargin)).collect().head
      assert(r.getAs[Long]("rows_applied") == 1)
      assert(s.sql("SELECT text FROM graft.pages").head().getString(0) == "hello")
    }
  }

  test("non-canonical MERGE shapes are rejected with guidance") {
    withSqlSession { s =>
      val dir = TestSpark.tempDir("sqlbad")
      graft.lake.LakeTable.create(s, dir, schemaId = 3, numBuckets = 2)
      val e = intercept[Exception] {
        s.sql(s"""MERGE INTO graft.`$dir` t
          |USING (SELECT 1L lsn, 'U' op, 'u' url,
          |  TIMESTAMP '2024-01-01 00:00:00' warc_ts,
          |  CAST(NULL AS BINARY) html, 't' text, 'en' lang, 1L content_len) s
          |ON t.url = s.url
          |WHEN MATCHED THEN UPDATE SET t.text = 'overwritten'
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
      }
      assert(e.getMessage.contains("canonical CDC form"))
    }
  }
}
