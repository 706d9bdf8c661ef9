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

  test("merge-on-read through SQL: set_write_mode, MERGE appends delta " +
      "layers, SELECT resolves them, auto_maintain folds") {
    withSqlSession { s =>
      val dir = TestSpark.tempDir("sqlmor")
      graft.lake.LakeTable.create(s, dir, schemaId = 3, numBuckets = 4)
      val r = s.sql(
        s"CALL graft.system.set_write_mode(table => '$dir', mode => 'mor')")
        .collect().head
      assert(r.getAs[String]("mode") == "mor")
      intercept[Exception] { s.sql(
        s"CALL graft.system.set_write_mode(table => '$dir', mode => 'zzz')")
        .collect() }

      val src0 = """SELECT * FROM VALUES
        |  (1L, 'U', 'http://a', TIMESTAMP '2024-01-01 00:00:00', CAST(NULL AS BINARY), 'text a', 'en', 6L),
        |  (2L, 'U', 'http://b', TIMESTAMP '2024-01-01 00:00:01', CAST(NULL AS BINARY), 'text b', 'en', 6L)
        |AS v(lsn, op, url, warc_ts, html, text, lang, content_len)""".stripMargin
      s.sql(mergeSql(dir, src0)).collect()
      val src1 = """SELECT * FROM VALUES
        |  (3L, 'U', 'http://a', TIMESTAMP '2024-01-02 00:00:00', CAST(NULL AS BINARY), 'text a v2', 'en', 9L),
        |  (4L, 'D', 'http://b', TIMESTAMP '2024-01-02 00:00:01', CAST(NULL AS BINARY), NULL, NULL, NULL)
        |AS v(lsn, op, url, warc_ts, html, text, lang, content_len)""".stripMargin
      s.sql(mergeSql(dir, src1)).collect()

      // both merges appended delta layers (visible in t$files)…
      assert(s.sql(s"SELECT count(*) FROM graft.`$dir$$files` WHERE delta")
        .head().getLong(0) >= 2)
      // …and the SELECT resolves the stack: a updated, b tombstoned
      val rows = s.sql(s"SELECT url, text FROM graft.`$dir` ORDER BY url")
        .collect().map(r2 => (r2.getString(0), r2.getString(1)))
      assert(rows.toSeq == Seq(("http://a", "text a v2")))

      // auto_maintain sees the fold debt and compacts it away
      val m = s.sql(s"CALL graft.system.auto_maintain(table => '$dir')")
        .collect().head
      // default threshold (32) not reached by 2 layers — explicit compact
      assert(m.getAs[String]("action") == "none")
      s.sql(s"CALL graft.system.compact(table => '$dir')").collect()
      assert(s.sql(s"SELECT count(*) FROM graft.`$dir$$files` WHERE delta")
        .head().getLong(0) == 0)
      assert(s.sql(s"SELECT url, text FROM graft.`$dir`").collect()
        .map(r2 => (r2.getString(0), r2.getString(1))).toSeq ==
        Seq(("http://a", "text a v2")))
    }
  }

  test("metadata tables: $history/$files/$manifests/$metrics via SQL") {
    withSqlSession { s =>
      val dir = TestSpark.tempDir("sqlmeta")
      graft.lake.LakeTable.create(s, dir, schemaId = 3, numBuckets = 4)
      s.conf.set("graft.merge.partitionLineage", "true")
      val src = """SELECT * FROM VALUES
        |  (1L, 'U', 'http://a', TIMESTAMP '2024-01-01 00:00:00', CAST(NULL AS BINARY), 'text a', 'en', 6L),
        |  (2L, 'U', 'http://b', TIMESTAMP '2024-01-01 00:00:01', CAST(NULL AS BINARY), 'text b', 'en', 6L)
        |AS v(lsn, op, url, warc_ts, html, text, lang, content_len)""".stripMargin
      s.sql(mergeSql(dir, src)).collect()

      // $history: v0 (create) + v1 (merge), lineage columns populated
      val hist = s.sql(
        s"SELECT version, epoch, rows_applied, conflicts FROM graft.`$dir$$history` ORDER BY version")
        .collect()
      assert(hist.length == 2)
      assert(hist(1).getLong(1) == 0L && hist(1).getLong(2) == 2L
        && hist(1).getLong(3) == 0L)
      // summary map round-trips through SQL
      assert(s.sql(
        s"SELECT summary['source-lsn-max'] FROM graft.`$dir$$history` WHERE version = 1")
        .head().getString(0) == "2")

      // $files: live inventory matches the snapshot; aggregates compose
      val snap = graft.lake.LakeTable.load(s, dir).currentSnapshot
      assert(s.sql(s"SELECT sum(rows) FROM graft.`$dir$$files`")
        .head().getLong(0) == 2L)
      assert(s.sql(s"SELECT count(*) FROM graft.`$dir$$files`")
        .head().getLong(0) == snap.files.size.toLong)

      // $manifests: the manifest list with per-group stats
      assert(s.sql(s"SELECT sum(num_files) FROM graft.`$dir$$manifests`")
        .head().getLong(0) == snap.fileCount.toLong)

      // $metrics: the per-batch throughput/lineage sink — the SQL MERGE
      // above appended its own row (epoch 0); add a stream-driver-shaped
      // row and read both back
      graft.cdc.Metrics.append(dir, graft.cdc.MergeStats(7L, applied = true,
        10L, 8L, 2L, 1L, 100L, 109L, 3, 42L))
      val m = s.sql(
        s"SELECT epoch, events_in, touched_buckets FROM graft.`$dir$$metrics` ORDER BY epoch")
        .collect()
      assert(m.length == 2)
      assert(m(0).getLong(0) == 0L && m(0).getLong(1) == 2L)
      assert(m(1).getLong(0) == 7L && m(1).getLong(1) == 10L && m(1).getInt(2) == 3)

      // $partitions: per-bucket lineage of the SQL merge (conf-enabled)
      val pl = s.sql(s"SELECT sum(events), sum(conflicts) FROM graft.`$dir$$partitions` WHERE epoch = 0")
        .head()
      assert(pl.getLong(0) == 2L && pl.getLong(1) == 0L)
      s.conf.unset("graft.merge.partitionLineage")

      // VERSION AS OF pins $files to the snapshot (v0 = empty table)
      assert(s.sql(s"SELECT count(*) FROM graft.`$dir$$files` VERSION AS OF 0")
        .head().getLong(0) == 0L)

      // $changes: the DISTRIBUTED changelog view (CDC out). Default range
      // = last commit's delta; VERSION AS OF pins `to`, graft.changes.from
      // pins `from`
      val ch = s.sql(s"SELECT url, _op, _lsn FROM graft.`$dir$$changes`")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(ch == Set(("http://a", "U", 1L), ("http://b", "U", 2L)))
      s.conf.set("graft.changes.from", "0")
      try {
        assert(s.sql(s"SELECT count(*) FROM graft.`$dir$$changes` VERSION AS OF 1")
          .head().getLong(0) == 2L)
        assert(s.sql(s"SELECT count(*) FROM graft.`$dir$$changes` VERSION AS OF 0")
          .head().getLong(0) == 0L)
      } finally s.conf.unset("graft.changes.from")

      // $cdf: the changelog with before images — both initial inserts,
      // no _op column, _change_type/_commit_version present
      val cdf = s.sql(
        s"SELECT url, _change_type, _commit_version FROM graft.`$dir$$cdf`")
        .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
      assert(cdf == Set(("http://a", "insert", 1), ("http://b", "insert", 1)))
      assert(!s.table(s"graft.`$dir$$cdf`").columns.contains("_op"))
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

      // catalog plumbing: listTables + schema surface through plain SQL
      assert(s.sql("SHOW TABLES IN graft").collect()
        .map(_.getString(1)).contains("pages"))
      val desc = s.sql("DESCRIBE TABLE graft.pages").collect()
        .map(_.getString(0))
      assert(desc.contains("url") && desc.contains("content_len"))

      // a user's PARTITIONED BY must be rejected, not silently discarded
      val pe = intercept[Exception] {
        s.sql("""CREATE TABLE graft.pages2 (
          |  url STRING NOT NULL, warc_ts TIMESTAMP NOT NULL, html BINARY,
          |  text STRING, lang STRING, content_len BIGINT)
          |PARTITIONED BY (lang)""".stripMargin)
      }
      assert(pe.getMessage.contains("buckets"))
      // DROP on a metadata view must be rejected, not no-op'd
      val de = intercept[Exception] { s.sql("DROP TABLE graft.`pages$files`") }
      assert(de.getMessage.contains("metadata table"))
      assert(graft.lake.LakeTable.exists(s"$wh/pages")) // base intact
    }
  }

  test("INSERT INTO and CTAS: create -> insert -> merge -> select purely via SQL") {
    withSqlSession { s =>
      val wh = TestSpark.tempDir("sqlinswh")
      s.conf.set("spark.sql.catalog.graft.warehouse", wh)
      s.sql("""CREATE TABLE graft.ins_pages (
        |  url STRING NOT NULL, warc_ts TIMESTAMP NOT NULL, html BINARY,
        |  text STRING, lang STRING, content_len BIGINT)
        |TBLPROPERTIES ('buckets' = '4')""".stripMargin)

      // K1 analog: plain-append rows (no lsn/op — the engine allocates)
      val r0 = s.sql("""INSERT INTO graft.ins_pages VALUES
        |  ('http://a', TIMESTAMP '2024-01-01 00:00:00', CAST(NULL AS BINARY), 'text a', 'en', 6L),
        |  ('http://b', TIMESTAMP '2024-01-01 00:00:01', CAST(NULL AS BINARY), 'text b', 'de', 6L)""".stripMargin)
        .collect().head
      assert(r0.getAs[Boolean]("applied") && r0.getAs[Long]("rows_applied") == 2)

      // second INSERT upserts: same key with a newer warc_ts wins
      s.sql("""INSERT INTO graft.ins_pages VALUES
        |  ('http://a', TIMESTAMP '2024-01-02 00:00:00', CAST(NULL AS BINARY), 'text a v2', 'en', 9L)""".stripMargin)
        .collect()
      val rows = s.sql("SELECT url, text FROM graft.ins_pages ORDER BY url")
        .collect().map(r => (r.getString(0), r.getString(1)))
      assert(rows.toSeq == Seq(("http://a", "text a v2"), ("http://b", "text b")))

      // a MERGE composes on top of SQL-inserted state
      s.sql(mergeSql(s"$wh/ins_pages",
        """SELECT 900L AS lsn, 'D' AS op, 'http://b' AS url,
          |TIMESTAMP '2024-01-03 00:00:00' AS warc_ts,
          |CAST(NULL AS BINARY) AS html, CAST(NULL AS STRING) AS text,
          |CAST(NULL AS STRING) AS lang, CAST(NULL AS BIGINT) AS content_len""".stripMargin))
        .collect()
      assert(s.sql("SELECT url FROM graft.ins_pages").collect()
        .map(_.getString(0)).toSeq == Seq("http://a"))

      // every SQL write is lineage-visible: v1 create, v2+v3 inserts, v4 merge
      val hist = s.sql(
        "SELECT version, epoch, rows_applied FROM graft.`ins_pages$history` ORDER BY version")
        .collect()
      assert(hist.length == 4)
      assert(hist(1).getLong(2) == 2L) // first insert's lineage row
      // epochs allocated in order across insert/insert/merge
      assert(hist.drop(1).map(_.getLong(1)).toSeq == Seq(0L, 1L, 2L))

      // CTAS: schema comes from the query, must match a registry version
      s.sql("""CREATE TABLE graft.ins_copy TBLPROPERTIES ('buckets' = '2')
        |AS SELECT url, warc_ts, html, text, lang, content_len
        |FROM graft.ins_pages""".stripMargin).collect()
      assert(graft.lake.LakeTable.exists(s"$wh/ins_copy"))
      assert(s.sql("SELECT url, text FROM graft.ins_copy").collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq
        == Seq(("http://a", "text a v2")))
      // IF NOT EXISTS: existing table → no create, no write
      s.sql("""CREATE TABLE IF NOT EXISTS graft.ins_copy
        |AS SELECT * FROM graft.ins_pages""".stripMargin).collect()
      assert(s.sql("SELECT count(*) FROM graft.`ins_copy$history`")
        .head().getLong(0) == 2L) // still create + first epoch only

      // INSERT with an explicit column list: unnamed columns null-backfill
      s.sql("""INSERT INTO graft.ins_pages (url, warc_ts, text)
        |VALUES ('http://d', TIMESTAMP '2024-01-04 00:00:00', 'text d')""".stripMargin)
        .collect()
      val d = s.sql("SELECT lang, text FROM graft.ins_pages WHERE url = 'http://d'")
        .head()
      assert(d.isNullAt(0) && d.getString(1) == "text d")
    }
  }

  test("failed CTAS is cleanly re-runnable; an empty INSERT is a calm no-op") {
    withSqlSession { s =>
      val wh = TestSpark.tempDir("sqlctasf")
      s.conf.set("spark.sql.catalog.graft.warehouse", wh)
      // the CTAS query fails at WRITE time (analysis is clean) — the
      // just-created empty table must be dropped so the retry can run
      intercept[Exception] {
        s.sql("""CREATE TABLE graft.ctas_f AS SELECT
          |  'http://x' AS url, TIMESTAMP '2024-01-01 00:00:00' AS warc_ts,
          |  CAST(NULL AS BINARY) AS html,
          |  CAST(raise_error('boom') AS STRING) AS text,
          |  'en' AS lang, 1L AS content_len""".stripMargin).collect()
      }
      assert(!graft.lake.LakeTable.exists(s"$wh/ctas_f"))
      s.sql("""CREATE TABLE graft.ctas_f AS SELECT
        |  'http://x' AS url, TIMESTAMP '2024-01-01 00:00:00' AS warc_ts,
        |  CAST(NULL AS BINARY) AS html, 'ok' AS text,
        |  'en' AS lang, 2L AS content_len""".stripMargin).collect()
      assert(s.sql("SELECT text FROM graft.ctas_f").head().getString(0) == "ok")

      // a genuinely-empty INSERT reports applied=false without retrying
      // or raising a spurious contention error (the gate's own verdict,
      // not an epoch comparison, classifies swallowed writes)
      val r = s.sql(
        "INSERT INTO graft.ctas_f SELECT * FROM graft.ctas_f WHERE 1 = 0")
        .collect().head
      assert(!r.getAs[Boolean]("applied") && r.getAs[Long]("events_in") == 0)
      assert(s.sql("SELECT count(*) FROM graft.ctas_f").head().getLong(0) == 1L)
    }
  }

  test("INSERT OVERWRITE truncates and replaces via the full-rewrite commit") {
    withSqlSession { s =>
      val wh = TestSpark.tempDir("sqlovwh")
      s.conf.set("spark.sql.catalog.graft.warehouse", wh)
      s.sql("""CREATE TABLE graft.ow_pages (
        |  url STRING NOT NULL, warc_ts TIMESTAMP NOT NULL, html BINARY,
        |  text STRING, lang STRING, content_len BIGINT)
        |TBLPROPERTIES ('buckets' = '4')""".stripMargin)
      s.sql("""INSERT INTO graft.ow_pages VALUES
        |  ('http://a', TIMESTAMP '2024-01-01 00:00:00', CAST(NULL AS BINARY), 'text a', 'en', 6L),
        |  ('http://b', TIMESTAMP '2024-01-01 00:00:01', CAST(NULL AS BINARY), 'text b', 'de', 6L)""".stripMargin)
        .collect()

      // K2: the SELECT's rows become the COMPLETE table state — a and b
      // are gone without tombstones; z (a within-batch duplicate) resolves
      // latest-wins so the one-row-per-url invariant holds
      val r = s.sql("""INSERT OVERWRITE graft.ow_pages VALUES
        |  ('http://z', TIMESTAMP '2024-02-01 00:00:00', CAST(NULL AS BINARY), 'z v1', 'en', 4L),
        |  ('http://z', TIMESTAMP '2024-02-02 00:00:00', CAST(NULL AS BINARY), 'z v2', 'en', 4L),
        |  ('http://y', TIMESTAMP '2024-02-01 00:00:00', CAST(NULL AS BINARY), 'y', 'fr', 1L)""".stripMargin)
        .collect().head
      assert(r.getAs[Boolean]("applied") && r.getAs[Long]("events_in") == 3
        && r.getAs[Long]("rows_applied") == 2 && r.getAs[Long]("conflicts") == 1)
      assert(s.sql("SELECT url, text FROM graft.ow_pages ORDER BY url")
        .collect().map(x => (x.getString(0), x.getString(1))).toSeq
        == Seq(("http://y", "y"), ("http://z", "z v2")))

      // lineage: the overwrite snapshot is marked truncate=true and
      // advances the purge-version fence (dropped keys left no tombstones)
      val hist = s.sql("""SELECT version, summary['truncate'],
        |summary['purge-version'] FROM graft.`ow_pages$history`
        |ORDER BY version""".stripMargin).collect()
      val ow = hist.last
      assert(ow.getString(1) == "true" && ow.getString(2) == ow.getInt(0).toString)
      // changelogs crossing the overwrite refuse; from the overwrite
      // forward (and the bootstrap) stay valid
      val t = graft.lake.LakeTable.load(s, s"$wh/ow_pages")
      val v = t.currentVersion
      val pe = intercept[IllegalStateException] { t.changesBetween(v - 1, v).count() }
      assert(pe.getMessage.contains("purge"))
      assert(t.changesBetween(v, v).count() == 0)
      assert(t.changesBetween(-1, v).count() == 2)

      // exactly-once: replaying the overwrite at its pinned epoch no-ops
      val epoch = r.getAs[Long]("epoch")
      s.conf.set("graft.merge.epoch", epoch.toString)
      try {
        val r2 = s.sql("""INSERT OVERWRITE graft.ow_pages VALUES
          |  ('http://q', TIMESTAMP '2024-03-01 00:00:00', CAST(NULL AS BINARY), 'q', 'en', 1L)""".stripMargin)
          .collect().head
        assert(!r2.getAs[Boolean]("applied"))
        assert(s.sql("SELECT count(*) FROM graft.ow_pages").head().getLong(0) == 2L)
      } finally s.conf.unset("graft.merge.epoch")
    }
  }

  test("SQL MERGE drives registry schema evolution: v1 table, v3 source") {
    withSqlSession { s =>
      val dir = TestSpark.tempDir("sqlevo")
      graft.lake.LakeTable.create(s, dir, schemaId = 1, numBuckets = 2)
      // v1-shaped source (no lang/content_len)
      s.sql(mergeSql(dir,
        """SELECT 1L AS lsn, 'U' AS op, 'http://old' AS url,
          |TIMESTAMP '2024-01-01 00:00:00' AS warc_ts,
          |CAST(NULL AS BINARY) AS html, 'old text' AS text""".stripMargin))
        .collect()
      assert(graft.lake.LakeTable.load(s, dir).currentSnapshot.schemaId == 1)
      // v3-shaped source: lang added, content_len BIGINT → the registry
      // infers version 3 and the snapshot schema advances; the v1 file
      // stays put and null-backfills at read
      s.sql(mergeSql(dir,
        """SELECT 2L AS lsn, 'U' AS op, 'http://new' AS url,
          |TIMESTAMP '2024-01-02 00:00:00' AS warc_ts,
          |CAST(NULL AS BINARY) AS html, 'new text' AS text,
          |'en' AS lang, 8L AS content_len""".stripMargin)).collect()
      val t = graft.lake.LakeTable.load(s, dir)
      assert(t.currentSnapshot.schemaId == 3)
      val rows = s.sql(s"SELECT url, lang, content_len FROM graft.`$dir` ORDER BY url")
        .collect().map(r => (r.getString(0), r.getString(1),
          if (r.isNullAt(2)) -1L else r.getLong(2)))
      assert(rows.toSeq == Seq(("http://new", "en", 8L), ("http://old", null, -1L)))
    }
  }

  test("ALTER TABLE ADD COLUMN mints a persisted registry version; " +
    "old-schema batches still merge and null-backfill") {
    withSqlSession { s =>
      val wh = TestSpark.tempDir("sqlevowh")
      s.conf.set("spark.sql.catalog.graft.warehouse", wh)
      s.sql("""CREATE TABLE graft.evo_pages (
        |  url STRING NOT NULL, warc_ts TIMESTAMP NOT NULL, html BINARY,
        |  text STRING, lang STRING, content_len BIGINT)
        |TBLPROPERTIES ('buckets' = '2')""".stripMargin)
      s.sql(mergeSql(s"$wh/evo_pages",
        """SELECT 1L AS lsn, 'U' AS op, 'http://old' AS url,
          |TIMESTAMP '2024-01-01 00:00:00' AS warc_ts,
          |CAST(NULL AS BINARY) AS html, 'old' AS text,
          |'en' AS lang, 3L AS content_len""".stripMargin)).collect()

      // the operational evolution act: no recompile, no data rewrite
      s.sql("ALTER TABLE graft.evo_pages ADD COLUMN fetch_ms INT")
      val t = graft.lake.LakeTable.load(s, s"$wh/evo_pages")
      assert(t.currentSnapshot.schemaId == 4)
      assert(t.knownSchemaVersions.contains(4))
      assert(t.registrySchemaFor(4).fieldNames.contains("fetch_ms"))

      // pre-ALTER rows read back null-backfilled through SQL
      val old = s.sql("SELECT url, fetch_ms FROM graft.evo_pages").head()
      assert(old.getString(0) == "http://old" && old.isNullAt(1))

      // an OLD-schema (v3) producer batch merged AFTER the ALTER still
      // applies through the engine path (the stream/CLI drivers) — the
      // batch aligns to the minted v4 with fetch_ms null-backfilled. (The
      // SQL MERGE spelling requires the source to name every target
      // column — INSERT * is strict star expansion — so a SQL caller
      // writes CAST(NULL AS INT) AS fetch_ms explicitly.)
      import s.implicits._
      val v3batch = Seq((2L, "U", "http://v3",
        java.sql.Timestamp.valueOf("2024-01-02 00:00:00"),
        null: Array[Byte], "from v3 producer", "de", 16L))
        .toDF("lsn", "op", "url", "warc_ts", "html", "text", "lang", "content_len")
      assert(graft.cdc.Merge.applyBatch(s, t, v3batch,
        epoch = t.lastCommittedEpoch.map(_ + 1).getOrElse(0L),
        batchSchemaVersion = 3).applied)
      assert(graft.lake.LakeTable.load(s, s"$wh/evo_pages")
        .currentSnapshot.schemaId == 4)

      // a writer can populate the minted column via SQL INSERT
      s.sql("""INSERT INTO graft.evo_pages (url, warc_ts, text, fetch_ms)
        |VALUES ('http://new', TIMESTAMP '2024-01-03 00:00:00', 'new', 250)""".stripMargin)
        .collect()
      val rows = s.sql(
        "SELECT url, fetch_ms FROM graft.evo_pages ORDER BY url")
        .collect().map(r => (r.getString(0), if (r.isNullAt(1)) -1 else r.getInt(1)))
      assert(rows.toSeq == Seq(("http://new", 250), ("http://old", -1), ("http://v3", -1)))

      // type widening mints the next version; the INT-written file widens
      // at read
      s.sql("ALTER TABLE graft.evo_pages ALTER COLUMN fetch_ms TYPE BIGINT")
      val t2 = graft.lake.LakeTable.load(s, s"$wh/evo_pages")
      assert(t2.currentSnapshot.schemaId == 5)
      assert(s.sql("SELECT fetch_ms FROM graft.evo_pages WHERE url = 'http://new'")
        .head().getLong(0) == 250L)

      // narrowing stays rejected (Spark's own analyzer guard fires first;
      // our evolveSchema canEvolve check is the backstop for API callers)
      val e = intercept[Exception] {
        s.sql("ALTER TABLE graft.evo_pages ALTER COLUMN content_len TYPE INT")
      }
      assert(e.getMessage.contains("NOT_SUPPORTED_CHANGE_COLUMN")
        || e.getMessage.contains("evolution"))
      val e2 = intercept[Exception] {
        t2.evolveSchema(org.apache.spark.sql.types.StructType(
          t2.registrySchemaFor(5).fields.filterNot(_.name == "lang")))
      }
      assert(e2.getMessage.contains("evolution"))
    }
  }

  test("SQL MERGE routes poison rows to the conf'd quarantine dir") {
    withSqlSession { s =>
      val dir = TestSpark.tempDir("sqlq")
      val qdir = TestSpark.tempDir("sqlqside") + "/dead"
      graft.lake.LakeTable.create(s, dir, schemaId = 3, numBuckets = 2)
      s.conf.set("graft.merge.quarantineDir", qdir)
      try {
        // u1's html does NOT re-extract to its text → poison; u2 (null
        // html) is exempt from the invariant check
        val src = """SELECT * FROM VALUES
          |  (1L, 'U', 'http://u1', TIMESTAMP '2024-01-01 00:00:00',
          |   CAST('<html><body><p>GARBAGE</p></body></html>' AS BINARY), 'clean text', 'en', 10L),
          |  (2L, 'U', 'http://u2', TIMESTAMP '2024-01-01 00:00:00',
          |   CAST(NULL AS BINARY), 'fine', 'en', 4L)
          |AS v(lsn, op, url, warc_ts, html, text, lang, content_len)""".stripMargin
        s.sql(mergeSql(dir, src)).collect()
        assert(s.read.parquet(qdir).select("lsn").head().getLong(0) == 1L)
        val rows = s.sql(s"SELECT url FROM graft.`$dir` ORDER BY url")
          .collect().map(_.getString(0))
        assert(rows.toSeq == Seq("http://u2"))
        assert(graft.lake.LakeTable.load(s, dir)
          .currentSnapshot.summary("quarantine-count") == "1")
      } finally s.conf.unset("graft.merge.quarantineDir")
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

      // update-only MERGE (no DELETE clause) must be rejected too: the
      // engine tombstones op='D' events, so accepting it would delete
      // rows the statement says to update (round-2 review)
      val e2 = intercept[Exception] {
        s.sql(s"""MERGE INTO graft.`$dir` t
          |USING (SELECT 1L lsn, 'U' op, 'u' url,
          |  TIMESTAMP '2024-01-01 00:00:00' warc_ts,
          |  CAST(NULL AS BINARY) html, 't' text, 'en' lang, 1L content_len) s
          |ON t.url = s.url
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
      }
      assert(e2.getMessage.contains("DELETE"))
    }
  }

  test("DELETE FROM and UPDATE lower to change events through the merge") {
    withSqlSession { s =>
      val wh = TestSpark.tempDir("sqldelwh")
      s.conf.set("spark.sql.catalog.graft.warehouse", wh)
      s.sql("""CREATE TABLE graft.du_pages (
        |  url STRING NOT NULL, warc_ts TIMESTAMP NOT NULL, html BINARY,
        |  text STRING, lang STRING, content_len BIGINT)
        |TBLPROPERTIES ('buckets' = '4')""".stripMargin)
      s.sql("""INSERT INTO graft.du_pages VALUES
        |  ('http://a', TIMESTAMP '2024-01-01 00:00:00', CAST(NULL AS BINARY), 'text a', 'en', 6L),
        |  ('http://b', TIMESTAMP '2024-01-01 00:00:01', CAST(NULL AS BINARY), 'text b', 'de', 6L),
        |  ('http://c', TIMESTAMP '2024-01-01 00:00:02', CAST(NULL AS BINARY), 'text c', 'de', 6L)""".stripMargin)
        .collect()
      val preDelete = graft.lake.LakeTable.load(s, s"$wh/du_pages").currentVersion

      // row-level DELETE: predicate-matched rows tombstone through the
      // merge — lineage row reports them as delete events
      val d = s.sql("DELETE FROM graft.du_pages WHERE lang = 'de'")
        .collect().head
      assert(d.getAs[Boolean]("applied") && d.getAs[Long]("events_in") == 2
        && d.getAs[Long]("deletes") == 2)
      assert(s.sql("SELECT url FROM graft.du_pages").collect()
        .map(_.getString(0)).toSeq == Seq("http://a"))

      // the deletes are real tombstones: the changelog emits op='D' rows
      // (replica propagation), and a LATE upsert older than the delete
      // cannot resurrect the key
      val t = graft.lake.LakeTable.load(s, s"$wh/du_pages")
      val v = t.currentVersion
      val changed = t.changesBetween(v - 1, v)
      assert(changed.filter(col("_op") === "D").count() == 2)
      s.sql(mergeSql(s"$wh/du_pages",
        """SELECT 1L lsn, 'U' op, 'http://b' url,
          |TIMESTAMP '2023-06-01 00:00:00' warc_ts, CAST(NULL AS BINARY) html,
          |'resurrect?' text, 'de' lang, 10L content_len""".stripMargin)).collect()
      assert(s.sql("SELECT url FROM graft.du_pages").collect()
        .map(_.getString(0)).toSeq == Seq("http://a"))

      // DELETE matching nothing: empty batch, calm gated no-op
      val d0 = s.sql("DELETE FROM graft.du_pages WHERE url = 'http://nope'")
        .collect().head
      assert(!d0.getAs[Boolean]("applied") && d0.getAs[Long]("events_in") == 0)

      // row-level UPDATE: SET applies in place, unmatched rows untouched,
      // and time travel still reads the pre-update value
      val preUpdate = t.currentVersion
      val u = s.sql(
        "UPDATE graft.du_pages SET text = concat(text, ' v2'), content_len = 9 " +
          "WHERE url = 'http://a'").collect().head
      assert(u.getAs[Boolean]("applied") && u.getAs[Long]("events_in") == 1)
      assert(s.sql("SELECT text, content_len FROM graft.du_pages")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
        == Seq(("text a v2", 9L)))
      assert(s.sql(
        s"SELECT text FROM graft.du_pages VERSION AS OF $preUpdate")
        .head().getString(0) == "text a")
      // pre-delete snapshot still shows all three keys (tombstones are
      // versioned state, not file surgery)
      assert(s.sql(
        s"SELECT count(*) FROM graft.du_pages VERSION AS OF $preDelete")
        .head().getLong(0) == 3L)

      // reassigning the key or its version order is rejected with guidance
      val bad = intercept[Exception] {
        s.sql("UPDATE graft.du_pages SET url = 'http://renamed'").collect()
      }
      assert(bad.getMessage.contains("MERGE INTO"))
    }
  }

  test("TRUNCATE TABLE empties via one metadata commit; time travel survives") {
    withSqlSession { s =>
      val wh = TestSpark.tempDir("sqltrwh")
      s.conf.set("spark.sql.catalog.graft.warehouse", wh)
      s.sql("""CREATE TABLE graft.tr_pages (
        |  url STRING NOT NULL, warc_ts TIMESTAMP NOT NULL, html BINARY,
        |  text STRING, lang STRING, content_len BIGINT)
        |TBLPROPERTIES ('buckets' = '4')""".stripMargin)
      s.sql("""INSERT INTO graft.tr_pages VALUES
        |  ('http://a', TIMESTAMP '2024-01-01 00:00:00', CAST(NULL AS BINARY), 'text a', 'en', 6L),
        |  ('http://b', TIMESTAMP '2024-01-01 00:00:01', CAST(NULL AS BINARY), 'text b', 'de', 6L)""".stripMargin)
        .collect()
      val t = graft.lake.LakeTable.load(s, s"$wh/tr_pages")
      val pre = t.currentVersion

      s.sql("TRUNCATE TABLE graft.tr_pages")
      assert(s.sql("SELECT count(*) FROM graft.tr_pages").head().getLong(0) == 0L)
      // metadata truncate: purge fence advances (no tombstones for the
      // dropped keys), epoch allocated, pre-truncate snapshot still reads
      val v = t.currentVersion
      val snap = t.snapshot(v)
      assert(snap.summary("truncate") == "true"
        && snap.summary("purge-version") == v.toString
        && snap.summary.contains("batch-epoch"))
      assert(s.sql(s"SELECT count(*) FROM graft.tr_pages VERSION AS OF $pre")
        .head().getLong(0) == 2L)
      val pe = intercept[IllegalStateException] { t.changesBetween(pre, v).count() }
      assert(pe.getMessage.contains("purge"))

      // the table keeps working after: a fresh insert lands normally
      s.sql("""INSERT INTO graft.tr_pages VALUES
        |  ('http://z', TIMESTAMP '2024-03-01 00:00:00', CAST(NULL AS BINARY), 'z', 'en', 1L)""".stripMargin)
        .collect()
      assert(s.sql("SELECT url FROM graft.tr_pages").collect()
        .map(_.getString(0)).toSeq == Seq("http://z"))
    }
  }

  test("CALL graft.system.*: compact, rebucket, expire_snapshots, gc as SQL procedures") {
    withSqlSession { s =>
      val dir = TestSpark.tempDir("sqlproc")
      graft.lake.LakeTable.create(s, dir, schemaId = 3, numBuckets = 4)
      val src = """SELECT * FROM VALUES
        |  (1L, 'U', 'http://a', TIMESTAMP '2024-01-01 00:00:00', CAST(NULL AS BINARY), 'text a', 'en', 6L),
        |  (2L, 'U', 'http://b', TIMESTAMP '2024-01-01 00:00:01', CAST(NULL AS BINARY), 'text b', 'en', 6L),
        |  (3L, 'D', 'http://b', TIMESTAMP '2024-01-02 00:00:00', CAST(NULL AS BINARY), NULL, NULL, NULL)
        |AS v(lsn, op, url, warc_ts, html, text, lang, content_len)""".stripMargin
      s.sql(mergeSql(dir, src)).collect()
      val t = graft.lake.LakeTable.load(s, dir)
      val content = s.sql(s"SELECT url, text FROM graft.`$dir` ORDER BY url")
        .collect().toSeq

      // rebucket 4 -> 16: result row reports the new layout; content holds
      val rb = s.sql(
        s"CALL graft.system.rebucket(table => '$dir', buckets => 16)")
      assert(rb.columns.toSeq == Seq("version", "buckets", "files"))
      val rbRow = rb.collect().head
      assert(rbRow.getInt(1) == 16)
      assert(t.currentSnapshot.numBuckets == 16)
      assert(s.sql(s"SELECT url, text FROM graft.`$dir` ORDER BY url")
        .collect().toSeq == content)

      // rollback to the pre-rebucket version: content holds, the result
      // row names the target, and the rebucket's layout is rolled back too
      val rbv = t.currentVersion
      s.sql(mergeSql(dir, src.replace("http://a", "http://z"))).collect()
      val rk = s.sql(s"CALL graft.system.rollback(table => '$dir', " +
        s"version => $rbv)").collect().head
      assert(rk.getInt(1) == rbv)
      assert(s.sql(s"SELECT url, text FROM graft.`$dir` ORDER BY url")
        .collect().toSeq == content)

      // compact with positional arg + default purge_tombstones=false,
      // then named purge: the 'D' tombstone survives the first, not the second
      val tombs = () => t.read().filter(col("_op") === "D").count()
      assert(tombs() == 1)
      val c1 = s.sql(s"CALL graft.system.compact('$dir')").collect().head
      assert(c1.getInt(0) == t.currentVersion && tombs() == 1)
      s.sql(s"CALL graft.system.compact(table => '$dir', " +
        "purge_tombstones => true)").collect()
      assert(tombs() == 0)

      // expire + gc (age 0: offline) — old versions unreadable, space freed
      val exp = s.sql(s"CALL graft.system.expire_snapshots(table => '$dir', " +
        "keep_last => 1)").collect().head
      assert(exp.getInt(0) > 0)
      val rem = s.sql(s"CALL graft.system.gc(table => '$dir', " +
        "min_age_sec => 0)").collect().head
      assert(rem.getInt(0) > 0)
      assert(s.sql(s"SELECT url, text FROM graft.`$dir` ORDER BY url")
        .collect().toSeq == content)

      // unknown procedure fails with guidance
      val e = intercept[Exception] {
        s.sql(s"CALL graft.system.vacuum(table => '$dir')").collect()
      }
      assert(e.getMessage.contains("vacuum")
        || e.getMessage.toLowerCase.contains("not found"))
    }
  }

  test("concurrent SQL INSERTs all land exactly once through the epoch-retry loop") {
    // 5 threads race INSERT INTO one table: each races the exactly-once
    // gate (a rival can commit our auto-allocated epoch before our gate
    // check → re-allocate) and the optimistic commit (rival wins the
    // version → 'concurrent commit lost' → re-allocate). With k threads a
    // statement can lose at most k-1 races, inside the retry budget — so
    // every statement must report applied=true at a DISTINCT epoch and
    // every row must land exactly once.
    withSqlSession { s =>
      val dir = TestSpark.tempDir("sqlrace")
      graft.lake.LakeTable.create(s, dir, schemaId = 3, numBuckets = 4)
      val n = 5
      val results = new java.util.concurrent.ConcurrentHashMap[Int, org.apache.spark.sql.Row]()
      val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
      (0 until n).foreach { i =>
        pool.submit(new Runnable {
          override def run(): Unit =
            try results.put(i, s.sql(
              s"INSERT INTO graft.`$dir` VALUES ('http://r$i', " +
                "TIMESTAMP '2024-01-01 00:00:00', CAST(NULL AS BINARY), " +
                s"'t$i', 'en', ${i}L)").collect().head)
            catch { case t: Throwable => errors.add(t) }
        })
      }
      pool.shutdown()
      assert(pool.awaitTermination(120, java.util.concurrent.TimeUnit.SECONDS))
      assert(errors.isEmpty, errors.toArray.mkString("; "))
      import scala.jdk.CollectionConverters._
      val rows = results.values().asScala.toSeq
      assert(rows.size == n)
      // every statement applied (never silently swallowed) …
      assert(rows.forall(_.getBoolean(1)), rows.mkString("; "))
      // … at its own epoch …
      assert(rows.map(_.getLong(0)).distinct.size == n)
      // … and every row landed exactly once
      val urls = s.sql(s"SELECT url FROM graft.`$dir` ORDER BY url")
        .collect().map(_.getString(0)).toSeq
      assert(urls == (0 until n).map(i => s"http://r$i"))
    }
  }

  test("row-level DELETE/UPDATE beat producers with large raw LSNs") {
    // A real binlog's LSNs can be byte offsets or ns timestamps (~1.6e18)
    // — far above the per-epoch synthetic band (epoch+1)·2^44. Without
    // the lsn-high-water escalation the DELETE tombstone LOSES its
    // (warc_ts, lsn) tie against the live row and the statement silently
    // no-ops. This pins the escalated band.
    withSqlSession { s =>
      val dir = TestSpark.tempDir("sqlhilsn")
      graft.lake.LakeTable.create(s, dir, schemaId = 3, numBuckets = 4)
      val hugeLsn = 1600000000000000000L // ≫ any epoch band
      s.sql(mergeSql(dir,
        s"""SELECT * FROM VALUES
           |  (${hugeLsn}L, 'U', 'http://a', TIMESTAMP '2024-01-01 00:00:00', CAST(NULL AS BINARY), 'ta', 'en', 1L),
           |  (${hugeLsn + 1}L, 'U', 'http://b', TIMESTAMP '2024-01-01 00:00:00', CAST(NULL AS BINARY), 'tb', 'en', 2L)
           |AS v(lsn, op, url, warc_ts, html, text, lang, content_len)""".stripMargin))
        .collect()
      s.sql(s"DELETE FROM graft.`$dir` WHERE url = 'http://a'").collect()
      assert(s.sql(s"SELECT url FROM graft.`$dir`").collect()
        .map(_.getString(0)).toSeq == Seq("http://b"))
      s.sql(s"UPDATE graft.`$dir` SET content_len = 99 WHERE url = 'http://b'")
        .collect()
      assert(s.sql(s"SELECT content_len FROM graft.`$dir`").head().getLong(0) == 99L)
      // the minted LSNs escalated ABOVE the producer's, and the high-water
      // advanced with them (so the NEXT statement escalates further)
      val hi = graft.lake.LakeTable.load(s, dir).currentSnapshot
        .summary("lsn-high-water").toLong
      assert(hi > hugeLsn + 1)
      // a plain INSERT also ties-and-wins against the huge-LSN row
      s.sql(s"INSERT INTO graft.`$dir` VALUES " +
        "('http://b', TIMESTAMP '2024-01-01 00:00:00', CAST(NULL AS BINARY), 'tb2', 'en', 7L)")
        .collect()
      assert(s.sql(s"SELECT text FROM graft.`$dir` WHERE url = 'http://b'")
        .head().getString(0) == "tb2")
    }
  }

  test("TIMESTAMP AS OF pins the read to the latest snapshot at that instant") {
    withSqlSession { s =>
      val dir = TestSpark.tempDir("sqlts")
      graft.lake.LakeTable.create(s, dir, schemaId = 3, numBuckets = 4)
      def mrg(lsn: Int, url: String): Unit = s.sql(mergeSql(dir,
        s"""SELECT * FROM VALUES
           |  (${lsn}L, 'U', '$url', TIMESTAMP '2024-01-01 00:00:00', CAST(NULL AS BINARY), 't', 'en', 1L)
           |AS v(lsn, op, url, warc_ts, html, text, lang, content_len)""".stripMargin))
        .collect()
      mrg(1, "http://a") // v1
      Thread.sleep(5)
      val mid = System.currentTimeMillis()
      Thread.sleep(5)
      mrg(2, "http://b") // v2

      def litOf(ms: Long): String = java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSS").withZone(java.time.ZoneOffset.UTC)
        .format(java.time.Instant.ofEpochMilli(ms))
      // between v1 and v2: reads v1 (one row)
      assert(s.sql(s"SELECT count(*) FROM graft.`$dir` " +
        s"TIMESTAMP AS OF '${litOf(mid)}'").head().getLong(0) == 1L)
      // at/after the latest commit: reads current (two rows)
      assert(s.sql(s"SELECT count(*) FROM graft.`$dir` " +
        s"TIMESTAMP AS OF '${litOf(System.currentTimeMillis())}'")
        .head().getLong(0) == 2L)
      // before the table existed: clear error, not an empty result
      val err = intercept[Exception] {
        s.sql(s"SELECT count(*) FROM graft.`$dir` " +
          "TIMESTAMP AS OF '2000-01-01 00:00:00'").collect()
      }
      assert(err.getMessage.contains("no snapshot")
        || Option(err.getCause).exists(_.getMessage.contains("no snapshot")))
      // metadata tables accept the same pin ($files honors it; history is
      // a whole-chain view by contract, same as VERSION AS OF)
      assert(s.sql(s"SELECT sum(rows) FROM graft.`$dir$$files` " +
        s"TIMESTAMP AS OF '${litOf(mid)}'").head().getLong(0) == 1L)
    }
  }
}
