package graft

import org.scalatest.funsuite.AnyFunSuite

/** The spark-submit CLI driven end to end against a session-injected
  * SparkSession: create → merge (staged parquet batch) → show → compact →
  * expire → gc over one table lifecycle.
  */
class MainSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("CLI lifecycle: create, merge, show, compact, expire, gc") {
    import spark.implicits._
    val dir = TestSpark.tempDir("cli-table")
    val batchDir = TestSpark.tempDir("cli-batch") + "/b0"

    val out = Main.run(spark, Seq("create", "--table", dir, "--buckets", "8"))
    assert(out.head.contains("created") && out.head.contains("v0"))

    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    Seq(
      (1L, "U", "http://a", ts, null: Array[Byte], "text a", "en", 6L),
      (2L, "U", "http://b", ts, null: Array[Byte], "text b", "en", 6L),
      (3L, "U", "http://a", new java.sql.Timestamp(ts.getTime + 1000),
        null: Array[Byte], "text a2", "en", 7L))
      .toDF("lsn", "op", "url", "warc_ts", "html", "text", "lang", "content_len")
      .write.parquet(batchDir)

    val m = Main.run(spark, Seq("merge", "--table", dir,
      "--batch", batchDir, "--epoch", "0"))
    assert(m.head.contains("applied=true") && m.head.contains("events=3")
      && m.head.contains("rows=2") && m.head.contains("conflicts=1"))

    // exactly-once: same epoch replays as a no-op
    val m2 = Main.run(spark, Seq("merge", "--table", dir,
      "--batch", batchDir, "--epoch", "0"))
    assert(m2.head.contains("applied=false"))

    val show = Main.run(spark, Seq("show", "--table", dir))
    assert(show.head.contains("version=1") && show.head.contains("lastEpoch=0"))

    val c = Main.run(spark, Seq("compact", "--table", dir))
    assert(c.head.contains("v2"))
    assert(Main.run(spark, Seq("expire", "--table", dir, "--keep-last", "1"))
      .head.startsWith("expired 2"))
    Main.run(spark, Seq("gc", "--table", dir))
    // table still reads correctly after maintenance
    val t = graft.lake.LakeTable.load(spark, dir)
    assert(t.readUser().count() == 2)
    assert(t.readUser().filter($"url" === "http://a").head().getAs[String]("text") == "text a2")
  }

  test("CLI tail --follow applies files dropped while the stream is live") {
    import spark.implicits._
    val dir = TestSpark.tempDir("cli-follow-table")
    val logDir = TestSpark.tempDir("cli-follow-log")
    val ck = TestSpark.tempDir("cli-follow-ck")
    Main.run(spark, Seq("create", "--table", dir, "--buckets", "4"))
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def writeChunk(n: Int, lsn: Long, url: String): Unit = {
      // the log is a directory of FILES (what a binlog shipper drops);
      // write via scratch, then move the single part file in
      val tmp = TestSpark.tempDir(s"cli-follow-chunk$n")
      Seq((lsn, "U", url, ts, null: Array[Byte], s"text $lsn", "en", 6L, 3))
        .toDF("lsn", "op", "url", "warc_ts", "html", "text", "lang",
          "content_len", "schema_version")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = graft.core.Fs.list(java.nio.file.Paths.get(tmp))
        .find(_.getFileName.toString.endsWith(".parquet")).get
      java.nio.file.Files.move(part,
        java.nio.file.Paths.get(logDir, s"chunk-$n.parquet"))
    }
    writeChunk(0, 1L, "http://a")
    // drop the second chunk while the bounded follow run is live
    val dropper = new Thread(() => {
      Thread.sleep(1500); writeChunk(1, 2L, "http://b")
    })
    dropper.start()
    val out = Main.run(spark, Seq("tail", "--table", dir, "--log", logDir,
      "--checkpoint", ck, "--follow", "--interval", "0.2",
      "--duration-sec", "10"))
    dropper.join()
    assert(out.head.contains("version=2"), out.mkString("; "))
    assert(graft.lake.LakeTable.load(spark, dir).readUser().count() == 2)
  }

  test("CLI changes --follow tails the changelog into range-keyed parquet") {
    import spark.implicits._
    val dir = TestSpark.tempDir("cli-changes-table")
    val feed = TestSpark.tempDir("cli-changes-feed")
    val ck = TestSpark.tempDir("cli-changes-ck") + "/feed.v"
    Main.run(spark, Seq("create", "--table", dir, "--buckets", "4"))
    val t = graft.lake.LakeTable.load(spark, dir)
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def batch(lsn: Long, url: String) =
      Seq((lsn, "U", url, ts, null: Array[Byte], s"text $lsn", "en", 6L))
        .toDF("lsn", "op", "url", "warc_ts", "html", "text", "lang", "content_len")
    assert(graft.cdc.Merge.applyBatch(spark, t, batch(1, "http://a"), 0, 3).applied)
    // drop a second commit while the bounded follow run is live
    val dropper = new Thread(() => {
      Thread.sleep(1200)
      graft.cdc.Merge.applyBatch(spark, t, batch(2, "http://b"), 1, 3)
    })
    dropper.start()
    val out = Main.run(spark, Seq("changes", "--table", dir, "--follow",
      "--out", feed, "--checkpoint", ck, "--interval", "0.2",
      "--duration-sec", "6"))
    dropper.join()
    // bootstrap emission first, then the live-landed delta
    assert(out.exists(_.startsWith("emitted bootstrap")), out.mkString("; "))
    assert(out.exists(l => l.startsWith("emitted v") && l.contains("rows=1")),
      out.mkString("; "))
    assert(graft.cdc.ChangeFeed.lastEmitted(ck) == t.currentVersion)
    // the feed dirs re-read as the deltas they claim
    val dirs = graft.core.Fs.list(java.nio.file.Paths.get(feed))
      .map(_.getFileName.toString).sorted
    assert(dirs.exists(_.startsWith("bootstrap_")) &&
      dirs.exists(_.startsWith("delta_")), dirs.mkString(","))

    // batch `changes --cdf`: the same range as the delta, CDF-shaped —
    // b was inserted in (v1, v2], so one insert, no pre/postimages
    val cdfOut = Main.run(spark, Seq("changes", "--table", dir,
      "--from", "1", "--cdf"))
    assert(cdfOut.exists(_.startsWith("cdf 1->2 insert=1 update_preimage=0 " +
      "update_postimage=0 delete=0")), cdfOut.mkString("; "))

    // `materialize`: incremental per-lang aggregate from the CDF
    val aggDir = TestSpark.tempDir("cli-changes-agg")
    val aggCk = TestSpark.tempDir("cli-changes-aggck") + "/agg.v"
    val mOut = Main.run(spark, Seq("materialize", "--source", dir,
      "--table", aggDir, "--checkpoint", aggCk,
      "--group", "lang", "--sum", "content_len"))
    assert(mOut.exists(_.contains(s"state groups=1 at v${t.currentVersion}")),
      mOut.mkString("; "))
    val st = graft.cdc.MaterializedAgg.readState(spark, aggDir, aggCk).get
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(st.toSeq == Seq(("en", 2L, 12L)), st.mkString(","))
  }

  test("CLI replicate mirrors a table through the changelog: bootstrap, " +
    "minted-schema sync, purge fence, rebootstrap") {
    import spark.implicits._
    val src = TestSpark.tempDir("rep-src")
    val rep = TestSpark.tempDir("rep-dst") + "/replica"
    val ck = TestSpark.tempDir("rep-ck") + "/rep.v"
    val t = graft.lake.LakeTable.create(spark, src, schemaId = 3, numBuckets = 4)
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val cols = Seq("lsn", "op", "url", "warc_ts", "html", "text", "lang", "content_len")
    def apply3(lsn: Long, op: String, url: String, when: String, text: String, e: Long) =
      assert(graft.cdc.Merge.applyBatch(spark, t,
        Seq((lsn, op, url, ts(when), null: Array[Byte], text, "en",
          Option(text).map(_.length.toLong).getOrElse(0L))).toDF(cols: _*),
        e, 3).applied)
    apply3(1, "U", "http://a", "2024-01-01 00:00:00", "a v1", 0)
    apply3(2, "U", "http://b", "2024-01-02 00:00:00", "b v1", 1)
    apply3(3, "D", "http://b", "2024-01-03 00:00:00", null, 2)

    // drain mode: bootstrap emission, replica auto-created, states match
    val out1 = Main.run(spark, Seq("replicate", "--source", src,
      "--table", rep, "--checkpoint", ck))
    assert(out1.exists(_.startsWith("applied bootstrap ")), out1.mkString("; "))
    val live = (d: graft.lake.LakeTable) => d.readUser().select("url", "text")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val r = graft.lake.LakeTable.load(spark, rep)
    assert(live(r) == live(t) && live(r) == Set(("http://a", "a v1")))

    // operational schema mint on the SOURCE propagates through the feed
    val base = t.registrySchemaFor(t.currentSnapshot.schemaId)
    t.evolveSchema(org.apache.spark.sql.types.StructType(base.fields :+
      org.apache.spark.sql.types.StructField("fetch_ms",
        org.apache.spark.sql.types.LongType, nullable = true)))
    val minted = t.currentSnapshot.schemaId
    assert(graft.cdc.Merge.applyBatch(spark, t,
      Seq((10L, "U", "http://c", ts("2024-02-01 00:00:00"),
        null: Array[Byte], "c v1", "en", 4L, 777L))
        .toDF(cols :+ "fetch_ms": _*), 3, minted).applied)
    val out2 = Main.run(spark, Seq("replicate", "--source", src,
      "--table", rep, "--checkpoint", ck))
    assert(out2.exists(_.startsWith("applied v")), out2.mkString("; "))
    assert(r.currentSnapshot.schemaId == minted)
    assert(r.readUser().filter($"url" === "http://c")
      .head().getAs[Long]("fetch_ms") == 777L)

    // purge-tombstones on the source fences the lagging feed...
    apply3(20, "D", "http://a", "2024-03-01 00:00:00", null, 4)
    graft.lake.Maintenance.compact(spark, t, purgeTombstones = true)
    apply3(21, "U", "http://d", "2024-03-02 00:00:00", "d v1", 5)
    val pe = intercept[IllegalStateException] {
      Main.run(spark, Seq("replicate", "--source", src,
        "--table", rep, "--checkpoint", ck))
    }
    assert(pe.getMessage.contains("purge"))
    // ...and --rebootstrap resyncs via truncate-and-replace: the purged
    // delete of a (never emitted as a delta) still disappears
    val out3 = Main.run(spark, Seq("replicate", "--source", src,
      "--table", rep, "--checkpoint", ck, "--rebootstrap"))
    assert(out3.exists(_.startsWith("applied bootstrap ")), out3.mkString("; "))
    assert(live(r) == live(t) &&
      live(r) == Set(("http://c", "c v1"), ("http://d", "d v1")))

    // caught-up rerun: no emissions, nothing moves
    val v = r.currentVersion
    val out4 = Main.run(spark, Seq("replicate", "--source", src,
      "--table", rep, "--checkpoint", ck))
    assert(!out4.exists(_.startsWith("applied")) && r.currentVersion == v)
  }

  test("CLI replicate --stream drains via the streaming source/sink and resumes") {
    import spark.implicits._
    val src = TestSpark.tempDir("reps-src")
    val rep = TestSpark.tempDir("reps-dst") + "/replica"
    val ck = TestSpark.tempDir("reps-ck") + "/ckpt"
    val t = graft.lake.LakeTable.create(spark, src, schemaId = 3, numBuckets = 4)
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val cols = Seq("lsn", "op", "url", "warc_ts", "html", "text", "lang", "content_len")
    def apply3(lsn: Long, op: String, url: String, when: String, text: String, e: Long) =
      assert(graft.cdc.Merge.applyBatch(spark, t,
        Seq((lsn, op, url, ts(when), null: Array[Byte], text, "en",
          Option(text).map(_.length.toLong).getOrElse(0L))).toDF(cols: _*),
        e, 3).applied)
    apply3(1, "U", "http://a", "2024-01-01 00:00:00", "a v1", 0)
    apply3(2, "U", "http://b", "2024-01-02 00:00:00", "b v1", 1)
    val out1 = Main.run(spark, Seq("replicate", "--stream", "--source", src,
      "--table", rep, "--checkpoint", ck))
    assert(out1.exists(_.startsWith(s"table=$rep ")), out1.mkString("; "))
    val live = (d: graft.lake.LakeTable) => d.readUser().select("url", "text")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val r = graft.lake.LakeTable.load(spark, rep)
    assert(live(r) == live(t))
    // incremental resume from Spark's offset log in the same checkpoint
    apply3(3, "D", "http://a", "2024-01-03 00:00:00", null, 2)
    Main.run(spark, Seq("replicate", "--stream", "--source", src,
      "--table", rep, "--checkpoint", ck))
    assert(live(r) == live(t) && live(r) == Set(("http://b", "b v1")))
  }

  test("CLI arg parser and unknown-command guard") {
    assert(Main.parse(Seq("gc", "--table", "/t")) == ("gc", Map("table" -> "/t")))
    assert(Main.parse(Seq("compact", "--table", "/t", "--purge-tombstones"))
      == ("compact", Map("table" -> "/t", "purge-tombstones" -> "")))
    val e1 = intercept[RuntimeException] { Main.run(spark, Seq("frobnicate")) }
    assert(e1.getMessage.contains("unknown command"))
    val e2 = intercept[RuntimeException] { Main.run(spark, Seq("gc")) }
    assert(e2.getMessage.contains("requires --table"))
  }
}
