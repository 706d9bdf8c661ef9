package graft

import graft.cdc.{ChangeFeed, Merge, Metrics}
import graft.lake.{LakeTable, Maintenance}
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}
import org.scalatest.funsuite.AnyFunSuite

/** The changelog as a first-class Structured Streaming source
  * (`format("graft-changelog")`) composed with the lake sink
  * (`format("graft-lake")`): lake-to-lake replication as one streaming
  * query, exactly-once via Spark's offset log + the sink's batchId gate.
  */
class ChangelogStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val cols = Seq("lsn", "op", "url", "warc_ts", "html", "text",
    "lang", "content_len")
  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private def ev(lsn: Long, op: String, url: String, t: java.sql.Timestamp,
      text: String) =
    (lsn, op, url, t, null: Array[Byte], text, "en",
      Option(text).map(_.length.toLong).getOrElse(0L))

  private def userState(t: LakeTable): Set[(String, String)] =
    t.readUser().select("url", "text")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet

  private def drain(sourceDir: String, replicaDir: String,
      checkpointDir: String, maxVersionsPerBatch: Option[Int] = None): Unit = {
    val q = ChangeFeed.replicateStream(spark, sourceDir, replicaDir,
      checkpointDir, Trigger.AvailableNow(), maxVersionsPerBatch)
    q.awaitTermination()
  }

  test("streaming source -> lake sink: bootstrap, incremental drains, idempotent restarts") {
    val srcDir = TestSpark.tempDir("clog-src")
    val repDir = TestSpark.tempDir("clog-rep")
    val ckpt = TestSpark.tempDir("clog-ckpt")
    val src = LakeTable.create(spark, srcDir, schemaId = 3, numBuckets = 4)
    val b0 = Seq(
      ev(1, "U", "http://a", ts("2024-01-01 00:00:00"), "a v1"),
      ev(2, "U", "http://b", ts("2024-01-01 00:00:01"), "b v1"),
      ev(3, "U", "http://d", ts("2024-01-01 00:00:02"), "d v1")).toDF(cols: _*)
    assert(Merge.applyBatch(spark, src, b0, 0, 3).applied)
    val b1 = Seq(
      ev(4, "U", "http://a", ts("2024-01-02 00:00:00"), "a v2"),
      ev(5, "D", "http://b", ts("2024-01-02 00:00:01"), null),
      ev(6, "U", "http://c", ts("2024-01-02 00:00:02"), "c v1")).toDF(cols: _*)
    assert(Merge.applyBatch(spark, src, b1, 1, 3).applied)

    // drain 1: fresh checkpoint -> full-snapshot bootstrap + live deltas
    drain(srcDir, repDir, ckpt)
    val rep = LakeTable.load(spark, repDir)
    assert(userState(rep) == userState(src))
    // the delete's tombstone replicated, not just the live rows
    val ops = rep.read().select("url", "_op").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(ops.contains(("http://b", "D")))

    // more changes land; the SAME checkpoint resumes from its offset log
    val b2 = Seq(
      ev(7, "D", "http://d", ts("2024-01-03 00:00:00"), null),
      ev(8, "U", "http://c", ts("2024-01-03 00:00:01"), "c v2")).toDF(cols: _*)
    assert(Merge.applyBatch(spark, src, b2, 2, 3).applied)
    drain(srcDir, repDir, ckpt)
    assert(userState(LakeTable.load(spark, repDir)) == userState(src))
    assert(userState(src) == Set(("http://a", "a v2"), ("http://c", "c v2")))

    // idempotent no-op drain: caught up -> no batch, no new replica commit
    val vBefore = LakeTable.load(spark, repDir).currentVersion
    drain(srcDir, repDir, ckpt)
    assert(LakeTable.load(spark, repDir).currentVersion == vBefore)
    // each applied batch logged lineage exactly once (distinct epochs)
    val epochs = Metrics.read(repDir).map(_.epoch)
    assert(epochs == epochs.distinct)
  }

  test("maxVersionsPerBatch bounds catch-up; coarse default collapses it to one batch") {
    val srcDir = TestSpark.tempDir("clog-bnd-src")
    val src = LakeTable.create(spark, srcDir, schemaId = 3, numBuckets = 4)
    (0 until 3).foreach { e =>
      val b = Seq(ev(e + 1, "U", s"http://k$e",
        ts(s"2024-01-0${e + 1} 00:00:00"), s"v$e")).toDF(cols: _*)
      assert(Merge.applyBatch(spark, src, b, e.toLong, 3).applied)
    }
    // bounded: one version per batch -> one replica commit per source version
    val repA = TestSpark.tempDir("clog-bnd-repA")
    drain(srcDir, repA, TestSpark.tempDir("clog-bnd-ckptA"),
      maxVersionsPerBatch = Some(1))
    assert(userState(LakeTable.load(spark, repA)) == userState(src))
    assert(Metrics.read(repA).count(_.applied) == 3)
    // default: the whole catch-up is ONE coarse manifest diff -> one commit
    val repB = TestSpark.tempDir("clog-bnd-repB")
    drain(srcDir, repB, TestSpark.tempDir("clog-bnd-ckptB"))
    assert(userState(LakeTable.load(spark, repB)) == userState(src))
    assert(Metrics.read(repB).count(_.applied) == 1)
  }

  test("maxRowsPerBatch prices catch-up in rows from the commits' own " +
    "rows-applied stamps; an over-budget version still flows alone") {
    val srcDir = TestSpark.tempDir("clog-rows-src")
    val src = LakeTable.create(spark, srcDir, schemaId = 3, numBuckets = 4)
    // three versions of 2 rows-applied each
    (0 until 3).foreach { e =>
      val b = Seq(
        ev(e * 2 + 1L, "U", s"http://k${e}a", ts(s"2024-01-0${e + 1} 00:00:00"), s"a$e"),
        ev(e * 2 + 2L, "U", s"http://k${e}b", ts(s"2024-01-0${e + 1} 00:00:01"), s"b$e"))
        .toDF(cols: _*)
      assert(Merge.applyBatch(spark, src, b, e.toLong, 3).applied)
    }
    // budget 1 < every version's 2 rows: each version crosses the budget
    // alone and still flows (target, not ceiling) -> one commit per version
    val repA = TestSpark.tempDir("clog-rows-repA")
    val qA = ChangeFeed.replicateStream(spark, srcDir, repA,
      TestSpark.tempDir("clog-rows-ckptA"), maxRowsPerBatch = Some(1L))
    qA.awaitTermination()
    assert(userState(LakeTable.load(spark, repA)) == userState(src))
    assert(Metrics.read(repA).count(_.applied) == 3)
    // budget 4: versions 1+2 (create's 0 rows + 2 + 2 = 4) fill batch one,
    // version 3 lands in batch two
    val repB = TestSpark.tempDir("clog-rows-repB")
    val qB = ChangeFeed.replicateStream(spark, srcDir, repB,
      TestSpark.tempDir("clog-rows-ckptB"), maxRowsPerBatch = Some(4L))
    qB.awaitTermination()
    assert(userState(LakeTable.load(spark, repB)) == userState(src))
    assert(Metrics.read(repB).count(_.applied) == 2)
  }

  test("source lag surfaces in StreamingQueryProgress metrics " +
    "(versionsBehindLatest) and drains to zero") {
    val srcDir = TestSpark.tempDir("clog-lag-src")
    val src = LakeTable.create(spark, srcDir, schemaId = 3, numBuckets = 4)
    (0 until 3).foreach { e =>
      val b = Seq(ev(e + 1, "U", s"http://k$e",
        ts(s"2024-01-0${e + 1} 00:00:00"), s"v$e")).toDF(cols: _*)
      assert(Merge.applyBatch(spark, src, b, e.toLong, 3).applied)
    }
    // bounded to 1 version/batch over a 4-versions-ahead source: the
    // early batches must REPORT the backlog, the final one zero
    val q = ChangeFeed.replicateStream(spark, srcDir,
      TestSpark.tempDir("clog-lag-rep"), TestSpark.tempDir("clog-lag-ckpt"),
      Trigger.AvailableNow(), maxVersionsPerBatch = Some(1))
    q.awaitTermination()
    val lags = q.recentProgress.toSeq
      .flatMap(p => p.sources.headOption)
      .flatMap(s => Option(s.metrics))
      .flatMap(m => Option(m.get("versionsBehindLatest")))
      .map(_.toLong)
    assert(lags.nonEmpty, "no versionsBehindLatest in any progress event")
    assert(lags.exists(_ > 0),
      s"a bounded catch-up must report a positive backlog: $lags")
    assert(lags.last == 0L, s"the drain must end caught up: $lags")
  }

  test("startingVersion=latest resolves once, persists across restarts, skips history") {
    val srcDir = TestSpark.tempDir("clog-late-src")
    val ckpt = TestSpark.tempDir("clog-late-ckpt")
    val sink = TestSpark.tempDir("clog-late-out")
    val src = LakeTable.create(spark, srcDir, schemaId = 3, numBuckets = 4)
    val b0 = Seq(ev(1, "U", "http://old", ts("2024-01-01 00:00:00"), "old"))
      .toDF(cols: _*)
    assert(Merge.applyBatch(spark, src, b0, 0, 3).applied)

    def drainToParquet(): Unit = {
      val q = spark.readStream.format("graft-changelog")
        .option("path", srcDir).option("startingVersion", "latest").load()
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // first start: nothing after "latest" -> no rows; the resolved start
    // version must now be pinned in the checkpoint
    drainToParquet()
    // history moves while the query is down; restart must emit EXACTLY
    // the missed delta, not re-resolve "latest" past it
    val b1 = Seq(ev(2, "U", "http://new", ts("2024-01-02 00:00:00"), "new"))
      .toDF(cols: _*)
    assert(Merge.applyBatch(spark, src, b1, 1, 3).applied)
    drainToParquet()
    val urls = spark.read.parquet(sink).select("url")
      .collect().map(_.getString(0)).toSet
    assert(urls == Set("http://new")) // no bootstrap of http://old
  }

  test("cdf option streams before images; a foreachBatch aggregate " +
    "maintained by retraction converges with recompute") {
    val srcDir = TestSpark.tempDir("clog-cdf-src")
    val ckpt = TestSpark.tempDir("clog-cdf-ckpt")
    val src = LakeTable.create(spark, srcDir, schemaId = 3, numBuckets = 4)
    // streaming state: (cnt, sum(content_len)) — retraction-maintained
    val agg = scala.collection.concurrent.TrieMap.empty[String, (Long, Long)]
    def drainCdf(): Unit = {
      val q = spark.readStream.format("graft-changelog")
        .option("path", srcDir).option("cdf", "true").load()
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.select("lang", "content_len", "_change_type").collect()
            .foreach { r =>
              val sign = if (r.getString(2) == "insert"
                || r.getString(2) == "update_postimage") 1L else -1L
              val (c0, s0) = agg.getOrElse(r.getString(0), (0L, 0L))
              agg.update(r.getString(0), (c0 + sign, s0 + sign * r.getLong(1)))
            }
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // epoch 0: inserts; drain 1 is the full-snapshot bootstrap as inserts
    val b0 = Seq(
      ev(1, "U", "http://a", ts("2024-01-01 00:00:00"), "a v1"),
      ev(2, "U", "http://b", ts("2024-01-01 00:00:01"), "bb v1")).toDF(cols: _*)
    assert(Merge.applyBatch(spark, src, b0, 0, 3).applied)
    drainCdf()
    // epoch 1: update a (len 4->7), delete b; drain 2 must retract both
    val b1 = Seq(
      ev(3, "U", "http://a", ts("2024-01-02 00:00:00"), "a v2 +2"),
      ev(4, "D", "http://b", ts("2024-01-02 00:00:01"), null)).toDF(cols: _*)
    assert(Merge.applyBatch(spark, src, b1, 1, 3).applied)
    drainCdf()
    val recomputed = src.readUser().groupBy("lang")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("c"),
        org.apache.spark.sql.functions.sum("content_len").as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(agg.filter(_._2._1 != 0L).toMap == recomputed)
  }

  test("randomized log + random drain points: streaming replica always converges") {
    val rnd = new scala.util.Random(4242)
    val srcDir = TestSpark.tempDir("clog-rand-src")
    val repDir = TestSpark.tempDir("clog-rand-rep")
    val ckpt = TestSpark.tempDir("clog-rand-ckpt")
    val src = LakeTable.create(spark, srcDir, schemaId = 3, numBuckets = 4)
    val urls = (0 until 8).map(i => s"http://site$i")
    var lsn = 0L
    (0 until 6).foreach { e =>
      val rows = (0 until (1 + rnd.nextInt(5))).map { _ =>
        lsn += 1
        val url = urls(rnd.nextInt(urls.length))
        val op = if (rnd.nextInt(4) == 0) "D" else "U"
        ev(lsn, op, url, ts(f"2024-01-01 00:${lsn}%02d:00"),
          if (op == "D") null else s"$url@$lsn")
      }
      assert(Merge.applyBatch(spark, src, rows.toDF(cols: _*), e.toLong, 3).applied)
      // drain at random points, with a random catch-up bound — every
      // prefix of the version chain must replicate to the same state
      if (rnd.nextBoolean()) {
        drain(srcDir, repDir, ckpt,
          maxVersionsPerBatch = if (rnd.nextBoolean()) Some(1 + rnd.nextInt(2)) else None)
        assert(userState(LakeTable.load(spark, repDir)) == userState(src),
          s"diverged after epoch $e")
      }
    }
    drain(srcDir, repDir, ckpt)
    val rep = LakeTable.load(spark, repDir)
    assert(userState(rep) == userState(src))
    // tombstones replicated too: full keyed state (incl. deletes) matches
    def keyed(t: LakeTable) = t.read().select("url", "_op", "_lsn").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(keyed(rep) == keyed(src))
    val epochs = Metrics.read(repDir).map(_.epoch)
    assert(epochs == epochs.distinct)
  }

  test("mid-stream ALTER TABLE fails the RUNNING stream with restart " +
    "guidance; the restart picks up the evolved schema from the same checkpoint") {
    val srcDir = TestSpark.tempDir("clog-evo-src")
    val repDir = TestSpark.tempDir("clog-evo-rep")
    val ckpt = TestSpark.tempDir("clog-evo-ckpt")
    val src = LakeTable.create(spark, srcDir, schemaId = 3, numBuckets = 4)
    assert(Merge.applyBatch(spark, src,
      Seq(ev(1, "U", "http://a", ts("2024-01-01 00:00:00"), "a v1"))
        .toDF(cols: _*), 0, 3).applied)
    // a resident follower is up and caught up...
    val q = ChangeFeed.replicateStream(spark, srcDir, repDir, ckpt,
      Trigger.ProcessingTime("50 milliseconds"))
    try {
      val deadline = System.nanoTime() + 30000000000L
      while (!LakeTable.exists(repDir) ||
          userState(LakeTable.load(spark, repDir)) != userState(src)) {
        assert(System.nanoTime() < deadline, "follower never caught up")
        Thread.sleep(50)
      }
      // ...when the SOURCE schema evolves under it: the stream must FAIL
      // with restart guidance — silently emitting the old projection
      // (dropping the new column from the replica) is forbidden
      val base = src.registrySchemaFor(src.currentSnapshot.schemaId)
      src.evolveSchema(org.apache.spark.sql.types.StructType(base.fields :+
        org.apache.spark.sql.types.StructField("fetch_ms",
          org.apache.spark.sql.types.LongType, nullable = true)))
      val minted = src.currentSnapshot.schemaId
      assert(Merge.applyBatch(spark, src,
        Seq((2L, "U", "http://b", ts("2024-01-02 00:00:00"),
          null: Array[Byte], "b v1", "en", 4L, 777L))
          .toDF(cols :+ "fetch_ms": _*), 1, minted).applied)
      val ex = intercept[StreamingQueryException] { q.awaitTermination(60000) }
      def messages(e: Throwable): Seq[String] =
        Option(e).toSeq.flatMap(x =>
          Option(x.getMessage).toSeq ++ messages(x.getCause))
      assert(messages(ex).exists(m => m.contains("evolved mid-stream")
        && m.contains("Restart the query")), messages(ex).mkString(" | "))
    } finally if (q.isActive) q.stop()
    // restart from the SAME checkpoint: schema re-resolves, the pending
    // delta replays under the evolved schema, the new column replicates
    drain(srcDir, repDir, ckpt)
    val rep = LakeTable.load(spark, repDir)
    assert(rep.currentSnapshot.schemaId == src.currentSnapshot.schemaId)
    assert(rep.readUser().filter($"url" === "http://b")
      .head().getAs[Long]("fetch_ms") == 777L)
    assert(userState(rep) == userState(src))
  }

  test("evolution in the load-to-start gap fails the FIRST batch — the " +
    "declared projection is pinned at load(), not at query start") {
    val srcDir = TestSpark.tempDir("clog-gap-src")
    val sink = TestSpark.tempDir("clog-gap-out")
    val ckpt = TestSpark.tempDir("clog-gap-ckpt")
    val src = LakeTable.create(spark, srcDir, schemaId = 3, numBuckets = 4)
    assert(Merge.applyBatch(spark, src,
      Seq(ev(1, "U", "http://a", ts("2024-01-01 00:00:00"), "a v1"))
        .toDF(cols: _*), 0, 3).applied)
    // load() resolves the declared schema (s3)...
    val df = spark.readStream.format("graft-changelog")
      .option("path", srcDir).load()
    // ...then an ALTER + merge land BEFORE start(): the old guard keyed
    // on start-time schemaId and never fired — every batch silently
    // emitted the s3 projection, dropping the new column forever
    val base = src.registrySchemaFor(src.currentSnapshot.schemaId)
    src.evolveSchema(org.apache.spark.sql.types.StructType(base.fields :+
      org.apache.spark.sql.types.StructField("fetch_ms",
        org.apache.spark.sql.types.LongType, nullable = true)))
    assert(Merge.applyBatch(spark, src,
      Seq((2L, "U", "http://b", ts("2024-01-02 00:00:00"),
        null: Array[Byte], "b v1", "en", 4L, 9L))
        .toDF(cols :+ "fetch_ms": _*), 1, src.currentSnapshot.schemaId)
      .applied)
    val q = df.writeStream.format("parquet").option("path", sink)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    val ex = intercept[StreamingQueryException] { q.awaitTermination() }
    def messages(e: Throwable): Seq[String] =
      Option(e).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(ex).exists(_.contains("evolved mid-stream")),
      messages(ex).mkString(" | "))
  }

  test("mid-stream type WIDENING fails the running stream like an added " +
    "column: files past the boundary store the wide physical type") {
    val srcDir = TestSpark.tempDir("clog-widen-src")
    val repDir = TestSpark.tempDir("clog-widen-rep")
    val ckpt = TestSpark.tempDir("clog-widen-ckpt")
    // schema 2: content_len is INT — the registry's widening step
    val src = LakeTable.create(spark, srcDir, schemaId = 2, numBuckets = 4)
    assert(Merge.applyBatch(spark, src,
      Seq((1L, "U", "http://a", ts("2024-01-01 00:00:00"),
        null: Array[Byte], "a v1", "en", 4))
        .toDF(cols: _*), 0, 2).applied)
    val q = ChangeFeed.replicateStream(spark, srcDir, repDir, ckpt,
      Trigger.ProcessingTime("50 milliseconds"))
    try {
      val deadline = System.nanoTime() + 30000000000L
      while (!LakeTable.exists(repDir) ||
          userState(LakeTable.load(spark, repDir)) != userState(src)) {
        assert(System.nanoTime() < deadline, "follower never caught up")
        Thread.sleep(50)
      }
      // widen content_len INT -> LONG under the running stream: the
      // fixed-schema run can neither resolve nor safely narrow the wide
      // physical type in post-boundary files — it must fail, not coerce
      val base = src.registrySchemaFor(src.currentSnapshot.schemaId)
      src.evolveSchema(org.apache.spark.sql.types.StructType(base.fields.map {
        case f if f.name == "content_len" =>
          f.copy(dataType = org.apache.spark.sql.types.LongType)
        case f => f
      }))
      val minted = src.currentSnapshot.schemaId
      assert(Merge.applyBatch(spark, src,
        Seq((2L, "U", "http://b", ts("2024-01-02 00:00:00"),
          null: Array[Byte], "b v1", "en", 5000000000L))
          .toDF(cols: _*), 1, minted).applied)
      val ex = intercept[StreamingQueryException] { q.awaitTermination(60000) }
      def messages(e: Throwable): Seq[String] =
        Option(e).toSeq.flatMap(x =>
          Option(x.getMessage).toSeq ++ messages(x.getCause))
      assert(messages(ex).exists(m => m.contains("evolved mid-stream")
        && m.contains("retypes content_len")
        && m.contains("Restart the query")), messages(ex).mkString(" | "))
    } finally if (q.isActive) q.stop()
    // restart from the SAME checkpoint: the widened value replicates
    drain(srcDir, repDir, ckpt)
    val rep = LakeTable.load(spark, repDir)
    assert(rep.currentSnapshot.schemaId == src.currentSnapshot.schemaId)
    assert(rep.readUser().filter($"url" === "http://b")
      .head().getAs[Long]("content_len") == 5000000000L)
    assert(userState(rep) == userState(src))
  }

  test("fresh checkpoint against an existing non-empty replica: the " +
    "bootstrap applies as TRUNCATE, dropping replica-only rows") {
    val srcDir = TestSpark.tempDir("clog-tr-src")
    val repDir = TestSpark.tempDir("clog-tr-rep")
    val src = LakeTable.create(spark, srcDir, schemaId = 3, numBuckets = 4)
    assert(Merge.applyBatch(spark, src, Seq(
      ev(1, "U", "http://a", ts("2024-01-01 00:00:00"), "a v1"),
      ev(2, "U", "http://b", ts("2024-01-01 00:00:01"), "b v1"))
      .toDF(cols: _*), 0, 3).applied)
    drain(srcDir, repDir, TestSpark.tempDir("clog-tr-ckpt1"))
    // the replica diverges (stale row X survives a source-side purge the
    // old checkpoint can no longer read across)
    val rep = LakeTable.load(spark, repDir)
    assert(Merge.applyBatch(spark, rep,
      Seq(ev(99, "U", "http://stale", ts("2024-01-01 00:00:02"), "X"))
        .toDF(cols: _*), 999, 3).applied)
    assert(userState(rep).exists(_._1 == "http://stale"))
    // operator re-bootstraps: FRESH checkpoint, existing replica — the
    // from = -1 batch must replace state, not merge over it
    drain(srcDir, repDir, TestSpark.tempDir("clog-tr-ckpt2"))
    val after = userState(LakeTable.load(spark, repDir))
    assert(after == userState(src), after.toString)
    assert(!after.exists(_._1 == "http://stale"))
  }

  test("streaming cdf batches equal the batch changesBetweenCdf plan " +
    "over the same ranges") {
    val srcDir = TestSpark.tempDir("clog-cdfeq-src")
    val ckpt = TestSpark.tempDir("clog-cdfeq-ckpt")
    val src = LakeTable.create(spark, srcDir, schemaId = 3, numBuckets = 4)
    def norm(rows: Array[org.apache.spark.sql.Row]): Set[List[Any]] =
      rows.map(_.toSeq.map {
        case b: Array[Byte] => b.toSeq
        case x => x
      }.toList).toSet
    val got = scala.collection.mutable.ArrayBuffer.empty[Set[List[Any]]]
    def drainCdf(): Unit = {
      val q = spark.readStream.format("graft-changelog")
        .option("path", srcDir).option("cdf", "true").load()
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          got += norm(df.collect()); ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    assert(Merge.applyBatch(spark, src, Seq(
      ev(1, "U", "http://a", ts("2024-01-01 00:00:00"), "a v1"),
      ev(2, "U", "http://b", ts("2024-01-01 00:00:01"), "b v1"))
      .toDF(cols: _*), 0, 3).applied)
    val v1 = src.currentVersion
    drainCdf()
    assert(Merge.applyBatch(spark, src, Seq(
      ev(3, "U", "http://a", ts("2024-01-02 00:00:00"), "a v2"),
      ev(4, "D", "http://b", ts("2024-01-02 00:00:01"), null),
      ev(5, "U", "http://c", ts("2024-01-02 00:00:02"), "c v1"))
      .toDF(cols: _*), 1, 3).applied)
    val v2 = src.currentVersion
    drainCdf()
    assert(got.size == 2)
    assert(got(0) == norm(src.changesBetweenCdf(-1, v1).collect()))
    assert(got(1) == norm(src.changesBetweenCdf(v1, v2).collect()))
    // and the update really carried both legs through the stream
    // (second-to-last col is _change_type; last is _commit_version)
    val legTypes = got(1).map(r => r(r.size - 2))
    assert(legTypes == Set("update_postimage", "update_preimage",
      "delete", "insert"), legTypes.toString)
  }

  test("a torn starting-version file (crash between create and write) " +
    "re-resolves instead of wedging every restart") {
    val srcDir = TestSpark.tempDir("clog-torn-src")
    val ckpt = TestSpark.tempDir("clog-torn-ckpt")
    val sink = TestSpark.tempDir("clog-torn-out")
    val src = LakeTable.create(spark, srcDir, schemaId = 3, numBuckets = 4)
    assert(Merge.applyBatch(spark, src,
      Seq(ev(1, "U", "http://a", ts("2024-01-01 00:00:00"), "a v1"))
        .toDF(cols: _*), 0, 3).applied)
    // simulate the torn first write: an EMPTY starting-version file
    val metaDir = java.nio.file.Paths.get(ckpt, "sources", "0")
    java.nio.file.Files.createDirectories(metaDir)
    java.nio.file.Files.writeString(metaDir.resolve("starting-version"), "")
    val q = spark.readStream.format("graft-changelog")
      .option("path", srcDir).load()
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.read.parquet(sink).count() == 1L)
  }

  test("tombstone purge inside a pending range fails the stream with re-bootstrap guidance") {
    val srcDir = TestSpark.tempDir("clog-purge-src")
    val repDir = TestSpark.tempDir("clog-purge-rep")
    val ckpt = TestSpark.tempDir("clog-purge-ckpt")
    val src = LakeTable.create(spark, srcDir, schemaId = 3, numBuckets = 4)
    val b0 = Seq(
      ev(1, "U", "http://a", ts("2024-01-01 00:00:00"), "a v1"),
      ev(2, "U", "http://b", ts("2024-01-01 00:00:01"), "b v1")).toDF(cols: _*)
    assert(Merge.applyBatch(spark, src, b0, 0, 3).applied)
    drain(srcDir, repDir, ckpt) // checkpoint now at the current version
    // a delete lands, then a purge-tombstones compaction erases its
    // tombstone -> the pending range crosses the purge
    val b1 = Seq(ev(3, "D", "http://b", ts("2024-01-02 00:00:00"), null))
      .toDF(cols: _*)
    assert(Merge.applyBatch(spark, src, b1, 1, 3).applied)
    Maintenance.compact(spark, src, purgeTombstones = true)
    val ex = intercept[StreamingQueryException] {
      val q = ChangeFeed.replicateStream(spark, srcDir, repDir, ckpt)
      q.awaitTermination()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("re-bootstrap")),
      s"expected re-bootstrap guidance, got: ${messages(ex).mkString(" | ")}")
  }

  test("maintenance racing a RESIDENT replica: compactions on the replica " +
    "interleave with live sink commits, both sides retry, replica converges") {
    val srcDir = TestSpark.tempDir("clog-maintrace-src")
    val repDir = TestSpark.tempDir("clog-maintrace-rep")
    val ckpt = TestSpark.tempDir("clog-maintrace-ckpt")
    val src = LakeTable.create(spark, srcDir, schemaId = 3, numBuckets = 4)
    val seed = (1 to 40).map(i => ev(i.toLong, "U", s"http://u$i",
      ts(f"2024-01-01 00:${i / 60}%02d:${i % 60}%02d"), s"seed-$i"))
    assert(Merge.applyBatch(spark, src, seed.toDF(cols: _*), 0, 3).applied)
    drain(srcDir, repDir, ckpt) // bootstrap: replica resident from here on

    // an operator's maintenance loop holds the REPLICA table for the rest
    // of the test: each compact commit can race a sink commit for the
    // snapshot version — the retry wrapper on either side must absorb the
    // loss (re-read the advanced snapshot, re-run), never fail the query
    // and never drop a batch
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val maintFailure =
      new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val compactions = new java.util.concurrent.atomic.AtomicInteger(0)
    val maint = new Thread(() => {
      try {
        while (!stop.get()) {
          val t = LakeTable.load(spark, repDir)
          val before = t.currentVersion
          if (Maintenance.compact(spark, t).version > before)
            compactions.incrementAndGet() // real rewrite committed
          else Thread.sleep(10) // quiet table: compact no-ops (idempotence)
        }
      } catch { case t: Throwable => maintFailure.set(t) }
    }, "replica-maintenance")
    maint.start()
    try {
      var lsn = 1000L
      (1 to 4).foreach { epoch =>
        val batch = (1 to 12).map { j =>
          lsn += 1
          val key = (epoch * 7 + j * 5) % 40 + 1
          if (j % 6 == 0)
            ev(lsn, "D", s"http://u$key",
              ts(f"2024-01-0${epoch + 1}%d 01:00:$j%02d"), null)
          else
            ev(lsn, "U", s"http://u$key",
              ts(f"2024-01-0${epoch + 1}%d 01:00:$j%02d"), s"e$epoch-$j")
        }
        assert(Merge.applyBatch(spark, src, batch.toDF(cols: _*),
          epoch.toLong, 3).applied)
        drain(srcDir, repDir, ckpt) // sink commits while compactions land
      }
    } finally { stop.set(true); maint.join() }
    assert(maintFailure.get() == null,
      s"maintenance loop failed: ${maintFailure.get()}")
    assert(compactions.get() > 0, "compaction never committed — no race run")
    // content converged: live-row state of the replica equals the source,
    // compactions rewrote files without changing rows
    assert(userState(LakeTable.load(spark, repDir)) ==
      userState(LakeTable.load(spark, srcDir)))
    // lineage: every sink epoch logged exactly once despite the races
    val epochs = Metrics.read(repDir).map(_.epoch)
    assert(epochs == epochs.distinct)
  }
}
