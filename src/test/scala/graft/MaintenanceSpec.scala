package graft

import graft.cdc.Merge
import graft.core.ChangeGen
import graft.lake.{LakeTable, Maintenance}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

class MaintenanceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def dataFiles(dir: String): Seq[String] =
    Files.walk(Paths.get(dir, "data")).iterator().asScala
      .filter(p => Files.isRegularFile(p)).map(_.toString).toSeq

  test("no small-file accretion: bucket CoW keeps at most one file per bucket") {
    import org.apache.spark.sql.functions.col
    val dir = TestSpark.tempDir("bmaint")
    val t = LakeTable.create(spark, dir, schemaId = 3, numBuckets = 256)
    val cfg = ChangeGen.Config(nEvents = 3000, nDomains = 20,
      pagesPerDomain = 10, v1Frac = 0.0, v2Frac = 0.0)
    val ev = ChangeGen.events(spark, cfg)
    // 5 batches over the same key population repeatedly touch the same
    // buckets — a format that APPENDED per-batch files would fragment
    // those buckets 5-deep. This merge replaces a touched bucket's files
    // wholesale (copy-on-write at bucket granularity), so the per-bucket
    // file count is invariantly ≤ 1 and no incremental small-file
    // compaction job is needed — fileCount is bounded by numBuckets
    // forever. (Full [[Maintenance.compact]] remains for tombstone purge.)
    (0 until 5).foreach { e =>
      Merge.applyBatch(spark, t,
        ev.filter(col("lsn") >= e * 600 && col("lsn") < (e + 1) * 600),
        e.toLong, 3)
      val byBucket = t.currentSnapshot.files.groupBy(_.bucket)
      assert(byBucket.nonEmpty, s"epoch $e wrote no data files") // not vacuous
      assert(byBucket.values.forall(_.size == 1),
        s"epoch $e fragmented a bucket: " +
          byBucket.filter(_._2.size > 1).keys.toSeq.sorted.mkString(","))
    }
    assert(t.currentSnapshot.fileCount <= 256)
    assert(t.readUser().count() > 0)
  }

  test("MoR delta gc across expiry: a retained layered snapshot keeps its " +
      "delta files through gc; expiring past the fold frees exactly them") {
    import org.apache.spark.sql.functions.col
    val dir = TestSpark.tempDir("mor-gc")
    val t = LakeTable.create(spark, dir, schemaId = 3, numBuckets = 4)
    t.updateProperties(Map("write-mode" -> "mor"))
    val ev = ChangeGen.events(spark, ChangeGen.Config(nEvents = 1500,
      nDomains = 10, pagesPerDomain = 8, v1Frac = 0.0, v2Frac = 0.0)).cache()
    (0 until 3).foreach { e =>
      Merge.applyBatch(spark, t,
        ev.filter(col("lsn") >= e * 500 && col("lsn") < (e + 1) * 500),
        e.toLong, 3)
    }
    val layeredV = t.currentVersion // epochs 0-2 stacked as delta layers
    val layeredSnap = t.snapshot(layeredV)
    assert(layeredSnap.files.exists(_.delta))
    val layeredContent = t.readUser(layeredSnap).orderBy("url")
      .select("url", "lang").collect().toSeq
    val deltaPaths = layeredSnap.files.filter(_.delta).map(_.path)
    Maintenance.compact(spark, t) // fold: current refs no deltas
    val foldV = t.currentVersion
    Merge.applyBatch(spark, t, ev.filter(col("lsn") >= 1200), 3L, 3)
    ev.unpersist()
    val lastV = t.currentVersion

    // expire everything BEFORE the layered snapshot; it stays retained
    Maintenance.expireSnapshots(t, keepLast = lastV - layeredV + 1)
    def parquetFiles() = dataFiles(dir).filter(_.endsWith(".parquet")).toSet
    val dataBefore = parquetFiles()
    // gc may collect expired manifests and writer sidecars (_SUCCESS/.crc)
    Maintenance.gc(t, minAgeMs = 0L)
    assert(parquetFiles() == dataBefore,
      "gc must delete no DATA file while the layered snapshot still " +
        "references every pre-fold base and delta layer (MoR commits are " +
        "additive, so expired earlier stack states reference no extra files)")
    deltaPaths.foreach(p => assert(Files.exists(Paths.get(p)),
      s"retained layered snapshot's delta file was collected: $p"))
    // time travel to the retained layered snapshot still resolves layers
    assert(t.readUser(t.snapshot(layeredV)).orderBy("url")
      .select("url", "lang").collect().toSeq == layeredContent)

    // now expire past the fold boundary: the delta stack becomes
    // unreferenced and gc must free exactly the no-longer-referenced set
    Maintenance.expireSnapshots(t, keepLast = lastV - foldV + 1)
    val removed = Maintenance.gc(t, minAgeMs = 0L)
    assert(removed > 0)
    deltaPaths.foreach(p => assert(!Files.exists(Paths.get(p)),
      s"unreferenced pre-fold delta survived gc: $p"))
    // every file a retained snapshot references is intact and readable
    val retained = t.existingVersions.map(t.snapshot)
    retained.flatMap(_.files).foreach(f =>
      assert(Files.exists(Paths.get(f.path))))
    assert(t.readUser().count() > 0)
    assert(t.readUser(t.snapshot(foldV)).count() > 0)
  }

  test("incremental compaction rewrites ONLY buckets churned since the last read-optimize") {
    import org.apache.spark.sql.functions.col
    val dir = TestSpark.tempDir("maint-inc")
    val t = LakeTable.create(spark, dir, schemaId = 3, numBuckets = 8)
    val cfg = ChangeGen.Config(nEvents = 4000, nDomains = 20,
      pagesPerDomain = 10, v1Frac = 0.0, v2Frac = 0.0)
    val ev = ChangeGen.events(spark, cfg)
    (0 until 2).foreach { e =>
      Merge.applyBatch(spark, t, ev.filter(col("lsn") >= e * 2000
        && col("lsn") < (e + 1) * 2000), e.toLong, 3)
    }
    Maintenance.compact(spark, t) // the full-rewrite base
    val base = t.currentSnapshot
    val baseFiles = base.files.map(f => f.bucket -> f.path).toMap

    // churn ONE key -> exactly one bucket's files change
    val oneUrl = ev.select("url").head().getString(0)
    Merge.applyBatch(spark, t, ev.filter(col("url") === oneUrl), 2L, 3)
    val preFiles = t.currentSnapshot.files.map(f => f.bucket -> f.path).toMap
    val dirty = (baseFiles.keySet ++ preFiles.keySet)
      .filter(b => baseFiles.get(b) != preFiles.get(b))
    assert(dirty.nonEmpty && dirty.size < 8)
    val before = t.readUser().orderBy("url").collect().toSeq

    val inc = Maintenance.compact(spark, t)
    // a DELTA commit stamped as a (scoped) compaction
    assert(inc.version == base.version + 2)
    assert(inc.summary.get("compaction-scope").contains(s"${dirty.size}/8"))
    val afterFiles = inc.files.map(f => f.bucket -> f.path).toMap
    // untouched buckets carried the BASE rewrite's files by reference…
    (baseFiles.keySet -- dirty).foreach { b =>
      assert(afterFiles.get(b) == baseFiles.get(b),
        s"bucket $b rewritten though untouched since the base compact")
    }
    // …dirty buckets were rewritten (new file), warc_ts-sorted within
    dirty.foreach { b =>
      assert(afterFiles.get(b) != preFiles.get(b), s"bucket $b not rewritten")
      val tsList = spark.read.parquet(afterFiles(b))
        .select("warc_ts").collect().map(_.getTimestamp(0).getTime).toSeq
      assert(tsList == tsList.sorted, s"bucket $b file not warc_ts-sorted")
    }
    // content identical, and an immediate re-compact is a no-op
    assert(t.readUser().orderBy("url").collect().toSeq == before)
    assert(Maintenance.compact(spark, t).version == inc.version)
    // churn-detection contract: the scoped compaction marker resets the
    // read-optimize debt exactly like a full one
    assert(Maintenance.plan(t, churnThreshold = 1)._1 == "none")
  }

  test("randomized merge/compact/rollback interleaving: compaction never " +
    "changes content and every live file is warc_ts-sorted after it") {
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(7)
    val dir = TestSpark.tempDir("maint-rand")
    val t = LakeTable.create(spark, dir, schemaId = 3, numBuckets = 8)
    val cfg = ChangeGen.Config(nEvents = 6000, nDomains = 15,
      pagesPerDomain = 8, v1Frac = 0.0, v2Frac = 0.0)
    val ev = ChangeGen.events(spark, cfg).cache()
    def content(): Seq[org.apache.spark.sql.Row] =
      t.readUser().orderBy("url").collect().toSeq
    def assertAllFilesSorted(): Unit =
      t.currentSnapshot.files.foreach { f =>
        assert(Files.exists(Paths.get(f.path)), s"referenced file missing: ${f.path}")
        val ts = spark.read.parquet(f.path)
          .select("warc_ts").collect().map(_.getTimestamp(0).getTime).toSeq
        assert(ts == ts.sorted, s"unsorted post-compact file: ${f.path}")
      }
    val urls = ev.select("url").distinct().collect().map(_.getString(0))
    var epoch = 0L
    var incrementalsTaken = 0
    (1 to 18).foreach { _ =>
      rnd.nextInt(100) match {
        case k if k < 55 => // merge: half wide slices, half single-key
          // (single-key batches dirty ≤1 of 8 buckets — the incremental
          // compact regime; wide slices dirty most buckets — the full)
          val batch =
            if (rnd.nextBoolean()) {
              val lo = rnd.nextInt(5000)
              ev.filter(col("lsn") >= lo && col("lsn") < lo + 400 + rnd.nextInt(800))
            } else ev.filter(col("url") === urls(rnd.nextInt(urls.length)))
          Merge.applyBatch(spark, t, batch, epoch, 3)
          epoch += 1
        case k if k < 85 => // compact (full or incremental — engine decides)
          val before = content()
          val v0 = t.currentVersion
          val s = Maintenance.compact(spark, t)
          if (s.summary.contains("compaction-scope")) incrementalsTaken += 1
          assert(content() == before, "compaction changed content")
          if (s.version > v0) assertAllFilesSorted()
        case k if k < 95 => // rollback to a random retained version
          val vs = t.existingVersions.filter(_ < t.currentVersion)
          if (vs.nonEmpty) Maintenance.rollback(spark, t, vs(rnd.nextInt(vs.size)))
        case _ => // purging compaction (always the full path)
          val before = t.readUser().orderBy("url").collect().toSeq
          Maintenance.compact(spark, t, purgeTombstones = true)
          assert(t.readUser().orderBy("url").collect().toSeq == before)
          assert(t.read().filter(col("_op") === "D").count() == 0)
      }
    }
    // the run must have exercised the incremental path, not only fulls
    assert(incrementalsTaken > 0,
      "randomized run never took the incremental compact path — pinned nothing")
  }

  test("compact + expire + gc: content identical, small files and orphans gone, gate intact") {
    val dir = TestSpark.tempDir("maint")
    val t = LakeTable.create(spark, dir, schemaId = 3, numBuckets = 4)
    val cfg = ChangeGen.Config(nEvents = 3000, nDomains = 20,
      pagesPerDomain = 10, v1Frac = 0.0, v2Frac = 0.0)
    val ev = ChangeGen.events(spark, cfg)
    (0 until 3).foreach { e =>
      val b = ev.filter(org.apache.spark.sql.functions.col("lsn") >= e * 1000
        && org.apache.spark.sql.functions.col("lsn") < (e + 1) * 1000)
      Merge.applyBatch(spark, t, b, e.toLong, 3)
    }
    // an orphan from a crashed phase-1 commit
    val orphanDir = t.newCommitDir(99)
    Files.writeString(Paths.get(orphanDir, "orphan.parquet"), "junk")

    val before = t.readUser().orderBy("url").collect().toSeq
    val tombstonesBefore = t.read().filter(
      org.apache.spark.sql.functions.col("_op") === "D").count()
    assert(tombstonesBefore > 0) // generator emits deletes

    Maintenance.compact(spark, t)
    assert(t.currentSnapshot.files.size <= 4) // one per bucket
    assert(t.readUser().orderBy("url").collect().toSeq == before)
    // tombstones survive a plain compaction…
    assert(t.read().filter(
      org.apache.spark.sql.functions.col("_op") === "D").count()
      == tombstonesBefore)
    // idempotence: re-compacting a just-compacted table is a NO-OP — no
    // version claimed (each vacuous commit is a race a resident writer
    // can lose; a tight maintenance loop starved a streaming sink)
    val vCompacted = t.currentVersion
    assert(Maintenance.compact(spark, t).version == vCompacted)
    assert(t.currentVersion == vCompacted)
    // …tombstones are dropped by a purging one, which DOES run on an
    // already-compacted table (caller asserts the late horizon)
    Maintenance.compact(spark, t, purgeTombstones = true)
    assert(t.read().filter(
      org.apache.spark.sql.functions.col("_op") === "D").count() == 0)
    assert(t.readUser().orderBy("url").collect().toSeq == before)
    // …and a REPEATED purge right after one is a no-op too (purge-version
    // stamp equals the current version: nothing landed since)
    val vPurged = t.currentVersion
    assert(Maintenance.compact(spark, t, purgeTombstones = true)
      .version == vPurged)
    assert(t.currentVersion == vPurged)

    val expired = Maintenance.expireSnapshots(t, keepLast = 1)
    assert(expired > 0)
    val removed = Maintenance.gc(t, minAgeMs = 0L) // offline: no writer active
    assert(removed > 0)
    // orphan is gone, table content intact, only referenced files remain
    assert(!Files.exists(Paths.get(orphanDir, "orphan.parquet")))
    assert(t.readUser().orderBy("url").collect().toSeq == before)
    val refd = t.currentSnapshot.files.map(f =>
      Paths.get(f.path).toAbsolutePath.toString).toSet
    assert(dataFiles(dir).forall(refd.contains))
    // exactly-once gate survives expiry (latest snapshot carries max epoch)
    val replay = Merge.applyBatch(spark, t,
      ev.filter(org.apache.spark.sql.functions.col("lsn") < 1000), 2, 3)
    assert(!replay.applied)
  }

  test("rebucket: bucket-count evolution preserves content, gate, changelog; next merge uses the new layout") {
    import org.apache.spark.sql.functions.col
    val dir = TestSpark.tempDir("rebucket")
    val t = LakeTable.create(spark, dir, schemaId = 3, numBuckets = 8)
    val cfg = ChangeGen.Config(nEvents = 3000, nDomains = 20,
      pagesPerDomain = 10, v1Frac = 0.0, v2Frac = 0.0)
    val ev = ChangeGen.events(spark, cfg)
    (0 until 2).foreach { e =>
      Merge.applyBatch(spark, t,
        ev.filter(col("lsn") >= e * 1000 && col("lsn") < (e + 1) * 1000),
        e.toLong, 3)
    }
    val before = t.readUser().orderBy("url").collect().toSeq
    val tombstonesBefore = t.read().filter(col("_op") === "D").count()
    val gateBefore = t.lastCommittedEpoch
    val preVersion = t.currentVersion

    // grow 8 -> 64 (the 100-TB direction: keep avg bucket bytes near the
    // target file size as the table grows)
    Maintenance.rebucket(spark, t, 64)
    val snap = t.currentSnapshot
    assert(snap.numBuckets == 64)
    assert(t.readUser().orderBy("url").collect().toSeq == before)
    assert(t.read().filter(col("_op") === "D").count() == tombstonesBefore)
    assert(t.lastCommittedEpoch == gateBefore) // lineage keys carried
    // every file sits in its url-hash bucket under the NEW count, ≤1 each
    val byBucket = snap.files.groupBy(_.bucket)
    assert(byBucket.values.forall(_.size == 1))
    assert(byBucket.keys.forall(b => b >= 0 && b < 64))
    // a rebucket changes every file but no row: changelog across it is empty
    assert(t.changesBetween(preVersion, snap.version).count() == 0)

    // the next merge plans/writes at the new count and its deltas are the
    // ONLY thing a changelog across the rebucket reports
    val s = Merge.applyBatch(spark, t,
      ev.filter(col("lsn") >= 2000 && col("lsn") < 3000), 2L, 3)
    assert(s.applied)
    val after = t.currentSnapshot
    assert(after.numBuckets == 64)
    assert(after.files.groupBy(_.bucket).values.forall(_.size == 1))
    // winner order is (warc_ts, lsn) — the engine's W1 ordering
    val oracle = ev.filter(col("lsn") < 3000)
      .groupBy("url").agg(org.apache.spark.sql.functions.max_by(col("op"),
        org.apache.spark.sql.functions.struct(col("warc_ts"), col("lsn")))
        .as("op"))
      .filter(col("op") =!= "D").count()
    assert(t.readUser().count() == oracle)
    val delta = t.changesBetween(preVersion, after.version)
    assert(delta.count() > 0)
    // delta rows are exactly the keys whose (url, _lsn) changed in range
    val expectedChanged = t.read(after).as("b")
      .join(t.read(t.snapshot(preVersion)).select(col("url"),
        col("_lsn")).as("a"), Seq("url", "_lsn"), "left_anti").count()
    assert(delta.count() == expectedChanged)

    // time travel still reads the OLD snapshot at its own bucket count
    assert(t.snapshot(preVersion).numBuckets == 8)
    assert(t.readUser(t.snapshot(preVersion)).orderBy("url")
      .collect().toSeq == before)

    // shrink works too (consolidating an over-bucketed small table)
    Maintenance.rebucket(spark, t, 4)
    assert(t.currentSnapshot.numBuckets == 4)
    assert(t.currentSnapshot.fileCount <= 4)
    assert(t.readUser().count() == oracle)
  }

  test("compact sorts within buckets by warc_ts (read-optimize for row-group pruning)") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val dir = TestSpark.tempDir("sortmaint")
    val t = LakeTable.create(spark, dir, schemaId = 3, numBuckets = 2)
    val rnd = new scala.util.Random(5)
    // 3 churn epochs with SHUFFLED timestamps so pre-compact order is
    // certainly not ts-sorted
    (0 until 3).foreach { e =>
      val rows = rnd.shuffle((0 until 40).toList).map { i =>
        (e * 100L + i, "U", s"http://p$i",
          java.sql.Timestamp.valueOf(f"2024-01-${i % 28 + 1}%02d 00:00:00"),
          null: Array[Byte], s"t$e-$i", "en", 1L)
      }.toDF("lsn", "op", "url", "warc_ts", "html", "text", "lang", "content_len")
      assert(Merge.applyBatch(spark, t, rows, e.toLong, 3).applied)
    }
    Maintenance.compact(spark, t)
    // each compacted bucket file reads back ts-monotone (parquet keeps
    // row order within a file) — the property row-group stats skip on
    t.currentSnapshot.files.foreach { f =>
      val ts = spark.read.parquet(f.path).select(col("warc_ts").cast("long"))
        .collect().map(_.getLong(0)).toSeq
      assert(ts == ts.sorted, s"bucket ${f.bucket} not ts-sorted after compact")
      assert(ts.nonEmpty)
    }
    // content untouched by the sort
    assert(t.readUser().count() == 40)
  }

  test("rollback: content reverts metadata-only, gates survive, changelog fences, follower rebootstraps") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val dir = TestSpark.tempDir("rollback")
    val t = LakeTable.create(spark, dir, schemaId = 3, numBuckets = 4)
    val cols = Seq("lsn", "op", "url", "warc_ts", "html", "text", "lang", "content_len")
    def ev(lsn: Long, url: String, text: String) =
      (lsn, "U", url, java.sql.Timestamp.valueOf(s"2024-01-01 00:00:0$lsn"),
        null: Array[Byte], text, "en", text.length.toLong)
    def state() = t.readUser().select("url", "text").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(Merge.applyBatch(spark, t,
      Seq(ev(1, "http://a", "a v1"), ev(2, "http://b", "b v1")).toDF(cols: _*), 0, 3).applied)
    val goodVersion = t.currentVersion
    val goodState = state()
    val goodFiles = dataFiles(dir).toSet
    assert(Merge.applyBatch(spark, t,
      Seq(ev(3, "http://a", "a v2 bad"), ev(4, "http://c", "c bad")).toDF(cols: _*), 1, 3).applied)
    assert(state() != goodState)

    // set up a follower BEFORE the rollback so it holds a pre-rollback cursor
    val repDir = TestSpark.tempDir("rollback-rep")
    val ck = TestSpark.tempDir("rollback-ck") + "/rep.v"
    graft.cdc.ChangeFeed.replicate(spark, dir, repDir, ck, intervalMs = 10L,
      until = () => true)
    val rep = LakeTable.load(spark, repDir)
    assert(rep.readUser().count() == 3)

    val snap = Maintenance.rollback(spark, t, goodVersion)
    // metadata-only: content identical to the good version, and the good
    // version's data files are still the live ones (nothing rewritten)
    assert(state() == goodState)
    assert(goodFiles.subsetOf(dataFiles(dir).toSet))
    assert(t.currentSnapshot.files.map(_.path).toSet.subsetOf(goodFiles))
    assert(snap.summary("rolled-back-to") == goodVersion.toString)
    // history moved forward; the bad version still time-travels until expiry
    assert(t.snapshot(goodVersion + 1).fileCount >= 0)
    // epoch gate survives: re-offering the already-applied epoch 1 no-ops
    assert(!Merge.applyBatch(spark, t,
      Seq(ev(3, "http://a", "a v2 bad")).toDF(cols: _*), 1, 3).applied)
    assert(state() == goodState)
    // changelog ranges crossing the rollback refuse with the purge fence
    val e = intercept[IllegalStateException] {
      t.changesBetween(goodVersion + 1, t.currentVersion).count()
    }
    assert(e.getMessage.contains("re-bootstrap"))
    // the follower's next poll rebootstraps (opt-in) and converges on the
    // rolled-back state
    graft.cdc.ChangeFeed.replicate(spark, dir, repDir, ck, intervalMs = 10L,
      until = () => true, rebootstrap = true)
    assert(LakeTable.load(spark, repDir).readUser().select("url", "text")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet == goodState)
    // CALL surface
    val err = intercept[Exception] { Maintenance.rollback(spark, t, 999) }
    assert(err.getMessage.contains("expired or was never committed"))
  }

  test("auto_maintain: engine-decided rebucket on drift, compact on churn " +
    "debt, no-op inside thresholds — content preserved throughout") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = TestSpark.tempDir("amaint")
    val t = LakeTable.create(spark, dir, schemaId = 3, numBuckets = 2)
    val cols = Seq("lsn", "op", "url", "warc_ts", "html", "text", "lang",
      "content_len")
    def ev(lsn: Long, url: String, text: String) =
      (lsn, "U", url, java.sql.Timestamp.valueOf(s"2024-01-01 00:00:${lsn % 60}"),
        null: Array[Byte], text, "en", text.length.toLong)
    (0 until 4).foreach { e =>
      assert(Merge.applyBatch(spark, t,
        Seq(ev(e * 10 + 1, s"http://k$e", "x" * 2000)).toDF(cols: _*),
        e.toLong, 3).applied)
    }
    def state = t.readUser().select("url", "text").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val before = state

    // 1. drift: a tiny target makes the 2 buckets read as oversized ->
    //    the plan prices a power-of-two rebucket and executes it
    val (a1, _, v1) = Maintenance.autoMaintain(spark, t,
      targetBucketBytes = 256, churnThreshold = 64)
    assert(a1.startsWith("rebucket("), s"expected a drift rebucket, got $a1")
    assert(t.currentSnapshot.numBuckets > 2 && v1 == t.currentVersion)
    assert(state == before)

    // 2. immediately after (same thresholds): buckets are ~target-sized
    //    and the rebucket reset the churn clock -> no-op
    val (a2, reason2, v2) = Maintenance.autoMaintain(spark, t,
      targetBucketBytes = 256, churnThreshold = 64)
    assert(a2 == "none" && v2 == v1, s"$a2 / $reason2")

    // 3. churn debt: two more merges at threshold 2 -> compact (sorted
    //    rewrite), then quiet again
    (4 until 6).foreach { e =>
      assert(Merge.applyBatch(spark, t,
        Seq(ev(e * 10 + 1, s"http://k$e", "y" * 500)).toDF(cols: _*),
        e.toLong, 3).applied)
    }
    val (a3, _, v3) = Maintenance.autoMaintain(spark, t,
      targetBucketBytes = 256, churnThreshold = 2)
    assert(a3 == "compact" && v3 == t.currentVersion)
    assert(t.currentSnapshot.summary.contains("compaction"))
    val (a4, _, _) = Maintenance.autoMaintain(spark, t,
      targetBucketBytes = 256, churnThreshold = 2)
    assert(a4 == "none")
    assert(state == before ++ (4 until 6).map(e => (s"http://k$e", "y" * 500)))

    // 4. the SQL spelling: at the production 256 MB target this tiny
    //    128-bucket table is over-bucketed -> the CALL consolidates down
    //    to the 64-bucket floor, and a second CALL converges to none
    spark.conf.set("spark.sql.catalog.graft", "graft.sql.GraftCatalog")
    val sql1 = spark.sql(s"CALL graft.system.auto_maintain(table => '$dir', " +
      "churn_threshold => 2)").collect()
    assert(sql1.length == 1 && sql1.head.getString(0) == "rebucket(64)",
      sql1.mkString(","))
    assert(t.currentSnapshot.numBuckets == 64)
    val sql2 = spark.sql(s"CALL graft.system.auto_maintain(table => '$dir', " +
      "churn_threshold => 2)").collect()
    assert(sql2.head.getString(0) == "none", sql2.mkString(","))
    assert(state == before ++ (4 until 6).map(e => (s"http://k$e", "y" * 500)))
  }

  test("expire_snapshots min-age: young snapshots survive the count window") {
    import spark.implicits._
    val dir = TestSpark.tempDir("expage")
    val t = LakeTable.create(spark, dir, schemaId = 3, numBuckets = 2)
    val cols = Seq("lsn", "op", "url", "warc_ts", "html", "text", "lang",
      "content_len")
    (0 until 3).foreach { e =>
      assert(Merge.applyBatch(spark, t,
        Seq((e * 10 + 1L, "U", s"http://k$e",
          java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
          null: Array[Byte], "t", "en", 1L)).toDF(cols: _*), e.toLong, 3)
        .applied)
    }
    assert(t.existingVersions.size == 4) // v0 create + 3 merges
    // age gate: every snapshot was committed "now", so an age bound in
    // the past expires NOTHING even though keepLast=1 would drop three
    assert(Maintenance.expireSnapshots(t, keepLast = 1,
      olderThanMs = Some(0L)) == 0)
    assert(t.existingVersions.size == 4)
    // SQL spelling: a large min_age_sec keeps young history too
    spark.conf.set("spark.sql.catalog.graft", "graft.sql.GraftCatalog")
    val kept = spark.sql(s"CALL graft.system.expire_snapshots(" +
      s"table => '$dir', keep_last => 1, min_age_sec => 999999999)")
      .collect().head.getInt(0)
    assert(kept == 0 && t.existingVersions.size == 4)
    // far-future bound degenerates to the count-only window
    assert(Maintenance.expireSnapshots(t, keepLast = 1,
      olderThanMs = Some(Long.MaxValue)) == 3)
    assert(t.existingVersions == Seq(3))
  }

  test("interleaved merge and maintenance both retry the version race " +
    "and converge to the argmax oracle (round-4 verdict #7)") {
    import org.apache.spark.sql.functions.col
    val dir = TestSpark.tempDir("cmrace")
    val t = LakeTable.create(spark, dir, schemaId = 3, numBuckets = 4)
    val cfg = ChangeGen.Config(nEvents = 3000, nDomains = 20,
      pagesPerDomain = 10, v1Frac = 0.0, v2Frac = 0.0)
    val ev = ChangeGen.events(spark, cfg)
    val nEpochs = 6
    val perEpoch = 500
    val racesBefore = Maintenance.racesLost.get() + Merge.commitRacesLost.get()
    def racesSeen = Maintenance.racesLost.get() + Merge.commitRacesLost.get() - racesBefore
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val notApplied = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    // each round races nEpochs merges against a compact storm + a
    // bucket-count toggle; rounds repeat (bounded) until at least one
    // side demonstrably LOST and retried — the counters — so the
    // convergence assert below speaks about the raced path, never a
    // lucky serial interleaving. Re-merging the same lsn windows at
    // fresh epochs in later rounds is argmax-idempotent by design.
    var round = 0
    var nextEpoch = 0L
    while (round < 5 && (round == 0 || racesSeen == 0)) {
      val base = nextEpoch
      val merger = new Thread(() => try {
        (0 until nEpochs).foreach { i =>
          val lo = i * perEpoch
          val st = Merge.applyBatchRetrying(spark, t,
            ev.filter(col("lsn") >= lo && col("lsn") < lo + perEpoch),
            base + i, 3)
          if (!st.applied) notApplied.add(base + i)
        }
      } catch { case th: Throwable => errors.add(th) })
      val maintainer = new Thread(() => try {
        (0 until 3).foreach { _ => Maintenance.compact(spark, t) }
        Maintenance.rebucket(spark, t,
          if (t.currentSnapshot.numBuckets == 4) 8 else 4)
      } catch { case th: Throwable => errors.add(th) })
      merger.start(); maintainer.start()
      merger.join(300000); maintainer.join(300000)
      assert(!merger.isAlive && !maintainer.isAlive, "race round hung")
      nextEpoch = base + nEpochs
      round += 1
    }
    assert(errors.isEmpty, errors.toArray.mkString("; "))
    assert(racesSeen > 0,
      s"$round rounds produced zero commit races — the spec pinned nothing")
    // no lost batch: every epoch applied (never silently swallowed) and
    // no orphaned gate: the surviving summary's high-water is the last one
    assert(notApplied.isEmpty, s"swallowed epochs: $notApplied")
    assert(t.currentSnapshot.summary("last-epoch").toLong == nextEpoch - 1)
    // converge to the brute-force argmax over everything ever offered
    val got = t.readUser()
      .select("url", "warc_ts", "html", "text", "lang", "content_len")
    val want = graft.cdc.Dedup.latestPerKeyWindow(ev, "url", Seq("warc_ts", "lsn"))
      .filter(col("op") =!= "D")
      .select("url", "warc_ts", "html", "text", "lang", "content_len")
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0,
      "raced table diverged from the argmax oracle")
    // CoW bucket invariant survived the storm; losers left no orphans a
    // gc can't account for (phase-1 dirs of lost races were deleted
    // eagerly; anything left is collectable)
    assert(t.currentSnapshot.files.groupBy(_.bucket).values.forall(_.size == 1))
    Maintenance.gc(t, minAgeMs = 0L) // all writers joined — offline
    assert(got.exceptAll(want).count() == 0,
      "gc after the raced storm collected a live file")
  }
}
