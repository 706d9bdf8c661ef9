package graft.tools

import graft.cdc.Merge
import graft.core.ChangeGen
import graft.lake.{LakeTable, Maintenance}
import org.apache.spark.sql.SparkSession

/** Quantifies merge-on-read vs copy-on-write in the regime MoR exists
  * for: a stream of micro-batches whose hot keys re-touch a large
  * table's buckets every commit. Twin tables with identical content:
  *
  *  - COW: each batch rewrites every touched bucket (resolve against
  *    current rows + full bucket rewrite) — write cost O(touched bucket
  *    bytes) per batch;
  *  - MOR: each batch appends per-bucket delta layers — write cost
  *    O(batch) per batch; reads pay the layer resolve until compaction
  *    folds the stack.
  *
  * Both sides then price the READ: a full user-view count on the
  * layered MoR table (resolve tax), the fold (compaction), and the
  * post-fold read (back to parity). The honest accounting: MoR wins
  * ingest by the amplification factor and repays a bounded read +
  * fold cost — exactly the trade a 10^10-event pipeline wants when
  * batches are minutes apart and folds are hourly.
  *
  * Table: ~1M urls over 2000 domains, 2048 buckets. Churn: 5 batches ×
  * 20k events over ~2000 hot keys (most buckets touched every batch —
  * the hot-domain worst case for CoW). args: [cpus] (default 8).
  * Prints one line:
  * MOR_APPLY_SEC <s> COW_APPLY_SEC <s> SPEEDUP <x> MOR_ROWS <n>
  * COW_ROWS <n> AMP <x> MOR_READ_SEC <s> FOLD_SEC <s> COW_READ_SEC <s>
  */
object MorBench {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .appName(s"mor-bench-$cpus")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // 256 buckets × ~2M rows ⇒ ~8k rows (~10 MB) per bucket: small enough
    // to run, big enough that the CoW rewrite cost per batch reflects
    // bucket MASS (the at-scale regime is 256 MB buckets — every ratio
    // here UNDERSTATES the true gap by that factor)
    val nb = 256
    val nBatches = 5

    val baseCfg = ChangeGen.Config(nEvents = 2000000L, nDomains = 2000,
      pagesPerDomain = 500, v1Frac = 0.0, v2Frac = 0.0)
    // hot set: ~2000 keys spread across ~all buckets, re-hit per batch
    val hotCfg = ChangeGen.Config(nEvents = 100000L, nDomains = 50,
      pagesPerDomain = 40, v1Frac = 0.0, v2Frac = 0.0)
    val per = hotCfg.nEvents / nBatches
    val batches = (0 until nBatches).map { i =>
      val b = ChangeGen.eventsRange(spark, hotCfg, i * per, (i + 1) * per)
        .cache()
      b.count()
      b
    }

    def initTable(mode: String): LakeTable = {
      val dir = java.nio.file.Files.createTempDirectory("morbench").toString
      val t = LakeTable.create(spark, dir, schemaId = 3, numBuckets = nb)
      if (mode == "mor") t.updateProperties(Map("write-mode" -> mode))
      Merge.applyBatch(spark, t, ChangeGen.events(spark, baseCfg),
        epoch = -1L, batchSchemaVersion = 3, batchBytesHint = Some(1L << 60))
      t
    }

    // JIT warmup, untimed (both write paths + the layered read)
    locally {
      val d = java.nio.file.Files.createTempDirectory("morbench-warm").toString
      val w = LakeTable.create(spark, d, schemaId = 3, numBuckets = 8)
      Merge.applyBatch(spark, w, batches.head, 0L, 3)
      w.updateProperties(Map("write-mode" -> "mor"))
      Merge.applyBatch(spark, w, batches.head, 1L, 3, gateKey = "warm2")
      w.readUser().count()
      Maintenance.compact(spark, w)
      graft.core.Fs.deleteRecursively(java.nio.file.Paths.get(d))
    }

    def timed[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }
    def applyAll(t: LakeTable): Long = {
      var rows = 0L
      batches.zipWithIndex.foreach { case (b, i) =>
        rows += Merge.applyBatch(spark, t, b, i.toLong, 3).rowsApplied
      }
      rows
    }

    val tMor = initTable("mor")
    val tCow = initTable("cow")
    val (cowSec, cowRows) = timed(applyAll(tCow))
    val (morSec, morRows) = timed(applyAll(tMor))
    require(tMor.currentSnapshot.files.exists(_.delta),
      "MOR twin wrote no delta layers")
    // READ pricing on the layered state, A/B over the resolve PATH
    // (round-6): `local` = the default bucket-local task scan (zero
    // exchanges, scan-level pruning); `agg` = the groupBy(url) argmax
    // (one exchange, PruneArgmaxStruct pruning) via the escape hatch.
    // Read shapes per path:
    //  - full: an aggregate that genuinely needs the payload (sum of
    //    html bytes) — the unavoidable full resolve tax;
    //  - narrow: count() — pruning drops html/text from the scan.
    // Repetitions are INTERLEAVED across every (path, shape) cell and
    // reported per-rep (min is the headline): a fixed order let the
    // later shapes ride the earlier scans' page cache (round-5 advice).
    import org.apache.spark.sql.functions.{col, octet_length, sum}
    val ResolveKey = "graft.mor.resolve"
    def withPath[A](path: String)(f: => A): A = {
      spark.conf.set(ResolveKey, path)
      try f finally spark.conf.unset(ResolveKey)
    }
    def readFull(): Long =
      tMor.readUser().agg(sum(octet_length(col("html")))).head().getLong(0)
    def readNarrow(): Long = tMor.readUser().count()
    val cells = Seq(
      "MOR_READ_FULL_LOCAL" -> (() => withPath("local")(readFull())),
      "MOR_READ_FULL_AGG" -> (() => withPath("agg")(readFull())),
      "MOR_READ_NARROW_LOCAL" -> (() => withPath("local")(readNarrow())),
      "MOR_READ_NARROW_AGG" -> (() => withPath("agg")(readNarrow())))
    val reps = 3
    val samples = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    val values = scala.collection.mutable.Map[String, Long]()
    (1 to reps).foreach { _ =>
      cells.foreach { case (name, f) =>
        val (sec, v) = timed(f())
        samples(name) = samples(name) :+ sec
        values.get(name).foreach(prev => require(prev == v,
          s"$name diverged across paths/reps: $prev vs $v"))
        values(name) = v
      }
    }
    require(values("MOR_READ_NARROW_LOCAL") == values("MOR_READ_NARROW_AGG"),
      "narrow reads diverged between resolve paths")
    require(values("MOR_READ_FULL_LOCAL") == values("MOR_READ_FULL_AGG"),
      "full reads diverged between resolve paths")
    val morCount = values("MOR_READ_NARROW_LOCAL")
    val (foldSec, _) = timed(Maintenance.compact(spark, tMor))
    val (cowReadSec, cowCount) = timed(tCow.readUser().count())
    require(morCount == cowCount,
      s"twins diverged: mor=$morCount cow=$cowCount")
    val perRep = cells.map { case (n, _) =>
      s"$n [${samples(n).map(s => f"$s%.2f").mkString(",")}]"
    }.mkString(" ")
    println(f"MOR_APPLY_SEC $morSec%.2f COW_APPLY_SEC $cowSec%.2f " +
      f"SPEEDUP ${cowSec / morSec}%.1f MOR_ROWS $morRows COW_ROWS $cowRows " +
      f"AMP ${cowRows.toDouble / math.max(1L, morRows)}%.1f " +
      f"MOR_READ_SEC ${samples("MOR_READ_NARROW_LOCAL").min}%.2f " +
      f"MOR_READ_AGG_SEC ${samples("MOR_READ_NARROW_AGG").min}%.2f " +
      f"MOR_READ_FULL_SEC ${samples("MOR_READ_FULL_LOCAL").min}%.2f " +
      f"MOR_READ_FULL_AGG_SEC ${samples("MOR_READ_FULL_AGG").min}%.2f " +
      f"FOLD_SEC $foldSec%.2f " +
      f"COW_READ_SEC $cowReadSec%.2f PER_REP $perRep")
    graft.core.Fs.deleteRecursively(java.nio.file.Paths.get(tMor.dir))
    graft.core.Fs.deleteRecursively(java.nio.file.Paths.get(tCow.dir))
    spark.stop()
  }
}
