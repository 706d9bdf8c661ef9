package graft.tools

import graft.cdc.Merge
import graft.core.ChangeGen
import graft.lake.{LakeTable, Maintenance}
import org.apache.spark.sql.SparkSession

/** Quantifies incremental compaction: the read-optimize debt of a big
  * table where only a small fraction of buckets churned since the last
  * compact. Twin tables with IDENTICAL live content at compact time:
  *
  *  - INC: init → full compact (the base read-optimize) → hot churn
  *    touching a handful of buckets → compact = the incremental path
  *    (rewrites only the churned buckets, carries the rest by manifest
  *    reference);
  *  - FULL: init → the same hot churn with no prior base → compact =
  *    the full O(table) rewrite (the only available plan without a
  *    retained read-optimized snapshot — and exactly what every compact
  *    cost before the incremental path existed).
  *
  * Table: ~2.4M urls over 2000 domains, 2048 buckets (the PruneBench
  * shape). Churn: ~20 urls (5 domains × 4 pages) → ~1% of buckets
  * dirty. args: [cpus] (default 8). Prints one line:
  * COMPACT_INC_SEC <s> FULL_SEC <s> DIRTY <buckets> OF <numBuckets>
  */
object CompactBench {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .appName(s"compact-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val nb = 2048

    val baseCfg = ChangeGen.Config(nEvents = 4000000L, nDomains = 2000,
      pagesPerDomain = 2000, v1Frac = 0.0, v2Frac = 0.0)
    // ~20 hot urls, ~200 versions/key → ≈1% of 2048 buckets churn
    val hotCfg = ChangeGen.Config(nEvents = 4000L, nDomains = 5,
      pagesPerDomain = 4, v1Frac = 0.0, v2Frac = 0.0)
    val hot = ChangeGen.events(spark, hotCfg).cache()
    hot.count()

    def initTable(baseCompact: Boolean): LakeTable = {
      val dir = java.nio.file.Files.createTempDirectory("cbench").toString
      val t = LakeTable.create(spark, dir, schemaId = 3, numBuckets = nb)
      Merge.applyBatch(spark, t, ChangeGen.events(spark, baseCfg),
        epoch = -1L, batchSchemaVersion = 3, batchBytesHint = Some(1L << 60))
      if (baseCompact) Maintenance.compact(spark, t)
      Merge.applyBatch(spark, t, hot, epoch = 0L, batchSchemaVersion = 3)
      t
    }

    // JIT warmup on a small throwaway table, untimed
    {
      val d = java.nio.file.Files.createTempDirectory("cbench-warm").toString
      val w = LakeTable.create(spark, d, schemaId = 3, numBuckets = 8)
      Merge.applyBatch(spark, w, hot, 0L, 3)
      Maintenance.compact(spark, w)
      graft.core.Fs.deleteRecursively(java.nio.file.Paths.get(d))
    }

    def timedCompact(t: LakeTable): (Double, graft.lake.Snapshot) = {
      val t0 = System.nanoTime()
      val s = Maintenance.compact(spark, t)
      ((System.nanoTime() - t0) / 1e9, s)
    }

    val tInc = initTable(baseCompact = true)
    val tFull = initTable(baseCompact = false)
    val (fullSec, sFull) = timedCompact(tFull)
    val (incSec, sInc) = timedCompact(tInc)
    require(sInc.summary.contains("compaction-scope"),
      "INC twin did not take the incremental path")
    require(!sFull.summary.contains("compaction-scope"),
      "FULL twin unexpectedly took the incremental path")
    // same live content both ways (cheap sanity, not a full diff)
    require(tInc.readUser().count() == tFull.readUser().count())
    val dirty = sInc.summary("compaction-scope").split("/")(0)
    println(f"COMPACT_INC_SEC $incSec%.2f FULL_SEC $fullSec%.2f " +
      s"DIRTY $dirty OF $nb")
    graft.core.Fs.deleteRecursively(java.nio.file.Paths.get(tInc.dir))
    graft.core.Fs.deleteRecursively(java.nio.file.Paths.get(tFull.dir))
    spark.stop()
  }
}
