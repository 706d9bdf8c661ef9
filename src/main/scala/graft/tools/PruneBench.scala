package graft.tools

import graft.cdc.{CdcStream, Merge}
import graft.core.ChangeGen
import graft.lake.LakeTable
import org.apache.spark.sql.SparkSession

/** The 100-TB-shaped MERGE scenario: small hot-key batches into a table
  * many times their size, where bucket pruning (SURVEY.md §4.2) — not
  * full rewrite — is the viable plan. The headline bench measures the
  * churn-heavy regime (batch ≈ table, rewrite everything); this one
  * measures the incremental regime (batch keys ≪ buckets, rewrite only
  * touched files) and quantifies the pruning advantage by rerunning the
  * identical batches with the full-rewrite path forced.
  *
  * Table: ~2.5M distinct urls over 2000 domains (one init batch),
  * 2048 buckets. Batches: 4 × 100k events over the 500 urls of the 25
  * hottest domains (~200 versions/key churn) — 500 keys touch ≤ 440 of
  * 2048 buckets, so ~78% of the table's files carry forward by
  * reference instead of being read and rewritten.
  *
  * args: [cpus] (default 8). Prints one line:
  * PRUNE_EPS <pruned events/sec> FULL_EPS <forced-full events/sec>
  * TOUCHED <mean touched buckets> OF <numBuckets>
  */
object PruneBench {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .appName(s"prune-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val nb = 2048

    // base table: one wide init batch (epoch -1 so narrow chunks 0..k pass
    // the exactly-once gate)
    val baseCfg = ChangeGen.Config(nEvents = 4000000L, nDomains = 2000,
      pagesPerDomain = 2000, v1Frac = 0.0, v2Frac = 0.0)
    // hot subset: the SAME url scheme restricted to 25 domains × 20 pages
    val hotCfg = ChangeGen.Config(nEvents = 400000L, nDomains = 25,
      pagesPerDomain = 20, v1Frac = 0.0, v2Frac = 0.0)
    val hotLog = java.nio.file.Files.createTempDirectory("prune-log").toString
    ChangeGen.writeLogDirs(spark, hotCfg, hotLog, nChunks = 4)

    def initTable(): (LakeTable, String) = {
      val dir = java.nio.file.Files.createTempDirectory("prune-table").toString
      val t = LakeTable.create(spark, dir, schemaId = 3, numBuckets = nb)
      Merge.applyBatch(spark, t, ChangeGen.events(spark, baseCfg),
        epoch = -1L, batchSchemaVersion = 3,
        batchBytesHint = Some(1L << 60)) // init = full rewrite (hint*4 must not overflow)
      (t, dir)
    }

    // replayChunks passes real (small) file-size hints → prune path;
    // forceFull reruns the identical batches with a table-sized hint
    def timed(forceFull: Boolean): (Double, Double) = {
      val (t, dir) = initTable()
      val t0 = System.nanoTime()
      val stats =
        if (!forceFull) CdcStream.replayChunks(spark, hotLog, dir)
        else {
          val Chunk = "chunk-(\\d+)-v(\\d+)\\.parquet".r
          import scala.jdk.CollectionConverters._
          val chunks = graft.core.Fs.list(java.nio.file.Paths.get(hotLog))
            .flatMap { p =>
              p.getFileName.toString match {
                case Chunk(i, v) => Some((i.toInt, v.toInt, p.toString))
                case _ => None
              }
            }.sortBy(_._1)
          chunks.map { case (i, v, path) =>
            Merge.applyBatch(spark, t, spark.read.parquet(path), epoch = i.toLong,
              batchSchemaVersion = v, batchBytesHint = Some(1L << 60))
          }
        }
      val wall = (System.nanoTime() - t0) / 1e9
      val applied = stats.filter(_.applied)
      (applied.map(_.eventsIn).sum / wall,
        applied.map(_.touchedBuckets).sum.toDouble / applied.size)
    }

    timed(forceFull = false) // warmup (JIT + page cache), untimed
    val (fullEps, _) = timed(forceFull = true)
    val (pruneEps, touched) = timed(forceFull = false)
    println(f"PRUNE_EPS $pruneEps%.0f FULL_EPS $fullEps%.0f " +
      f"TOUCHED $touched%.0f OF $nb")
    spark.stop()
  }
}
