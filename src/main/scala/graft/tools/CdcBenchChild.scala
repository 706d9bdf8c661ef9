package graft.tools

import graft.cdc.CdcStream
import graft.lake.LakeTable
import org.apache.spark.sql.SparkSession

/** One CDC measurement in a clean JVM (spawned by Bench): JIT code cache
  * and metaspace pollution from other parallelism levels would otherwise
  * skew per-level timings. Prints `CDC_EPS <events/sec>` on stdout.
  *
  * args: <cpus> <logDir> <nEvents>
  */
object CdcBenchChild {
  def main(args: Array[String]): Unit = {
    val Array(cpusS, logDir, nEventsS) = args
    val cpus = cpusS.toInt
    val nEvents = nEventsS.toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"cdc-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("GRAFT_AQE", "true"))
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup replay (JIT, classloading, page cache) — one chunk
    // exercises every code path
    val warmDir = java.nio.file.Files.createTempDirectory(s"cdcb-warm-$cpus").toString
    LakeTable.create(spark, warmDir, schemaId = 3, numBuckets = sys.env.getOrElse("GRAFT_BUCKETS", "32").toInt)
    CdcStream.replayChunks(spark, logDir, warmDir, maxChunks = 1)
    // timed replay into a fresh table; report the MEDIAN per-batch
    // events/sec — the sandbox has noisy-neighbor CPU transients that a
    // single total-wall number absorbs but a median rejects
    val tableDir = java.nio.file.Files.createTempDirectory(s"cdcb-table-$cpus").toString
    LakeTable.create(spark, tableDir, schemaId = 3, numBuckets = sys.env.getOrElse("GRAFT_BUCKETS", "32").toInt)
    val stats = CdcStream.replayChunks(spark, logDir, tableDir)
    val perBatch = stats.filter(_.applied)
      .map(s => s.eventsIn * 1000.0 / math.max(1, s.wallMs)).sorted
    val median = perBatch(perBatch.size / 2)
    println(s"CDC_BATCHES ${stats.map(_.wallMs).mkString(",")}")
    println(s"CDC_EPS ${"%.0f".format(median)}")
    spark.stop()
  }
}
