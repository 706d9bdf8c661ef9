package graft.tools

import graft.cdc.CdcStream
import graft.core.ChangeGen
import graft.lake.LakeTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import scala.collection.mutable

/** Ad-hoc CDC profiling: per-batch wall times at two parallelism levels. */
object ProfileCdc {
  def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder().master(s"local[$cpus]")
      .appName(s"profile-$cpus")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val nEvents = args.headOption.map(_.toLong).getOrElse(1000000L)
    val levels = if (args.length > 1) args(1).split(",").map(_.toInt).toSeq else Seq(8, 32)
    val nChunks = if (args.length > 2) args(2).toInt else 8
    val gen = session(32)
    val logDir = java.nio.file.Files.createTempDirectory("prof-log").toString
    val cfg = ChangeGen.Config(nEvents = nEvents, nDomains = 500,
      pagesPerDomain = 100, v1Frac = 0.0, v2Frac = 0.0)
    val tGen0 = System.nanoTime()
    ChangeGen.writeLogDirs(gen, cfg, logDir, nChunks)
    println(f"[prof] generate: ${(System.nanoTime() - tGen0) / 1e9}%.1fs")
    gen.stop(); SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()

    levels.foreach { cpus =>
      val spark = session(cpus)
      val stages = mutable.ArrayBuffer[(Int, String, Long, Long)]()
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
          val si = e.stageInfo
          val wall = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
          stages += ((si.stageId, si.name.takeWhile(_ != '\n').take(60),
            wall, si.taskMetrics.executorRunTime))
        }
      })
      // JIT/classload warmup outside the timed window
      val warmDir = java.nio.file.Files.createTempDirectory(s"prof-w$cpus").toString
      LakeTable.create(spark, warmDir, schemaId = 3, numBuckets = 32)
      CdcStream.replayChunks(spark, logDir, warmDir)
      val tableDir = java.nio.file.Files.createTempDirectory(s"prof-t$cpus").toString
      LakeTable.create(spark, tableDir, schemaId = 3, numBuckets = 32)
      val t0 = System.nanoTime()
      val stats = CdcStream.replayChunks(spark, logDir, tableDir)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[prof] cpus=$cpus total=$sec%.1fs eps=${nEvents / sec}%.0f " +
        s"batches=${stats.map(_.wallMs).mkString(",")}ms")
      stages.toSeq.sortBy(-_._3).take(12).foreach { case (id, nm, w, rt) =>
        println(f"[stage $cpus] #$id wall=${w}ms taskTime=${rt}ms  $nm")
      }
      spark.stop(); SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    }
  }
}
