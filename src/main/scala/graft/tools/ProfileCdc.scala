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
    val logDir = sys.env.getOrElse("GRAFT_PROF_LOG", {
      val gen = session(32)
      val d = java.nio.file.Files.createTempDirectory("prof-log").toString
      val cfg = ChangeGen.Config(nEvents = nEvents, nDomains = 500,
        pagesPerDomain = 100, v1Frac = 0.0, v2Frac = 0.0)
      val tGen0 = System.nanoTime()
      ChangeGen.writeLogDirs(gen, cfg, d, nChunks)
      println(f"[prof] generate: ${(System.nanoTime() - tGen0) / 1e9}%.1fs")
      gen.stop(); SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      d
    })

    levels.foreach { cpus =>
      val spark = session(cpus)
      // (stageId, name, submissionTime, completionTime)
      val stages = mutable.ArrayBuffer[(Int, String, Long, Long)]()
      val cpuMs = new java.util.concurrent.atomic.AtomicLong
      val runMs = new java.util.concurrent.atomic.AtomicLong
      val gcMs = new java.util.concurrent.atomic.AtomicLong
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
          val si = e.stageInfo
          cpuMs.addAndGet(si.taskMetrics.executorCpuTime / 1000000)
          runMs.addAndGet(si.taskMetrics.executorRunTime)
          gcMs.addAndGet(si.taskMetrics.jvmGCTime)
          stages.synchronized {
            stages += ((si.stageId, si.name.takeWhile(_ != '\n').take(60),
              si.submissionTime.getOrElse(0L), si.completionTime.getOrElse(0L)))
          }
        }
      })
      // JIT/classload warmup outside the timed window
      val warmDir = java.nio.file.Files.createTempDirectory(s"prof-w$cpus").toString
      LakeTable.create(spark, warmDir, schemaId = 3, numBuckets = 32)
      CdcStream.replayChunks(spark, logDir, warmDir)
      val tableDir = java.nio.file.Files.createTempDirectory(s"prof-t$cpus").toString
      LakeTable.create(spark, tableDir, schemaId = 3, numBuckets = 32)
      stages.clear(); cpuMs.set(0); runMs.set(0); gcMs.set(0)
      val t0 = System.nanoTime()
      val stats = CdcStream.replayChunks(spark, logDir, tableDir)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[prof] cpus=$cpus total=$sec%.1fs eps=${nEvents / sec}%.0f " +
        s"batches=${stats.map(_.wallMs).mkString(",")}ms")
      // serial-time estimate: batch wall not covered by any running stage
      // (stages overlap across jobs, so this sums the stage-wall union)
      val iv = stages.toSeq.map { case (_, _, sub, comp) => (sub, comp) }
        .filter(x => x._2 > x._1).sortBy(_._1)
      val merged = iv.foldLeft(List.empty[(Long, Long)]) {
        case (acc @ ((s0, e0) :: rest), (s, e)) =>
          if (s <= e0) (s0, math.max(e0, e)) :: rest else (s, e) :: acc
        case (Nil, x) => List(x)
      }
      val covered = merged.map(x => x._2 - x._1).sum
      println(f"[prof] cpus=$cpus stageUnion=${covered}ms " +
        f"wall=${(sec * 1000).toLong}ms uncovered=${(sec * 1000).toLong - covered}ms " +
        s"nStages=${stages.size} taskRun=${runMs.get}ms taskCpu=${cpuMs.get}ms " +
        s"gc=${gcMs.get}ms utilization=" +
        f"${runMs.get / (sec * 1000 * cpus)}%.2f")
      stages.toSeq.sortBy(x => -(x._4 - x._3)).take(10).foreach { case (id, nm, sub, comp) =>
        println(f"[stage $cpus] #$id wall=${comp - sub}ms  $nm")
      }
      spark.stop(); SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    }
  }
}
