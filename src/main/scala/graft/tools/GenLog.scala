package graft.tools

import graft.core.ChangeGen
import org.apache.spark.sql.SparkSession

/** Write a bench change log to a fixed dir: args = <dir> <nEvents> <chunks>. */
object GenLog {
  def main(args: Array[String]): Unit = {
    val Array(dir, n, chunks) = args
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cfg = ChangeGen.Config(nEvents = n.toLong, nDomains = 500,
      pagesPerDomain = 200, v1Frac = 0.0, v2Frac = 0.0)
    ChangeGen.writeLogDirs(spark, cfg, dir, chunks.toInt)
    println(s"GENLOG_DONE $dir")
    spark.stop()
  }
}
