package graft.tools
import graft.core.ChangeGen
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Measures the irreducible input cost: full-column scan of one bench
  * chunk vs the narrow key scan, at a given core count. */
object ScanFloor {
  def main(args: Array[String]): Unit = {
    val nEvents = args.headOption.map(_.toLong).getOrElse(4000000L)
    val cpus = if (args.length > 1) args(1).toInt else 8
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files.createTempDirectory("scanfloor").toString
    val cfg = ChangeGen.Config(nEvents = nEvents, nDomains = 500,
      pagesPerDomain = 200, v1Frac = 0.0, v2Frac = 0.0)
    ChangeGen.writeLogDirs(spark, cfg, dir, 1)
    val path = s"$dir/chunk-00000-v3.parquet"
    val bytes = {
      val p = java.nio.file.Paths.get(path)
      graft.core.Fs.list(p).map(java.nio.file.Files.size(_)).sum
    }
    def time(label: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime(); val n = f
        val s = (System.nanoTime() - t0) / 1e9
        println(f"[floor] $label rep$i: $s%.2fs  (${nEvents / s / 1e6}%.2fM ev/s, ${bytes / s / 1e9}%.2f GB/s) n=$n")
      }
    }
    val full = spark.read.parquet(path)
    time("full-scan-all-cols")(full.select(max(length(col("html"))), max(length(col("text"))), max(col("lsn"))).head().getLong(2))
    time("narrow-keys-scan")(full.select(max(col("lsn")), max(unix_millis(col("warc_ts")))).head().getLong(0))
    println(f"[floor] chunk bytes on disk: ${bytes / 1e9}%.2f GB")
    spark.stop()
  }
}
