package graft.tools

import graft.cdc.ParquetRowCodec
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Microbench for the scalar parquet codec ([[ParquetRowCodec]]): where
  * does a bucket-local scan's time go — file OPEN (footer + column IO
  * setup) vs row DRAIN (record assembly)? Writes a fleet of small
  * bucket-sized files (the MoR layered-read shape), then times open-only
  * and open+drain passes single-threaded. args: [files] [rowsPerFile]
  */
object CodecProbe {
  def main(args: Array[String]): Unit = {
    val nFiles = args.headOption.map(_.toInt).getOrElse(64)
    val rowsPer = args.drop(1).headOption.map(_.toInt).getOrElse(8000)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files.createTempDirectory("codec-probe").toString
    spark.range(nFiles.toLong * rowsPer)
      .select(
        concat(lit("https://example.com/page/"), col("id")).as("url"),
        timestamp_micros(col("id") * 1000000L).as("warc_ts"),
        lit("x" * 400).as("text"),
        col("id").as("_lsn"),
        lit("U").as("_op"),
        (col("id") / rowsPer).cast("int").as("part"))
      .repartition(nFiles, col("part")).drop("part")
      .write.mode("overwrite").parquet(dir)
    val files = graft.core.Fs.list(java.nio.file.Paths.get(dir))
      .filter(_.getFileName.toString.endsWith(".parquet")).map(_.toString)
    println(s"files=${files.size} rowsPer=$rowsPer")
    val conf = new org.apache.hadoop.conf.Configuration()
    val narrow = StructType(Seq(
      StructField("url", StringType), StructField("warc_ts", TimestampType),
      StructField("_lsn", LongType), StructField("_op", StringType)))
    def timed(tag: String)(f: => Long): Unit = {
      (1 to 3).foreach { rep =>
        val t0 = System.nanoTime()
        val n = f
        println(f"$tag rep$rep: ${(System.nanoTime() - t0) / 1e9}%.3fs (n=$n)")
      }
    }
    timed("open-only") {
      files.map { p =>
        val r = ParquetRowCodec.openReader(p, narrow, conf)
        r.close(); 1L
      }.sum
    }
    timed("open+drain-narrow") {
      files.map { p =>
        val r = ParquetRowCodec.openReader(p, narrow, conf)
        var n = 0L
        try { while (r.read() != null) n += 1 } finally r.close()
        n
      }.sum
    }
    val rawConf = new org.apache.hadoop.conf.Configuration()
    rawConf.set("fs.file.impl",
      classOf[org.apache.hadoop.fs.RawLocalFileSystem].getName)
    timed("open-only-rawfs") {
      files.map { p =>
        val r = ParquetRowCodec.openReader(p, narrow, rawConf)
        r.close(); 1L
      }.sum
    }
    timed("open+drain-narrow-rawfs") {
      files.map { p =>
        val r = ParquetRowCodec.openReader(p, narrow, rawConf)
        var n = 0L
        try { while (r.read() != null) n += 1 } finally r.close()
        n
      }.sum
    }
    spark.stop()
    graft.core.Fs.deleteRecursively(java.nio.file.Paths.get(dir))
  }
}
