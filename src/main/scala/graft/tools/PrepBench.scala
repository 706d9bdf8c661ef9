package graft.tools

import graft.cdc.Merge
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B the merge's per-batch prepare strategies over one bench chunk
  * (guide §1: measure before redesigning the hot path). Candidates:
  *   scan      — full-width scan+count of the chunk (the IO floor);
  *   keys      — prepareKeys (narrow max(struct) — SortAggregate today);
  *   keysHash  — packed-decimal argmax (HashAggregate candidate);
  *   winners   — prepareWinners given materialized keys (bcast semi-join);
  *   fused     — one full-width max(struct) agg producing keys+winners.
  * args: <logDir> [cpus]
  */
object PrepBench {
  def main(args: Array[String]): Unit = {
    val logDir = args(0)
    val cpus = if (args.length > 1) args(1).toInt else 32
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val chunk0 = graft.core.Fs.list(java.nio.file.Paths.get(logDir))
      .map(_.toString).filter(_.contains("chunk-0")).head
    val batch = spark.read.schema(graft.cdc.CdcStream.chunkSchema(3))
      .parquet(chunk0)

    def time(tag: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[prep] $tag rep$i: ${(System.nanoTime() - t0) / 1e9}%.2fs ($n)")
      }
    }
    // noop sink computes EVERY column of every row (guide §1.4) — count()
    // would let Catalyst prune the payload out of the very pass we are
    // trying to price
    def noop(df: org.apache.spark.sql.DataFrame): Long = {
      df.write.format("noop").mode("overwrite").save(); 0L
    }

    time("scan-full") {
      batch.write.format("noop").mode("overwrite").save(); 0L
    }
    time("scan-narrow")(batch.select("url", "warc_ts", "lsn", "op").count())
    time("keys-sortagg")(noop(Merge.prepareKeys(batch)))
    // packed-decimal candidate: ts-micros and lsn both provably
    // non-negative here; order-preserving pack into DECIMAL(38,0)
    time("keys-hashagg") {
      val packed = batch
        .select(col("url").cast("string").as("url"),
          (unix_micros(col("warc_ts").cast("timestamp")).cast("decimal(38,0)")
            * lit(math.pow(2, 64)).cast("decimal(20,0)")
            + (col("lsn").cast("decimal(38,0)")
              + lit(math.pow(2, 63)).cast("decimal(20,0)"))).as("pk"),
          col("lsn"), col("op"))
        .groupBy("url")
        .agg(max("pk").as("win"), count(lit(1)).as("cnt"),
          min("lsn").as("lsnMin"), max("lsn").as("lsnMax"),
          sum(when(col("op") === "D", 1L).otherwise(0L)).as("nDel"))
      noop(packed)
    }
    val pk = Merge.prepareKeys(batch).persist()
    pk.count()
    time("winners-semijoin")(
      noop(Merge.prepareWinners(batch, pk, Some(110000L))))
    time("fused-fullwidth") {
      val cols = batch.columns.map(col)
      val f = batch
        .groupBy(col("url"))
        .agg(max(struct((col("warc_ts") +: col("lsn") +: cols.toSeq): _*)).as("m"),
          count(lit(1)).as("cnt"))
      noop(f)
    }
    spark.stop()
  }
}
