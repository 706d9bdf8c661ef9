package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.nio.file.attribute.FileTime

/** Deterministic seeded change-event generator (SURVEY.md §7.1 step 2).
  *
  * Emits a Common-Crawl-style binlog of I/U/D events over zipf-skewed urls
  * (hot-domain realism), with monotonic LSN and text derived
  * deterministically from (url, warc_ts) — so byte-identical replay is
  * checkable. Everything is a pure Catalyst expression over spark.range:
  * no driver-side loops, no RNG state → the same (seed, i) always yields
  * the same event on any cluster size.
  */
object ChangeGen {

  final case class Config(
      nEvents: Long,
      nDomains: Int = 100,
      pagesPerDomain: Int = 50,
      seed: Long = 42L,
      tsBaseSec: Long = 1700000000L,
      tsRangeSec: Long = 100000L,
      deleteFrac: Double = 0.08,
      /** fraction of the log emitted under registry schema v1 / v2 (rest v3) */
      v1Frac: Double = 0.4,
      v2Frac: Double = 0.3)

  private val vocab: Seq[String] = Seq(
    "web", "page", "crawl", "index", "link", "data", "stream", "batch",
    "merge", "lake", "table", "query", "spark", "shuffle", "key", "value",
    "hash", "scan", "filter", "join", "window", "dedup", "commit", "log",
    "event", "change", "upsert", "delete", "schema", "column", "row",
    "byte", "text", "html", "lang", "r&d", "a<b", "x>y", "snapshot", "epoch")

  import org.apache.spark.sql.Column

  private def h(seed: Long, k: Int, cols: Column*): Column =
    xxhash64((lit(seed) +: lit(k) +: cols): _*)

  /** uniform double in [0,1) from a hash */
  private def u(hc: Column): Column =
    (pmod(hc, lit(1L << 31)) / lit((1L << 31).toDouble))

  /** Full-superset event DataFrame: Schemas.changeEvent columns, lsn = id. */
  def events(spark: SparkSession, cfg: Config): DataFrame =
    eventsRange(spark, cfg, 0, cfg.nEvents)

  /** Events for an LSN slice, generated from its own range so every task
    * holds data (a filter over one global range leaves the off-slice tasks
    * empty → half-idle scans downstream).
    */
  def eventsRange(spark: SparkSession, cfg: Config, lo: Long, hi: Long): DataFrame = {
    val df = spark.range(lo, hi).toDF("id")
    val id = col("id")

    // zipf-ish domain rank via log-uniform inverse CDF (rank 1 hottest).
    // exp(u·ln(N+1)) ∈ [1, N+1) so floor lands on [1, N] exactly — the
    // earlier floor(exp(u·ln N)) + 1 shifted ranks to [2, N]: rank-1 (the
    // documented hottest domain) never generated, only N-1 distinct
    // domains (round-2 review)
    val dom = floor(exp(u(h(cfg.seed, 1, id)) * log(lit(cfg.nDomains + 1.0))))
      .cast("int")
    val page = floor(u(h(cfg.seed, 2, id)) * cfg.pagesPerDomain).cast("int")
    val url = concat(lit("https://d"), dom, lit(".example.com/p"), page)

    // coarse-second timestamps: ties on hot urls are intended (lsn breaks them)
    val ts = timestamp_seconds(
      lit(cfg.tsBaseSec) + floor(u(h(cfg.seed, 3, id)) * cfg.tsRangeSec).cast("long"))

    val opU = u(h(cfg.seed, 4, id))
    val op = when(opU < cfg.deleteFrac, "D")
      .when(opU < lit(0.55), "U").otherwise("I")

    // deterministic text: pure function of (url, warc_ts)
    val vocabArr = array(vocab.map(lit): _*)
    val nWords = (pmod(h(cfg.seed, 5, url, ts), lit(40)) + 20).cast("int")
    val text = concat_ws(" ",
      transform(sequence(lit(1), nWords),
        k => element_at(vocabArr,
          (pmod(h(cfg.seed, 6, url, ts, k), lit(vocab.size)) + 1).cast("int"))))

    val html = TextHtml.htmlify(text, url)
    val lang = TextHtml.langOf(h(cfg.seed, 7, dom))

    val n1 = (cfg.nEvents * cfg.v1Frac).toLong
    val n2 = (cfg.nEvents * (cfg.v1Frac + cfg.v2Frac)).toLong
    val sv = when(id < n1, 1).when(id < n2, 2).otherwise(3)

    df.select(
      id.as("lsn"),
      op.as("op"),
      url.as("url"),
      ts.as("warc_ts"),
      html.as("html"),
      text.as("text"),
      lang.as("lang"),
      length(text).cast("long").as("content_len"),
      sv.cast("int").as("schema_version"))
  }

  /** Project the superset event frame down to what a producer running
    * registry version `v` would actually emit (v1 has no lang/content_len;
    * v2 carries content_len as INT).
    */
  def projectToVersion(df: DataFrame, v: Int): DataFrame = v match {
    case 1 => df.select("lsn", "op", "url", "warc_ts", "html", "text", "schema_version")
    case 2 => df.select(col("lsn"), col("op"), col("url"), col("warc_ts"),
      col("html"), col("text"), col("lang"),
      col("content_len").cast("int").as("content_len"), col("schema_version"))
    case _ => df
  }

  /** Write the binlog as an ordered sequence of chunk files under `logDir`
    * (one parquet file per chunk, ascending mtime so Spark's file source
    * triggers them in order). Each chunk is written with the schema its
    * producer version would emit — chunk boundaries align with schema
    * breaks. Returns chunk file paths in order.
    */
  def writeLog(spark: SparkSession, cfg: Config, logDir: String,
      nChunks: Int): Seq[String] = {
    val dir = Paths.get(logDir)
    Files.createDirectories(dir)
    val all = events(spark, cfg)
    val chunkSize = math.max(1L, math.ceil(cfg.nEvents.toDouble / nChunks).toLong)
    val n1 = (cfg.nEvents * cfg.v1Frac).toLong
    val n2 = (cfg.nEvents * (cfg.v1Frac + cfg.v2Frac)).toLong
    // a real producer rolls a new file when its schema version changes, so
    // chunk ranges are additionally cut at the version breaks — the log
    // content must not depend on how it was chunked (replay convergence)
    def versionAt(lsn: Long): Int = if (lsn < n1) 1 else if (lsn < n2) 2 else 3
    val pieces = (0 until nChunks).flatMap { i =>
      val lo = i * chunkSize
      val hi = math.min(cfg.nEvents, (i + 1) * chunkSize)
      // ceil-sized chunks can cover the log in < nChunks pieces; a
      // trailing lo >= hi range must be SKIPPED — sorted-pair recovery
      // used to resurrect it as a phantom empty chunk file (spurious
      // epoch in replay/tail accounting)
      if (lo >= hi) Nil
      else {
        val cuts = (Seq(lo, hi) ++ Seq(n1, n2).filter(b => b > lo && b < hi)).sorted
        cuts.zip(cuts.tail).filter { case (a, b) => a < b }
      }
    }
    pieces.zipWithIndex.map { case ((lo, hi), idx) =>
      val chunk = all.filter(col("lsn") >= lo && col("lsn") < hi)
      val v = versionAt(lo)
      // scratchDir: the _SUCCESS/.crc litter left after the part-file
      // move is cleaned at JVM exit (Fs.scratchDir's whole purpose)
      val tmp = Fs.scratchDir("graft-chunk")
      projectToVersion(chunk, v).coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = Fs.list(Paths.get(tmp))
        .find(_.getFileName.toString.endsWith(".parquet")).get
      val dst = dir.resolve(f"chunk-$idx%05d-v$v.parquet")
      Files.move(part, dst, StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(dst, FileTime.fromMillis(1700000000000L + idx * 1000L))
      dst.toString
    }
  }

  /** Bench-scale log writer: same chunking, but each chunk is a parquet
    * DIRECTORY written with full parallelism (no coalesce(1) bottleneck).
    * Readable by CdcStream.replayChunks; not for the single-file-per-batch
    * streaming tail.
    */
  def writeLogDirs(spark: SparkSession, cfg: Config, logDir: String,
      nChunks: Int): Seq[String] = {
    Files.createDirectories(Paths.get(logDir))
    val chunkSize = math.max(1L, math.ceil(cfg.nEvents.toDouble / nChunks).toLong)
    (0 until nChunks).flatMap { i =>
      val lo = i * chunkSize
      val hi = math.min(cfg.nEvents, (i + 1) * chunkSize)
      if (lo >= hi) None // ceil coverage exhausted — no phantom chunks
      else {
        val v = if (lo < (cfg.nEvents * cfg.v1Frac).toLong) 1
          else if (lo < (cfg.nEvents * (cfg.v1Frac + cfg.v2Frac)).toLong) 2 else 3
        val dst = Paths.get(logDir).resolve(f"chunk-$i%05d-v$v.parquet")
        projectToVersion(eventsRange(spark, cfg, lo, hi), v)
          .write.mode("overwrite").parquet(dst.toString)
        Some(dst.toString)
      }
    }
  }
}
