package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque BINARY columns with
  * typed metadata structs, plus decode / feature-extract / resize /
  * frame-sample stages.
  *
  * The Spark-side plumbing is real — binary payload schema, metadata
  * struct, hash-partitioned batched processing, per-row and exploded
  * shapes. Two codec branches exist:
  *  - [[ImageCodec]] / `mm_decode_real`: a REAL PNG encode/decode via
  *    javax.imageio (in the JDK) — exercised end to end with an exact
  *    pixel-sum oracle and a roundtrip spec;
  *  - [[decodeFeatures]]: the deterministic md5 STUB kept for the
  *    payload-shaped queries whose oracle must recompute "pixels"
  *    without any codec (no libjpeg/ffmpeg in DuckDB). On a cluster,
  *    either branch is the body of a Pandas UDF / mapInPandas stage with
  *    the same schema and batch shape.
  *
  * Payload wire format (deterministic from the documents table):
  * `IMG<w>x<h>:<body>` as UTF-8 bytes — a parseable header plus a body,
  * standing in for magic bytes + compressed stream.
  */
object MultimodalQueries {

  import Tables.tbl

  /** Synthesize the multimodal table: one "image" per document with typed
    * metadata. At 100 TB this table is what a crawler emits: (id, media
    * BINARY, meta STRUCT) partitioned by hash(id).
    */
  def imageTable(s: SparkSession, dir: String): DataFrame = {
    val d = tbl(s, dir, "documents")
    val w = (pmod(col("doc_id") * 37, lit(512)) + 16).cast("int")
    val h = (pmod(col("doc_id") * 101, lit(512)) + 16).cast("int")
    d.select(
      col("doc_id"),
      concat(lit("IMG"), w, lit("x"), h, lit(":"),
        substring(col("text"), 1, 64)).cast("binary").as("media"),
      struct(w.as("width"), h.as("height"), col("lang").as("tag"),
        col("n_chars").as("src_bytes")).as("meta"))
  }

  /** STUBBED decode + feature extraction: header parse is real; the
    * "pixel decode" is a deterministic md5-derived feature vector (the
    * `???` of this sandbox — a real build plugs libjpeg/ffmpeg here).
    */
  def decodeFeatures(media: Column, nFeatures: Int): Column = {
    val s = media.cast("string")
    transform(sequence(lit(0), lit(nFeatures - 1)), i =>
      (conv(substring(md5(concat(s, lit("_"), i).cast("binary")), 1, 8), 16, 10)
        .cast("long") / lit(4294967296.0)))
  }

  /** REAL codec branch of the swap-point (round-2 verdict #8): PNG
    * encode/decode via javax.imageio — in the JDK, no external libs. The
    * pixel CONTENT is a pure function of doc_id, so the DuckDB oracle can
    * state the expected decoded pixel sums in closed form while the bytes
    * on the wire are a genuine compressed PNG stream produced and parsed
    * by a real codec. This is the per-row body a mapInPandas/JNI stage
    * would run on a cluster — same batch shape (hash-clustered
    * partitions), same signature (id → decoded features).
    */
  object ImageCodec {
    import java.awt.image.BufferedImage
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.imageio.ImageIO

    val Side = 8

    // ImageIO's default ImageInputStream/ImageOutputStream cache is a
    // DISK temp file — every encode+decode call created and deleted two
    // /tmp files, serializing 2 file ops per row on fs metadata (and
    // making the query's wall track disk pressure, not codec work). The
    // images here are 8×8: memory caching is strictly better, and the
    // decoded bytes are identical either way.
    ImageIO.setUseCache(false)

    def pixel(id: Long, x: Int, y: Int): (Int, Int, Int) = (
      ((id * 31 + x * 7 + y * 13) % 256).toInt,
      ((id * 17 + x * 11 + y * 3) % 256).toInt,
      ((id * 23 + x * 5 + y * 19) % 256).toInt)

    def encodePng(id: Long): Array[Byte] = {
      val img = new BufferedImage(Side, Side, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < Side) {
        var x = 0
        while (x < Side) {
          val (r, g, b) = pixel(id, x, y)
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          x += 1
        }
        y += 1
      }
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Decode a PNG and sum the channels — the "feature extraction". */
    def decodeSums(png: Array[Byte]): (Long, Long, Long) = {
      val img = ImageIO.read(new ByteArrayInputStream(png))
      var sr = 0L; var sg = 0L; var sb = 0L
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val p = img.getRGB(x, y)
          sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
          x += 1
        }
        y += 1
      }
      (sr, sg, sb)
    }
  }

  def defs: Seq[QueryDef] = Seq(

    // REAL decode: synthesize a genuine PNG per document, decode it back
    // through the same codec, emit pixel-derived features. PNG byte size
    // is codec-implementation-specific so it stays OUT of the oracle'd
    // columns; the decoded pixel sums are exact.
    QueryDef(
      "mm_decode_real",
      (s, dir) => {
        import s.implicits._
        Tables.tblSpread(s, dir, "documents", "doc_id")
          .select(col("doc_id")).as[Long]
          .mapPartitions { it =>
            it.map { id =>
              val png = ImageCodec.encodePng(id)
              val (sr, sg, sb) = ImageCodec.decodeSums(png)
              (id, sr, sg, sb)
            }
          }
          .toDF("doc_id", "sum_r", "sum_g", "sum_b")
      },
      // DuckDB widens integer sum() to HUGEINT, which the driver hashes as
      // float64 while Spark emits BIGINT — pin the oracle to BIGINT (same
      // fix as the d4_simhash oracle).
      Some(s"""SELECT doc_id,
              |  (SELECT CAST(sum((doc_id * 31 + x * 7 + y * 13) % 256) AS BIGINT)
              |   FROM range(8) t1(x), range(8) t2(y)) AS sum_r,
              |  (SELECT CAST(sum((doc_id * 17 + x * 11 + y * 3) % 256) AS BIGINT)
              |   FROM range(8) t1(x), range(8) t2(y)) AS sum_g,
              |  (SELECT CAST(sum((doc_id * 23 + x * 5 + y * 19) % 256) AS BIGINT)
              |   FROM range(8) t1(x), range(8) t2(y)) AS sum_b
              |FROM documents""".stripMargin)),

    // decode: header → dimensions; verify against the metadata struct
    QueryDef(
      "mm_decode_meta",
      (s, dir) =>
        imageTable(s, dir)
          .repartition(8, col("doc_id")) // batch shape: hash-clustered
          .select(col("doc_id"),
            regexp_extract(col("media").cast("string"), "^IMG(\\d+)x", 1)
              .cast("int").as("dec_width"),
            regexp_extract(col("media").cast("string"), "x(\\d+):", 1)
              .cast("int").as("dec_height"),
            col("meta.width").as("meta_width"),
            col("meta.height").as("meta_height"),
            length(col("media")).as("media_bytes")),
      Some("""SELECT doc_id,
             |  CAST((doc_id * 37) % 512 + 16 AS INTEGER) AS dec_width,
             |  CAST((doc_id * 101) % 512 + 16 AS INTEGER) AS dec_height,
             |  CAST((doc_id * 37) % 512 + 16 AS INTEGER) AS meta_width,
             |  CAST((doc_id * 101) % 512 + 16 AS INTEGER) AS meta_height,
             |  length('IMG' || CAST((doc_id * 37) % 512 + 16 AS VARCHAR) || 'x'
             |    || CAST((doc_id * 101) % 512 + 16 AS VARCHAR) || ':'
             |    || substr(text, 1, 64)) AS media_bytes
             |FROM documents""".stripMargin)),

    // feature extraction: fixed-width embedding per media blob (the
    // mapInPandas batch stage, stubbed deterministically)
    QueryDef(
      "mm_feature_extract",
      (s, dir) =>
        imageTable(s, dir)
          .select(col("doc_id"),
            round(aggregate(decodeFeatures(col("media"), 8), lit(0.0),
              (acc, x) => acc + x), 4).as("feature_sum")),
      Some {
        val feat = (0 until 8).map { i =>
          s"""(CAST(((md5_number_upper(img || '_$i') & 255) << 24)
             |  | (((md5_number_upper(img || '_$i') >> 8) & 255) << 16)
             |  | (((md5_number_upper(img || '_$i') >> 16) & 255) << 8)
             |  | ((md5_number_upper(img || '_$i') >> 24) & 255) AS BIGINT)
             |  / 4294967296.0)""".stripMargin.replace("\n", " ")
        }.mkString(" + ")
        s"""SELECT doc_id, round($feat, 4) AS feature_sum FROM (
           |  SELECT doc_id,
           |    'IMG' || CAST((doc_id * 37) % 512 + 16 AS VARCHAR) || 'x'
           |      || CAST((doc_id * 101) % 512 + 16 AS VARCHAR) || ':'
           |      || substr(text, 1, 64) AS img
           |  FROM documents)""".stripMargin
      }),

    // resize: metadata transform + payload rewrite (header swap)
    QueryDef(
      "mm_resize",
      (s, dir) => {
        val t = imageTable(s, dir)
        val s2 = t.select(col("doc_id"),
          floor(col("meta.width") / 2).cast("int").as("new_w"),
          floor(col("meta.height") / 2).cast("int").as("new_h"),
          col("media").cast("string").as("m"))
        s2.select(col("doc_id"), col("new_w"), col("new_h"),
          length(concat(lit("IMG"), col("new_w"), lit("x"), col("new_h"),
            lit(":"), regexp_extract(col("m"), ":(.*)$", 1)).cast("binary"))
            .as("new_bytes"))
      },
      Some("""SELECT doc_id,
             |  CAST(floor(((doc_id * 37) % 512 + 16) / 2) AS INTEGER) AS new_w,
             |  CAST(floor(((doc_id * 101) % 512 + 16) / 2) AS INTEGER) AS new_h,
             |  length('IMG' || CAST(CAST(floor(((doc_id * 37) % 512 + 16) / 2) AS INTEGER) AS VARCHAR)
             |    || 'x' || CAST(CAST(floor(((doc_id * 101) % 512 + 16) / 2) AS INTEGER) AS VARCHAR)
             |    || ':' || substr(text, 1, 64)) AS new_bytes
             |FROM documents""".stripMargin)),

    // audio feature extraction: windowed RMS over PCM samples — the
    // audio leg of the multimodal trio (image = mm_decode_real,
    // video = mm_frame_sample). Samples are the deterministic decode-stub
    // output (md5-derived, both engines recompute them — the real-codec
    // swap-point is the same mapInPandas-shaped stage mm_decode_real
    // exercises with PNG); the windowing/RMS plumbing — materialized
    // sample array, slice per window, posexplode, aggregate — is the
    // real Spark shape of an audio featurizer at scale.
    QueryDef(
      "mm_audio_rms",
      (s, dir) => {
        val nSamples = 256
        val winLen = 64
        def h32(c: Column): Column =
          graft.functions.Md5Prefix32.md5_prefix32(c)
        val sampled = Tables.tblSpread(s, dir, "documents", "doc_id")
          // samples materialized in their OWN projection: the window
          // slices below reference the array repeatedly inside
          // interpreted HOFs (no CSE — re-deriving 256 md5s per
          // reference would multiply the work by the window count)
          .select(col("doc_id"),
            transform(sequence(lit(0), lit(nSamples - 1)), i =>
              h32(concat(col("doc_id").cast("string"), lit("_"),
                i.cast("string"))) / lit(2147483648.0) - lit(1.0)).as("pcm"))
        sampled
          .select(col("doc_id"),
            posexplode(transform(sequence(lit(0), lit(nSamples / winLen - 1)),
              w => slice(col("pcm"), w * winLen + 1, lit(winLen))))
              .as(Seq("window_no", "w")))
          .select(col("doc_id"), col("window_no"),
            round(sqrt(aggregate(col("w"), lit(0.0), (acc, x) => acc + x * x)
              / lit(winLen.toDouble)), 4).as("rms"))
      },
      Some {
        val h = (e: String) =>
          s"""CAST(((md5_number_upper($e) & 255) << 24)
             | | (((md5_number_upper($e) >> 8) & 255) << 16)
             | | (((md5_number_upper($e) >> 16) & 255) << 8)
             | | ((md5_number_upper($e) >> 24) & 255) AS BIGINT)""".stripMargin.replace("\n", " ")
        s"""WITH pcm AS (
           |  SELECT doc_id,
           |         [${h("CAST(doc_id AS VARCHAR) || '_' || (i - 1)")} / 2147483648.0 - 1.0
           |          FOR i IN range(1, 257)] AS pcm
           |  FROM documents),
           |wins AS (
           |  SELECT doc_id, w AS window_no, list_slice(pcm, w * 64 + 1, w * 64 + 64) AS ws
           |  FROM pcm, (SELECT unnest(range(0, 4)) AS w))
           |SELECT doc_id, CAST(window_no AS INTEGER) AS window_no,
           |       round(sqrt(list_sum(list_transform(ws, x -> x * x)) / 64.0), 4) AS rms
           |FROM wins""".stripMargin
      }),

    // frame sampling: "video" = delimited frame payloads; posexplode +
    // every-k-th filter (the frame-sample stage of a video pipeline)
    QueryDef(
      "mm_frame_sample",
      (s, dir) => {
        val video = tbl(s, dir, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("frames"))
        video.select(col("doc_id"),
            posexplode(col("frames")).as(Seq("frame_no", "frame")))
          .filter(col("frame_no") % 4 === 0)
          .select(col("doc_id"), col("frame_no"), col("frame"))
      },
      Some("""SELECT doc_id, frame_no, frame FROM (
             |  SELECT doc_id, unnest(string_split(text, ' ')) AS frame,
             |         generate_subscripts(string_split(text, ' '), 1) - 1 AS frame_no
             |  FROM documents)
             |WHERE frame_no % 4 = 0""".stripMargin))
  )
}
