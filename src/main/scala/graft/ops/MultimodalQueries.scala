package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque BINARY columns with
  * typed metadata structs, plus decode / feature-extract / resize /
  * frame-sample stages.
  *
  * The Spark-side plumbing is real — binary payload schema, metadata
  * struct, hash-partitioned batched processing, per-row and exploded
  * shapes — but the codec itself is a STUB: no image/audio libraries ship
  * in this container, so "pixels" are a deterministic fake (md5-derived
  * bytes) that both engines can recompute. Swapping the fake for a real
  * decoder is a one-function change in [[decodeFeatures]]; on a cluster
  * that function would be a Pandas UDF / mapInPandas stage with the same
  * schema and batch shape.
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

  def defs: Seq[QueryDef] = Seq(

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
