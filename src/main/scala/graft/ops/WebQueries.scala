package graft.ops

import org.apache.spark.sql.functions._
import graft.functions.UrlNorm

/** Web-text pipeline operators around the engine's key domain: URL
  * canonicalization (two crawl variants of one page must merge to ONE CDC
  * key), canonical-key exact dedup, and PII redaction for training-data
  * export. Inputs are synthesized deterministically from testdata tables
  * so the DuckDB oracle states the EXPECTED output independently (not by
  * re-running the same regexes).
  */
object WebQueries {

  import Tables.tbl

  /** Three crawl-variants of the same logical page per customer: cased
    * scheme/host + trailing slash; tracking param; explicit default port
    * + fragment. All must canonicalize to
    * `https://www.example-<k%50>.com/Products/<k>`.
    */
  private def urlVariants(s: org.apache.spark.sql.SparkSession, dir: String) = {
    // tblSpread: the ~8-regex normalize chain over |customer|×3 rows is
    // CPU-bound, and the driver testdata is one parquet row group — spread
    // by key or the whole chain runs on one core (memory: 1-row-group
    // pitfall; measured 2.8 s → sub-second at sf0.1)
    val base = Tables.tblSpread(s, dir, "customer", "c_custkey").select(col("c_custkey"),
      concat(lit("www.example-"), col("c_custkey") % 50, lit(".com")).as("host"),
      concat(lit("/Products/"), col("c_custkey")).as("path"))
    base.select(col("c_custkey"), lit("cased").as("variant"),
        concat(lit("HTTPS://"), upper(col("host")), col("path"), lit("/")).as("url"))
      .unionAll(base.select(col("c_custkey"), lit("tracked"),
        concat(lit("https://"), col("host"), col("path"), lit("?utm_source=feed&utm_campaign=x"))))
      .unionAll(base.select(col("c_custkey"), lit("ported"),
        concat(lit("https://"), col("host"), lit(":443"), col("path"), lit("#top"))))
  }

  def defs: Seq[QueryDef] = Seq(

    // F13: URL canonicalization — the CDC key normalizer (UrlNorm)
    QueryDef(
      "f13_url_canonicalize",
      (s, dir) => urlVariants(s, dir)
        .select(col("c_custkey"), col("variant"),
          UrlNorm.normalize(col("url")).as("canon")),
      Some("""SELECT c_custkey, v.variant,
             |       'https://www.example-' || (c_custkey % 50) || '.com/Products/' || c_custkey AS canon
             |FROM customer, (VALUES ('cased'), ('tracked'), ('ported')) v(variant)""".stripMargin)),

    // D7: exact dedup on the CANONICAL key — all crawl variants of a page
    // collapse to one row (hash-groupBy on the normalized key; one
    // map-side-combined shuffle, the same shape as d1 exact dedup)
    QueryDef(
      "d7_canonical_url_dedup",
      (s, dir) => urlVariants(s, dir)
        // materialize the canonical key in a Project BEFORE grouping: as a
        // groupBy expression the ~8-regex chain is re-evaluated per
        // aggregate mode and falls out of whole-stage codegen (measured
        // 3.2 s vs 0.6 s for the identical rows)
        .select(UrlNorm.normalize(col("url")).as("canon"), col("url"))
        .groupBy("canon")
        // min over a string buffer plans as SortAggregate (varlen agg
        // buffers have no hash path in this Spark build) — still one
        // exchange, partial-agg'd, fully parallel; per-key group size is
        // bounded by the variant fan-in so the local sorts stay tiny
        .agg(count(lit(1)).as("n_variants"), min(col("url")).as("kept_url")),
      Some("""SELECT 'https://www.example-' || (c_custkey % 50) || '.com/Products/' || c_custkey AS canon,
             |       3 AS n_variants,
             |       'HTTPS://WWW.EXAMPLE-' || (c_custkey % 50) || '.COM/Products/' || c_custkey || '/' AS kept_url
             |FROM customer""".stripMargin)),

    // T7: deterministic hash sampling — the web-pipeline way to sample
    // (keep rows whose key-hash lands under the rate): reproducible
    // across runs/engines, no RNG state, pushes down as a plain filter
    // and composes with incremental processing (a re-crawled url keeps
    // its sample fate). 10% by doc fingerprint.
    QueryDef(
      "t7_hash_sample",
      (s, dir) => tbl(s, dir, "documents")
        .filter(pmod(graft.functions.Md5Prefix32.md5_prefix32(
          col("doc_id").cast("string")), lit(100)) < 10)
        .select(col("doc_id"), col("lang"), col("n_chars")),
      Some("""SELECT doc_id, lang, n_chars FROM documents
             |WHERE CAST(((md5_number_upper(CAST(doc_id AS VARCHAR)) & 255) << 24)
             |   | (((md5_number_upper(CAST(doc_id AS VARCHAR)) >> 8) & 255) << 16)
             |   | (((md5_number_upper(CAST(doc_id AS VARCHAR)) >> 16) & 255) << 8)
             |   | ((md5_number_upper(CAST(doc_id AS VARCHAR)) >> 24) & 255) AS BIGINT)
             |   % 100 < 10""".stripMargin)),

    // T8: stratified deterministic sampling — per-language rates (e.g.
    // downsample the dominant language, keep the tail whole), same
    // hash-fate mechanism, still a single codegen'd filter
    QueryDef(
      "t8_stratified_sample",
      (s, dir) => {
        val rate = when(col("lang") === "en", 10)
          .when(col("lang") === "de", 50)
          .otherwise(100)
        tbl(s, dir, "documents")
          .filter(pmod(graft.functions.Md5Prefix32.md5_prefix32(
            col("doc_id").cast("string")), lit(100)) < rate)
          .groupBy("lang").agg(count(lit(1)).as("n_kept"))
      },
      Some("""SELECT lang, count(*) AS n_kept FROM documents
             |WHERE CAST(((md5_number_upper(CAST(doc_id AS VARCHAR)) & 255) << 24)
             |   | (((md5_number_upper(CAST(doc_id AS VARCHAR)) >> 8) & 255) << 16)
             |   | (((md5_number_upper(CAST(doc_id AS VARCHAR)) >> 16) & 255) << 8)
             |   | ((md5_number_upper(CAST(doc_id AS VARCHAR)) >> 24) & 255) AS BIGINT)
             |   % 100 < (CASE WHEN lang = 'en' THEN 10
             |                 WHEN lang = 'de' THEN 50 ELSE 100 END)
             |GROUP BY lang""".stripMargin)),

    // T6: PII redaction for training-data export — emails and phone
    // numbers replaced by placeholder tokens; global regexp_replace, pure
    // codegen. The oracle asserts the EXPECTED redacted text directly.
    QueryDef(
      "t6_redact_pii",
      (s, dir) => {
        val withPii = tbl(s, dir, "documents")
          .select(col("doc_id"),
            concat(col("text"), lit(" Contact user"), col("doc_id"),
              lit("@mail.example.com or call +1-555-"),
              (lit(1000) + col("doc_id") % 9000)).as("text"))
        withPii.select(col("doc_id"),
          regexp_replace(
            regexp_replace(col("text"),
              "[A-Za-z0-9._%-]+@[A-Za-z0-9.-]+", "[EMAIL]"),
            "\\+[0-9][0-9-]{6,}", "[PHONE]").as("redacted"))
      },
      Some("""SELECT doc_id,
             |       text || ' Contact [EMAIL] or call [PHONE]' AS redacted
             |FROM documents""".stripMargin))
  )
}
