package graft.core

import org.apache.spark.sql.types._

/** The engine's data model (SURVEY.md §1.4).
  *
  * Input table shape is authoritative from BASELINE.json `input_hint`:
  * web_pages(url STRING, warc_ts TIMESTAMP, html BINARY, text STRING,
  * lang STRING), key = url, version order = (warc_ts, lsn).
  */
object Schemas {

  /** Change event (the binlog row). Mirrors the reference's queue rows
    * (objectId ≈ lsn, createdOn ≈ warc_ts, patientId×team ≈ url — see
    * /root/reference/project_setup/late_setup/late_round12.csv:1).
    */
  val changeEvent: StructType = StructType(Seq(
    StructField("lsn", LongType, nullable = false),
    StructField("op", StringType, nullable = false), // I | U | D
    StructField("url", StringType, nullable = false),
    StructField("warc_ts", TimestampType, nullable = false),
    StructField("html", BinaryType, nullable = true),
    StructField("text", StringType, nullable = true),
    StructField("lang", StringType, nullable = true),
    StructField("content_len", LongType, nullable = true),
    StructField("schema_version", IntegerType, nullable = false)))

  /** Hidden lineage column: LSN of the change that produced the row. */
  val LsnCol = "_lsn"

  /** Hidden op column: 'U' live row, 'D' tombstone. Tombstones must be
    * persisted — otherwise a late-arriving upsert older than a delete
    * would resurrect the key and replay convergence across different
    * batch splits would break.
    */
  val OpCol = "_op"
}

/** Avro-style schema registry (SURVEY.md §1.2 "cast registry" → versioned
  * registry; reference analog: the V3→V4 dataset switch,
  * /root/reference/create_tables/create_submission_tables.sh:1-28, and the
  * COL_FUNCS cast registry,
  * /root/reference/upload_data/Submissions/round3/make_round3_prediction_files.R:29-46).
  *
  * Version 1: base web-page columns.
  * Version 2: adds `lang` + `content_len` (added-column evolution — the
  *            "lang promotion" of the north star; nulls backfilled).
  * Version 3: widens `content_len` INT→LONG (type-widening evolution).
  */
object SchemaRegistry {

  private def base(contentLen: Option[DataType], withLang: Boolean) = {
    val cols = Seq(
      StructField("url", StringType, nullable = false),
      StructField("warc_ts", TimestampType, nullable = false),
      StructField("html", BinaryType, nullable = true),
      StructField("text", StringType, nullable = true)) ++
      (if (withLang) Seq(StructField("lang", StringType, nullable = true)) else Nil) ++
      contentLen.map(t => StructField("content_len", t, nullable = true)).toSeq
    StructType(cols)
  }

  val versions: Map[Int, StructType] = Map(
    1 -> base(None, withLang = false),
    2 -> base(Some(IntegerType), withLang = true),
    3 -> base(Some(LongType), withLang = true))

  val latestVersion: Int = versions.keys.max

  def schemaFor(version: Int): StructType =
    versions.getOrElse(version,
      throw new IllegalArgumentException(s"unknown schema version $version"))

  /** True iff `from` can evolve to `to` by add-column / widen-type only
    * (BigQuery-NULLABLE-style: never drops or narrows).
    */
  def canEvolve(from: StructType, to: StructType): Boolean =
    from.fields.forall { f =>
      to.fields.find(_.name == f.name).exists(t => widens(f.dataType, t.dataType))
    }

  private def widens(a: DataType, b: DataType): Boolean = (a, b) match {
    case (x, y) if x == y => true
    case (IntegerType, LongType) => true
    case (IntegerType, DoubleType) => true
    case (FloatType, DoubleType) => true
    case _ => false
  }
}
