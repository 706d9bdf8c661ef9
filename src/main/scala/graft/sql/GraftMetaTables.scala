package graft.sql

import graft.cdc.Metrics
import graft.lake.LakeTable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.connector.catalog.{Table, TableCapability}
import org.apache.spark.sql.types._
import java.util
import scala.jdk.CollectionConverters._

/** Iceberg-style SQL metadata tables: `graft.t$history`, `graft.t$files`,
  * `graft.t$manifests`, `graft.t$metrics` expose the snapshot chain, the
  * live file inventory, the manifest list, and the per-batch lineage/
  * throughput sink to plain `spark.sql` — the queryable face of the north
  * star's "per-partition lineage + metrics". All four are driver-sized
  * metadata (bounded by snapshot retention / manifest grouping), built as
  * local relations — no executor work.
  */
object GraftMetaTables {

  val kinds: Set[String] =
    Set("history", "files", "manifests", "metrics", "partitions", "changes",
      "cdf")

  val historySchema: StructType = StructType(Seq(
    StructField("version", IntegerType, nullable = false),
    StructField("schema_id", IntegerType, nullable = false),
    StructField("num_buckets", IntegerType, nullable = false),
    StructField("file_count", IntegerType, nullable = false),
    StructField("total_bytes", LongType, nullable = false),
    StructField("epoch", LongType, nullable = true),
    StructField("rows_applied", LongType, nullable = true),
    StructField("conflicts", LongType, nullable = true),
    StructField("lsn_min", LongType, nullable = true),
    StructField("lsn_max", LongType, nullable = true),
    StructField("summary", MapType(StringType, StringType), nullable = false)))

  val filesSchema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("bucket", IntegerType, nullable = false),
    StructField("rows", LongType, nullable = false),
    StructField("bytes", LongType, nullable = false),
    StructField("schema_id", IntegerType, nullable = false),
    // warc_ts zone map (epoch micros) — null for pre-stats files
    StructField("ts_min", LongType, nullable = true),
    StructField("ts_max", LongType, nullable = true),
    // merge-on-read delta layer (write-mode mor); false = base file
    StructField("delta", BooleanType, nullable = false)))

  val manifestsSchema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("bucket_group", IntegerType, nullable = false),
    StructField("num_files", IntegerType, nullable = false),
    StructField("rows", LongType, nullable = false),
    StructField("bytes", LongType, nullable = false)))

  val metricsSchema: StructType = StructType(Seq(
    StructField("epoch", LongType, nullable = false),
    StructField("applied", BooleanType, nullable = false),
    StructField("events_in", LongType, nullable = false),
    StructField("rows_applied", LongType, nullable = false),
    StructField("conflicts", LongType, nullable = false),
    StructField("deletes", LongType, nullable = false),
    StructField("lsn_min", LongType, nullable = false),
    StructField("lsn_max", LongType, nullable = false),
    StructField("touched_buckets", IntegerType, nullable = false),
    StructField("wall_ms", LongType, nullable = false)))

  val partitionsSchema: StructType = StructType(Seq(
    StructField("epoch", LongType, nullable = false),
    StructField("bucket", IntegerType, nullable = false),
    StructField("events", LongType, nullable = false),
    StructField("keys", LongType, nullable = false),
    StructField("conflicts", LongType, nullable = false),
    StructField("lsn_min", LongType, nullable = false),
    StructField("lsn_max", LongType, nullable = false)))

  def schemaFor(kind: String): StructType = kind match {
    case "history"    => historySchema
    case "files"      => filesSchema
    case "manifests"  => manifestsSchema
    case "metrics"    => metricsSchema
    case "partitions" => partitionsSchema
  }

  def df(spark: SparkSession, dir: String, kind: String,
      pinVersion: Option[Int]): DataFrame = {
    val lake = LakeTable.load(spark, dir)
    def snap = pinVersion.map(lake.snapshot).getOrElse(lake.currentSnapshot)
    // $changes is the one DATA-sized metadata view: a DISTRIBUTED
    // changelog plan (Iceberg-style incremental read), not a driver-built
    // local relation. `VERSION AS OF n` pins the `to` side; the `from`
    // side comes from the graft.changes.from conf (default: to - 1, the
    // last commit's delta).
    if (kind == "changes") {
      val to = pinVersion.getOrElse(lake.currentVersion)
      // default from = to - 1 (last commit's delta), floored at -1 so the
      // FIRST commit's delta is the observable initial changelog instead
      // of a silently-empty from==to range (round-3 advice)
      val from = spark.conf.getOption("graft.changes.from").map(_.toInt)
        .getOrElse(math.max(-1, to - 1))
      return lake.changesBetween(from, to)
    }
    // $cdf: the changelog WITH before images (update_preimage /
    // update_postimage / delete-with-payload) — same pin + conf range
    // contract as $changes, distributed plan like it
    if (kind == "cdf") {
      val to = pinVersion.getOrElse(lake.currentVersion)
      val from = spark.conf.getOption("graft.changes.from").map(_.toInt)
        .getOrElse(math.max(-1, to - 1))
      return lake.changesBetweenCdf(from, to)
    }
    val rows: Seq[Row] = kind match {
      case "history" =>
        lake.existingVersions.map(lake.snapshot).map { s =>
          def l(k: String): java.lang.Long =
            s.summary.get(k).map(v => java.lang.Long.valueOf(v.toLong)).orNull
          Row(s.version, s.schemaId, s.numBuckets, s.fileCount, s.totalBytes,
            l("batch-epoch"), l("rows-applied"), l("conflict-count"),
            l("source-lsn-min"), l("source-lsn-max"), s.summary)
        }
      case "files" =>
        snap.files.map(f => Row(f.path, f.bucket, f.rows, f.bytes, f.schemaId,
          f.tsMin.map(Long.box).orNull, f.tsMax.map(Long.box).orNull,
          f.delta))
      case "manifests" =>
        snap.manifests.map(m => Row(m.path, m.group, m.numFiles, m.rows, m.bytes))
      case "metrics" =>
        Metrics.read(dir).map(s => Row(s.epoch, s.applied, s.eventsIn,
          s.rowsApplied, s.conflicts, s.deletes, s.lsnMin, s.lsnMax,
          s.touchedBuckets, s.wallMs))
      case "partitions" =>
        Metrics.readPartitionLineage(dir).map { case (e, p) =>
          Row(e, p.bucket, p.events, p.keys, p.conflicts, p.lsnMin, p.lsnMax)
        }
    }
    spark.createDataFrame(rows.asJava, schemaFor(kind))
  }
}

/** DSv2 handle for a metadata table; reads are lowered by [[GraftSqlRule]]
  * to a driver-built local relation. `pinVersion` supports
  * `graft.`t$files` VERSION AS OF n` (history/metrics ignore the pin —
  * they are whole-chain views).
  */
final case class GraftMetaTable(dir: String, kind: String,
    pinVersion: Option[Int] = None) extends Table {
  override def name(): String = s"$dir$$$kind"
  override def schema(): StructType =
    if (kind == "changes" || kind == "cdf") {
      // changelog rows carry the TABLE's schema (+ _lsn/_op for $changes;
      // $cdf swaps _op for _change_type/_commit_version), pinned to the
      // `to` snapshot's registry version
      val lake = LakeTable.load(SparkSession.active, dir)
      val base = lake.schemaFor(pinVersion.map(lake.snapshot(_).schemaId)
        .getOrElse(lake.currentSnapshot.schemaId))
      if (kind == "changes") base
      else StructType(
        base.fields.filterNot(_.name == graft.core.Schemas.OpCol)
          :+ StructField("_change_type", StringType, nullable = false)
          :+ StructField("_commit_version", IntegerType, nullable = false))
    } else GraftMetaTables.schemaFor(kind)
  override def capabilities(): util.Set[TableCapability] =
    util.Collections.emptySet()
  override def properties(): util.Map[String, String] =
    util.Collections.emptyMap()
}
