package graft.cdc

import graft.lake.BucketChangeTask
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
import org.apache.spark.sql.connector.catalog.{
  SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{
  Batch, InputPartition, PartitionReaderFactory, Scan, ScanBuilder,
  Statistics, SupportsPushDownFilters, SupportsPushDownRequiredColumns,
  SupportsReportStatistics}
import org.apache.spark.sql.sources.{
  DataSourceRegister, EqualTo, Filter, In}
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import java.util.OptionalLong

/** BATCH twin of the streaming changelog scan (round-6 optimization,
  * round-5 verdict #1/#2): the bucket-local, shuffle-free task form —
  * one [[InputPartition]] per bucket carrying that bucket's after-side
  * (and optionally before-side) files, resolved/diffed in-task by
  * [[ChangelogPartitionReader]] exactly like the streaming source.
  *
  * Three batch paths converge on it:
  *  - '''merge-on-read resolve reads''' ([[graft.lake.LakeTable]]
  *    readFiles): a layered bucket's latest-wins argmax runs in one
  *    bucket-local hash map instead of a `groupBy(url)` hash-agg — the
  *    resolve EXCHANGE over the layered rows is gone (the data is
  *    already co-located by the lake's url-hash bucketing; only Catalyst
  *    couldn't see it). Tasks have no before side.
  *  - '''batch `changesBetween`''': the (url, _lsn) anti-join and its
  *    two exchanges collapse into the per-bucket key probe the
  *    streaming diff always used.
  *  - '''batch `changesBetweenCdf`''': same, with the transition legs
  *    generated in-task (the former plan paid an anti-join + outer join
  *    + explode).
  *
  * Column pruning happens at the SCAN (SupportsPushDownRequiredColumns →
  * the reader's parquet projection), so a narrow read over layered
  * buckets never decodes `html` regardless of what operators sit above
  * — strictly wider coverage than the PruneArgmaxStruct rule the agg
  * path needs (which fires only on Project/Filter-over-Aggregate
  * shapes). `url` point-lookup filters prune whole bucket tasks
  * driver-side (the task-form analog of [[graft.lake.GraftFileIndex]]
  * key-bucket pruning); `warc_ts` zone pruning is deliberately NOT
  * applied — dropping a layer by time could resurrect a superseded row,
  * the same refusal the agg path enforces.
  *
  * Plumbing: the task list cannot ride a DSv2 string-options map, so
  * [[BucketBatchScan.dataFrame]] parks it in a driver-side registry
  * under a one-shot handle and the provider resolves the handle. Handles
  * live for the session (a few hundred bytes each — file PATHS, not
  * data); re-planning a cached DataFrame re-reads the same handle.
  */
object BucketBatchScan {

  final case class Spec(tasks: Seq[BucketChangeTask], schema: StructType,
      cdf: Boolean, commitVersion: Int, numBuckets: Int)

  private val specs =
    new java.util.concurrent.ConcurrentHashMap[String, Spec]()

  private[cdc] def spec(handle: String): Spec = {
    val s = specs.get(handle)
    require(s != null, s"graft-bucket-scan: unknown handle $handle " +
      "(BucketBatchScan frames are session-local; rebuild the DataFrame)")
    s
  }

  def dataFrame(spark: SparkSession, tasks: Seq[BucketChangeTask],
      schema: StructType, cdf: Boolean, commitVersion: Int,
      numBuckets: Int): DataFrame = {
    val handle = java.util.UUID.randomUUID().toString
    // nullability matches what the former plans produced (r5 output
    // parity): non-cdf, the group key `url` is non-null and every
    // resolved payload column came out of a max(struct(...)) extraction
    // as nullable; the old CDF plan routed even `url` through a struct
    // explode (nullable); the generated `_commit_version` is non-null.
    val declared = StructType(schema.fields.map {
      case f if f.name == "url" && !cdf => f.copy(nullable = false)
      case f if f.name == "_commit_version" => f
      case f => f.copy(nullable = true)
    })
    specs.put(handle,
      Spec(tasks, declared, cdf, commitVersion, numBuckets))
    spark.read.format("graft-bucket-scan").option("handle", handle).load()
  }

  /** Driver-side twin of [[Merge.bucketOf]] for literal pruning —
    * evaluated via the same Catalyst xxhash64 expression (seed 42).
    */
  private[cdc] def bucketOfLiteral(url: UTF8String, n: Int): Int = {
    val h = XxHash64(Seq(Literal(url, StringType)), 42L)
      .eval(InternalRow.empty).asInstanceOf[Long]
    (((h % n) + n) % n).toInt
  }
}

final class BucketBatchProvider extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-bucket-scan"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BucketBatchScan.spec(options.get("handle")).schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new BucketBatchTable(
      BucketBatchScan.spec(
        new CaseInsensitiveStringMap(properties).get("handle")))
}

private[cdc] final class BucketBatchTable(spec: BucketBatchScan.Spec)
    extends Table with SupportsRead {

  override def name(): String =
    s"graft-bucket-scan[${if (spec.cdf) "cdf" else "delta"}," +
      s"buckets=${spec.tasks.size}]"

  override def schema(): StructType = spec.schema

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new BucketScanBuilder(spec)
}

private[cdc] final class BucketScanBuilder(spec: BucketBatchScan.Spec)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {

  private var required: StructType = spec.schema
  private var tasks: Seq[BucketChangeTask] = spec.tasks
  private var pruning: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** `url` point-lookups prune whole bucket TASKS (driver-side, before
    * any split exists). Every filter is returned as residual — rows are
    * still re-checked above the scan, so pruning can only drop buckets
    * that provably contain no matching url. `warc_ts` zone maps are
    * deliberately not consulted (see class doc).
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val n = spec.numBuckets
    def bucketsOf(f: Filter): Option[Set[Int]] = f match {
      case EqualTo("url", v: String) if n > 0 =>
        Some(Set(BucketBatchScan.bucketOfLiteral(UTF8String.fromString(v), n)))
      case In("url", vs) if n > 0 && vs.forall(_.isInstanceOf[String]) =>
        Some(vs.map(v => BucketBatchScan.bucketOfLiteral(
          UTF8String.fromString(v.asInstanceOf[String]), n)).toSet)
      case _ => None
    }
    val prunable = filters.flatMap(f => bucketsOf(f).map(f -> _))
    if (prunable.nonEmpty) {
      val keep = prunable.map(_._2).reduce(_ intersect _)
      tasks = tasks.filter(t => keep.contains(t.bucket))
      pruning = prunable.map(_._1)
    }
    filters // all residual: pruning is file skipping, not row filtering
  }

  override def pushedFilters(): Array[Filter] = pruning

  override def build(): Scan = new BucketScan(spec, tasks, required)
}

private[cdc] final class BucketScan(spec: BucketBatchScan.Spec,
    tasks: Seq[BucketChangeTask], required: StructType)
    extends Scan with Batch with SupportsReportStatistics {

  override def readSchema(): StructType = required

  override def description(): String =
    s"GraftBucketScan(${if (spec.cdf) "cdf" else "delta"}, " +
      s"buckets=${tasks.size}, columns=[${required.fieldNames.mkString(",")}])"

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    tasks.map(t => ChangelogPartition(t.bucket, t.after, t.before,
      spec.commitVersion): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new ChangelogReaderFactory(required.json, spec.cdf,
      ParquetRowCodec.hadoopConfDelta(SparkSession.active))

  /** Upper-bound stats from the task file metadata (no IO): after-side
    * bytes/rows. Resolution/diff only shrinks them — safe for broadcast
    * decisions above.
    */
  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): OptionalLong =
      OptionalLong.of(tasks.flatMap(_.after).map(_.bytes).sum)
    override def numRows(): OptionalLong =
      OptionalLong.of(tasks.flatMap(_.after).map(_.rows).sum)
  }
}
