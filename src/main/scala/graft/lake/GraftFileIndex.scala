package graft.lake

import org.apache.hadoop.fs.{FileStatus, Path => HPath}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.{StringType, StructType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

/** Manifest-backed `FileIndex` over a snapshot's [[DataFile]]s — the lake's
  * scan planner (SURVEY.md §4.2 read path, hardened for 100 TB).
  *
  * Two scale problems with handing Spark a raw path list
  * (`spark.read.parquet(paths: _*)`):
  *
  *  1. '''O(files) driver listing''': `InMemoryFileIndex` re-stats every
  *     path at plan time — at 10^5 files on an object store that is 10^5
  *     driver round trips per query, for sizes the manifests already
  *     recorded at commit. This index serves `FileStatus` straight from
  *     manifest metadata: ZERO filesystem calls to plan a scan.
  *  2. '''No file skipping''': Spark's parquet reader prunes row groups
  *     per task, but every file still becomes a split. `listFiles` gets
  *     the pushed data filters, so pruning happens before splits exist:
  *     - '''key-bucket pruning''': `url = 'x'` / `url IN (…)` keep only
  *       the named keys' hash buckets — a point lookup reads
  *       1/numBuckets of the table (the layout the MERGE maintains,
  *       [[graft.cdc.Merge.bucketOf]]);
  *     - '''zone maps''': `warc_ts` range predicates drop files whose
  *       footer-recorded [min, max] (captured during the commit's
  *       existing footer pass, [[DataFile.tsMin]]/[[DataFile.tsMax]]) is
  *       disjoint — the natural prune axis of a time-versioned CDC table.
  *
  * Pruning is CONSERVATIVE: a file is dropped only when a pushed filter
  * provably excludes every row (missing stats ⇒ kept — legacy INT96
  * files carry no usable ts stats). Correctness never depends on it;
  * the same predicates still run on the surviving rows.
  */
final class GraftFileIndex(files: Seq[DataFile], numBuckets: Int)
    extends FileIndex {

  // explain's "Location" line; first file's directory stands in for the
  // commit-dir forest (purely informational — reads use listFiles)
  override def rootPaths: Seq[HPath] =
    files.headOption.map(f => new HPath(f.path).getParent).toSeq

  override def partitionSchema: StructType = StructType(Nil)

  override def sizeInBytes: Long = files.map(_.bytes).sum

  override def inputFiles: Array[String] = files.map(_.path).toArray

  override def refresh(): Unit = ()

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val kept = files.filter(f => dataFilters.forall(mayMatch(f, _)))
    Seq(PartitionDirectory(InternalRow.empty, kept.map(status).toArray))
  }

  private def status(f: DataFile): FileStatus = {
    // block size / mtime are immaterial (split sizing uses
    // maxPartitionBytes; nothing caches by mtime here); LENGTH must be
    // real — the reader seeks the footer at [length-8, length). Engine
    // write paths always record real sizes; legacy manifests predating
    // the bytes field deserialize as 0 and fall back to one stat call.
    val len = if (f.bytes > 0) f.bytes
      else java.nio.file.Files.size(java.nio.file.Paths.get(f.path))
    new FileStatus(len, false, 1, 128L * 1024 * 1024, 0L,
      new HPath(new java.io.File(f.path).toURI))
  }

  /** False only when `e` provably excludes every row of `f`. */
  private def mayMatch(f: DataFile, e: Expression): Boolean = e match {
    case And(l, r) => mayMatch(f, l) && mayMatch(f, r)
    case Or(l, r) => mayMatch(f, l) || mayMatch(f, r)
    // --- key-bucket pruning on url ---
    case EqualTo(a: AttributeReference, Literal(v: UTF8String, StringType))
      if isUrl(a) => bucketOf(v) == f.bucket
    case EqualTo(Literal(v: UTF8String, StringType), a: AttributeReference)
      if isUrl(a) => bucketOf(v) == f.bucket
    case In(a: AttributeReference, vs) if isUrl(a) &&
        vs.forall(_.isInstanceOf[Literal]) =>
      vs.exists {
        case Literal(v: UTF8String, StringType) => bucketOf(v) == f.bucket
        case Literal(null, _) => false // = NULL matches nothing
        case _ => true                 // non-string literal: keep
      }
    case InSet(a: AttributeReference, vs) if isUrl(a) =>
      vs.exists {
        case v: UTF8String => bucketOf(v) == f.bucket
        case null => false
        case _ => true
      }
    // --- warc_ts zone maps (micros; None ⇒ keep) ---
    case EqualTo(a: AttributeReference, TsLit(v)) if isTs(a) =>
      tsOverlap(f, v, v)
    case EqualTo(TsLit(v), a: AttributeReference) if isTs(a) =>
      tsOverlap(f, v, v)
    case GreaterThan(a: AttributeReference, TsLit(v)) if isTs(a) =>
      f.tsMax.forall(_ > v)
    case GreaterThanOrEqual(a: AttributeReference, TsLit(v)) if isTs(a) =>
      f.tsMax.forall(_ >= v)
    case LessThan(a: AttributeReference, TsLit(v)) if isTs(a) =>
      f.tsMin.forall(_ < v)
    case LessThanOrEqual(a: AttributeReference, TsLit(v)) if isTs(a) =>
      f.tsMin.forall(_ <= v)
    // literal-first comparisons mirror
    case GreaterThan(TsLit(v), a: AttributeReference) if isTs(a) =>
      f.tsMin.forall(_ < v)
    case GreaterThanOrEqual(TsLit(v), a: AttributeReference) if isTs(a) =>
      f.tsMin.forall(_ <= v)
    case LessThan(TsLit(v), a: AttributeReference) if isTs(a) =>
      f.tsMax.forall(_ > v)
    case LessThanOrEqual(TsLit(v), a: AttributeReference) if isTs(a) =>
      f.tsMax.forall(_ >= v)
    case _ => true
  }

  private object TsLit {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: java.lang.Long, TimestampType) => Some(v.longValue)
      case _ => None
    }
  }

  private def isUrl(a: AttributeReference): Boolean =
    a.name == "url" && numBuckets > 0

  private def isTs(a: AttributeReference): Boolean = a.name == "warc_ts"

  private def tsOverlap(f: DataFile, lo: Long, hi: Long): Boolean =
    f.tsMin.forall(_ <= hi) && f.tsMax.forall(_ >= lo)

  /** MUST equal [[graft.cdc.Merge.bucketOf]] (pmod(xxhash64(url), n)) —
    * evaluated on the driver via the same Catalyst expression.
    */
  private def bucketOf(url: UTF8String): Int = {
    val h = XxHash64(Seq(Literal(url, StringType)), 42L) // SQL xxhash64 seed
      .eval(InternalRow.empty).asInstanceOf[Long]
    (((h % numBuckets) + numBuckets) % numBuckets).toInt
  }
}

/** Builds the lake's parquet scan over one schema-group of data files. */
object GraftScan {

  def scan(spark: org.apache.spark.sql.SparkSession, files: Seq[DataFile],
      dataSchema: StructType, numBuckets: Int): DataFrame = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val rel = HadoopFsRelation(
      new GraftFileIndex(files, numBuckets),
      partitionSchema = StructType(Nil),
      dataSchema = dataSchema,
      bucketSpec = None,
      fileFormat = new ParquetFileFormat,
      options = Map.empty)(classic)
    org.apache.spark.sql.graftshim.Bridge.ofRows(classic,
      LogicalRelation(rel, isStreaming = false))
  }
}
