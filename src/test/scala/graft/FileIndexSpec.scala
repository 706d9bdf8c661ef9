package graft

import graft.cdc.Merge
import graft.lake.{DataFile, GraftFileIndex, LakeTable}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** The manifest-backed scan planner: zero-listing FileStatus service,
  * url key-bucket pruning, and warc_ts zone maps — file skipping BEFORE
  * splits exist, the 100-TB point-lookup / time-range read path.
  */
class FileIndexSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  // --- unit level: pruning decisions over synthetic stats ---------------

  private val nb = 8
  private def df(b: Int, lo: Long, hi: Long) =
    DataFile(s"/x/f$b-$lo.parquet", b, 10, 100, 3, Some(lo), Some(hi))
  private val urlAttr = AttributeReference("url", StringType)()
  private val tsAttr = AttributeReference("warc_ts", TimestampType)()
  private def lit(s: String) = Literal(UTF8String.fromString(s), StringType)
  private def tsLit(us: Long) = Literal(us, TimestampType)

  private def kept(files: Seq[DataFile], filters: Expression*): Seq[DataFile] = {
    val idx = new GraftFileIndex(files, nb)
    val pd = idx.listFiles(Nil, filters.toSeq)
    val paths = pd.flatMap(_.files).map(_.getPath.toUri.getPath).toSet
    files.filter(f => paths.contains(f.path))
  }

  test("url equality keeps exactly the key's hash bucket (matches Merge.bucketOf)") {
    val files = (0 until nb).map(b => df(b, 0L, 1000L))
    val urls = Seq("https://a.com/1", "https://b.org/x", "https://c.net/?q=1")
    for (u <- urls) {
      // the engine's own bucket assignment is the oracle
      val want = spark.range(1).select(
        Merge.bucketOf(org.apache.spark.sql.functions.lit(u), nb)).head().getInt(0)
      val k = kept(files, EqualTo(urlAttr, lit(u)))
      assert(k.map(_.bucket) == Seq(want), s"url=$u")
      // literal-first and IN forms prune identically
      assert(kept(files, EqualTo(lit(u), urlAttr)).map(_.bucket) == Seq(want))
      assert(kept(files, In(urlAttr, Seq(lit(u)))).map(_.bucket) == Seq(want))
    }
    // IN over two urls keeps the union of their buckets
    val b0 = kept(files, EqualTo(urlAttr, lit(urls(0)))).head.bucket
    val b1 = kept(files, EqualTo(urlAttr, lit(urls(1)))).head.bucket
    assert(kept(files, In(urlAttr, Seq(lit(urls(0)), lit(urls(1)))))
      .map(_.bucket).toSet == Set(b0, b1))
  }

  test("warc_ts zone maps prune disjoint ranges, keep overlap and stat-less files") {
    val files = Seq(df(0, 0L, 100L), df(1, 200L, 300L),
      DataFile("/x/nostats.parquet", 2, 10, 100, 3)) // legacy: no stats
    def paths(k: Seq[DataFile]) = k.map(_.path).toSet
    // > 150: file0 disjoint, file1 overlaps, stat-less kept
    assert(paths(kept(files, GreaterThan(tsAttr, tsLit(150L))))
      == Set("/x/f1-200.parquet", "/x/nostats.parquet"))
    // <= 100: file1 disjoint
    assert(paths(kept(files, LessThanOrEqual(tsAttr, tsLit(100L))))
      == Set("/x/f0-0.parquet", "/x/nostats.parquet"))
    // equality inside a gap prunes both stat-ful files
    assert(paths(kept(files, EqualTo(tsAttr, tsLit(150L))))
      == Set("/x/nostats.parquet"))
    // boundary inclusivity: >= max keeps the file ending there
    assert(paths(kept(files, GreaterThanOrEqual(tsAttr, tsLit(300L))))
      == Set("/x/f1-200.parquet", "/x/nostats.parquet"))
    // literal-first mirror: 150 < ts === ts > 150
    assert(paths(kept(files, LessThan(tsLit(150L), tsAttr)))
      == Set("/x/f1-200.parquet", "/x/nostats.parquet"))
    // conjunction narrows, disjunction widens
    assert(paths(kept(files,
      And(GreaterThan(tsAttr, tsLit(150L)), LessThan(tsAttr, tsLit(180L)))))
      == Set("/x/nostats.parquet"))
    assert(paths(kept(files,
      Or(LessThan(tsAttr, tsLit(50L)), GreaterThan(tsAttr, tsLit(250L)))))
      == Set("/x/f0-0.parquet", "/x/f1-200.parquet", "/x/nostats.parquet"))
    // unknown predicate shapes never prune
    assert(kept(files, IsNotNull(tsAttr)).size == 3)
  }

  // --- integration: pushdown reaches listFiles through real queries -----

  private def scannedFiles(q: DataFrame): Long = {
    q.collect()
    def unwrap(p: SparkPlan): Long = p match {
      case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
      case other => other.collectWithSubqueries {
        case s: FileSourceScanExec => s.metrics("numFiles").value
      }.sum
    }
    unwrap(q.queryExecution.executedPlan)
  }

  test("point lookup reads one bucket's file; ts range prunes via harvested stats") {
    val dir = TestSpark.tempDir("fidx")
    val t = LakeTable.create(spark, dir, schemaId = 3, numBuckets = 8)
    // 64 keys spread over the 8 buckets, ts strictly increasing
    val batch = spark.range(64).select(
      col("id").as("lsn"), org.apache.spark.sql.functions.lit("U").as("op"),
      concat(org.apache.spark.sql.functions.lit("https://site"), col("id"),
        org.apache.spark.sql.functions.lit(".com/")).as("url"),
      timestamp_micros(col("id") * 1000000L).as("warc_ts"),
      org.apache.spark.sql.functions.lit(null).cast("binary").as("html"),
      concat(org.apache.spark.sql.functions.lit("text "), col("id")).as("text"),
      org.apache.spark.sql.functions.lit("en").as("lang"),
      org.apache.spark.sql.functions.lit(6L).as("content_len"))
    Merge.applyBatch(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      t, batch, epoch = 0L, batchSchemaVersion = 3)

    val snap = t.currentSnapshot
    val all = snap.files
    assert(all.size > 1, "need multiple files for pruning to be observable")
    // the commit's footer pass harvested a zone map for every file
    assert(all.forall(f => f.tsMin.isDefined && f.tsMax.isDefined))
    assert(all.map(_.tsMin.get).min == 0L
      && all.map(_.tsMax.get).max == 63L * 1000000L)

    val full = scannedFiles(t.readUser())
    assert(full == all.size.toLong)

    // url point lookup: exactly the key's bucket is scanned
    val look = t.readUser().filter(col("url") === "https://site17.com/")
    assert(look.select("text").head().getString(0) == "text 17")
    val b17 = spark.range(1)
      .select(Merge.bucketOf(org.apache.spark.sql.functions.lit("https://site17.com/"), 8))
      .head().getInt(0)
    assert(scannedFiles(
      t.readUser().filter(col("url") === "https://site17.com/"))
      == all.count(_.bucket == b17).toLong)

    // ts predicate beyond the data's range: zero files become splits
    assert(scannedFiles(t.readUser()
      .filter(col("warc_ts") > timestamp_micros(org.apache.spark.sql.functions.lit(64L * 1000000L)))) == 0L)
    // in-range ts predicate still answers correctly
    assert(t.readUser()
      .filter(col("warc_ts") >= timestamp_micros(org.apache.spark.sql.functions.lit(60L * 1000000L)))
      .count() == 4L)
  }
}
