package graft

import graft.cdc.Merge
import graft.core.ChangeGen
import graft.lake.{LakeTable, Maintenance}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.plans.PruneArgmaxStruct]]: narrow reads over an UNCOMPACTED
  * merge-on-read table must not decode the payload columns they never
  * ask for. The layered buckets route through resolveLatest's
  * max(struct(warc_ts, _lsn, payload…)) — without the rule, any query
  * over them reads `html` (the dominant bytes) because Catalyst cannot
  * prune inside an aggregate's struct. The rule prunes the struct to the
  * order prefix + the fields actually extracted, and ColumnPruning then
  * narrows the parquet ReadSchema. Every case checks BOTH the plan (no
  * html/text in any scan) and the result (equal to the CoW twin).
  */
class PruneArgmaxSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def log(n: Long = 3000): DataFrame =
    ChangeGen.events(spark, ChangeGen.Config(nEvents = n, nDomains = 20,
      pagesPerDomain = 10, v1Frac = 0.0, v2Frac = 0.0))

  /** mor table + CoW twin, two epochs each so every touched bucket holds
    * base + delta layers (the resolve path engages).
    */
  private def twins(prefix: String): (LakeTable, LakeTable) = {
    val ev = log().cache()
    val mor = LakeTable.create(spark, TestSpark.tempDir(prefix),
      schemaId = 3, numBuckets = 8)
    mor.updateProperties(Map("write-mode" -> "mor"))
    val cow = LakeTable.create(spark, TestSpark.tempDir(s"$prefix-twin"),
      schemaId = 3, numBuckets = 8)
    Seq(mor, cow).foreach { t =>
      Merge.applyBatch(spark, t, ev.filter(col("lsn") % 2 === 0), 1L, 3)
      Merge.applyBatch(spark, t, ev.filter(col("lsn") % 2 === 1), 2L, 3)
    }
    ev.unpersist()
    assert(mor.currentSnapshot.files.exists(_.delta),
      "fixture must leave delta layers or the resolve path is not exercised")
    (mor, cow)
  }

  /** The whole physical plan (incl. every scan's ReadSchema) as text. */
  private def planText(df: DataFrame): String = {
    df.collect() // AQE: finalize before inspecting
    df.queryExecution.executedPlan.toString
  }

  test("narrow projection over layered buckets prunes html/text out of " +
      "the resolve scan, plans ZERO exchanges, and matches the CoW twin") {
    val (mor, cow) = twins("prune-narrow")
    val narrow = mor.readUser().select("url", "lang")
    val plan = planText(narrow)
    assert(!plan.contains("html") && !plan.contains("text"),
      s"narrow read still touches payload columns:\n$plan")
    // round-6 default: the layered resolve is the bucket-LOCAL task scan
    // — in-task argmax, no groupBy(url) hash-agg, and therefore no
    // exchange anywhere in the read (the data is already co-located by
    // the lake's url-hash bucketing)
    assert(plan.contains("GraftBucketScan"),
      s"layered read did not route through the bucket-local scan:\n$plan")
    assert(!plan.contains("Exchange"),
      s"full-table MoR read must plan no exchange below the resolve:\n$plan")
    def rows(t: LakeTable) = t.readUser().select("url", "lang")
      .collect().map(_.toString).toSet
    assert(rows(mor) == rows(cow))
  }

  test("agg-path escape hatch (graft.mor.resolve=agg): PruneArgmaxStruct " +
      "prunes the resolve struct, keeps the order prefix, matches the twin") {
    val (mor, cow) = twins("prune-narrow-agg")
    spark.conf.set("graft.mor.resolve", "agg")
    try {
      val narrow = mor.readUser().select("url", "lang")
      val plan = planText(narrow)
      assert(!plan.contains("html") && !plan.contains("text"),
        s"narrow agg-path read still touches payload columns:\n$plan")
      // the order prefix must survive the pruning (it decides the argmax)
      assert(plan.contains("warc_ts") && plan.contains("_lsn"),
        s"order prefix pruned out of the resolve:\n$plan")
      def rows(t: LakeTable) = t.readUser().select("url", "lang")
        .collect().map(_.toString).toSet
      assert(rows(mor) == rows(cow))
    } finally spark.conf.unset("graft.mor.resolve")
  }

  test("bucket-local and agg resolves agree row-for-row on the full width") {
    val (mor, _) = twins("prune-ab")
    def all(t: LakeTable) = t.readUser()
      .withColumn("html", md5(col("html")))
      .collect().map(_.toString).toSet
    val local = all(mor)
    spark.conf.set("graft.mor.resolve", "agg")
    val agg = try all(mor) finally spark.conf.unset("graft.mor.resolve")
    assert(local == agg)
  }

  test("count over a layered table reads no payload at all") {
    val (mor, cow) = twins("prune-count")
    val cnt = mor.readUser()
    val n = cnt.count()
    assert(n == cow.readUser().count())
    val plan = cnt.groupBy().count().queryExecution.executedPlan.toString
    assert(!plan.contains("html") && !plan.contains("text"),
      s"count still decodes payload:\n$plan")
  }

  test("a Window over a narrow projection still prunes payload on the " +
      "default bucket-local path (scan-level pruning covers every " +
      "consumer shape)") {
    // r5 verdict #5: an intervening operator Catalyst does not collapse
    // into Project/Filter-over-Aggregate must not silently decode html.
    // The default read path prunes at the SCAN (DSv2 column pushdown),
    // so the consumer shape above is irrelevant by construction.
    import org.apache.spark.sql.expressions.Window
    val (mor, cow) = twins("prune-window")
    def windowed(t: LakeTable) = t.readUser().select("url", "lang")
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        Window.partitionBy("lang").orderBy("url")))
    val plan = planText(windowed(mor))
    assert(!plan.contains("html") && !plan.contains("text"),
      s"windowed narrow read decodes payload on the default path:\n$plan")
    assert(plan.contains("GraftBucketScan"),
      s"layered read did not route through the bucket-local scan:\n$plan")
    def rows(t: LakeTable) = windowed(t).collect().map(_.toString).toSet
    assert(rows(mor) == rows(cow))
  }

  test("full-width read keeps every payload field and stays " +
      "byte-identical to the CoW twin") {
    val (mor, cow) = twins("prune-full")
    def all(t: LakeTable) = t.readUser()
      .withColumn("html", md5(col("html")))
      .collect().map(_.toString).toSet
    assert(all(mor) == all(cow))
    val plan = planText(mor.readUser())
    assert(plan.contains("html"), "full read must still scan html")
  }

  test("pruned narrow read across a mid-stack schema evolution (v2 INT " +
      "bases under v3 LONG deltas) stays correct and payload-free") {
    def build(prefix: String): LakeTable = {
      val t = LakeTable.create(spark, TestSpark.tempDir(prefix),
        schemaId = 2, numBuckets = 8)
      t.updateProperties(Map("write-mode" -> "mor"))
      val all = ChangeGen.events(spark, ChangeGen.Config(nEvents = 800,
        nDomains = 10, pagesPerDomain = 8, v1Frac = 0.0, v2Frac = 0.0))
      val b1 = ChangeGen.projectToVersion(all.filter(col("lsn") < 600), 2)
      Merge.applyBatch(spark, t, b1, 1L, batchSchemaVersion = 2)
      Merge.applyBatch(spark, t, all.filter(col("lsn") >= 600), 2L,
        batchSchemaVersion = 3)
      t
    }
    val mor = build("prune-evo")
    assert(mor.currentSnapshot.schemaId == 3 &&
      mor.currentSnapshot.files.exists(_.delta))
    // content_len survives the prune (it is asked for, and v2 files cast
    // INT→LONG below the resolve agg); html/text go
    val narrow = mor.readUser().select("url", "content_len")
    val plan = planText(narrow)
    assert(!plan.contains("html") && !plan.contains("text"),
      s"evolved narrow read still touches payload:\n$plan")
    val cow = build("prune-evo-cow")
    cow.updateProperties(Map("write-mode" -> "cow")) // no-op: built mor…
    Maintenance.compact(spark, cow) // …then folded — a resolved twin
    def rows(t: LakeTable) = t.readUser().select("url", "content_len")
      .collect().map(_.toString).toSet
    assert(rows(mor) == rows(cow))
  }

  test("mixed plain + layered buckets (a Union of both branches) prune " +
      "on the layered side and stay correct") {
    val ev = log().cache()
    val mor = LakeTable.create(spark, TestSpark.tempDir("prune-mix"),
      schemaId = 3, numBuckets = 32)
    mor.updateProperties(Map("write-mode" -> "mor"))
    val cow = LakeTable.create(spark, TestSpark.tempDir("prune-mix-twin"),
      schemaId = 3, numBuckets = 32)
    Seq(mor, cow).foreach { t =>
      Merge.applyBatch(spark, t, ev, 1L, 3)
      // a tiny second batch touches FEW of the 32 buckets: the rest stay
      // single-file (plain branch), the touched ones layer (resolve branch)
      Merge.applyBatch(spark, t, ev.filter(col("lsn") < 40), 2L, 3)
    }
    ev.unpersist()
    val layered = mor.currentSnapshot.files.groupBy(_.bucket)
      .count { case (_, fs) => fs.size >= 2 && fs.exists(_.delta) }
    assert(layered > 0 && layered < 32,
      s"fixture must leave a MIX of plain and layered buckets, got $layered/32")
    val narrow = mor.readUser().select("url", "lang")
    val plan = planText(narrow)
    assert(!plan.contains("html") && !plan.contains("text"),
      s"mixed-shape narrow read still touches payload:\n$plan")
    def rows(t: LakeTable) = t.readUser().select("url", "lang")
      .collect().map(_.toString).toSet
    assert(rows(mor) == rows(cow))
  }

  test("a filter on a pruned-away column keeps that column (filter " +
      "condition counts as a consumer)") {
    val (mor, cow) = twins("prune-filter")
    val q = mor.readUser().filter(length(col("text")) > 0).select("url")
    val plan = planText(q)
    assert(!plan.contains("html"), s"html not needed by filter or select:\n$plan")
    def rows(t: LakeTable) = t.readUser()
      .filter(length(col("text")) > 0).select("url")
      .collect().map(_.toString).toSet
    assert(rows(mor) == rows(cow))
  }
}
