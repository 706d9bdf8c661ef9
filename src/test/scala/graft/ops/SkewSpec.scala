package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The scale claim in SimilarityQueries' header — "the per-bucket join
  * keys are exact-match strings, so AQE skew-join handles hot buckets" —
  * exercised instead of asserted (round-3 verdict #7): one hot LSH band
  * bucket whose self-join emits ≥10^5 candidate pairs (the quadratic
  * bucket term that appears when boilerplate text collapses many docs
  * into one band) must complete through the real pipeline, produce
  * exactly the expected pairs, and plan as an AQE skew-split join rather
  * than one straggler partition.
  */
class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("one hot LSH band bucket (~10^5 in-bucket pairs) completes with " +
    "AQE skew-split, exact results") {
    import spark.implicits._
    val hot = 450 // C(450,2) = 101,025 pairs from ONE band bucket
    val hotText = "the quick brown fox jumps over the lazy dog again and " +
      "again every single day"
    val docs = ((0 until hot).map(i => (i.toLong, hotText)) ++
      (0 until 200).map(i => ((1000 + i).toLong,
        s"unique doc $i with tokens u${i}a u${i}b u${i}c u${i}d u${i}e")))
      .toDF("doc_id", "text")
      .repartition(8) // spread the hot copies across input partitions

    val skewConfs = Map(
      // force the skew machinery to engage at test scale: tiny skew
      // threshold, no broadcast escape (the bands frame is small here,
      // but at 10^9 docs it is not — SMJ is the at-scale plan)
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "4096",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2048",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = skewConfs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    skewConfs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val shingles = SimilarityQueries.docShingles(spark,
        "/root/testdata/sf0.001", _ => docs)
      val bands = SimilarityQueries.minhashBandsFrom(shingles).persist()
      try {
        // the real pipeline end to end: completes and is exact — every
        // hot pair present exactly once, no cross/unique-doc pairs
        val pairs = SimilarityQueries.lshCandidatePairsFrom(bands)
        val n = pairs.count()
        assert(n == hot.toLong * (hot - 1) / 2, s"got $n pairs")
        assert(pairs.filter(col("doc_a") >= 1000 || col("doc_b") >= 1000)
          .count() == 0)

        // plan shape: the same in-bucket self-join the pipeline runs
        // (lshCandidatePairsFrom checkpoints its result, so the executed
        // join plan is inspected on an identically-shaped frame)
        val joined = bands.as("a").join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .distinct()
        // collect() executes THIS QueryExecution, so the adaptive final
        // plan (with its skew marks) is inspectable afterwards
        assert(joined.collect().length == hot * (hot - 1) / 2)
        val plan = joined.queryExecution.executedPlan.toString
        assert(plan.contains("skew=true"),
          s"hot band bucket did not take the AQE skew-split path:\n$plan")
      } finally bands.unpersist()
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
