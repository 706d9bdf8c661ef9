package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Recall knobs of the approximate similarity operators (round-2 verdict
  * #4): the single-table / single-cell variants provably MISS pairs the
  * banded / multi-probe plans recover — the delta is asserted, not
  * assumed.
  */
class RecallSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("banded 2-table LSH strictly recovers perturbed near-dups a " +
    "single hyperplane table misses") {
    val base = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("e"))
    val planted = SimilarityQueries.plantPerturbed(base)
    // planted ground truth: (id, id + 1000000) pairs; recovery = the pair
    // survived candidate generation AND the exact cosine >= 0.7 verify
    def recovered(nTables: Int): Set[Long] =
      SimilarityQueries.lshNearDupPairs(planted, nTables)
        .filter(col("id_b") === col("id_a") + 1000000L)
        .select("id_a").as[Long].collect().toSet
    val one = recovered(1)
    val two = recovered(2)
    assert(one.subsetOf(two), "adding a table must never lose a pair")
    assert(two.size > one.size,
      s"2-table recall (${two.size}) must strictly beat single-table (${one.size})")
    // the perturbation leaves real near-dups on the table (sanity: the
    // single-table plan already finds a non-trivial share)
    assert(one.nonEmpty && two.size < 1000)
  }

  test("width knobs cut candidate volume while exact-duplicate recall holds") {
    val spark0 = spark
    // --- MinHash band width: (8 hashes, 4-row bands) vs (16, 8-row) ---
    // plant exact duplicates (identical text => identical signatures at
    // ANY width — their recall must be exactly 100% both settings) on top
    // of the natural corpus, which carries the mid-sim pairs whose
    // candidates the wider bands are supposed to shed
    val nPlant = 40
    val nMid = 100
    val plant: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      df => {
        val exactTwins = df.filter(col("doc_id") < nPlant)
          .select((col("doc_id") + 500000L).as("doc_id"), col("text"))
        // mid-similarity twins (shingle-jaccard ~0.6): the original text
        // plus ~50% unique filler tokens — these are the borderline pairs
        // a 4-row band catches and an 8-row band is supposed to shed
        val toks = split(trim(col("text")), "\\s+")
        val filler = concat_ws(" ",
          transform(sequence(lit(1), greatest((size(toks) / 2).cast("int"), lit(1))),
            i => concat_ws("", lit("zz"), col("doc_id").cast("string"),
              lit("x"), i.cast("string"))))
        val midTwins = df.filter(col("doc_id") < nMid)
          .select((col("doc_id") + 600000L).as("doc_id"),
            concat_ws(" ", col("text"), filler).as("text"))
        df.select(col("doc_id"), col("text"))
          .unionByName(exactTwins).unionByName(midTwins)
      }
    val sh = SimilarityQueries.docShingles(spark0, "/root/testdata/sf0.01", plant)
      .persist()
    try {
      def cand(nHashes: Int, nBands: Int): Set[(Long, Long)] =
        SimilarityQueries.lshCandidatePairsFrom(
          SimilarityQueries.minhashBandsFrom(sh, nHashes, nBands))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val narrow = cand(8, 2)
      val wide = cand(16, 2)
      val plantedPairs = (0L until nPlant).map(i => (i, i + 500000L)).toSet
      assert(plantedPairs.subsetOf(narrow) && plantedPairs.subsetOf(wide),
        "exact-duplicate recall must be 100% at both widths")
      assert(wide.size < narrow.size,
        s"8-row bands must shed candidates: wide=${wide.size} narrow=${narrow.size}")
    } finally sh.unpersist()

    // --- hyperplane count: 8 planes (256 buckets) vs 10 (1024) ---
    import spark0.implicits._
    val base = spark0.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("e"))
    // candidate volume = in-bucket pair count over the perturbed plant
    val perturbed = SimilarityQueries.plantPerturbed(base).persist()
    try {
      def candVolume(nPlanes: Int): Long = {
        val b = perturbed.select(col("vec_id"),
          SimilarityQueries.bucketOf(col("e"), 0, nPlanes).as("bk"))
        b.groupBy("bk").count()
          .agg(sum(expr("`count` * (`count` - 1) DIV 2"))).head().getLong(0)
      }
      val v8 = candVolume(8)
      val v10 = candVolume(10)
      assert(v10 < v8,
        s"1024 buckets must cut in-bucket pair volume: v10=$v10 v8=$v8")
    } finally perturbed.unpersist()
    // exact copies land in identical buckets in every table at every
    // width — recall of exact dups through the FULL verify is 100%
    val exact = base.unionByName(
      base.select((col("vec_id") + 2000000L).as("vec_id"), col("e")))
    def exactRecovered(nPlanes: Int): Long =
      SimilarityQueries.lshNearDupPairs(exact, nTables = 2, nPlanes = nPlanes)
        .filter(col("id_b") === col("id_a") + 2000000L).count()
    val total = base.count()
    assert(exactRecovered(8) == total && exactRecovered(10) == total)
  }

  test("auto-sized widths land within the pair budget with exact-dup " +
    "recall held (round-4 verdict #6)") {
    val spark0 = spark
    import spark0.implicits._
    // --- derivation pins: the formulas reproduce the hand-picked
    // defaults at the sizes they were picked FOR, and saturate sanely ---
    assert(SimilarityQueries.derivedPlanes(1000) == 8,
      "n=1000 at the default budget must re-derive the d6 default")
    assert(SimilarityQueries.derivedPlanes(1000000000L) == 30,
      "plane count clamps at 30 — beyond that partitioned ANN, not wider keys")
    assert(SimilarityQueries.derivedBandGeometry(1000000000L) == (16, 2),
      "band rows cap at the affine-permutation family size")

    // --- a THIRD band setting, derived not hand-picked: the planted
    // sf0.01 corpus (n = 640) prices to (4 hashes, 2 bands) — looser
    // than the (8,2)/(16,2) knob settings because the budget permits it
    // at this cardinality ---
    val nPlant = 40
    val plant: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      df => {
        val toks = split(trim(col("text")), "\\s+")
        val filler = concat_ws(" ",
          transform(sequence(lit(1), greatest((size(toks) / 2).cast("int"), lit(1))),
            i => concat_ws("", lit("zz"), col("doc_id").cast("string"),
              lit("x"), i.cast("string"))))
        df.select(col("doc_id"), col("text"))
          .unionByName(df.filter(col("doc_id") < nPlant)
            .select((col("doc_id") + 500000L).as("doc_id"), col("text")))
          .unionByName(df.filter(col("doc_id") < 100)
            .select((col("doc_id") + 600000L).as("doc_id"),
              concat_ws(" ", col("text"), filler).as("text")))
      }
    val sh = SimilarityQueries.docShingles(spark0, "/root/testdata/sf0.01", plant)
      .persist()
    try {
      val n = sh.count()
      val derived = SimilarityQueries.derivedBandGeometry(n)
      assert(derived._1 != SimilarityQueries.numHashes || derived._2 != SimilarityQueries.numBands,
        s"fixture must price a setting distinct from the default, got $derived")
      val cand = SimilarityQueries.lshCandidatePairsFrom(
        SimilarityQueries.minhashBandsAuto(sh))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val plantedPairs = (0L until nPlant).map(i => (i, i + 500000L)).toSet
      assert(plantedPairs.subsetOf(cand),
        "exact-duplicate recall must be 100% at the derived width")
      assert(cand.size <= 4 * SimilarityQueries.defaultPairBudget,
        s"candidate volume ${cand.size} must stay within ~the pair budget")
    } finally sh.unpersist()

    // --- a THIRD plane setting: a tighter budget (512) prices 11
    // planes on the n = 1000 perturbed plant; volume obeys the budget
    // and exact recall holds through the full verify ---
    val base = spark0.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("e"))
    val perturbed = SimilarityQueries.plantPerturbed(base).persist()
    try {
      val tightBudget = 512L
      val p = SimilarityQueries.derivedPlanes(perturbed.count(), tightBudget)
      assert(p == 11, s"1000 rows at budget 512 must price 11 planes, got $p")
      def candVolume(nPlanes: Int): Long =
        perturbed.select(
            SimilarityQueries.bucketOf(col("e"), 0, nPlanes).as("bk"))
          .groupBy("bk").count()
          .agg(sum(expr("`count` * (`count` - 1) DIV 2"))).head().getLong(0)
      val vDerived = candVolume(p)
      assert(vDerived < candVolume(8),
        "the derived tighter width must shed candidates vs the default")
      assert(vDerived <= 4 * tightBudget,
        s"in-bucket pair volume $vDerived must stay within ~the budget")
    } finally perturbed.unpersist()
    val exact = base.unionByName(
      base.select((col("vec_id") + 2000000L).as("vec_id"), col("e")))
    val recoveredAuto = SimilarityQueries
      .lshNearDupPairsAuto(exact, nTables = 2, pairBudget = 512L)
      .filter(col("id_b") === col("id_a") + 2000000L).count()
    assert(recoveredAuto == base.count(),
      "exact-dup recall through the auto-sized full verify must be 100%")
  }

  test("auto-sized IVF: sqrt-n cell count, broadcast model stays " +
    "sublinear, exhaustive probe equals brute-force cosine exactly") {
    val spark0 = spark
    import spark0.implicits._
    // derivation pins: sqrt(n), floor 4, ceiling 65536 (past 64k cells
    // the flat centroid argmin needs an index, not a bigger knob)
    assert(SimilarityQueries.derivedCells(1000) == 32)
    assert(SimilarityQueries.derivedCells(4) == 4)
    assert(SimilarityQueries.derivedCells(1000000000L) == 31623)
    assert(SimilarityQueries.derivedCells(10000000000L) == 65536)

    val base = spark0.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("e"))
    val n = base.count()
    val cells = SimilarityQueries.derivedCells(n)
    // the scale property the derivation buys: the centroid MODEL is
    // O(sqrt n) — every-50th would make it n/50, linear in the corpus
    val stride = math.max(2L, math.ceil(n.toDouble / cells).toLong)
    val modelSize = base.filter(col("vec_id") % stride === 0).count()
    assert(modelSize <= cells + 1 && modelSize >= cells / 2,
      s"centroid model $modelSize must track the derived cell count $cells")

    // correctness of the auto plumbing: probing EVERY cell is exhaustive
    // search — it must equal brute-force cosine top-k exactly (same
    // rounding, same tie order)
    def dot(a: org.apache.spark.sql.Column,
        b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      graft.functions.DotProduct.dot_product(a, b)
    val qRow = base.filter(col("vec_id") === 0)
      .select(col("e").as("qe"))
    val brute = base.crossJoin(broadcast(qRow))
      .select(col("vec_id"),
        round(dot(col("e"), col("qe")) /
          (sqrt(dot(col("e"), col("e"))) * sqrt(dot(col("qe"), col("qe")))), 4)
          .as("sim"))
      .orderBy(col("sim").desc, col("vec_id")).limit(10)
      .select("vec_id").as[Long].collect().toSeq
    val exhaustive = SimilarityQueries.ivfTopKAuto(base, nProbe = cells, k = 10)
      .select("vec_id").as[Long].collect().toSeq
    assert(exhaustive == brute,
      s"exhaustive-probe IVF must equal brute force: $exhaustive vs $brute")
    // and the normal multi-probe path still self-matches at rank 1
    val top = SimilarityQueries.ivfTopKAuto(base, nProbe = 2, k = 10)
      .select("vec_id").as[Long].collect().toSeq
    assert(top.headOption.contains(0L),
      s"the query vector must be its own nearest neighbor, got $top")
  }

  test("multi-probe IVF recovers a Voronoi-boundary neighbor that " +
    "single-probe misses") {
    // engineered 2-D fixture: the query IS centroid 0 (unit x-axis); its
    // true nearest neighbor (id 7, at 19 deg) sits JUST across the
    // boundary into centroid 50's cell (c50 at 37 deg, midline 18.5 deg);
    // everything else points away (120..180 deg)
    def vec(angleDeg: Double): Seq[Double] = {
      val a = math.toRadians(angleDeg); Seq(math.cos(a), math.sin(a))
    }
    val rows = Seq((0L, vec(0)), (50L, vec(37)), (7L, vec(19))) ++
      (1 to 99).filterNot(i => i == 7 || i == 50)
        .map(i => (i.toLong, vec(120 + (i % 60))))
    val df = rows.toDF("vec_id", "e")
    def topIds(nProbe: Int): Set[Long] =
      SimilarityQueries.ivfTopK(df, nProbe, k = 3)
        .select("vec_id").as[Long].collect().toSet
    val p1 = topIds(1)
    val p2 = topIds(2)
    assert(p1.contains(0L) && !p1.contains(7L),
      s"fixture: single-probe must miss the cross-boundary neighbor, got $p1")
    assert(p2.contains(7L),
      s"2-probe must recover the cross-boundary neighbor, got $p2")
  }
}
