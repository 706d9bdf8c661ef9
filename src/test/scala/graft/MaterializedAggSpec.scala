package graft

import graft.cdc.{ChangeFeed, MaterializedAgg, Merge}
import graft.lake.LakeTable
import org.scalatest.funsuite.AnyFunSuite

/** Incremental materialized aggregate (MaterializedAgg): the CDF consumer
  * maintaining count/sums per group by retraction, exactly-once.
  */
class MaterializedAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val cols = Seq("lsn", "op", "url", "warc_ts", "html", "text",
    "lang", "content_len")
  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private def ev(lsn: Long, op: String, url: String, t: java.sql.Timestamp,
      text: String, lang: String) =
    (lsn, op, url, t, null: Array[Byte], text, lang,
      Option(text).map(_.length.toLong).getOrElse(0L))

  private def recompute(t: LakeTable): Map[Option[String], (Long, Long)] =
    t.readUser().groupBy("lang")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("cnt"),
        org.apache.spark.sql.functions.sum("content_len").as("s"))
      .collect()
      .map(r => Option(r.getString(0)) -> (r.getLong(1), r.getLong(2))).toMap

  private def state(stateDir: String, ck: String): Map[Option[String], (Long, Long)] =
    MaterializedAgg.readState(spark, stateDir, ck).get
      .collect()
      .map(r => Option(r.getString(0)) ->
        (r.getLong(1), r.getLong(2))).toMap

  test("maintained aggregate converges with recompute across churn, " +
    "null groups, and a crash-replayed emission") {
    val dir = TestSpark.tempDir("magg-src")
    val stateDir = TestSpark.tempDir("magg-state")
    val ck = TestSpark.tempDir("magg-ck") + "/agg.v"
    val t = LakeTable.create(spark, dir, schemaId = 3, numBuckets = 4)
    val rnd = new scala.util.Random(11)
    val urls = (0 until 30).map(i => s"http://u$i")
    var lsn = 0L
    def churn(epoch: Long): Unit = {
      val batch = Seq.tabulate(20) { i =>
        lsn += 1
        val url = urls(rnd.nextInt(urls.size))
        if (rnd.nextInt(4) == 0)
          ev(lsn, "D", url, ts(f"2024-01-01 0$epoch:00:${i % 60}%02d"), null, null)
        else {
          // ~1 in 5 rows lands in the NULL group
          val lang = if (rnd.nextInt(5) == 0) null else s"l${rnd.nextInt(3)}"
          ev(lsn, "U", url, ts(f"2024-01-01 0$epoch:00:${i % 60}%02d"),
            s"t$lsn", lang)
        }
      }.toDF(cols: _*)
      assert(Merge.applyBatch(spark, t, batch, epoch, 3).applied)
    }
    // bootstrap after the first epoch
    churn(0L)
    MaterializedAgg.maintain(spark, dir, stateDir, ck,
      groupCols = Seq("lang"), sumCols = Seq("content_len"),
      intervalMs = 10L, until = () => true)
    assert(state(stateDir, ck) == recompute(t))

    // incremental folds across four more churn epochs
    (1L to 4L).foreach { e =>
      churn(e)
      MaterializedAgg.maintain(spark, dir, stateDir, ck,
        groupCols = Seq("lang"), sumCols = Seq("content_len"),
        intervalMs = 10L, until = () => true)
      assert(state(stateDir, ck) == recompute(t), s"diverged at epoch $e")
    }

    // crash replay: rewind the checkpoint one emission (state_v<current>
    // already written = crash BETWEEN state write and checkpoint write);
    // the re-poll must re-fold the same range onto the same base state
    // and overwrite identically — never double-apply
    val current = t.currentVersion
    val prev = current - 1
    java.nio.file.Files.writeString(java.nio.file.Paths.get(ck), prev.toString)
    MaterializedAgg.maintain(spark, dir, stateDir, ck,
      groupCols = Seq("lang"), sumCols = Seq("content_len"),
      intervalMs = 10L, until = () => true)
    assert(ChangeFeed.lastEmitted(ck) == current)
    assert(state(stateDir, ck) == recompute(t))

    // groups fully retracted must be absent, not zero-count rows
    assert(MaterializedAgg.readState(spark, stateDir, ck).get
      .filter($"cnt" === 0L).count() == 0)

    // state pruning: only the fold base and the current state survive
    val states = graft.core.Fs.list(java.nio.file.Paths.get(stateDir))
      .map(_.getFileName.toString).filter(_.startsWith("state_v")).sorted
    assert(states == Seq(s"state_v$prev.parquet", s"state_v$current.parquet"),
      states.mkString(","))
  }

  test("min/max maintained with recompute-on-retraction; fractional sums " +
    "accumulate in the column's own type (never truncated to long)") {
    import org.apache.spark.sql.functions.{count, lit, max, min, sum}
    import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
    val dir = TestSpark.tempDir("magg2-src")
    val stateDir = TestSpark.tempDir("magg2-state")
    val ck = TestSpark.tempDir("magg2-ck") + "/agg.v"
    val t = LakeTable.create(spark, dir, schemaId = 3, numBuckets = 4)
    // mint a DOUBLE column: the r4-advice defect was sum(double) silently
    // truncating each value to a whole number before accumulating
    t.evolveSchema(StructType(t.registrySchemaFor(3).fields :+
      StructField("score", DoubleType, nullable = true)))
    val minted = t.currentSnapshot.schemaId
    val cols2 = cols :+ "score"
    def ev2(lsn: Long, op: String, url: String, tstr: String, lang: String,
        len: Long, score: Option[Double]) =
      (lsn, op, url, ts(tstr), null: Array[Byte],
        if (op == "D") null else s"t$lsn", lang, len, score)
    def apply2(epoch: Long, rows: Seq[(Long, String, String,
        java.sql.Timestamp, Array[Byte], String, String, Long,
        Option[Double])]): Unit =
      assert(Merge.applyBatch(spark, t, rows.toDF(cols2: _*), epoch, minted)
        .applied)
    def fold(): Unit = MaterializedAgg.maintain(spark, dir, stateDir, ck,
      groupCols = Seq("lang"), sumCols = Seq("score"),
      minCols = Seq("score"), maxCols = Seq("score", "content_len"),
      intervalMs = 10L, until = () => true)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => Option(r.getString(0)) ->
        (1 until 6).map(i => Option(r.get(i))).toList).toMap
    def expect() = rows(t.readUser().groupBy("lang").agg(
      count(lit(1)), sum("score"), min("score"), max("score"),
      max("content_len")))
    def got() = rows(MaterializedAgg.readState(spark, stateDir, ck).get)

    // epoch 0 (bootstrap): two 0.5-score rows in l0 (tied min!), the l0
    // max at u2; l1 holds fractional halves whose sum must stay exact
    apply2(0L, Seq(
      ev2(1, "U", "http://u1", "2024-01-01 00:00:01", "l0", 10L, Some(0.5)),
      ev2(2, "U", "http://u2", "2024-01-01 00:00:02", "l0", 20L, Some(9.5)),
      ev2(3, "U", "http://u3", "2024-01-01 00:00:03", "l1", 30L, Some(1.25)),
      ev2(4, "U", "http://u4", "2024-01-01 00:00:04", "l0", 5L, Some(0.5)),
      ev2(5, "U", "http://u5", "2024-01-01 00:00:05", "l1", 7L, Some(0.5)),
      ev2(6, "U", "http://u6", "2024-01-01 00:00:06", "l1", 8L, Some(0.5))))
    fold()
    assert(got() == expect())
    // the advice defect pinned: sum over halves is fractional, not 0/2
    assert(got()(Some("l1"))(1) == Some(2.25))

    // epoch 1: DELETE the l0 max row (retracts max score 9.5 AND max len
    // 20 — the recompute path), and shrink u3's score via update (the
    // preimage retracts l1's max 1.25)
    apply2(1L, Seq(
      ev2(7, "D", "http://u2", "2024-01-02 00:00:01", null, 0L, None),
      ev2(8, "U", "http://u3", "2024-01-02 00:00:02", "l1", 31L, Some(0.75))))
    fold()
    assert(got() == expect())

    // epoch 2: retract ONE of l0's two tied 0.5 minima (u1 -> 0.25); the
    // recompute must see the surviving tie, not assume the min vanished
    apply2(2L, Seq(
      ev2(9, "U", "http://u1", "2024-01-03 00:00:01", "l0", 11L, Some(0.25))))
    fold()
    assert(got() == expect())
    assert(got()(Some("l0"))(2) == Some(0.25)) // new min
    assert(got()(Some("l0"))(3) == Some(0.5))  // surviving tied runner-up

    // epoch 3: retract l1 entirely — the group drops, no zombie extrema
    apply2(3L, Seq(
      ev2(10, "D", "http://u3", "2024-01-04 00:00:01", null, 0L, None),
      ev2(11, "D", "http://u5", "2024-01-04 00:00:02", null, 0L, None),
      ev2(12, "D", "http://u6", "2024-01-04 00:00:03", null, 0L, None)))
    fold()
    assert(got() == expect())
    assert(!got().contains(Some("l1")))

    // crash replay: rewind one emission; the re-fold recomputes extrema
    // at the PINNED version and overwrites the identical state
    val current = t.currentVersion
    java.nio.file.Files.writeString(java.nio.file.Paths.get(ck),
      (current - 1).toString)
    fold()
    assert(ChangeFeed.lastEmitted(ck) == current)
    assert(got() == expect())
  }
}
