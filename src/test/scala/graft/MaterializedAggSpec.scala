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
}
