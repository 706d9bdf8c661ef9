package graft

import graft.cdc.Dedup
import graft.core.ChangeGen
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val ev = ChangeGen.events(spark,
    ChangeGen.Config(nEvents = 5000, nDomains = 30, pagesPerDomain = 10))
    .cache()

  test("window, salted and agg dedup strategies agree exactly") {
    val w = Dedup.latestPerKeyWindow(ev).orderBy("url")
    val s = Dedup.latestPerKeySalted(ev, numSalts = 7).orderBy("url")
    val a = Dedup.latestPerKeyAgg(ev).orderBy("url")
    assert(w.schema.map(f => (f.name, f.dataType)) ==
      a.schema.map(f => (f.name, f.dataType)))
    assert(w.exceptAll(a).isEmpty && a.exceptAll(w).isEmpty)
    assert(w.exceptAll(s).isEmpty && s.exceptAll(w).isEmpty)
  }

  test("dedup keeps exactly one row per key, the (warc_ts, lsn) argmax") {
    val d = Dedup.latestPerKeyAgg(ev)
    val nKeys = ev.select("url").distinct().count()
    assert(d.count() == nKeys)
    // independently: max lsn among rows sharing the max warc_ts per url
    val m = ev.groupBy("url").agg(max(struct(col("warc_ts"), col("lsn"))).as("m"))
      .select(col("url"), col("m.lsn").as("lsn"))
    assert(d.select("url", "lsn").exceptAll(m).isEmpty)
  }

  test("ties on warc_ts are broken by lsn (deterministic)") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val df = Seq(
      (1L, "I", "u1", ts, "a"), (2L, "U", "u1", ts, "b"),
      (3L, "U", "u2", ts, "c")).toDF("lsn", "op", "url", "warc_ts", "text")
    val got = Dedup.latestPerKeyAgg(df, "url", Seq("warc_ts", "lsn"))
      .orderBy("url").select("lsn", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((2L, "b"), (3L, "c")))
  }

  test("hot-key skew: one url carrying 200k duplicate events dedups correctly") {
    import org.apache.spark.sql.functions._
    // 200k events on ONE url (the pathological hot domain) + 5k spread
    val hot = spark.range(200000).select(
      col("id").as("lsn"), lit("U").as("op"), lit("https://hot/0").as("url"),
      timestamp_seconds(lit(1700000000L) + pmod(col("id"), lit(1000))).as("warc_ts"),
      concat(lit("p"), col("id")).as("text"))
    val cold = spark.range(200000, 205000).select(
      col("id").as("lsn"), lit("U").as("op"),
      concat(lit("https://cold/"), pmod(col("id"), lit(1000))).as("url"),
      timestamp_seconds(lit(1700000000L)).as("warc_ts"),
      concat(lit("p"), col("id")).as("text"))
    val df = hot.unionByName(cold)
    val agg = Dedup.latestPerKeyAgg(df)
    val salted = Dedup.latestPerKeySalted(df, numSalts = 16)
    assert(agg.count() == 1001) // 1 hot + 1000 cold keys
    assert(agg.exceptAll(salted).isEmpty && salted.exceptAll(agg).isEmpty)
    // the hot key's winner is the max-(warc_ts, lsn) event
    val hotWin = agg.filter(col("url") === "https://hot/0")
      .select("lsn").head().getLong(0)
    val expect = (0L until 200000L).maxBy(i => (1700000000L + i % 1000, i))
    assert(hotWin == expect)
  }
}
