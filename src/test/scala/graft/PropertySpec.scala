package graft

import graft.cdc.{Dedup, Merge}
import graft.lake.LakeTable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based CDC invariants (SURVEY.md §5.2 #3) over random event
  * multisets and random batch splits. Sizes kept small — each property
  * evaluation runs real Spark jobs.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** run a scalacheck property with few, small cases (each runs Spark jobs) */
  private def checkProp(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(5).withMaxSize(40), p)
    assert(res.passed, res.status.toString)
  }

  private val cols = Seq("lsn", "op", "url", "warc_ts", "html", "text",
    "lang", "content_len", "schema_version")

  private case class Ev(lsn: Long, op: String, url: String, tsSec: Long)

  private val evGen: Gen[List[Ev]] = for {
    n <- Gen.choose(1, 60)
    evs <- Gen.listOfN(n, for {
      url <- Gen.oneOf("a", "b", "c", "d", "e") // few keys → many collisions
      ts <- Gen.choose(0L, 5L) // coarse → warc_ts ties, lsn tie-break
      op <- Gen.frequency(4 -> Gen.const("U"), 1 -> Gen.const("D"),
        2 -> Gen.const("I"))
    } yield (url, ts, op))
  } yield evs.zipWithIndex.map { case ((u, t, o), i) => Ev(i.toLong, o, u, t) }

  private def toDf(evs: Seq[Ev]) =
    evs.map(e => (e.lsn, e.op, e.url,
        new java.sql.Timestamp(1700000000000L + e.tsSec * 1000),
        Array[Byte](), s"text-${e.url}-${e.tsSec}", "en", 1L, 3))
      .toDF(cols: _*)

  /** ground truth: per url the max-(ts, lsn) event; absent if it is a D */
  private def argmax(evs: Seq[Ev]): Map[String, Long] =
    evs.groupBy(_.url).flatMap { case (u, es) =>
      val win = es.maxBy(e => (e.tsSec, e.lsn))
      if (win.op == "D") None else Some(u -> win.lsn)
    }

  test("property: merge over ANY batch split equals argmax over the whole log") {
    checkProp(Prop.forAll(evGen, Gen.choose(1, 4)) { (evs: List[Ev], nSplits: Int) =>
      evs.isEmpty || {
        val dir = TestSpark.tempDir("prop")
        val t = LakeTable.create(spark, dir, schemaId = 3, numBuckets = 4)
        val bounds = (0 to nSplits).map(i => evs.size * i / nSplits)
        bounds.zip(bounds.tail).zipWithIndex.foreach {
          case ((lo, hi), epoch) if hi > lo =>
            Merge.applyBatch(spark, t, toDf(evs.slice(lo, hi)), epoch.toLong, 3)
          case _ =>
        }
        val got = t.read().filter(col("_op") =!= "D")
          .select("url", "_lsn").collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        got == argmax(evs)
      }
    })
  }

  test("property: all three dedup strategies equal the scala argmax") {
    checkProp(Prop.forAll(evGen) { (evs: List[Ev]) =>
      evs.isEmpty || {
        val df = toDf(evs)
        val expect = evs.groupBy(_.url)
          .map { case (u, es) => u -> es.maxBy(e => (e.tsSec, e.lsn)).lsn }
        def ok(d: org.apache.spark.sql.DataFrame) =
          d.select("url", "lsn").collect()
            .map(r => r.getString(0) -> r.getLong(1)).toMap == expect
        ok(Dedup.latestPerKeyWindow(df)) &&
          ok(Dedup.latestPerKeySalted(df, numSalts = 3)) &&
          ok(Dedup.latestPerKeyAgg(df))
      }
    })
  }

  test("property: applying changesBetween(i, j) to a mirror of snapshot i " +
    "reproduces snapshot j (changelog replica convergence)") {
    checkProp(Prop.forAll(evGen, Gen.choose(2, 4)) { (evs: List[Ev], nSplits: Int) =>
      evs.size < nSplits || {
        val dir = TestSpark.tempDir("prop-ch")
        val t = LakeTable.create(spark, dir, schemaId = 3, numBuckets = 4)
        val bounds = (0 to nSplits).map(i => evs.size * i / nSplits)
        bounds.zip(bounds.tail).zipWithIndex.foreach {
          case ((lo, hi), epoch) if hi > lo =>
            Merge.applyBatch(spark, t, toDf(evs.slice(lo, hi)), epoch.toLong, 3)
          case _ =>
        }
        def liveState(d: LakeTable, v: Int) =
          d.read(d.snapshot(v)).filter(col("_op") =!= "D")
            .select("url", "_lsn", "text").collect()
            .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
        val vMax = t.currentVersion
        // ranges (i, i) and (i, vMax) for every i: identity plus every
        // suffix (the full (i, j) lattice costs quadratic Spark jobs for
        // no extra lattice structure — changesBetween only ever sees two
        // endpoint snapshots)
        (0 to vMax).forall { i =>
          Seq(i, vMax).distinct.forall { j =>
            val m = LakeTable.create(spark,
              TestSpark.tempDir(s"prop-ch-m$i-$j"), schemaId = 3, numBuckets = 4)
            // seed = snapshot i as one upsert batch (tombstones dropped —
            // a fresh mirror has nothing to delete)
            val seed = t.read(t.snapshot(i)).filter(col("_op") =!= "D")
              .withColumnRenamed("_lsn", "lsn").withColumn("op", lit("U"))
              .drop("_op")
            if (seed.count() > 0) Merge.applyBatch(spark, m, seed, 0, 3)
            val feed = t.changesBetween(i, j)
              .withColumnRenamed("_lsn", "lsn").withColumnRenamed("_op", "op")
            if (feed.count() > 0) Merge.applyBatch(spark, m, feed, 1, 3)
            liveState(m, m.currentVersion) == liveState(t, j)
          }
        }
      }
    })
  }

  test("property: re-applying ANY committed prefix is a no-op (idempotency)") {
    checkProp(Prop.forAll(evGen) { (evs: List[Ev]) =>
      evs.size < 2 || {
        val dir = TestSpark.tempDir("prop-idem")
        val t = LakeTable.create(spark, dir, schemaId = 3, numBuckets = 4)
        val mid = evs.size / 2
        Merge.applyBatch(spark, t, toDf(evs.take(mid)), 0, 3)
        Merge.applyBatch(spark, t, toDf(evs.drop(mid)), 1, 3)
        val v = t.currentVersion
        // replay both epochs in order — both must be skipped
        val r0 = Merge.applyBatch(spark, t, toDf(evs.take(mid)), 0, 3)
        val r1 = Merge.applyBatch(spark, t, toDf(evs.drop(mid)), 1, 3)
        !r0.applied && !r1.applied && t.currentVersion == v
      }
    })
  }
}
