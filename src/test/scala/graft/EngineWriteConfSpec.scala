package graft

import graft.core.EngineWriteConf
import org.scalatest.funsuite.AnyFunSuite

/** The scoped parquet write policy (round-4 advice): pinned INSIDE an
  * engine write, the USER'S value restored after — including under
  * concurrent engine writers on one session, where the first pins and
  * only the last restores.
  */
class EngineWriteConfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val Key = "spark.sql.parquet.outputTimestampType"

  test("pinned() sets TIMESTAMP_MICROS inside, restores the user's value " +
    "after, and unsets when the user never set one") {
    spark.conf.unset(Key)
    val default = spark.conf.get(Key) // Spark's own session default
    EngineWriteConf.pinned(spark) {
      assert(spark.conf.get(Key) == "TIMESTAMP_MICROS")
    }
    // user never set it -> back to the session default, not left pinned
    assert(spark.conf.get(Key) == default)
    spark.conf.set(Key, "INT96")
    EngineWriteConf.pinned(spark) {
      assert(spark.conf.get(Key) == "TIMESTAMP_MICROS")
    }
    assert(spark.conf.get(Key) == "INT96") // the user's choice survives
    spark.conf.unset(Key)
  }

  test("concurrent engine writers: the conf stays pinned until the LAST " +
    "exits, then restores exactly once") {
    spark.conf.set(Key, "INT96")
    val inside = new java.util.concurrent.CountDownLatch(2)
    val release = new java.util.concurrent.CountDownLatch(1)
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val threads = (1 to 2).map { _ =>
      new Thread(() => EngineWriteConf.pinned(spark) {
        seen.add(spark.conf.get(Key))
        inside.countDown()
        release.await()
      })
    }
    threads.foreach(_.start())
    assert(inside.await(10, java.util.concurrent.TimeUnit.SECONDS))
    // both writers in flight: pinned for both, user value shadowed
    assert(seen.size == 2 && seen.toArray.forall(_ == "TIMESTAMP_MICROS"))
    assert(spark.conf.get(Key) == "TIMESTAMP_MICROS")
    release.countDown()
    threads.foreach(_.join(10000))
    // last one out restored the user's value
    assert(spark.conf.get(Key) == "INT96")
    spark.conf.unset(Key)
  }
}
