package graft.core

import org.apache.spark.sql.SparkSession

/** Engine parquet write policy, applied around each lake write and then
  * RESTORED — standard INT64-micros timestamps, not Spark's default
  * INT96. INT96 writes NO parquet min/max stats, which kills both the
  * footer-harvested warc_ts zone maps (GraftFileIndex file pruning) and
  * the reader's own row-group pruning on time predicates. Session-level
  * because parquet exposes no per-write option for it; readers handle
  * both encodings transparently, so pre-existing INT96 files coexist
  * (they just carry no zone map).
  *
  * Scoped (not a permanent session mutation): the conf is set on entry
  * and the user's previous value restored on exit, so a graft merge
  * never silently changes the timestamp encoding of UNRELATED writes the
  * user performs later in the same SparkSession. Concurrent engine
  * writes on one session (the 5-thread epoch race) are handled by a
  * per-session depth count — the first writer saves, the last restores —
  * so a finishing thread can never flip the conf back under a sibling
  * still writing.
  */
object EngineWriteConf {

  private val Key = "spark.sql.parquet.outputTimestampType"
  private val Pinned = "TIMESTAMP_MICROS"

  private final class State(var depth: Int, val saved: Option[String])
  private val states =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, State]()

  def pinned[T](spark: SparkSession)(body: => T): T = {
    states.synchronized {
      val st = states.get(spark)
      if (st == null) {
        states.put(spark, new State(1, spark.conf.getOption(Key)))
        spark.conf.set(Key, Pinned)
      } else st.depth += 1
    }
    try body
    finally states.synchronized {
      val st = states.get(spark)
      st.depth -= 1
      if (st.depth == 0) {
        states.remove(spark)
        st.saved match {
          case Some(v) => spark.conf.set(Key, v)
          case None => spark.conf.unset(Key)
        }
      }
    }
  }
}
