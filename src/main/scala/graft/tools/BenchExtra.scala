package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import java.util.Locale

/** Query-phase-only bench (guide §1.4 isolation): the SAME methodology as
  * graft.Bench's per-query phase — same session config, same untimed
  * warmup, interleaved rounds, per-query MIN over reps — without the
  * ~40-minute CDC phase, so an optimization round can re-measure the 85
  * queries in ~3 minutes per rep. Reads SPARK_GRAFT_SF_DIR /
  * SPARK_GRAFT_CPUS / SPARK_GRAFT_QUERY_REPS like Bench. Prints one JSON
  * line: {"queries": {name: sec, ...}, "total_query_sec": s}.
  * (Bench.scala itself is the frozen driver harness; this tool exists so
  * local iteration never touches it.)
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_QUERY_REPS", "3").toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-benchextra-$cpus")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    val names = args.toSeq match {
      case Nil => SparkEntry.queries.keys.toSeq.sorted
      case some => some
    }
    val best = scala.collection.mutable.Map[String, Double]()
    (1 to reps).foreach { _ =>
      names.foreach { name =>
        val t0 = System.nanoTime()
        val ok = try { SparkEntry.queries(name)(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[benchextra] $name FAILED: ${e.getMessage}")
          false
        }
        val sec = if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
        best(name) = (best.get(name), sec) match {
          case (Some(p), s) if p >= 0 && s >= 0 => math.min(p, s)
          case (Some(p), s) => math.max(p, s)
          case (None, s) => s
        }
      }
    }
    val qs = names.map(n => "\"" + n + "\":" +
      String.format(Locale.ROOT, "%.3f", Double.box(best(n))))
      .mkString("{", ",", "}")
    val total = best.values.filter(_ >= 0).sum
    println(s"""{"queries":$qs,"total_query_sec":${
      String.format(Locale.ROOT, "%.2f", Double.box(total))}}""")
    spark.stop()
  }
}
