package graft.cdc

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Incremental materialized aggregate over a lake table — the canonical
  * CDC consumer the change-data-feed exists for: maintain
  *
  * {{{ SELECT <groupCols>, count(*) AS cnt, sum(c) AS sum_c … GROUP BY <groupCols> }}}
  *
  * WITHOUT recomputing it, by folding each emission of the source's CDF
  * into a per-group state: inserts/update_postimages ADD, update_preimages/
  * deletes RETRACT (the preimage is exactly what `$changes` cannot
  * provide). Per poll the work is O(changed rows) + a join against the
  * per-group state — for a 10^10-row source with 10^3 groups, a delta of
  * any size folds into kilobytes of state; the full groupBy never runs
  * again after bootstrap.
  *
  * Exactly-once, same discipline as the feed CLI's range-keyed export:
  * state for version v is written to `state_v<v>.parquet` BEFORE the feed
  * checkpoint advances to v, so a crash between the two re-emits the same
  * range and OVERWRITES the same state file — idempotent, never doubled.
  * [[readState]] reads the state at the CHECKPOINTED version (a crash-
  * orphaned newer state file is invisible until its range commits).
  *
  * Bootstrap (`from = -1` — fresh feed, or a retention/purge rebootstrap
  * with `rebootstrap = true`): the CDF emits the full snapshot as
  * inserts, so the fold IS the initial aggregate; prior state is
  * discarded (replace-state, the only correct resync).
  *
  * Group keys are null-safe (`<=>` join, null groups aggregate like any
  * other); groups whose count retracts to zero are dropped from state.
  * Sum columns must be numeric; their per-group sums are maintained over
  * non-null values (a row's pre/post images carry their own values, so
  * retraction stays symmetric).
  *
  * Deliberately count/sum only (avg derives): MIN/MAX are not
  * retractable — deleting the current extremum requires re-scanning the
  * group for the runner-up, which is a per-group recompute, not a fold.
  * An engine that needs maintained extrema keeps a per-group top-k
  * sketch instead; recompute-on-read is this engine's honest answer.
  */
object MaterializedAgg {

  private def statePath(stateDir: String, v: Int) =
    Paths.get(stateDir, s"state_v$v.parquet")

  /** The maintained aggregate as of the feed's checkpoint (None before
    * the first emission).
    */
  def readState(spark: SparkSession, stateDir: String,
      checkpointFile: String): Option[DataFrame] = {
    val v = ChangeFeed.lastEmitted(checkpointFile)
    if (v < 0) None
    else Some(spark.read.parquet(statePath(stateDir, v).toString))
  }

  /** Follow the source's CDF, folding each emission into the state.
    * Returns the emissions (rows = state group count after the fold).
    */
  def maintain(spark: SparkSession, sourceDir: String, stateDir: String,
      checkpointFile: String, groupCols: Seq[String], sumCols: Seq[String],
      intervalMs: Long = 5000L,
      durationMs: Option[Long] = None,
      until: () => Boolean = () => false,
      rebootstrap: Boolean = false): Seq[ChangeFeed.Emitted] = {
    require(groupCols.nonEmpty, "maintain: at least one group column")
    Files.createDirectories(Paths.get(stateDir))
    ChangeFeed.follow(spark, sourceDir, checkpointFile,
      onDelta = (from, to, cdfDelta) => {
        val delta = foldDelta(cdfDelta, groupCols, sumCols)
        val next =
          if (from == -1) delta // bootstrap: the fold IS the aggregate
          else merge(spark.read.parquet(statePath(stateDir, from).toString),
            delta, groupCols, sumCols)
        // tiny (per-group) state: one file, atomic-enough via overwrite —
        // a replayed range rewrites the identical content
        val out = statePath(stateDir, to).toString
        next.coalesce(1).write.mode("overwrite").parquet(out)
        val n = spark.read.parquet(out).count()
        // prune states older than the fold base: the base (v=from) must
        // survive until the checkpoint advances past it (crash replay
        // re-folds onto it); anything older is unreachable. A bootstrap
        // (from = -1) has no base — every pre-bootstrap state below the
        // fresh `to` is stale and goes
        val keepFloor = if (from == -1) to else from
        graft.core.Fs.list(Paths.get(stateDir)).foreach { p =>
          val name = p.getFileName.toString
          if (name.startsWith("state_v") && name.endsWith(".parquet")) {
            name.stripPrefix("state_v").stripSuffix(".parquet").toIntOption
              .filter(v => v < keepFloor)
              .foreach(_ => graft.core.Fs.deleteRecursively(p))
          }
        }
        n
      },
      intervalMs = intervalMs, durationMs = durationMs, until = until,
      rebootstrap = rebootstrap, cdf = true)
  }

  /** Signed per-group aggregate of one CDF delta. */
  private def foldDelta(cdf: DataFrame, groupCols: Seq[String],
      sumCols: Seq[String]): DataFrame = {
    val sign = when(
      col("_change_type").isin("insert", "update_postimage"), 1L)
      .otherwise(-1L)
    cdf.groupBy(groupCols.map(col): _*)
      .agg(sum(sign).as("cnt"),
        sumCols.map(c =>
          sum(sign * col(c).cast("long")).as(s"sum_$c")): _*)
  }

  /** old state + signed delta, null-safe on the group keys; fully
    * retracted groups dropped.
    */
  private def merge(old: DataFrame, delta: DataFrame,
      groupCols: Seq[String], sumCols: Seq[String]): DataFrame = {
    val o = old.alias("o")
    val d = delta.alias("d")
    val cond = groupCols.map(c => col(s"o.$c") <=> col(s"d.$c"))
      .reduce(_ && _)
    def added(c: String): Column =
      coalesce(col(s"o.$c"), lit(0L)) + coalesce(col(s"d.$c"), lit(0L))
    o.join(d, cond, "full_outer")
      .select(groupCols.map(c =>
          coalesce(col(s"o.$c"), col(s"d.$c")).as(c)) ++
        (added("cnt").as("cnt") +:
          sumCols.map(c => added(s"sum_$c").as(s"sum_$c"))): _*)
      .filter(col("cnt") =!= 0L)
  }
}
