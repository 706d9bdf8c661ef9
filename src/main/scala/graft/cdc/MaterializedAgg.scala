package graft.cdc

import graft.lake.LakeTable
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Incremental materialized aggregate over a lake table — the canonical
  * CDC consumer the change-data-feed exists for: maintain
  *
  * {{{ SELECT <groupCols>, count(*) AS cnt, sum(c) AS sum_c,
  *     min(m) AS min_m, max(x) AS max_x … GROUP BY <groupCols> }}}
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
  * Sum columns must be numeric; sums accumulate in the column's own
  * Spark sum type (long for integrals, double for floats, widened
  * decimal for decimals — NEVER truncated to a whole number), over
  * non-null values (a row's pre/post images carry their own values, so
  * retraction stays symmetric).
  *
  * MIN/MAX (reference analog: the A3 majority-vote argmax,
  * /root/reference/upload_data/Submissions/round1/upload_round1_variants.R:123-126)
  * are maintained with recompute-on-retraction: monotone updates fold
  * for free (an added value only ever tightens an extremum), and only
  * when a retraction's value TIES the stored extremum — the one case a
  * fold cannot answer, because the runner-up is unknown — are exactly
  * the affected groups recomputed from the source snapshot at the
  * emission's own version (deterministic under crash replay). Cost: the
  * fold stays O(changed rows); a retracted extremum adds one
  * column-pruned scan of the source semi-joined to the affected group
  * keys — O(affected groups) result, never a full re-aggregate of
  * untouched groups.
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
      minCols: Seq[String] = Nil, maxCols: Seq[String] = Nil,
      intervalMs: Long = 5000L,
      durationMs: Option[Long] = None,
      until: () => Boolean = () => false,
      rebootstrap: Boolean = false): Seq[ChangeFeed.Emitted] = {
    require(groupCols.nonEmpty, "maintain: at least one group column")
    Files.createDirectories(Paths.get(stateDir))
    ChangeFeed.follow(spark, sourceDir, checkpointFile,
      onDelta = (from, to, cdfDelta) => {
        val delta = foldDelta(cdfDelta, groupCols, sumCols, minCols, maxCols)
        val next =
          if (from == -1) // bootstrap: the fold IS the aggregate (inserts
            delta.drop(retractCols(minCols, maxCols): _*) // only — no
          else {                                          // retractions)
            val merged = merge(
              spark.read.parquet(statePath(stateDir, from).toString),
              delta, groupCols, sumCols, minCols, maxCols)
            recomputeFlagged(spark, sourceDir, to, merged, groupCols,
              minCols, maxCols)
          }
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

  private def retractCols(minCols: Seq[String], maxCols: Seq[String]) =
    minCols.map(c => s"_retmin_$c") ++ maxCols.map(c => s"_retmax_$c")

  /** Signed per-group aggregate of one CDF delta. Extrema are split into
    * the ADDED side (folds monotonically) and the RETRACTED side (drives
    * the recompute decision in [[merge]]).
    */
  private def foldDelta(cdf: DataFrame, groupCols: Seq[String],
      sumCols: Seq[String], minCols: Seq[String],
      maxCols: Seq[String]): DataFrame = {
    val add = col("_change_type").isin("insert", "update_postimage")
    val sign = when(add, 1L).otherwise(-1L)
    val aggs =
      // sign * value accumulates in Spark's own sum type for the column
      // (long for integrals, double for floats, widened decimal) — a
      // cast to long here silently truncated fractional sums (advice r4)
      sumCols.map(c => sum(sign * col(c)).as(s"sum_$c")) ++
      minCols.flatMap(c => Seq(
        min(when(add, col(c))).as(s"min_$c"),
        min(when(!add, col(c))).as(s"_retmin_$c"))) ++
      maxCols.flatMap(c => Seq(
        max(when(add, col(c))).as(s"max_$c"),
        max(when(!add, col(c))).as(s"_retmax_$c")))
    cdf.groupBy(groupCols.map(col): _*)
      .agg(sum(sign).as("cnt"), aggs: _*)
  }

  /** old state + signed delta, null-safe on the group keys; fully
    * retracted groups dropped. Extrema fold via least/greatest (both
    * skip nulls); a group whose RETRACTED extremum ties the stored one
    * is flagged `_recompute` — the fold cannot know the runner-up.
    */
  private def merge(old: DataFrame, delta: DataFrame,
      groupCols: Seq[String], sumCols: Seq[String],
      minCols: Seq[String], maxCols: Seq[String]): DataFrame = {
    val o = old.alias("o")
    val d = delta.alias("d")
    val cond = groupCols.map(c => col(s"o.$c") <=> col(s"d.$c"))
      .reduce(_ && _)
    // type-preserving signed add: both present -> sum, else the one side
    def added(c: String): Column =
      coalesce(col(s"o.$c") + col(s"d.$c"), col(s"o.$c"), col(s"d.$c"))
    val needRecompute = (
      minCols.map(c => col(s"d._retmin_$c").isNotNull &&
        (col(s"o.min_$c").isNull || col(s"d._retmin_$c") <= col(s"o.min_$c"))) ++
      maxCols.map(c => col(s"d._retmax_$c").isNotNull &&
        (col(s"o.max_$c").isNull || col(s"d._retmax_$c") >= col(s"o.max_$c"))))
      .foldLeft(lit(false))(_ || _)
    o.join(d, cond, "full_outer")
      .select(groupCols.map(c =>
          coalesce(col(s"o.$c"), col(s"d.$c")).as(c)) ++
        (added("cnt").as("cnt") +:
          sumCols.map(c => added(s"sum_$c").as(s"sum_$c"))) ++
        minCols.map(c => least(col(s"o.min_$c"), col(s"d.min_$c")).as(s"min_$c")) ++
        maxCols.map(c => greatest(col(s"o.max_$c"), col(s"d.max_$c")).as(s"max_$c")) :+
        needRecompute.as("_recompute"): _*)
      .filter(col("cnt") =!= 0L)
  }

  /** Replace the extrema of `_recompute`-flagged groups by recomputing
    * them from the source's user state AT the emitted version `to`
    * (pinned, so a crash-replayed fold recomputes identically). Only the
    * flagged groups are re-aggregated: the source scan is semi-joined to
    * their keys and column-pruned to the group + extrema columns.
    */
  private def recomputeFlagged(spark: SparkSession, sourceDir: String,
      to: Int, merged: DataFrame, groupCols: Seq[String],
      minCols: Seq[String], maxCols: Seq[String]): DataFrame = {
    if (minCols.isEmpty && maxCols.isEmpty) return merged.drop("_recompute")
    val m = merged.persist() // tiny (per-group); read twice below
    val flagged = m.filter(col("_recompute")).drop("_recompute")
    if (flagged.isEmpty) { m.unpersist(); return merged.drop("_recompute") }
    val clean = m.filter(!col("_recompute")).drop("_recompute")
    val table = LakeTable.load(spark, sourceDir)
    val live = table.readUser(table.snapshot(to))
      .select((groupCols ++ (minCols ++ maxCols).distinct).map(col): _*)
    val keys = broadcast(flagged.select(groupCols.map(col): _*))
    val keyCond = (a: String, b: String) => groupCols
      .map(c => col(s"$a.$c") <=> col(s"$b.$c")).reduce(_ && _)
    val ext = live.alias("l")
      .join(keys.alias("k"), keyCond("l", "k"), "left_semi")
      .groupBy(groupCols.map(col): _*)
      .agg((minCols.map(c => min(col(c)).as(s"rmin_$c")) ++
        maxCols.map(c => max(col(c)).as(s"rmax_$c"))).head,
        (minCols.map(c => min(col(c)).as(s"rmin_$c")) ++
          maxCols.map(c => max(col(c)).as(s"rmax_$c"))).tail: _*)
    val fixed = flagged.alias("f")
      .join(ext.alias("e"), keyCond("f", "e"), "left_outer")
      .select(groupCols.map(c => col(s"f.$c").as(c)) ++
        (col("f.cnt").as("cnt") +:
          flagged.columns.filter(_.startsWith("sum_")).toSeq
            .map(c => col(s"f.$c").as(c))) ++
        minCols.map(c => col(s"e.rmin_$c").as(s"min_$c")) ++
        maxCols.map(c => col(s"e.rmax_$c").as(s"max_$c")): _*)
    val out = clean.unionByName(fixed)
    m.unpersist()
    out
  }
}
