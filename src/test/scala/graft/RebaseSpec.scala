package graft

import graft.cdc.Merge
import graft.core.ChangeGen
import graft.lake.LakeTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Optimistic commit REBASE on the snapshot-version race
  * ([[LakeTable.commitDeltaRebasing]]): a merge that loses the race to a
  * rival which provably left its touched buckets byte-identical re-points
  * its already-written delta at the new head — one manifest rewrite —
  * instead of re-running the whole batch. An intersecting rival must
  * still force the full retry (the loser's resolve read stale bucket
  * content). Race windows are injected deterministically via
  * [[Merge.beforeCommitHook]].
  */
class RebaseSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val noop: () => Unit = () => ()

  private def freshTable(prefix: String): (LakeTable, DataFrame) = {
    val dir = TestSpark.tempDir(prefix)
    val t = LakeTable.create(spark, dir, schemaId = 3, numBuckets = 8)
    val cfg = ChangeGen.Config(nEvents = 2000, nDomains = 20,
      pagesPerDomain = 10, v1Frac = 0.0, v2Frac = 0.0)
    (t, ChangeGen.events(spark, cfg))
  }

  /** urls grouped by their lake bucket, largest groups first. */
  private def urlsByBucket(ev: DataFrame): Map[Int, Seq[String]] =
    ev.select(col("url"), Merge.bucketOf(col("url"), 8).as("b"))
      .distinct().collect()
      .groupBy(_.getInt(1)).view
      .mapValues(_.map(_.getString(0)).toSeq).toMap

  private def userRows(t: LakeTable): Set[String] =
    // binary html → md5: Row.toString on Array[Byte] prints identity
    t.readUser()
      .withColumn("html", org.apache.spark.sql.functions.md5(col("html")))
      .collect().map(_.toString).toSet

  test("disjoint rival race REBASES: one manifest rewrite, no batch re-run") {
    val (t, ev) = freshTable("rebase-disj")
    val buckets = urlsByBucket(ev)
    val Seq(bA, bB) = buckets.keys.toSeq.sorted.take(2)
    val batchOuter = ev.filter(col("url").isin(buckets(bA): _*))
    val batchRival = ev.filter(col("url").isin(buckets(bB): _*))
    assert(batchOuter.count() > 0 && batchRival.count() > 0)

    // serial twin = the oracle: disjoint buckets commute
    val twin = LakeTable.create(spark, TestSpark.tempDir("rebase-disj-twin"),
      schemaId = 3, numBuckets = 8)
    Merge.applyBatch(spark, twin, batchRival, 1L, 3)
    Merge.applyBatch(spark, twin, batchOuter, 5L, 3)

    val rebases0 = LakeTable.commitRebases.get()
    val races0 = Merge.commitRacesLost.get()
    val v0 = t.currentVersion
    Merge.beforeCommitHook = () => {
      Merge.beforeCommitHook = noop // the rival merge must not re-fire it
      Merge.applyBatch(spark, t, batchRival, 1L, 3)
    }
    try {
      val st = Merge.applyBatchRetrying(spark, t, batchOuter, 5L, 3)
      assert(st.applied && !st.gated)
    } finally Merge.beforeCommitHook = noop

    assert(LakeTable.commitRebases.get() == rebases0 + 1,
      "the disjoint race must be salvaged by rebase")
    assert(Merge.commitRacesLost.get() == races0,
      "a rebased race must never surface as a full applyBatch re-run")
    // two commits landed: the rival's, then ours rebased on top of it
    assert(t.currentVersion == v0 + 2)
    assert(userRows(t) == userRows(twin))
    // the rebased summary inherited the HEAD's lineage, then advanced it
    val s = t.currentSnapshot.summary
    assert(s("last-epoch").toLong == 5L)
    assert(s("batch-epoch").toLong == 5L)
  }

  test("intersecting rival race falls back to the FULL retry") {
    val (t, ev) = freshTable("rebase-isect")
    val buckets = urlsByBucket(ev)
    // two distinct key sets in the SAME bucket: the rival's commit
    // changes a bucket the outer batch also rewrites, so the outer's
    // resolve (which never saw the rival's rows) is stale — rebase must
    // refuse and the retry must re-resolve against the head
    val shared = buckets.values.find(_.size >= 2).get
    val batchOuter = ev.filter(col("url") === shared.head)
    val batchRival = ev.filter(col("url") === shared(1))
    assert(batchOuter.count() > 0 && batchRival.count() > 0)

    val twin = LakeTable.create(spark, TestSpark.tempDir("rebase-isect-twin"),
      schemaId = 3, numBuckets = 8)
    Merge.applyBatch(spark, twin, batchRival, 1L, 3)
    Merge.applyBatch(spark, twin, batchOuter, 5L, 3)

    val rebases0 = LakeTable.commitRebases.get()
    val races0 = Merge.commitRacesLost.get()
    Merge.beforeCommitHook = () => {
      Merge.beforeCommitHook = noop
      Merge.applyBatch(spark, t, batchRival, 1L, 3)
    }
    try {
      val st = Merge.applyBatchRetrying(spark, t, batchOuter, 5L, 3)
      assert(st.applied && !st.gated)
    } finally Merge.beforeCommitHook = noop

    assert(LakeTable.commitRebases.get() == rebases0,
      "an intersecting race must NOT rebase")
    assert(Merge.commitRacesLost.get() == races0 + 1,
      "the intersecting race must take the full retry")
    assert(userRows(t) == userRows(twin))
  }

  test("metadata-only rival (no file changes) rebases") {
    val (t, ev) = freshTable("rebase-meta")
    Merge.applyBatch(spark, t, ev.filter(col("lsn") < 1000), 0L, 3)
    val rebases0 = LakeTable.commitRebases.get()
    Merge.beforeCommitHook = () => {
      Merge.beforeCommitHook = noop
      t.updateProperties(Map("note" -> "rival"))
    }
    try {
      val st = Merge.applyBatchRetrying(spark, t,
        ev.filter(col("lsn") >= 1000), 5L, 3)
      assert(st.applied)
    } finally Merge.beforeCommitHook = noop
    assert(LakeTable.commitRebases.get() == rebases0 + 1)
    // the property landed and survived the rebased commit's inheritance?
    // properties are NOT lineage keys, so the rebased commit need not
    // carry "note" — but the rival's snapshot itself must still hold it
    val prev = t.snapshot(t.currentVersion - 1)
    assert(prev.summary.get("note").contains("rival"))
  }

  test("a rival rebucket refuses rebase (bucket layout is stale)") {
    val (t, ev) = freshTable("rebase-rebkt")
    Merge.applyBatch(spark, t, ev.filter(col("lsn") < 1000), 0L, 3)
    val rebases0 = LakeTable.commitRebases.get()
    val races0 = Merge.commitRacesLost.get()
    Merge.beforeCommitHook = () => {
      Merge.beforeCommitHook = noop
      graft.lake.Maintenance.rebucket(spark, t, 16)
    }
    try {
      val st = Merge.applyBatchRetrying(spark, t,
        ev.filter(col("lsn") >= 1000), 5L, 3)
      assert(st.applied)
    } finally Merge.beforeCommitHook = noop
    assert(LakeTable.commitRebases.get() == rebases0,
      "a rebucketed head invalidates the written bucket layout")
    assert(Merge.commitRacesLost.get() == races0 + 1)
    assert(t.currentSnapshot.numBuckets == 16)
    // the retried merge laid its rows out under the NEW bucket count:
    // every url in a bucket's files must hash there at 16 buckets
    val snap = t.currentSnapshot
    val b = snap.files.head.bucket
    val stray = t.readBuckets(snap, Set(b))
      .filter(Merge.bucketOf(col("url"), 16) =!= b)
    assert(stray.isEmpty)
  }
}
