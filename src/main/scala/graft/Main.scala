package graft

import graft.cdc.{CdcStream, Merge, Metrics}
import graft.core.SchemaRegistry
import graft.lake.{LakeTable, Maintenance}
import org.apache.spark.sql.SparkSession

/** spark-submit entry point (north star: "runs via spark-submit on
  * multi-executor clusters"). The master/executor topology comes entirely
  * from the submit conf — nothing here pins local mode:
  *
  * {{{
  *   spark-submit --class graft.Main <jar> create  --table /lake/pages --buckets 4096
  *   spark-submit --class graft.Main <jar> tail    --table /lake/pages --log /wal --checkpoint /ck
  *   spark-submit --class graft.Main <jar> tail    --table /lake/pages --log /wal --checkpoint /ck \
  *                                                 --follow --interval 5 [--duration-sec 3600]
  *   spark-submit --class graft.Main <jar> replay  --table /lake/pages --log /wal [--max-chunks N]
  *   spark-submit --class graft.Main <jar> merge   --table /lake/pages --batch /staged.parquet --epoch 7
  *   spark-submit --class graft.Main <jar> changes --table /lake/pages --from 3 [--to 7] [--out /feed] [--cdf]
  *   spark-submit --class graft.Main <jar> materialize --source /lake/pages --table /agg/by-lang \
  *                                                 --checkpoint /ck/agg.v --group lang [--sum content_len] \
  *                                                 [--follow] [--interval 5] [--duration-sec 3600] [--rebootstrap]
  *   spark-submit --class graft.Main <jar> changes --table /lake/pages --follow --out /feed [--cdf] \
  *                                                 --checkpoint /ck/feed.v [--interval 5] [--duration-sec 3600] [--rebootstrap]
  *   spark-submit --class graft.Main <jar> replicate --source /lake/pages --table /lake/replica \
  *                                                 --checkpoint /ck/rep.v [--follow] [--interval 5] [--duration-sec 3600] [--rebootstrap]
  *   spark-submit --class graft.Main <jar> replicate --stream --source /lake/pages --table /lake/replica \
  *                                                 --checkpoint /ck/rep [--follow] [--interval 5] [--duration-sec 3600] [--max-versions-per-batch 8] [--max-rows-per-batch 4000000]
  *   spark-submit --class graft.Main <jar> compact --table /lake/pages [--purge-tombstones]
  *   spark-submit --class graft.Main <jar> rebucket --table /lake/pages --buckets 4096
  *   spark-submit --class graft.Main <jar> maintain --table /lake/pages [--target-bucket-mb 256] \
  *                                                 [--churn-threshold 64] [--purge-tombstones]
  *   spark-submit --class graft.Main <jar> rollback --table /lake/pages --to-version 7
  *   spark-submit --class graft.Main <jar> expire  --table /lake/pages --keep-last 10
  *   spark-submit --class graft.Main <jar> gc      --table /lake/pages
  *   spark-submit --class graft.Main <jar> show    --table /lake/pages
  * }}}
  *
  * Reference analog: the operator-facing run scripts
  * (/root/reference/upload_data/Submissions/round3/upload_round3_files_to_cloud.sh,
  * query_queues.sh) collapsed into one governed CLI.
  */
object Main {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try run(spark, args.toSeq).foreach(println)
    finally spark.stop()
  }

  /** Session-injected core (unit-testable); returns printed report lines. */
  def run(spark: SparkSession, args: Seq[String]): Seq[String] = {
    val (cmd, opts) = parse(args)
    def table = opts.getOrElse("table",
      sys.error(s"$cmd requires --table <dir>"))
    def schemaVersion =
      opts.get("schema-version").map(_.toInt).getOrElse(SchemaRegistry.latestVersion)
    cmd match {
      case "create" =>
        val t = LakeTable.create(spark, table, schemaId = schemaVersion,
          numBuckets = opts.get("buckets").map(_.toInt).getOrElse(1024))
        Seq(s"created $table v${t.currentVersion} schema=$schemaVersion")
      case "tail" =>
        val mftp = opts.get("max-files-per-trigger").map(_.toInt).getOrElse(1)
        if (opts.contains("follow")) {
          // continuous production tail: a resident ProcessingTime stream
          // that applies files dropped AFTER start without a restart;
          // --duration-sec bounds the run (ops drills, tests), otherwise
          // it tails until externally stopped
          val q = CdcStream.tail(spark, opts("log"), table, opts("checkpoint"),
            schemaVersion, mftp, quarantineDir = opts.get("quarantine"),
            trigger = org.apache.spark.sql.streaming.Trigger
              .ProcessingTime(intervalMs(opts), java.util.concurrent.TimeUnit.MILLISECONDS))
          durationMs(opts) match {
            case Some(d) => q.awaitTermination(d); q.stop()
            case None => q.awaitTermination()
          }
        } else {
          CdcStream.tailAll(spark, opts("log"), table, opts("checkpoint"),
            schemaVersion, mftp, quarantineDir = opts.get("quarantine"))
        }
        report(spark, table)
      case "replay" =>
        val stats = CdcStream.replayChunks(spark, opts("log"), table,
          opts.get("max-chunks").map(_.toInt).getOrElse(Int.MaxValue))
        stats.map(s => s"epoch=${s.epoch} applied=${s.applied} " +
          s"events=${s.eventsIn} rows=${s.rowsApplied} " +
          s"conflicts=${s.conflicts} wallMs=${s.wallMs}") ++ report(spark, table)
      case "merge" =>
        val t = LakeTable.load(spark, table)
        val batch = spark.read.parquet(opts("batch"))
        val s = Merge.applyBatch(spark, t, batch,
          epoch = opts("epoch").toLong, batchSchemaVersion = schemaVersion,
          quarantineDir = opts.get("quarantine"))
        if (s.applied) Metrics.append(table, s)
        Seq(s"epoch=${s.epoch} applied=${s.applied} events=${s.eventsIn} " +
          s"rows=${s.rowsApplied} conflicts=${s.conflicts} " +
          s"quarantined=${s.quarantined}")
      case "compact" =>
        val snap = Maintenance.compact(spark, LakeTable.load(spark, table),
          purgeTombstones = opts.contains("purge-tombstones"))
        Seq(s"compacted $table -> v${snap.version} files=${snap.fileCount}")
      case "rollback" =>
        val snap = Maintenance.rollback(spark, LakeTable.load(spark, table),
          toVersion = opts("to-version").toInt)
        Seq(s"rolled back $table -> v${snap.version} " +
          s"(content of v${snap.summary("rolled-back-to")}); changelog " +
          "ranges crossing it are fenced — followers re-bootstrap")
      case "rebucket" =>
        val snap = Maintenance.rebucket(spark, LakeTable.load(spark, table),
          newBuckets = opts("buckets").toInt)
        Seq(s"rebucketed $table -> v${snap.version} " +
          s"buckets=${snap.numBuckets} files=${snap.fileCount}")
      case "maintain" =>
        // engine-decided pass: rebucket on bucket-size drift, compact on
        // read-optimize debt, else no-op (Maintenance.plan thresholds)
        val (action, reason, v) = Maintenance.autoMaintain(spark,
          LakeTable.load(spark, table),
          targetBucketBytes =
            opts.get("target-bucket-mb").map(_.toLong).getOrElse(256L) << 20,
          churnThreshold =
            opts.get("churn-threshold").map(_.toInt).getOrElse(64),
          purgeTombstones = opts.contains("purge-tombstones"))
        Seq(s"maintain $table: $action -> v$v ($reason)")
      case "expire" =>
        // --min-age-sec keeps snapshots younger than the age even beyond
        // the count window (time-travel / changelog-retention SLA)
        val n = Maintenance.expireSnapshots(LakeTable.load(spark, table),
          keepLast = opts("keep-last").toInt,
          olderThanMs = opts.get("min-age-sec").map(s =>
            System.currentTimeMillis() - s.toLong * 1000L))
        Seq(s"expired $n snapshots")
      case "gc" =>
        // default 1h orphan age guard protects in-flight commits; pass
        // --min-age-sec 0 only when no writer can be active
        val minAge = opts.get("min-age-sec").map(_.toLong * 1000).getOrElse(3600000L)
        Seq(s"removed ${Maintenance.gc(LakeTable.load(spark, table), minAge)} files")
      case "replicate" if opts.contains("stream") =>
        // CDC OUT on Spark's own micro-batch engine: one Structured
        // Streaming query (graft-changelog source -> graft-lake sink).
        // --checkpoint here is a streaming checkpoint DIRECTORY (Spark's
        // offset log), not the driver-loop version file. Default drains
        // (AvailableNow) and exits; --follow keeps a resident trigger.
        val src = opts.getOrElse("source",
          sys.error("replicate requires --source <dir>"))
        val ck = opts.getOrElse("checkpoint",
          sys.error("replicate --stream requires --checkpoint <dir>"))
        val trigger =
          if (opts.contains("follow"))
            org.apache.spark.sql.streaming.Trigger
              .ProcessingTime(intervalMs(opts))
          else org.apache.spark.sql.streaming.Trigger.AvailableNow()
        val q = graft.cdc.ChangeFeed.replicateStream(spark, src, table, ck,
          trigger, opts.get("max-versions-per-batch").map(_.toInt),
          opts.get("max-rows-per-batch").map(_.toLong))
        durationMs(opts) match {
          case Some(d) => q.awaitTermination(d); q.stop()
          case None => q.awaitTermination()
        }
        report(spark, table)
      case "replicate" =>
        // CDC OUT, applied: tail the source's changelog INTO a replica
        // lake table (auto-created on first run). Default drains to
        // caught-up and exits; --follow keeps tailing. Bootstrap (fresh
        // checkpoint, or --rebootstrap after retention/purge) applies as
        // truncate-and-replace.
        val src = opts.getOrElse("source",
          sys.error("replicate requires --source <dir>"))
        val ck = opts.getOrElse("checkpoint",
          sys.error("replicate requires --checkpoint <file>"))
        val emitted = graft.cdc.ChangeFeed.replicate(spark, src, table, ck,
          intervalMs = intervalMs(opts), durationMs = durationMs(opts),
          until = () => !opts.contains("follow"),
          rebootstrap = opts.contains("rebootstrap"))
        emitted.map(emissionLine("applied", _)) ++ report(spark, table)
      case "materialize" =>
        // CDC OUT, aggregated: maintain a per-group count/sum aggregate
        // of the source table incrementally from its CDF (retraction via
        // before images) — never recomputing the groupBy after bootstrap.
        // Default drains to caught-up and exits; --follow keeps folding.
        val src = opts.getOrElse("source",
          sys.error("materialize requires --source <dir>"))
        val ck = opts.getOrElse("checkpoint",
          sys.error("materialize requires --checkpoint <file>"))
        val group = opts.getOrElse("group",
          sys.error("materialize requires --group <col[,col…]>"))
          .split(',').toSeq.map(_.trim).filter(_.nonEmpty)
        def colList(key: String) = opts.get(key).toSeq
          .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
        val sums = colList("sum")
        val emitted = graft.cdc.MaterializedAgg.maintain(spark, src, table,
          ck, group, sums, colList("min"), colList("max"),
          intervalMs = intervalMs(opts), durationMs = durationMs(opts),
          until = () => !opts.contains("follow"),
          rebootstrap = opts.contains("rebootstrap"))
        emitted.map(emissionLine("folded", _)) ++
          graft.cdc.MaterializedAgg.readState(spark, table, ck).toSeq
            .map(st => s"state groups=${st.count()} at v${
              graft.cdc.ChangeFeed.lastEmitted(ck)}")
      case "changes" if opts.contains("follow") =>
        // CDC OUT, continuous: tail the changelog — per poll, emit the
        // delta since the checkpointed version into a range-keyed parquet
        // dir (overwrite => re-emission after a crash is idempotent) and
        // advance the checkpoint. The first emission of a fresh
        // checkpoint is the full-snapshot bootstrap (from = -1). --cdf
        // exports the before-image shape into cdf_-prefixed range dirs.
        val out = opts.getOrElse("out",
          sys.error("changes --follow requires --out <dir>"))
        val ck = opts.getOrElse("checkpoint",
          sys.error("changes --follow requires --checkpoint <file>"))
        val prefix = if (opts.contains("cdf")) "cdf_" else ""
        val emitted = graft.cdc.ChangeFeed.follow(spark, table, ck,
          onDelta = (from, to, df) => {
            val dir = if (from == -1) s"$out/${prefix}bootstrap_v$to"
              else s"$out/${prefix}delta_v${from}_v$to"
            df.write.mode("overwrite").parquet(dir)
            // count from the written files, not a second plan execution
            spark.read.parquet(dir).count()
          },
          intervalMs = intervalMs(opts), durationMs = durationMs(opts),
          rebootstrap = opts.contains("rebootstrap"),
          cdf = opts.contains("cdf"))
        emitted.map(emissionLine("emitted", _)) ++ report(spark, table)
      case "changes" =>
        // CDC OUT: emit the changelog a downstream replica applies to move
        // from snapshot --from to --to (defaults: last commit's delta).
        // --cdf emits the change-data-feed shape instead: before images
        // (_change_type update_preimage/update_postimage/insert/delete)
        // for derived-aggregate maintenance by retraction.
        val t = LakeTable.load(spark, table)
        val to = opts.get("to").map(_.toInt).getOrElse(t.currentVersion)
        // floor -1, not 0: on a table whose only commit is v0 the default
        // delta is the full initial changelog, not a silent empty range
        val from = opts.get("from").map(_.toInt).getOrElse(math.max(-1, to - 1))
        val asCdf = opts.contains("cdf")
        val df = if (asCdf) t.changesBetweenCdf(from, to)
          else t.changesBetween(from, to)
        opts.get("out").foreach(o => df.write.mode("overwrite").parquet(o))
        // count from the materialized export when one was written — the
        // changelog plan is data-sized and must not execute twice
        val counted = opts.get("out").map(spark.read.parquet(_)).getOrElse(df)
        val tagCol = if (asCdf) "_change_type" else "_op"
        val byOp = counted.groupBy(tagCol).count().collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        val summary = if (asCdf)
          s"cdf $from->$to " + Seq("insert", "update_preimage",
            "update_postimage", "delete")
            .map(k => s"$k=${byOp.getOrElse(k, 0L)}").mkString(" ")
        else s"changes $from->$to upserts=${byOp.getOrElse("U", 0L)} " +
          s"deletes=${byOp.getOrElse("D", 0L)}"
        Seq(summary + opts.get("out").map(o => s" written=$o").getOrElse(""))
      case "show" =>
        report(spark, table)
      case other =>
        sys.error(s"unknown command '$other' " +
          "(create|tail|replay|merge|changes|materialize|replicate|compact|rebucket|maintain|rollback|expire|gc|show)")
    }
  }

  /** Shared --interval / --duration-sec parsing of the feed commands. */
  private def intervalMs(opts: Map[String, String]): Long =
    (opts.get("interval").map(_.toDouble).getOrElse(5.0) * 1000).toLong

  private def durationMs(opts: Map[String, String]): Option[Long] =
    opts.get("duration-sec").map(d => (d.toDouble * 1000).toLong)

  private def emissionLine(verb: String, e: graft.cdc.ChangeFeed.Emitted): String =
    s"$verb ${if (e.from == -1) "bootstrap " else s"v${e.from}->"}v${e.to} rows=${e.rows}"

  private def report(spark: SparkSession, dir: String): Seq[String] = {
    val t = LakeTable.load(spark, dir)
    val s = t.currentSnapshot
    Seq(s"table=$dir version=${s.version} schema=${s.schemaId} " +
      s"buckets=${s.numBuckets} files=${s.fileCount} bytes=${s.totalBytes} " +
      s"lastEpoch=${t.lastCommittedEpoch.getOrElse(-1L)} " +
      s"lsnMax=${s.summary.getOrElse("source-lsn-max", "-")} " +
      s"lsnHighWater=${s.summary.getOrElse("lsn-high-water", "-")} " +
      s"conflicts=${s.summary.getOrElse("conflict-count", "-")}" +
      // feed-operator diagnostics: a fence explains why a follower got
      // the re-bootstrap error; a rollback marker explains the fence
      s.summary.get("purge-version").map(v => s" purgeFence=v$v").getOrElse("") +
      s.summary.get("rolled-back-to").map(v => s" rolledBackTo=v$v").getOrElse("")) ++
      maintenanceAdvice(t)
  }

  /** `show`'s advisory line is [[Maintenance.plan]] itself — the SAME
    * decision `maintain` executes, so the advice and the action can
    * never drift apart.
    */
  private[graft] def maintenanceAdvice(t: LakeTable): Seq[String] =
    Maintenance.plan(t) match {
      case ("none", _, _) => Nil
      case ("rebucket", reason, Some(n)) =>
        Seq(s"advice: $reason — run maintain (or rebucket --buckets $n)")
      case (action, reason, _) =>
        Seq(s"advice: $reason — run maintain (or $action)")
    }

  /** `cmd --key value --flag` → (cmd, opts); bare flags map to "". */
  private[graft] def parse(args: Seq[String]): (String, Map[String, String]) = {
    require(args.nonEmpty, "usage: <command> [--key value ...]")
    var opts = Map.empty[String, String]
    var i = 1
    while (i < args.length) {
      val a = args(i)
      require(a.startsWith("--"), s"expected --option, got '$a'")
      val k = a.stripPrefix("--")
      if (i + 1 < args.length && !args(i + 1).startsWith("--")) {
        opts += k -> args(i + 1); i += 2
      } else { opts += k -> ""; i += 1 }
    }
    (args.head, opts)
  }
}
