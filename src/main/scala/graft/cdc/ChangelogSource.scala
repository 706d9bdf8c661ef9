package graft.cdc

import graft.lake.LakeTable
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.connector.read.streaming.{
  Offset => OffsetV2, ReadLimit, SupportsAdmissionControl,
  SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.streaming.{Offset, Sink, Source}
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.sources.{
  DataSourceRegister, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType

/** Stream offset = lake table version: the changelog position is exactly
  * the snapshot chain, so Spark's checkpointed offset log records version
  * ranges and a restart replays precisely the uncommitted range.
  */
final case class VersionOffset(version: Long) extends Offset {
  override val json: String = version.toString
}

/** The changelog as a FIRST-CLASS Structured Streaming source (round-3
  * verdict #2, completed: the driver-loop [[ChangeFeed]] stays as the
  * callback API; this is the `spark.readStream.format("graft-changelog")`
  * surface — the Delta/Iceberg CDF-read shape on the graft lake format).
  *
  * Per micro-batch it emits `changesBetween(from, to]` where the range
  * endpoints come from Spark's own checkpointed offset log — so delivery
  * is exactly-once TO THE SINK CONTRACT: a crash between getBatch and the
  * batch commit re-plans the identical range (changesBetween is
  * deterministic given retained snapshots), and an idempotent sink (the
  * graft-lake sink gates on batchId) makes the pipeline exactly-once end
  * to end.
  *
  * Range semantics (same contracts as [[LakeTable.changesBetween]]):
  *  - a fresh checkpoint's first batch is the Iceberg-style INITIAL
  *    changelog (`from = -1`): the full current snapshot. `option
  *    ("startingVersion", "latest")` skips it and tails new changes only;
  *    `option("startingVersion", n)` starts from version n's delta.
  *  - an expired `from` (retention breach) or a purge-tombstones
  *    compaction inside a pending range FAILS the stream with the
  *    re-bootstrap guidance error — never silently-wrong deltas. The
  *    operator restarts with a fresh checkpoint (→ full-snapshot
  *    bootstrap), the replace-state resync.
  *
  * Catch-up shape at scale: one batch over (from, current] is ONE
  * manifest-ref diff + a read of only the net-changed buckets — a replica
  * that fell 10k versions behind pays one coarse diff that collapses the
  * intermediate churn, not 10k incremental reads. `option
  * ("maxVersionsPerBatch", k)` bounds the range instead when steady
  * commit granularity on the replica matters more than minimal read
  * volume.
  *
  * The declared schema is fixed at stream start (the current snapshot's
  * schema, including `_lsn`/`_op`); a mid-stream ALTER TABLE keeps
  * emitting the declared columns (new columns appear after a restart —
  * the standard streaming-source evolution contract).
  */
final class ChangelogSource(spark: SparkSession, tableDir: String,
    declaredSchema: StructType, initialFrom: Int,
    maxVersionsPerBatch: Option[Int], cdf: Boolean = false)
  extends Source with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  override def schema: StructType = declaredSchema

  // Trigger.AvailableNow pins its end version at prepare time, so a drain
  // terminates even while merges keep landing on the source table.
  @volatile private var availableNowCap: Option[Long] = None

  private def table: LakeTable = LakeTable.load(spark, tableDir)

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(table.currentVersion.toLong)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  private def versionOf(o: OffsetV2): Long = o match {
    case VersionOffset(v) => v
    case other => other.json.trim.toLong // SerializedOffset after restart
  }

  override def latestOffset(startOffset: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val start = Option(startOffset).map(versionOf).getOrElse(initialFrom.toLong)
    var end = table.currentVersion.toLong
    availableNowCap.foreach(cap => end = math.min(end, cap))
    maxVersionsPerBatch.foreach(m => end = math.min(end, start + m))
    if (end <= start) null else VersionOffset(end)
  }

  /** Legacy (pre-admission-control) polling path; kept honest. */
  override def getOffset: Option[Offset] = {
    val end = table.currentVersion.toLong
    if (end < 0 || end <= initialFrom.toLong) None else Some(VersionOffset(end))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(o => versionOf(o)).getOrElse(initialFrom.toLong).toInt
    val to = versionOf(end).toInt
    // align: a mid-stream ALTER TABLE adds columns to the delta; the
    // stream keeps its declared schema until restart
    val changes = if (cdf) table.changesBetweenCdf(from, to)
      else table.changesBetween(from, to)
    Bridge.asStreamingFrame(LakeTable.align(changes, declaredSchema))
  }

  override def deserializeOffset(json: String): OffsetV2 =
    VersionOffset(json.trim.toLong)

  // retention is the table's own contract (Maintenance.expireSnapshots);
  // nothing to release per-batch
  override def commit(end: OffsetV2): Unit = ()

  override def stop(): Unit = ()

  override def toString: String = s"ChangelogSource[$tableDir]"
}

/** `format("graft-changelog")` registration (META-INF/services). */
final class GraftChangelogProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-changelog"

  private def tableDir(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-changelog: set .option(\"path\", <lake table dir>)"))

  /** `option("cdf", "true")` emits the change-data-feed shape instead of
    * after-image deltas: `_op` replaced by `_change_type`
    * (insert / update_preimage / update_postimage / delete-with-payload)
    * + `_commit_version` — for foreachBatch consumers maintaining derived
    * state by retraction (e.g. [[graft.cdc.MaterializedAgg]]'s streaming
    * twin), NOT for the `graft-lake` sink (which applies upsert/tombstone
    * events).
    */
  private def isCdf(parameters: Map[String, String]): Boolean =
    parameters.get("cdf").exists(_.trim.equalsIgnoreCase("true"))

  private def declaredFor(t: LakeTable, parameters: Map[String, String]): StructType = {
    val base = t.schemaFor(t.currentSnapshot.schemaId)
    if (!isCdf(parameters)) base
    else StructType(
      base.fields.filterNot(_.name == graft.core.Schemas.OpCol)
        :+ org.apache.spark.sql.types.StructField("_change_type",
          org.apache.spark.sql.types.StringType, nullable = false)
        :+ org.apache.spark.sql.types.StructField("_commit_version",
          org.apache.spark.sql.types.IntegerType, nullable = false))
  }

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val t = LakeTable.load(sqlContext.sparkSession, tableDir(parameters))
    (s"${shortName()}:${tableDir(parameters)}",
      schema.getOrElse(declaredFor(t, parameters)))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val spark = sqlContext.sparkSession
    val dir = tableDir(parameters)
    val t = LakeTable.load(spark, dir)
    val declared = schema.getOrElse(declaredFor(t, parameters))
    // `startingVersion` resolves ONCE per checkpoint and persists under
    // the source's metadataPath (the Kafka-source pattern): without it, a
    // restart that re-resolved "latest" against a since-moved table would
    // silently skip every delta landed while the query was down.
    val initialFrom = readInitialFrom(spark, metadataPath).getOrElse {
      val resolved = parameters.get("startingVersion") match {
        case None => -1
        case Some("latest") => t.currentVersion
        case Some(v) => v.toIntOption.filter(_ >= 0).map(_ - 1).getOrElse(
          throw new IllegalArgumentException("graft-changelog: " +
            s"startingVersion must be a version number or 'latest', got '$v'"))
      }
      writeInitialFrom(spark, metadataPath, resolved)
      resolved
    }
    val maxV = parameters.get("maxVersionsPerBatch").map(_.trim.toInt)
    require(maxV.forall(_ >= 1),
      s"graft-changelog: maxVersionsPerBatch must be >= 1, got $maxV")
    new ChangelogSource(spark, dir, declared, initialFrom, maxV,
      cdf = isCdf(parameters))
  }

  // metadataPath may carry a scheme (file:/…), so go through Hadoop FS
  // like every other source's metadata log does
  private def initFile(spark: SparkSession, metadataPath: String) = {
    val p = new org.apache.hadoop.fs.Path(metadataPath, "starting-version")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    (fs, p)
  }

  private def readInitialFrom(spark: SparkSession,
      metadataPath: String): Option[Int] = {
    val (fs, p) = initFile(spark, metadataPath)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(), "UTF-8").trim.toInt)
      finally in.close()
    }
  }

  private def writeInitialFrom(spark: SparkSession, metadataPath: String,
      v: Int): Unit = {
    val (fs, p) = initFile(spark, metadataPath)
    // single-driver, first-start-only write; overwrite=false so a rival
    // (impossible in practice) fails loudly rather than torn
    val out = fs.create(p, false)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
  }
}

/** `format("graft-lake")` streaming SINK: any stream of change events
  * (the changelog source's `_lsn`/`_op` spelling or a producer's
  * `lsn`/`op`) applied through the engine's epoch-gated argmax merge.
  * Epoch = Spark batchId in this checkpoint's own gate namespace, so the
  * crash-replayed batch after a restart is a no-op — the foreachBatch
  * tail's exactly-once discipline, available to any `writeStream` user.
  */
final class GraftLakeSink(spark: SparkSession, tableDir: String,
    gateKey: String, schemaVersion: Int, quarantineDir: Option[String])
  extends Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val table = LakeTable.load(spark, tableDir)
    var batch = Bridge.asBatchFrame(data)
    if (batch.columns.contains(graft.core.Schemas.LsnCol))
      batch = batch.withColumnRenamed(graft.core.Schemas.LsnCol, "lsn")
    if (batch.columns.contains(graft.core.Schemas.OpCol))
      batch = batch.withColumnRenamed(graft.core.Schemas.OpCol, "op")
    // no batchBytesHint: micro-batches are deltas, and the prune path's
    // stats probe sizes them correctly; a changelog bootstrap into a
    // fresh replica prunes against an empty table (cheap) either way
    val stats = Merge.applyBatch(spark, table, batch, epoch = batchId,
      batchSchemaVersion = schemaVersion,
      quarantineDir = quarantineDir,
      partitionLineage = true,
      gateKey = gateKey)
    if (stats.applied) Metrics.append(tableDir, stats)
  }

  override def toString: String = s"GraftLakeSink[$tableDir]"
}

/** `format("graft-lake")` registration (META-INF/services). */
final class GraftLakeSinkProvider extends StreamSinkProvider with DataSourceRegister {

  override def shortName(): String = "graft-lake"

  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    val spark = sqlContext.sparkSession
    val dir = parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-lake sink: set .option(\"path\", <lake table dir>)"))
    val checkpoint = parameters.getOrElse("checkpointLocation",
      throw new IllegalArgumentException("graft-lake sink: " +
        "checkpointLocation is required — batchIds gate exactly-once " +
        "per checkpoint namespace"))
    val t = LakeTable.load(spark, dir) // must exist: creation is explicit
    val sv = parameters.get("schemaVersion").map(_.trim.toInt)
      .getOrElse(t.currentSnapshot.schemaId)
    new GraftLakeSink(spark, dir, CdcStream.gateKeyFor(checkpoint), sv,
      parameters.get("quarantineDir"))
  }
}
