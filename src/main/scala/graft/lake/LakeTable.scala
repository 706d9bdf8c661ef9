package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** One immutable data file of a snapshot, pinned to one key bucket and the
  * registry schema it was written under.
  */
final case class DataFile(path: String, bucket: Int, rows: Long, bytes: Long, schemaId: Int)

/** One committed table version. `summary` carries the exactly-once /
  * lineage properties (batch epoch, source LSN range, rows applied,
  * conflict count — the reference's WRITE_APPEND + staged `gsutil`+`bq
  * load` two-phase publish, /root/reference/upload_data/Submissions/round3/
  * upload_round3_files_to_cloud.sh:1-5, made atomic).
  */
final case class Snapshot(
    version: Int,
    schemaId: Int,
    numBuckets: Int,
    files: Seq[DataFile],
    summary: Map[String, String]) {
  def epoch: Option[Long] = summary.get("batch-epoch").map(_.toLong)
}

/** Iceberg-style snapshot-chain table over Parquet, built from scratch
  * (SURVEY.md §7.1 step 3 — no lake-format runtime ships in this sandbox).
  *
  * Layout:
  * {{{
  *   dir/meta/v<N>.json        — manifest per snapshot (atomic rename publish)
  *   dir/data/c<epoch>-<uuid>/_bucket=<b>/part-*.parquet — immutable data
  * }}}
  *
  * Commit protocol (two-phase, crash-safe on a rename-atomic FS): data
  * files are fully written first under a fresh commit directory, then the
  * manifest is published by an atomic rename of meta/.tmp → meta/v<N+1>
  * .json. A crash in between leaves orphan data files, never a corrupt
  * table. Readers resolve the current version by scanning meta/ for the
  * highest committed N.
  *
  * Scale note: each manifest lists every live data file (≤ numBuckets ×
  * small after compaction), so a commit writes O(files) JSON — ~10 MB at
  * 10^5 buckets, a driver-side cost of ~100 ms per commit. Iceberg's
  * manifest-list/manifest split removes that linearity; it's the one
  * piece of the format deliberately simplified here, and it caps out far
  * above this sandbox. Snapshot history is bounded by
  * [[Maintenance.expireSnapshots]].
  *
  * Schema evolution = a new snapshot pointing at a higher registry
  * schemaId; old files keep their original schemaId and are aligned
  * (null-backfill added columns, widen types) at read time.
  */
final class LakeTable private (val dir: String, spark: SparkSession) {

  import LakeTable._

  private def metaDir: Path = Paths.get(dir, "meta")
  private def dataDir: Path = Paths.get(dir, "data")

  /** registry: schemaId → StructType plus the hidden lineage columns
    * (_lsn: source LSN of the writing change; _op: live/tombstone).
    */
  def schemaFor(schemaId: Int): StructType = {
    import org.apache.spark.sql.types.{LongType, StringType, StructField}
    val base = graft.core.SchemaRegistry.schemaFor(schemaId)
    StructType(base.fields ++ Seq(
      StructField(graft.core.Schemas.LsnCol, LongType),
      StructField(graft.core.Schemas.OpCol, StringType)))
  }

  /** Committed manifest versions present on disk (expiry leaves gaps). */
  def existingVersions: Seq[Int] =
    graft.core.Fs.list(metaDir)
      .map(_.getFileName.toString)
      .collect { case ManifestName(n) => n.toInt }
      .sorted

  def currentVersion: Int = existingVersions.foldLeft(-1)(math.max)

  def currentSnapshot: Snapshot = snapshot(currentVersion)

  def snapshot(version: Int): Snapshot = {
    require(version >= 0, s"no committed snapshot (version=$version)")
    val node = mapper.readTree(metaDir.resolve(s"v$version.json").toFile)
    Snapshot(
      version = node.get("version").asInt(),
      schemaId = node.get("schemaId").asInt(),
      numBuckets = node.get("numBuckets").asInt(),
      files = node.get("files").elements().asScala.map { f =>
        DataFile(f.get("path").asText(), f.get("bucket").asInt(),
          f.get("rows").asLong(),
          if (f.has("bytes")) f.get("bytes").asLong() else 0L,
          f.get("schemaId").asInt())
      }.toSeq,
      summary = node.get("summary").fields().asScala
        .map(e => e.getKey -> e.getValue.asText()).toMap)
  }

  /** Time-travel read of any snapshot, aligned to that snapshot's schema.
    * Files are grouped by the schemaId they were written under and each
    * group is read with its own schema, then cast/null-backfilled to the
    * snapshot schema — this is what makes INT→LONG widening and added
    * columns safe on old files.
    */
  def read(s: Snapshot): DataFrame = {
    val target = schemaFor(s.schemaId)
    if (s.files.isEmpty)
      spark.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](), target)
    else
      s.files.groupBy(_.schemaId).map { case (sid, fs) =>
        align(spark.read.schema(schemaFor(sid)).parquet(fs.map(_.path): _*), target)
      }.reduce(_ unionByName _)
  }

  def read(): DataFrame = read(currentSnapshot)

  /** Table state without lineage columns and tombstones (the user-facing
    * web_pages view) — any snapshot (time travel) or current.
    */
  def readUser(s: Snapshot): DataFrame =
    read(s).filter(col(graft.core.Schemas.OpCol) =!= "D")
      .drop(graft.core.Schemas.LsnCol, graft.core.Schemas.OpCol)

  def readUser(): DataFrame = readUser(currentSnapshot)

  /** Read only the files of the given buckets (MERGE target pruning). */
  def readBuckets(s: Snapshot, buckets: Set[Int]): DataFrame = {
    val fs = s.files.filter(f => buckets.contains(f.bucket))
    val target = schemaFor(s.schemaId)
    if (fs.isEmpty)
      spark.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](), target)
    else
      fs.groupBy(_.schemaId).map { case (sid, group) =>
        align(spark.read.schema(schemaFor(sid)).parquet(group.map(_.path): _*), target)
      }.reduce(_ unionByName _)
  }

  /** Allocate a fresh commit directory for a writer (phase 1 of 2PC). */
  def newCommitDir(epoch: Long): String = {
    val p = dataDir.resolve(s"c$epoch-${java.util.UUID.randomUUID().toString.take(8)}")
    Files.createDirectories(p)
    p.toString
  }

  /** Phase 2: publish a new snapshot atomically. Fails (cleanly) if a
    * concurrent committer won the version — optimistic concurrency.
    */
  def commit(next: Snapshot): Snapshot = {
    val out = mapper.createObjectNode()
    out.put("version", next.version)
    out.put("schemaId", next.schemaId)
    out.put("numBuckets", next.numBuckets)
    val arr = out.putArray("files")
    next.files.foreach { f =>
      val n = arr.addObject()
      n.put("path", f.path); n.put("bucket", f.bucket)
      n.put("rows", f.rows); n.put("bytes", f.bytes)
      n.put("schemaId", f.schemaId)
    }
    val sm = out.putObject("summary")
    next.summary.toSeq.sortBy(_._1).foreach { case (k, v) => sm.put(k, v) }
    val tmp = metaDir.resolve(s".tmp-v${next.version}-${java.util.UUID.randomUUID()}")
    Files.writeString(tmp, mapper.writerWithDefaultPrettyPrinter().writeValueAsString(out))
    val dst = metaDir.resolve(s"v${next.version}.json")
    // POSIX rename() REPLACES an existing target, so ATOMIC_MOVE cannot
    // give optimistic concurrency. link(2) is atomic AND fails with EEXIST
    // — the loser of a commit race gets a clean error, never a clobber.
    try {
      Files.createLink(dst, tmp)
      Files.deleteIfExists(tmp)
    } catch { case e: java.nio.file.FileAlreadyExistsException =>
      Files.deleteIfExists(tmp)
      throw new IllegalStateException(
        s"concurrent commit lost: v${next.version} already exists", e)
    }
    next
  }

  /** Metadata-only commit (reference analog K7: annotation write-back,
    * reannotate_files.R:11-19): new snapshot, same data files and schema,
    * updated summary properties.
    */
  def updateProperties(props: Map[String, String]): Snapshot = {
    val s = currentSnapshot
    val inherited = s.summary.get("last-epoch")
      .map(v => Map("last-epoch" -> v)).getOrElse(Map.empty)
    commit(Snapshot(s.version + 1, s.schemaId, s.numBuckets, s.files,
      inherited ++ props))
  }

  /** Highest batch epoch already committed — the exactly-once gate.
    * Every commit (merge, metadata, compaction) carries the running
    * `last-epoch` watermark forward, so one manifest read answers this in
    * O(1) and the watermark survives snapshot expiry. Falls back to a
    * full-chain scan for manifests written before the key existed.
    */
  def lastCommittedEpoch: Option[Long] = {
    val cur = currentSnapshot
    cur.summary.get("last-epoch").map(_.toLong)
      .orElse(existingVersions.flatMap(i => snapshot(i).epoch)
        .reduceOption(_ max _))
  }
}

object LakeTable {

  private val mapper = new ObjectMapper()
  private val ManifestName = "v(\\d+)\\.json".r

  def create(spark: SparkSession, dir: String, schemaId: Int,
      numBuckets: Int): LakeTable = {
    val t = new LakeTable(dir, spark)
    Files.createDirectories(Paths.get(dir, "meta"))
    Files.createDirectories(Paths.get(dir, "data"))
    t.commit(Snapshot(0, schemaId, numBuckets, Nil,
      Map("created" -> "true")))
    t
  }

  def load(spark: SparkSession, dir: String): LakeTable = {
    require(Files.exists(Paths.get(dir, "meta")), s"not a lake table: $dir")
    new LakeTable(dir, spark)
  }

  def exists(dir: String): Boolean = Files.exists(Paths.get(dir, "meta"))

  /** Cast / null-backfill `df` to `target` column-by-column. */
  private[lake] def align(df: DataFrame, target: StructType): DataFrame =
    df.select(target.fields.map { f =>
      if (df.columns.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }.toSeq: _*)
}
