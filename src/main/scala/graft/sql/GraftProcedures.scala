package graft.sql

import graft.lake.{LakeTable, Maintenance}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{
  BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL `CALL` surface for lake maintenance — the DSv2 procedure API
  * (Spark 4's ProcedureCatalog), so every operator action the CLI offers
  * is also one SQL statement away for a warehouse user:
  *
  * {{{
  *   CALL graft.system.compact(table => 'pages')
  *   CALL graft.system.compact(table => 'pages', purge_tombstones => true)
  *   CALL graft.system.rebucket(table => 'pages', buckets => 4096)
  *   CALL graft.system.rollback(table => 'pages', version => 7)
  *   CALL graft.system.expire_snapshots(table => 'pages', keep_last => 10)
  *   CALL graft.system.gc(table => 'pages')          -- min_age_sec => 3600
  * }}}
  *
  * Each returns its outcome as one result row (new version / counts), so
  * a maintenance job can assert on what it did. The `table` argument is a
  * warehouse-relative name or an absolute table directory — the same
  * resolution as every other `graft.` identifier.
  *
  * Reference analog: the operator-run maintenance scripts
  * (/root/reference/upload_data/Teams/upload_team_tables.R full-refresh,
  * query_queues.sh re-polls) given a governed, auditable SQL spelling.
  */
private[sql] object GraftProcedures {

  private val Namespace = Array("system")

  def list: Array[Identifier] =
    names.map(n => Identifier.of(Namespace, n)).toArray

  private val names =
    Seq("compact", "rebucket", "rollback", "expire_snapshots", "gc",
      "auto_maintain", "set_write_mode")

  def load(catalog: GraftCatalog, ident: Identifier): UnboundProcedure = {
    def spark = SparkSession.active
    def tableOf(input: InternalRow): LakeTable =
      LakeTable.load(spark, catalog.resolveDir(input.getUTF8String(0).toString))
    ident.name() match {
      case "compact" => new MaintenanceProcedure(
        "compact",
        Array(in("table", StringType),
          in("purge_tombstones", BooleanType, Some("false"))),
        new StructType().add("version", IntegerType).add("files", IntegerType),
        input => {
          val s = Maintenance.compact(spark, tableOf(input),
            purgeTombstones = !input.isNullAt(1) && input.getBoolean(1))
          Seq(s.version, s.fileCount)
        })
      case "rebucket" => new MaintenanceProcedure(
        "rebucket",
        Array(in("table", StringType), in("buckets", IntegerType)),
        new StructType().add("version", IntegerType)
          .add("buckets", IntegerType).add("files", IntegerType),
        input => {
          val s = Maintenance.rebucket(spark, tableOf(input), input.getInt(1))
          Seq(s.version, s.numBuckets, s.fileCount)
        })
      case "rollback" => new MaintenanceProcedure(
        "rollback",
        Array(in("table", StringType), in("version", IntegerType)),
        new StructType().add("version", IntegerType)
          .add("rolled_back_to", IntegerType),
        input => {
          val s = Maintenance.rollback(spark, tableOf(input), input.getInt(1))
          Seq(s.version, s.summary("rolled-back-to").toInt)
        })
      case "expire_snapshots" => new MaintenanceProcedure(
        "expire_snapshots",
        Array(in("table", StringType), in("keep_last", IntegerType),
          // only expire snapshots at least this old (time-travel SLA);
          // NULL = count-based window only
          in("min_age_sec", LongType, Some("NULL"))),
        new StructType().add("expired", IntegerType),
        input => Seq(Maintenance.expireSnapshots(tableOf(input),
          keepLast = input.getInt(1),
          olderThanMs = if (input.isNullAt(2)) None
            else Some(System.currentTimeMillis() - input.getLong(2) * 1000L))))
      case "gc" => new MaintenanceProcedure(
        "gc",
        Array(in("table", StringType),
          in("min_age_sec", LongType, Some("3600"))),
        new StructType().add("removed", IntegerType),
        input => Seq(Maintenance.gc(tableOf(input),
          minAgeMs = (if (input.isNullAt(1)) 3600L
            else input.getLong(1)) * 1000L)))
      case "auto_maintain" => new MaintenanceProcedure(
        "auto_maintain",
        Array(in("table", StringType),
          in("purge_tombstones", BooleanType, Some("false")),
          in("target_bucket_mb", LongType, Some("256")),
          in("churn_threshold", IntegerType, Some("64"))),
        new StructType().add("action", StringType)
          .add("reason", StringType).add("version", IntegerType),
        input => {
          val (action, reason, v) = Maintenance.autoMaintain(spark,
            tableOf(input),
            targetBucketBytes =
              (if (input.isNullAt(2)) 256L else input.getLong(2)) << 20,
            churnThreshold = if (input.isNullAt(3)) 64 else input.getInt(3),
            purgeTombstones = !input.isNullAt(1) && input.getBoolean(1))
          Seq(action, reason, v)
        })
      case "set_write_mode" => new MaintenanceProcedure(
        "set_write_mode",
        Array(in("table", StringType), in("mode", StringType)),
        new StructType().add("version", IntegerType).add("mode", StringType),
        input => {
          val mode = input.getUTF8String(1).toString
          require(mode == "cow" || mode == "mor",
            s"write mode must be 'cow' (copy-on-write) or 'mor' " +
              s"(merge-on-read), got '$mode'")
          val s = tableOf(input)
            .updateProperties(Map("write-mode" -> mode))
          Seq(s.version, mode)
        })
      case other => throw new IllegalArgumentException(
        s"unknown procedure graft.system.$other " +
          s"(available: ${names.mkString(", ")})")
    }
  }

  private def in(name: String, dt: DataType,
      default: Option[String] = None): ProcedureParameter = {
    val b = ProcedureParameter.in(name, dt)
    default.foreach(b.defaultValue)
    b.build()
  }

  /** One maintenance action: bind is identity (parameters are fixed and
    * Spark's ProcedureArgumentCoercion aligns/coerces the call site),
    * call runs the action on the driver and returns its outcome as a
    * single-row [[LocalScan]].
    */
  private final class MaintenanceProcedure(
      procName: String,
      params: Array[ProcedureParameter],
      out: StructType,
      body: InternalRow => Seq[Any])
    extends UnboundProcedure with BoundProcedure {

    override def name(): String = procName
    override def description(): String = s"graft lake maintenance: $procName"
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params
    override def isDeterministic: Boolean = false

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val vals = body(input).map {
        case s: String => UTF8String.fromString(s)
        case v => v
      }
      val scan: Scan = new LocalScan {
        override def rows(): Array[InternalRow] =
          Array(InternalRow.fromSeq(vals))
        override def readSchema(): StructType = out
      }
      java.util.Collections.singletonList(scan).iterator()
    }
  }
}
