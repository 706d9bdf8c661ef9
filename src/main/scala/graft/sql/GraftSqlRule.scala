package graft.sql

import graft.cdc.Merge
import graft.core.SchemaRegistry
import graft.lake.LakeTable
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.QueryPlan
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructType}

/** Resolution rule making graft lake tables first-class in `spark.sql`
  * (SURVEY.md §4.2; round-1 verdict next-round item 9). Two lowerings:
  *
  *  1. '''Reads''': a resolved `DataSourceV2Relation` over a [[GraftTable]]
  *     is replaced by the current snapshot's parquet scan
  *     (`LakeTable.readUser()`'s analyzed plan), aliased onto the
  *     relation's attribute ids — so `SELECT * FROM graft.t` runs through
  *     Spark's native vectorized reader with full pushdown/pruning, no
  *     custom PartitionReader needed.
  *  2. '''MERGE INTO''': the canonical CDC statement
  *     {{{
  *     MERGE INTO graft.`/dir` t USING (<change events>) s
  *     ON t.url = s.url
  *     WHEN MATCHED AND s.op = 'D' THEN DELETE
  *     WHEN MATCHED THEN UPDATE SET *
  *     WHEN NOT MATCHED THEN INSERT *
  *     }}}
  *     lowers to [[GraftMergeCommand]] → [[graft.cdc.Merge.applyBatch]]:
  *     last-write-wins by (warc_ts, lsn) with tombstoned deletes —
  *     exactly the semantics the three clauses spell, executed as the
  *     engine's key-argmax merge instead of a row-level rewrite. Other
  *     merge shapes are rejected with an explanatory error (the engine is
  *     a CDC applier, not a general row-level mutator).
  *
  * The MERGE case must fire before the read lowering touches the target
  * relation, so targets are collected first and exempted from (1).
  */
case class GraftSqlRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val mergeTargets = plan.collect { case m: MergeIntoTable =>
      m.targetTable.collect {
        case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] => r
      }
    }.flatten.toSet
    plan.resolveOperatorsDown {
      case m: MergeIntoTable if graftTarget(m.targetTable).isDefined &&
          m.sourceTable.resolved =>
        val t = graftTarget(m.targetTable).get
        require(t.pinVersion.isEmpty,
          "cannot MERGE INTO a time-travel (VERSION AS OF) relation")
        validate(m)
        GraftMergeCommand(t.dir, m.sourceTable)
      case r: DataSourceV2Relation
          if r.table.isInstanceOf[GraftTable] && !mergeTargets.contains(r) =>
        lowerRead(r, r.table.asInstanceOf[GraftTable])
      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftMetaTable] =>
        val t = r.table.asInstanceOf[GraftMetaTable]
        lowerTo(r,
          GraftMetaTables.df(spark, t.dir, t.kind, t.pinVersion)
            .queryExecution.analyzed)
    }
  }

  private def graftTarget(p: LogicalPlan): Option[GraftTable] = p match {
    case SubqueryAlias(_, child) => graftTarget(child)
    case r: DataSourceV2Relation => r.table match {
      case t: GraftTable => Some(t)
      case _ => None
    }
    case _ => None
  }

  private def lowerRead(r: DataSourceV2Relation, t: GraftTable): LogicalPlan =
    lowerTo(r, t.lake.readUser(t.pinnedSnapshot).queryExecution.analyzed)

  /** Graft the replacement plan onto the relation's attribute ids. */
  private def lowerTo(r: DataSourceV2Relation, scan: LogicalPlan): LogicalPlan = {
    val byName = scan.output.map(a => a.name -> a).toMap
    Project(r.output.map { o =>
      Alias(byName(o.name), o.name)(exprId = o.exprId, qualifier = o.qualifier)
    }, scan)
  }

  // --- canonical-CDC-shape validation (names may still be unresolved) ---

  private def colName(e: Expression): Option[String] = e match {
    case a: UnresolvedAttribute => Some(a.nameParts.last.toLowerCase)
    case a: AttributeReference => Some(a.name.toLowerCase)
    case _ => None
  }

  private def isOpEqD(e: Expression): Boolean = e match {
    case EqualTo(l, Literal(v, StringType))
      if colName(l).contains("op") && String.valueOf(v) == "D" => true
    case EqualTo(Literal(v, StringType), r)
      if colName(r).contains("op") && String.valueOf(v) == "D" => true
    case _ => false
  }

  private def validate(m: MergeIntoTable): Unit = {
    def fail(msg: String): Nothing = throw new UnsupportedOperationException(
      "graft MERGE INTO supports the canonical CDC form only — " +
        "ON t.url = s.url; WHEN MATCHED AND s.op = 'D' THEN DELETE; " +
        "WHEN MATCHED THEN UPDATE SET *; WHEN NOT MATCHED THEN INSERT * — " +
        msg)
    m.mergeCondition match {
      case EqualTo(l, r) if colName(l).contains("url") && colName(r).contains("url") => ()
      case other => fail(s"unsupported ON condition: ${other.sql}")
    }
    // the analyzer may have already expanded SET * / INSERT * into
    // per-column assignments; accept the expansion (fromStar, or an
    // all-identity column mapping) as equivalent to the star form
    def identityAssignments(as: Seq[Assignment]): Boolean =
      as.forall { a =>
        (colName(a.key), colName(a.value)) match {
          case (Some(k), Some(v)) => k == v
          case _ => false
        }
      }
    def isUpdateAll(a: MergeAction): Boolean = a match {
      case UpdateStarAction(None) => true
      case u: UpdateAction if u.condition.isEmpty =>
        u.fromStar || identityAssignments(u.assignments)
      case _ => false
    }
    // the engine tombstones every winning op='D' event, so the statement
    // MUST spell that out — and in first-match order (DELETE before
    // UPDATE), or standard MERGE semantics would shadow the delete and
    // the lowering would diverge from what the SQL says (round-2 review:
    // accepting an update-only merge silently deleted op='D' rows)
    m.matchedActions match {
      case Seq(DeleteAction(Some(c)), u) if isOpEqD(c) && isUpdateAll(u) => ()
      case Seq(u, DeleteAction(Some(c))) if isOpEqD(c) && isUpdateAll(u) =>
        fail("WHEN MATCHED THEN UPDATE SET * is listed before the DELETE " +
          "clause — first-match semantics would shadow the delete; list " +
          "WHEN MATCHED AND s.op = 'D' THEN DELETE first")
      case other =>
        fail(s"WHEN MATCHED clauses must be exactly [AND s.op = 'D' THEN " +
          s"DELETE; THEN UPDATE SET *] — got: $other. The engine " +
          "tombstones op='D' events, so the statement must declare it")
    }
    m.notMatchedActions match {
      case Seq(InsertStarAction(None)) => ()
      case Seq(i: InsertAction)
        if i.condition.isEmpty && identityAssignments(i.assignments) => ()
      case other => fail(s"unsupported WHEN NOT MATCHED actions: $other")
    }
    if (m.notMatchedBySourceActions.nonEmpty)
      fail("WHEN NOT MATCHED BY SOURCE is not supported")
  }
}

/** Eagerly-executed MERGE: applies the source change-event plan to the
  * lake table through the engine's CDC merge and returns the batch
  * lineage row. Epoch: `graft.merge.epoch` session conf if set (replays
  * hit the exactly-once gate and no-op), else last committed + 1.
  */
case class GraftMergeCommand(tableDir: String, source: LogicalPlan)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("epoch", LongType, nullable = false)(),
    AttributeReference("applied", org.apache.spark.sql.types.BooleanType, nullable = false)(),
    AttributeReference("events_in", LongType, nullable = false)(),
    AttributeReference("rows_applied", LongType, nullable = false)(),
    AttributeReference("conflicts", LongType, nullable = false)(),
    AttributeReference("deletes", LongType, nullable = false)())

  override def innerChildren: Seq[QueryPlan[_]] = Seq(source)

  /** Smallest registry version whose schema admits every source data
    * column (up-cast only), never below the table's current version.
    */
  private def inferSchemaVersion(batch: StructType, currentId: Int): Int = {
    val meta = Set("lsn", "op", "schema_version")
    def fits(v: Int): Boolean = {
      val reg = SchemaRegistry.schemaFor(v)
      batch.fields.filterNot(f => meta.contains(f.name)).forall { f =>
        reg.fields.find(_.name == f.name)
          .exists(r => Cast.canUpCast(f.dataType, r.dataType))
      }
    }
    val v = SchemaRegistry.versions.keys.toSeq.sorted.find(fits)
      .getOrElse(throw new IllegalArgumentException(
        s"MERGE source schema matches no registry version: ${batch.simpleString}"))
    math.max(v, currentId)
  }

  override def run(session: SparkSession): Seq[Row] = {
    val classic = session.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val table = LakeTable.load(session, tableDir)
    val batch = org.apache.spark.sql.graftshim.Bridge.ofRows(classic, source)
    val epoch = session.conf.getOption("graft.merge.epoch").map(_.toLong)
      .getOrElse(table.lastCommittedEpoch.map(_ + 1L).getOrElse(0L))
    val v = inferSchemaVersion(batch.schema, table.currentSnapshot.schemaId)
    val s = Merge.applyBatch(classic, table, batch, epoch, batchSchemaVersion = v,
      // session-conf knobs, same surface the CLI exposes as flags
      quarantineDir = session.conf.getOption("graft.merge.quarantineDir"))
    // same lineage sink as the stream drivers — SQL merges show up in
    // the $metrics metadata table too
    if (s.applied) graft.cdc.Metrics.append(tableDir, s)
    Seq(Row(s.epoch, s.applied, s.eventsIn, s.rowsApplied, s.conflicts, s.deletes))
  }
}
