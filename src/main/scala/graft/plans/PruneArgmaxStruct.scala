package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Max}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Column pruning THROUGH the lake's latest-wins argmax.
  *
  * [[graft.lake.LakeTable.resolveLatest]] folds merge-on-read layers with
  * `max(struct(warc_ts, _lsn, payload...))` per url. Catalyst's own
  * ColumnPruning cannot prune inside that struct: a query that extracts
  * only `_m.lang` still builds the full struct, so the parquet scan under
  * the agg reads `html` (the dominant bytes of a web-pages table) for a
  * projection that never uses it. In general pruning payload fields out
  * of a `max(struct(...))` would change results — later struct fields
  * break ties — but the ENGINE knows its argmax is decided entirely by
  * the (warc_ts, _lsn) prefix: `_lsn` is globally unique per event, so
  * within a url group two rows either differ in the prefix (payload never
  * consulted) or are the same event re-published through rival MoR layers
  * (identical payload; pruning cannot change the winner's fields).
  *
  * resolveLatest asserts that knowledge by tagging its `_m` alias with
  * [[PruneArgmaxStruct.PrefixKey]] = number of leading struct fields that
  * alone decide the max. This rule fires only on so-tagged aliases and
  * rewrites
  * {{{ Project(..., _m.f, ...)            [+ optional Filter between]
  *     Aggregate(url, max(struct(prefix..., payload...)) AS _m) }}}
  * keeping the prefix fields plus only the payload fields the project /
  * filter actually extract. It runs inside the operator-optimization
  * fixed point (injected via [[graft.GraftExtensions]]), so ColumnPruning
  * then carries the narrowing down into the scan's ReadSchema — a
  * `SELECT url, lang` or a bare `count(*)` over an uncompacted MoR table
  * stops decoding `html`/`text` entirely. At 100 TB this is the
  * difference between a metadata query costing O(hot-layer bytes) and
  * one costing O(narrow columns): the resolve tax becomes proportional
  * to the columns asked for, exactly like the plain-scan path.
  *
  * SCOPE (round-6): the rule fires only on the `Project(Aggregate)` and
  * `Project(Filter(Aggregate))` shapes matched below — a consumer the
  * fixed point never normalizes to those (a Window or Join directly
  * over the agg) keeps the full struct. Since round 6 the DEFAULT MoR
  * read path is the bucket-local [[graft.cdc.BucketBatchScan]], whose
  * scan-level column pruning covers EVERY consumer shape with no
  * optimizer rule in the loop; this rule now serves the
  * `graft.mor.resolve = agg` escape-hatch plan and any user-authored
  * prefix-tagged argmax.
  *
  * Safety gates: fires only when every reference to the tagged attribute
  * in the consuming project/filter is a direct `GetStructField` (a whole-
  * struct reference keeps the full struct), only for a plain non-distinct
  * unfiltered MAX, and the rewrite is idempotent (a second visit finds
  * every remaining field referenced and leaves the plan alone).
  */
object PruneArgmaxStruct extends Rule[LogicalPlan] {

  /** Alias-metadata key: Long = how many leading fields of the max'd
    * struct decide the ordering on their own (see class doc for why the
    * engine may assert this).
    */
  val PrefixKey = "graft.argmaxPrefixDecides"

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(_, agg: Aggregate) =>
      rewrite(p, None, agg).getOrElse(p)
    case p @ Project(_, f @ Filter(_, agg: Aggregate)) =>
      rewrite(p, Some(f), agg).getOrElse(p)
  }

  private def rewrite(p: Project, f: Option[Filter],
      agg: Aggregate): Option[Project] = {
    val consumers: Seq[Expression] = p.projectList ++ f.map(_.condition)
    val subs = scala.collection.mutable.Map[ExprId, (Attribute, Map[Int, Int])]()
    val newAggExprs = agg.aggregateExpressions.map {
      case a @ Alias(
            ae @ AggregateExpression(Max(s: CreateNamedStruct), _, false, None, _), _)
          if a.metadata.contains(PrefixKey) &&
            refsOnlyViaExtract(consumers, a.exprId) =>
        val n = s.valExprs.size
        val prefix = math.min(a.metadata.getLong(PrefixKey).toInt, n)
        val used = consumers.flatMap(collectOrds(_, a.exprId)).toSet
        val keep = ((0 until prefix) ++ used.toSeq.sorted).distinct
        if (keep.size == n) a
        else {
          val kids = keep.flatMap(i => Seq(s.children(2 * i), s.children(2 * i + 1)))
          val newAlias = Alias(
            ae.copy(aggregateFunction = Max(CreateNamedStruct(kids))), a.name)(
            a.exprId, a.qualifier, Some(a.metadata), a.nonInheritableMetadataKeys)
          subs(a.exprId) = (newAlias.toAttribute, keep.zipWithIndex.toMap)
          newAlias
        }
      case other => other
    }
    if (subs.isEmpty) return None
    def remap(e: Expression): Expression = e.transform {
      case GetStructField(ar: AttributeReference, ord, nm)
          if subs.contains(ar.exprId) =>
        val (attr, m) = subs(ar.exprId)
        GetStructField(attr, m(ord), nm)
    }
    val newAgg = agg.copy(aggregateExpressions = newAggExprs)
    val newChild = f match {
      case Some(fl) => Filter(remap(fl.condition), newAgg)
      case None => newAgg
    }
    Some(Project(
      p.projectList.map(remap(_).asInstanceOf[NamedExpression]), newChild))
  }

  /** Every occurrence of attr `id` in `es` is immediately under a
    * GetStructField — i.e. only individual fields are consumed.
    */
  private def refsOnlyViaExtract(es: Seq[Expression], id: ExprId): Boolean = {
    def ok(e: Expression): Boolean = e match {
      case GetStructField(ar: AttributeReference, _, _) if ar.exprId == id => true
      case ar: AttributeReference if ar.exprId == id => false
      case other => other.children.forall(ok)
    }
    es.forall(ok)
  }

  private def collectOrds(e: Expression, id: ExprId): Seq[Int] = e match {
    case GetStructField(ar: AttributeReference, ord, _) if ar.exprId == id =>
      Seq(ord)
    case other => other.children.flatMap(collectOrds(_, id))
  }
}
