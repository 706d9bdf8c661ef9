package graft

import graft.functions.Md5Prefix32
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BinaryType, StringType}

/** Session extension entry point (SURVEY.md §7.3 item c): install with
  * `spark.sql.extensions=graft.GraftExtensions` or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`.
  *
  * Injects:
  *  - the `md5_prefix32` SQL function (native codegen'd expression —
  *    first 4 md5 bytes as an unsigned long);
  *  - [[FuseMd5Prefix]], an optimizer rule rewriting the portable
  *    3-expression spelling `conv(substring(md5(cast(x as binary)),1,8),
  *    16,10)` into the fused native expression, so SQL written for
  *    engine portability (e.g. shared with a DuckDB oracle) still runs
  *    the single-operation form here;
  *  - [[graft.sql.GraftSqlRule]], the SQL surface of the lake table:
  *    SELECT over `graft.<table>` lowers to the snapshot's parquet scan
  *    and the canonical CDC `MERGE INTO graft.<table> ...` lowers to
  *    [[graft.cdc.Merge.applyBatch]] (pair with
  *    `spark.sql.catalog.graft = graft.sql.GraftCatalog`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectResolutionRule(session => graft.sql.GraftSqlRule(session))
    ext.injectFunction((
      new FunctionIdentifier("md5_prefix32"),
      new ExpressionInfo(classOf[Md5Prefix32].getName, "md5_prefix32"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "md5_prefix32 expects exactly 1 argument")
        Md5Prefix32(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[graft.functions.DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_dot expects exactly 2 arguments")
        graft.functions.DotProduct(children.head, children(1))
      }))
    ext.injectOptimizerRule(_ => FuseMd5Prefix)
    // prune never-extracted payload fields out of the lake's latest-wins
    // max(struct(...)) resolve (merge-on-read layers) — see the rule's
    // doc for why the engine may assert prefix-decidedness. Runs in the
    // operator-optimization fixed point so ColumnPruning carries the
    // narrowing into the parquet ReadSchema.
    ext.injectOptimizerRule(_ => graft.plans.PruneArgmaxStruct)
  }
}

/** conv(substring(md5(cast(x as binary)), 1, 8), 16, 10) — the portable
  * md5-prefix idiom — materializes a 32-char hex string, substrings it,
  * then re-parses digits. Rewrite to cast(md5_prefix32(x) as string):
  * one digest, no hex round-trip, stays inside whole-stage codegen.
  * (conv emits the unsigned decimal digits of the first 4 digest bytes
  * with no leading zeros; Long.toString of the same value is identical.)
  */
object FuseMd5Prefix extends Rule[LogicalPlan] {
  private val one = Literal(1)
  private val eight = Literal(8)
  private val hex = Literal(16)
  private val dec = Literal(10)

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Conv(Substring(Md5(Cast(x, BinaryType, _, _)), `one`, `eight`), `hex`, `dec`, _)
          if x.dataType == StringType =>
        Cast(Md5Prefix32(x), StringType)
    }
}
