package graft.rpt

import org.apache.spark.sql.catalyst.expressions.{Attribute, DynamicPruningExpression, Expression, GetStructField, Literal}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{InSubqueryExec, SparkPlan}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

/**
 * AQE query-stage rule that drops no-op runtime group filters from v2
 * scans.
 *
 * When a runtime-filterable v2 scan (any `SupportsRuntimeV2Filtering`
 * source — stock Spark injects these itself, independent of the RPT rule)
 * carries a `DynamicPruningSubquery` with `onlyInBroadcast = true` and the
 * planned join ends up NOT reusing a broadcast exchange (the shuffle
 * regime), `PlanAdaptiveDynamicPruningFilters` degrades the filter to
 * `DynamicPruningExpression(true)` rather than paying a standalone build.
 * That residue is semantically a no-op, but it survives into
 * `BatchScanExec.runtimeFilters`, where every execution offers it to
 * `DataSourceV2Strategy.translateRuntimeFilterV2` — which logs
 * `WARN Can't translate true to source filter` once per scan per
 * execution. At production log volume that is real noise that can bury
 * genuine warnings.
 *
 * User-injected query-stage optimizer rules run AFTER
 * `PlanAdaptiveDynamicPruningFilters` in `AdaptiveSparkPlanExec`'s rule
 * list, so this rule sees the degraded literal and removes it before the
 * stage executes. Removing a `true` conjunct from a scan's runtime
 * filters cannot change results — it filtered nothing.
 */
case class StripNoOpRuntimeFilters() extends Rule[SparkPlan] {

  private def isNoOp(e: Expression): Boolean = e match {
    case DynamicPruningExpression(Literal.TrueLiteral) => true
    // a runtime group filter whose pruning key is a COMPUTED expression
    // (stock insertion on a computed join key) can never translate to a
    // v2 column reference: translateRuntimeFilterV2 requires a pushable
    // column and BatchScanExec silently skips untranslatable filters —
    // but only after EXECUTING the filter's subquery and logging the
    // WARN. Stripping it here avoids both; scan runtime filters are
    // never row-evaluated, so nothing else consumes it.
    case DynamicPruningExpression(in: InSubqueryExec) =>
      !pushableColumn(in.child)
    case _ => false
  }

  private def pushableColumn(e: Expression): Boolean = e match {
    case _: Attribute => true
    case g: GetStructField => pushableColumn(g.child) // nested column
    case _ => false
  }

  override def apply(plan: SparkPlan): SparkPlan = plan.transform {
    case b: BatchScanExec if b.runtimeFilters.exists(isNoOp) =>
      b.copy(runtimeFilters = b.runtimeFilters.filterNot(isNoOp))
  }
}
