package graft.rpt

import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{FilterExec, SparkPlan}

/**
 * Physical-plan rule that wraps each spliced transfer probe in
 * [[AdaptiveProbe]] (the reference's `SelectivityOptionalFilter` analog —
 * see that class's scaladoc for semantics and the superset-safety
 * argument).
 *
 * The wrap happens HERE, after physical planning, and deliberately not at
 * the logical splice: a wrapped probe in the logical plan changes how
 * `FileSourceStrategy` classifies the conjunct — the bare
 * `might_contain` is excluded from the scan's `dataFilters`, but the
 * wrapped form slipped through, duplicating every build subquery into a
 * second physical instance on the `FileScan` node (measured on q35: 16
 * subquery instances for 8 logical builds, and the rule-on side paying
 * ~13% — 1.21× → 1.03× — for builds that executed twice). Rewriting
 * `FilterExec` conditions after the scan split exists leaves the logical
 * plan, scan pushdown, and subquery reuse byte-identical to the bare
 * probe; only the per-row evaluation gains the sampling latch.
 *
 * Injected on both channels, mirroring [[StripNoOpRuntimeFilters]]: as an
 * AQE query-stage optimizer rule (stage-compiled filters) and as a
 * columnar pre-transition rule (non-adaptive plans, and the physical
 * plans of build subqueries — whose own probes are equally latchable).
 * Double application is idempotent: `wrap` never descends into an
 * existing [[AdaptiveProbe]].
 */
case class WrapAdaptiveProbes() extends Rule[SparkPlan] {

  override def apply(plan: SparkPlan): SparkPlan = {
    if (!RptConf.adaptiveProbeDrop(conf)) return plan
    val sample = RptConf.adaptiveProbeSample(conf)
    val keep = RptConf.adaptiveProbeKeep(conf)
    def wrap(e: Expression): Expression = e match {
      case a: AdaptiveProbe => a
      case b: BloomFilterMightContain => AdaptiveProbe(b, sample, keep)
      case other => other.mapChildren(wrap)
    }
    plan.transform {
      case f: FilterExec
          if f.condition.exists(_.isInstanceOf[BloomFilterMightContain]) =>
        val wrapped = wrap(f.condition)
        if (wrapped.fastEquals(f.condition)) f else f.copy(condition = wrapped)
    }
  }
}
