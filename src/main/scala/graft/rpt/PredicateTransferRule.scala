package graft.rpt

import java.util.{IdentityHashMap => JIdentityHashMap}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{BloomFilterAggregate, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/**
 * Robust Predicate Transfer as a Catalyst rule.
 *
 * For every [[ScheduledOp]] the rule splices
 * {{{
 *   Filter(BloomFilterMightContain(
 *            GetStructField(ScalarSubquery(
 *              Aggregate(Nil, struct(bloom_filter_agg(xxhash64(buildKeys)),
 *                                    min(k), max(k), ...),
 *                        <build unit plan AS FILTERED BY EARLIER OPS>)), i),
 *            XxHash64(probeKeys)),
 *          <probe unit plan>)
 * }}}
 * above the probe-side table unit. Building each stage's subquery over the
 * already-filtered build side is what makes the transfer transitive — the
 * Spark equivalent of the reference's stacked CREATE_BF/USE_BF operators
 * with pipeline dependencies (src/operators/physical_create_bf.cpp:559-613).
 *
 * Consecutive ops that build from the same unit are merged into ONE
 * subquery returning a struct (one scan builds several bloom filters —
 * the reference's BuildStackedBFOperators, rpt_optimizer.cpp:1164-1265).
 * Min/max bounds ride in the same struct and become range predicates on
 * the probe side (reference's min/max dynamic filters,
 * src/operators/physical_create_bf.cpp:82-176).
 *
 * Execution-model notes (SURVEY.md §3): the subquery runs once (partial
 * bloom-filter aggregates per task, merged at a single final aggregate) and
 * its result is broadcast to every executor evaluating the filter. Spark's
 * ReuseSubquery dedupes the repeated subquery instances that arise when one
 * build feeds several probes.
 */
case class PredicateTransferRule() extends Rule[LogicalPlan] {

  // alias prefix marks our subqueries (idempotence guard); the _fwd/_bwd
  // suffix lets profiling roll up selectivity per pass, like the
  // reference's per-pass reports (rpt_profiling.hpp:122-216)
  private val SUBQ_ALIAS = "graft_rpt_bf"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!RptConf.enabled(conf) || !plan.resolved || plan.isStreaming ||
        alreadyApplied(plan)) {
      return plan
    }
    val graph = JoinGraph.extract(plan)
    if (graph.edges.size < RptConf.minEdges(conf)) return plan
    val ops = RptConf.heuristic(conf) match {
      case "joinOrder" => TransferSchedule.joinOrder(graph,
        RptConf.passMode(conf), RptConf.flipRoots(conf))
      case _ => TransferSchedule.largestRoot(graph, RptConf.passMode(conf))
    }
    if (ops.isEmpty) return plan
    if (RptConf.displayDag(conf)) {
      logInfo(s"[graft-rpt] transfer schedule:\n${DagPrinter.render(graph, ops)}")
    }
    val rewritten = applyOps(plan, graph, ops)
    if (RptConf.displayPhysicalDag(conf)) {
      logInfo(s"[graft-rpt] rewritten plan:\n${rewritten.treeString}")
    }
    rewritten
  }

  /** Idempotence guard: our injected subqueries are recognizable by the
   *  aggregate alias. Runs-per-fixpoint-iteration safe. */
  private def alreadyApplied(plan: LogicalPlan): Boolean = {
    plan.exists { node =>
      node.expressions.exists(_.exists {
        case ss: ScalarSubquery => ss.plan match {
          case Aggregate(_, Seq(a: Alias), _, _) =>
            a.name.startsWith(SUBQ_ALIAS)
          case _ => false
        }
        case _ => false
      })
    }
  }

  private def applyOps(
      plan: LogicalPlan,
      graph: JoinGraph,
      ops: Seq[ScheduledOp]): LogicalPlan = {
    val filterType = RptConf.filterType(conf)
    val withBf = filterType != "minmaxOnly"
    val withMinmax = filterType != "bfOnly"
    val maxItems = RptConf.maxBfItems(conf)
    val defaultItems = RptConf.defaultBfItems(conf)

    // per-unit current (filtered-so-far) plan and accumulated conditions
    val cur = mutable.HashMap[Int, LogicalPlan]() ++
      graph.units.map(u => u.id -> u.plan)
    val pendingConds = mutable.HashMap[Int, mutable.ArrayBuffer[Expression]]()
    // Build-side snapshots at the end of the forward pass. Backward-pass
    // builds read THESE rather than the fully-cascaded plans: a
    // less-filtered build side yields a superset bloom filter — always
    // correct, marginally less selective — and caps plan growth at
    // polynomial (full fwd+bwd cascading is exponential in join-tree depth:
    // each backward subquery would embed plans that embed forward
    // subqueries embedding other plans, and so on).
    lazy val fwdFinal = mutable.HashMap[Int, LogicalPlan]()
    var inBackward = false

    // One plain single-alias Aggregate subquery per value (bloom filter /
    // min / max). This is exactly the shape Catalyst's MergeScalarSubqueries
    // understands, so consecutive CREATEs over the same build side merge
    // into one scan automatically — the Spark-native equivalent of the
    // reference's BuildStackedBFOperators (rpt_optimizer.cpp:1164-1265).
    def scalarAgg(expr: Expression, buildPlan: LogicalPlan,
        keys: Seq[Expression], forward: Boolean): ScalarSubquery = {
      val needed = AttributeSet(keys.flatMap(_.references))
      val projected = Project(buildPlan.output.filter(needed.contains), buildPlan)
      val alias = SUBQ_ALIAS + (if (forward) "_fwd" else "_bwd")
      ScalarSubquery(
        Aggregate(Nil, Seq(Alias(expr, alias)()), projected))
    }

    // cost gates (see RptConf scaladoc): don't probe tiny units, don't
    // build over huge ones. Un-probed units also keep their build plans
    // flat, which collapses the nested-subquery cascade.
    val minProbeRows = RptConf.minProbeRows(conf).toDouble
    val maxBuildRows = RptConf.maxBuildRows(conf).toDouble
    val buildProbeRatio = RptConf.minBuildProbeRatio(conf)

    ops.foreach { op =>
      if (!inBackward && !op.forward) {
        inBackward = true
        graph.units.foreach(u => fwdFinal(u.id) = cur(u.id))
      }
      val gated = graph.units(op.probe).card < minProbeRows ||
        graph.units(op.build).card > maxBuildRows ||
        (buildProbeRatio > 0 &&
          graph.units(op.build).card * buildProbeRatio >
            graph.units(op.probe).card)
      if (!gated) {
        val buildPlan = if (inBackward) fwdFinal(op.build) else cur(op.build)
        val conds = mutable.ArrayBuffer[Expression]()
        if (withBf) {
          val est = estimatedItems(buildPlan, graph.units(op.build).card,
            maxItems, defaultItems)
          val bfAgg = new BloomFilterAggregate(new XxHash64(op.buildKeys), est)
            .toAggregateExpression()
          conds += BloomFilterMightContain(
            scalarAgg(bfAgg, buildPlan, op.buildKeys, op.forward),
            new XxHash64(op.probeKeys))
        }
        if (withMinmax) {
          op.buildKeys.zip(op.probeKeys).foreach { case (bk, pk) =>
            if (RowOrdering.isOrderable(bk.dataType)) {
              conds += GreaterThanOrEqual(pk,
                scalarAgg(Min(bk).toAggregateExpression(), buildPlan,
                  Seq(bk), op.forward))
              conds += LessThanOrEqual(pk,
                scalarAgg(Max(bk).toAggregateExpression(), buildPlan,
                  Seq(bk), op.forward))
            }
          }
        }
        if (conds.nonEmpty) {
          val cond = conds.reduce(And)
          cur(op.probe) = Filter(cond, cur(op.probe))
          pendingConds.getOrElseUpdate(op.probe,
            mutable.ArrayBuffer[Expression]()) += cond
        }
      }
    }

    // splice: wrap each ORIGINAL unit subtree (identity match) with its
    // accumulated filters, handling units nested inside barrier units
    val byIdentity = new JIdentityHashMap[LogicalPlan, Seq[Expression]]()
    pendingConds.foreach { case (id, conds) =>
      byIdentity.put(graph.units(id).plan, conds.toSeq)
    }

    def splice(p: LogicalPlan): LogicalPlan = {
      val conds = byIdentity.get(p) // look up BEFORE children are rebuilt
      val rebuilt = p.mapChildren(splice)
      if (conds != null) conds.foldLeft(rebuilt)((acc, c) => Filter(c, acc))
      else rebuilt
    }
    splice(plan)
  }

  /** Bloom-filter sizing from build-side stats (the reference sizes at
   *  finalize from true cardinality, physical_create_bf.cpp:382-406; we size
   *  statically from stats — SURVEY.md §4.1 #11). */
  private def estimatedItems(
      buildPlan: LogicalPlan,
      unitCard: Double,
      maxItems: Long,
      defaultItems: Long): Long = {
    val est = buildPlan.stats.rowCount.map(_.toDouble)
      .getOrElse(math.min(unitCard, defaultItems.toDouble))
    math.max(4096L, math.min(est.toLong, maxItems))
  }
}
