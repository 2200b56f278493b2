package graft.rpt

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.execution.{FilterExec, QueryExecution, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.util.QueryExecutionListener

/**
 * Post-execution selectivity report for injected transfer filters — the
 * analog of the reference's profiling surface (`rpt_profiling`,
 * src/include/rpt_profiling.hpp:16-217: per-op rows in/out, probe timing,
 * per-pass selectivity rollups).
 *
 * Spark-native mechanics: every injected probe is a `FilterExec` whose
 * condition contains `BloomFilterMightContain`, and every build is a
 * subquery; both already carry SQLMetrics. The report reads those metrics
 * after an action has run — no extra instrumentation in the hot path.
 */
object RptProfiling {

  final case class ProbeStat(
      node: String, pass: String, rowsIn: Long, rowsOut: Long) {
    def selectivity: Double =
      if (rowsIn <= 0) 1.0 else rowsOut.toDouble / rowsIn.toDouble
  }

  /** Collect per-probe-filter rows in/out from executed-plan metrics.
   *  Valid after an action (metrics are zero before execution). */
  def probeStats(qe: QueryExecution): Seq[ProbeStat] = {
    def walk(p: SparkPlan): Seq[ProbeStat] = {
      val here = p match {
        // AQE wraps the final plan; query stages wrap materialized subtrees
        case a: AdaptiveSparkPlanExec => return walk(a.executedPlan)
        // walk already visits each node's subqueries in its generic tail;
        // adding s.plan.subqueries here would count them twice
        case s: QueryStageExec => return walk(s.plan)
        case f: FilterExec
            if f.condition.exists(_.isInstanceOf[BloomFilterMightContain]) =>
          val out = f.metrics.get("numOutputRows").map(_.value).getOrElse(-1L)
          val in = f.child.metrics.get("numOutputRows").map(_.value)
            .getOrElse(-1L)
          // the subquery's output attribute carries the pass-tagged alias
          // (robust against ReusedSubquery's terse string form)
          val aliases = f.condition.collect {
            case s: org.apache.spark.sql.execution.ScalarSubquery =>
              s.plan.output.map(_.name)
          }.flatten ++ Seq(f.condition.toString)
          val pass =
            if (aliases.exists(_.contains("graft_rpt_bf_bwd"))) "backward"
            else if (aliases.exists(_.contains("graft_rpt_bf_fwd"))) "forward"
            else "?"
          Seq(ProbeStat(f.child.nodeName, pass, in, out))
        case _ => Nil
      }
      here ++ p.children.flatMap(walk) ++
        p.subqueries.flatMap(walk)
    }
    walk(qe.executedPlan)
  }

  /** Human-readable report: one line per probe + rollups (geomean
   *  selectivity and total rows removed, mirroring the reference's per-pass
   *  summary, rpt_profiling.hpp:122-216). */
  def report(qe: QueryExecution): String = {
    val stats = probeStats(qe)
    if (stats.isEmpty) return "rpt: no transfer filters in this plan"
    val sb = new StringBuilder("rpt probe filters (rows in -> out):\n")
    stats.zipWithIndex.foreach { case (s, i) =>
      sb.append(f"  #$i%2d [${s.pass}%-8s] ${s.node}%-24s ${s.rowsIn}%,12d -> ${s.rowsOut}%,12d  (${s.selectivity * 100}%6.2f%%)\n")
    }
    def geo(ss: Seq[ProbeStat]): Double = math.exp(
      ss.map(s => math.log(math.max(s.selectivity, 1e-12))).sum / ss.size)
    val removed = stats.map(s => math.max(0L, s.rowsIn - s.rowsOut)).sum
    // per-pass rollups, mirroring the reference's pass-level summary
    stats.groupBy(_.pass).toSeq.sortBy(_._1).foreach { case (p, ss) =>
      sb.append(f"  $p pass: ${ss.size} probes, geomean selectivity ${geo(ss) * 100}%.2f%%\n")
    }
    sb.append(f"  overall: geomean selectivity ${geo(stats) * 100}%.2f%%, rows removed $removed%,d across ${stats.size} probes")
    sb.toString
  }

  def report(df: DataFrame): String = report(df.queryExecution)

  /** Logs the report after every successful action when
   *  `spark.graft.rpt.profiling=true` (the reference prints its profile at
   *  query end when `rpt_profiling` is set, rpt_extension.cpp:57-58).
   *  Registered by GraftSession; library users:
   *  `spark.listenerManager.register(new RptProfilingListener(spark))`. */
  final class RptProfilingListener(
      sparkSession: org.apache.spark.sql.SparkSession)
      extends QueryExecutionListener {
    private def enabled: Boolean = sparkSession.conf
      .getOption(RptConf.PROFILING).exists(_.toBoolean)

    override def onSuccess(
        funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
      if (enabled) {
        val stats = probeStats(qe)
        if (stats.nonEmpty) {
          // scalastyle:off println
          println(s"[graft-rpt] $funcName (${durationNs / 1000000} ms)\n" +
            report(qe))
          // scalastyle:on println
        }
      }
    }

    override def onFailure(
        funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
  }
}
