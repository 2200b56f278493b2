package graft.rpt

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{BaseSubqueryExec, ReusedSubqueryExec, ScalarSubquery => ExecScalarSubquery, SparkPlan, SubqueryExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/**
 * Executed-plan evidence for the two delegation claims of SURVEY §2.1:
 *
 *  - #11 backward-pass broadcast: one bloom filter per join-key
 *    equivalence class, built once, probed by every class member
 *    (reference: rpt_optimizer.cpp:1070-1158). Spark-side this must show
 *    up as ONE executed build subquery + ReusedSubqueryExec for the rest.
 *
 *  - #12 consecutive-CREATE merge: several aggregates over the same build
 *    side collapse into one build scan (reference BuildStackedBFOperators,
 *    rpt_optimizer.cpp:1164-1265). Spark-side: MergeScalarSubqueries
 *    and/or ReuseSubquery leave at most one executed scan of the build.
 *
 * These were previously claims in comments; a regression here silently
 * multiplies build scans — exactly the cost pattern that made round 2's
 * rule a net loss.
 */
class SubqueryReuseSuite extends SparkTestBase {

  /** All rpt build subqueries in the final executed plan, split into
    * (executed, reused). Walks AQE wrappers and nested subqueries. */
  private def rptSubqueries(df: DataFrame): (Seq[SparkPlan], Seq[SparkPlan]) = {
    val executed = collection.mutable.ArrayBuffer[SparkPlan]()
    val reused = collection.mutable.ArrayBuffer[SparkPlan]()
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean]())
    def walk(p: SparkPlan): Unit = {
      if (!seen.add(p)) return
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case s: QueryStageExec => walk(s.plan)
        case other =>
          other.expressions.foreach(_.foreach {
            case ss: ExecScalarSubquery =>
              val isRpt = ss.plan.schema.fieldNames.exists(
                _.startsWith("graft_rpt_bf"))
              ss.plan match {
                case r: ReusedSubqueryExec if isRpt =>
                  reused += r; walk(r.child)
                case b: BaseSubqueryExec if isRpt =>
                  executed += b; walk(b)
                case _ => ()
              }
            case _ => ()
          })
          other.children.foreach(walk)
          other.subqueries.foreach(walk)
      }
    }
    walk(df.queryExecution.executedPlan)
    (executed.toSeq, reused.toSeq)
  }

  private def openGates = Seq(
    RptConf.ENABLED -> "true",
    "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    RptConf.MIN_PROBE_ROWS -> "0",
    RptConf.MIN_BUILD_PROBE_RATIO -> "0",
    RptConf.MAX_BUILD_ROWS -> "100000000")

  test("equivalence class probes share ONE executed build (backward broadcast)") {
    // lineitem (filtered root) probes BOTH orders instances on the same
    // key in the backward pass — two identical build subqueries that must
    // execute once
    val sql =
      """SELECT count(*) AS n
        |FROM lineitem
        |JOIN orders o1 ON o1.o_orderkey = l_orderkey
        |JOIN orders o2 ON o2.o_orderkey = l_orderkey
        |WHERE l_quantity > 49""".stripMargin
    withConf(openGates: _*) {
      val df = spark.sql(sql)
      // both probes must be injected (one per class member)
      val optimized = df.queryExecution.optimizedPlan.toString
      assert("might_contain".r.findAllIn(optimized).size == 2,
        s"expected 2 probes in the optimized plan:\n$optimized")
      df.collect()
      val (executed, reused) = rptSubqueries(df)
      assert(executed.nonEmpty, "no rpt subqueries in the plan at all")
      // distinct-by-identity EXECUTIONS: the shared expression instance (or
      // a ReusedSubqueryExec wrapper) must leave exactly one real build
      val distinctExecuted = {
        val m = new java.util.IdentityHashMap[SparkPlan, Unit]()
        executed.filter(
          _.schema.fieldNames.exists(_.startsWith("graft_rpt_bf_bwd")))
          .foreach(p => m.put(p, ()))
        m.keySet.size
      }
      assert(distinctExecuted == 1,
        s"equivalence class built $distinctExecuted times " +
          s"(${reused.size} reused):\n${df.queryExecution.executedPlan}")
      // the second probe either references the shared build subquery, or —
      // stronger — its whole subtree deduped into a ReusedExchange (the
      // shared exprId makes both probe exchanges canonically equal)
      val exec = df.queryExecution.executedPlan.toString
      val bwdRefs = (executed ++ reused).count(
        _.schema.fieldNames.exists(_.startsWith("graft_rpt_bf_bwd")))
      assert(bwdRefs >= 2 || exec.contains("ReusedExchange"),
        s"second probe neither shares the build nor reuses the exchange:\n" +
          exec)
    }
  }

  test("bf + min/max over one build side collapse to one executed scan") {
    // filterType=all emits three aggregates (bf, min, max) over the same
    // build plan for the part->lineitem op; they must not triple-scan part
    val sql =
      """SELECT count(*) AS n
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |WHERE p_size < 10""".stripMargin
    withConf(openGates :+ (RptConf.FILTER_TYPE -> "all"): _*) {
      val df = spark.sql(sql)
      df.collect()
      val (executed, reused) = rptSubqueries(df)
      assert(executed.nonEmpty, "no rpt subqueries in the plan at all")
      // group executed builds by which leaf they scan: no leaf may be
      // scanned by more than one EXECUTED rpt subquery per pass
      def leafKey(p: SparkPlan): String = p.collectLeaves().map(_.nodeName)
        .mkString(",") + "|" + p.schema.fieldNames.head.takeWhile(_ != '#')
          .replaceAll("_(fwd|bwd).*", "")
      val perBuild = executed.groupBy(leafKey)
      val multi = perBuild.filter(_._2.size > 3) // bf+min+max at most…
      assert(reused.nonEmpty || executed.size <= 3,
        s"${executed.size} executed rpt subqueries, none reused/merged:\n" +
          s"${df.queryExecution.executedPlan}")
      assert(multi.isEmpty,
        s"a build side is scanned by >3 executed subqueries: " +
          s"${multi.keys}\n${df.queryExecution.executedPlan}")
    }
  }
}
