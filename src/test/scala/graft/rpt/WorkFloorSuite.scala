package graft.rpt

import graft.SparkTestBase
import org.apache.spark.sql.catalyst.expressions.ScalarSubquery
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/**
 * Pins the planning-time total-work floor ([[RptConf.WAVE_COST_BYTES]]):
 * a query whose estimated scan volume cannot fund a transfer wave's
 * fixed cost plans NO transfers; a partial budget admits build groups in
 * schedule order (cheap forward-pass dims first) and rejects the rest;
 * disabling the floor restores every transfer. Results must be identical
 * in all three states (the floor is perf-only).
 */
class WorkFloorSuite extends SparkTestBase {

  private val sql =
    """SELECT count(*) AS n
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |JOIN part ON l_partkey = p_partkey
      |WHERE r_name = 'ASIA' AND p_size < 10
      |  AND o_totalprice > 1000.0""".stripMargin

  private def buildSubqueries(plan: LogicalPlan): Seq[ScalarSubquery] = {
    val out = collection.mutable.ArrayBuffer[ScalarSubquery]()
    plan.foreach(_.expressions.foreach(_.foreach {
      case ss: ScalarSubquery if ss.plan.toString.contains("graft_rpt_bf") =>
        out += ss
      case _ => ()
    }))
    out.toSeq
  }

  private def plannedBuilds(): Int = {
    val plan = spark.sql(sql).queryExecution.optimizedPlan
    // distinct subquery expression instances = distinct build groups
    buildSubqueries(plan).map(_.exprId).distinct.size
  }

  test("floor stands the rule down when the plan is under minPlanWork") {
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      RptConf.WAVE_COST_BYTES -> "8388608") { // master switch on
      // the whole sf0.001 fixture is a few hundred KB — far under the
      // default 32 MB minPlanWorkBytes fast bail
      assert(plannedBuilds() == 0,
        "tiny plan must plan no transfers under the floor")
      // and the rewritten plan IS the rule-off plan
      val on = spark.sql(sql).queryExecution.optimizedPlan
      val off = withConf(RptConf.ENABLED -> "false") {
        spark.sql(sql).queryExecution.optimizedPlan
      }
      assert(on.canonicalized == off.canonicalized,
        "floor stand-down must leave the plan untouched")
    }
  }

  test("floor off restores every transfer") {
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      RptConf.WAVE_COST_BYTES -> "0") {
      assert(plannedBuilds() > 0, "floor off must plan transfers")
    }
  }

  test("partial budget admits build groups in schedule order") {
    val all = withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      RptConf.WAVE_COST_BYTES -> "0") { plannedBuilds() }
    assert(all >= 2, s"fixture query must plan >=2 build groups, got $all")
    // one wave affordable: with fraction=1.0 and flat-only charging, the
    // budget is the probed-unit byte sum — at least lineitem (the probed
    // fact, >50% of the fixture) and at most every relational leaf, so a
    // flat charge of lineitem's own bytes funds EXACTLY one group
    // (two would need 2x lineitem > the whole fixture)
    val lineitemBytes = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .queryExecution.optimizedPlan.collectLeaves().head.stats.sizeInBytes
    val some = withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      RptConf.MIN_PLAN_WORK_BYTES -> "0", // past the fast bail
      RptConf.WAVE_WORK_FRACTION -> "1.0",
      RptConf.WAVE_BUILD_FRACTION -> "0.0",
      RptConf.WAVE_COST_BYTES -> lineitemBytes.toString) { plannedBuilds() }
    assert(some >= 1 && some < all,
      s"budget for ~1 wave must trim the schedule: got $some of $all")
  }

  test("results identical with floor on, trimmed, and off") {
    def run(): Seq[String] = fingerprint(spark.sql(sql))
    val floored = withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      RptConf.WAVE_COST_BYTES -> "8388608") { run() }
    // the PARTIAL-budget state (same conf as the schedule-order test:
    // exactly one affordable wave, so some build groups are trimmed and
    // some admitted) — the mixed state is where a charge-accounting bug
    // would corrupt results, so it gets its own fingerprint
    val lineitemBytes = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .queryExecution.optimizedPlan.collectLeaves().head.stats.sizeInBytes
    val trimmed = withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      RptConf.MIN_PLAN_WORK_BYTES -> "0",
      RptConf.WAVE_WORK_FRACTION -> "1.0",
      RptConf.WAVE_BUILD_FRACTION -> "0.0",
      RptConf.WAVE_COST_BYTES -> lineitemBytes.toString) { run() }
    val off = withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      RptConf.WAVE_COST_BYTES -> "0") { run() }
    assert(floored == off, "floor must be perf-only")
    assert(trimmed == off, "partial-budget trim must be perf-only")
  }
}
