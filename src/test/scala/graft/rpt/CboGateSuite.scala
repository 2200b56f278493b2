package graft.rpt

import org.apache.spark.sql.catalyst.expressions.ScalarSubquery

import graft.SparkTestBase

/**
 * CBO-stats path of the keep-fraction build gate: with
 * `spark.sql.cbo.enabled` and ANALYZE'd column statistics, a weakly-
 * selective build stands down from the filter ESTIMATE alone — no
 * planning-time count jobs (the runtimeSizedBuilds path) needed.
 * Also pins the trust guard: CBO without column stats must change
 * nothing, because FilterEstimation assumes unestimatable predicates
 * keep 100% of rows.
 */
class CboGateSuite extends SparkTestBase {

  private def buildTables(sql: String): Set[String] = {
    val out = collection.mutable.Set[String]()
    spark.sql(sql).queryExecution.optimizedPlan.foreach(
      _.expressions.foreach(_.foreach {
        case ss: ScalarSubquery
            if ss.plan.toString.contains("graft_rpt_bf") =>
          ss.plan.collectLeaves().headOption.foreach { leaf =>
            leaf.output.headOption.map(_.name.take(2)).foreach {
              case "s_" => out += "supplier"
              case "p_" => out += "part"
              case "o_" => out += "orders"
              case "l_" => out += "lineitem"
              case _ => ()
            }
          }
        case _ => ()
      }))
    out.toSet
  }

  // weak supplier filter (keeps every row), selective orders filter
  private val weak =
    """SELECT count(*) AS n FROM lineitem
      |JOIN graft_cbo_supplier s ON l_suppkey = s.s_suppkey
      |JOIN orders ON l_orderkey = o_orderkey
      |WHERE s.s_acctbal > -999999 AND o_totalprice < 20000""".stripMargin

  test("ANALYZE'd stats stand a weak build down; no-stats CBO is inert") {
    spark.sql("DROP TABLE IF EXISTS graft_cbo_supplier")
    spark.sql(
      s"""CREATE TABLE graft_cbo_supplier
         |USING parquet LOCATION '$sfDir/supplier.parquet'""".stripMargin)
    try {
      withConf(RptConf.ENABLED -> "true",
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.cbo.enabled" -> "true") {
        // no column stats yet: the estimate is untrustworthy (selectivity
        // defaults to 1.0) and must NOT gate — supplier still builds
        // (lineitem backward builds also appear: tests run minProbeRows=0)
        val ungated = buildTables(weak)
        assert(ungated.contains("supplier") && ungated.contains("orders"),
          s"CBO without column stats must not gate any build ($ungated)")

        spark.sql("ANALYZE TABLE graft_cbo_supplier COMPUTE STATISTICS " +
          "FOR ALL COLUMNS")
        spark.catalog.refreshTable("graft_cbo_supplier")
        // with stats, FilterEstimation sees s_acctbal > -999999 keeps
        // ~100% of rows → the supplier build stands down; orders'
        // selective filter keeps transferring
        val gated = buildTables(weak)
        assert(!gated.contains("supplier"),
          s"stats-estimated weak build not gated (builds: $gated)")
        assert(gated.contains("orders"),
          s"selective build lost (builds: $gated)")
        // and correctness is unaffected
        val on = fingerprint(spark.sql(weak))
        val off = withConf(RptConf.ENABLED -> "false")(
          fingerprint(spark.sql(weak)))
        assert(on === off)
      }
    } finally spark.sql("DROP TABLE IF EXISTS graft_cbo_supplier")
  }
}
