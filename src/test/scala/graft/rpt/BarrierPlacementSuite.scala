package graft.rpt

import graft.SparkTestBase
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Union, Window}

/**
 * Barrier placement: the rule splices probe filters ABOVE barrier units
 * (Union/Window — the reference's placement, rpt_optimizer.cpp:112-124),
 * and the stock optimizer batches that run AFTER the preCBO hook complete
 * the push where provably safe — into every Union branch (probe keys
 * remapped per child) and below a Window whose partition keys cover the
 * probe keys. This suite pins that downstream completion, which the
 * 100 TB story relies on (the probe must cut rows before the union concat
 * / window sort, not after), plus the negative case: a window partitioned
 * on other columns must keep the probe above it, or window values would
 * change.
 */
class BarrierPlacementSuite extends SparkTestBase {

  private val unionSql =
    """SELECT count(*) AS n, min(u.l_partkey) AS m
      |FROM (SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity > 30
      |      UNION ALL
      |      SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity <= 10) u
      |JOIN orders ON u.l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE n_name = 'NATION_3'""".stripMargin

  private val windowSql =
    """SELECT c_mktsegment, count(*) AS n
      |FROM (SELECT o_orderkey, o_custkey,
      |             row_number() OVER (PARTITION BY o_custkey
      |                                ORDER BY o_orderkey) AS rn
      |      FROM orders) w
      |JOIN customer ON w.o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE n_name = 'NATION_3' AND rn <= 5
      |GROUP BY c_mktsegment""".stripMargin

  // window partitioned by a DIFFERENT column than the join key: pushing
  // the probe below would change rank() results — it must stay above
  private val unsafeWindowSql =
    """SELECT count(*) AS n
      |FROM (SELECT o_custkey,
      |             rank() OVER (PARTITION BY o_orderstatus
      |                          ORDER BY o_totalprice) AS rk
      |      FROM orders) w
      |JOIN customer ON w.o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE n_name = 'NATION_3' AND rk <= 100""".stripMargin

  private def probeFilter(p: LogicalPlan): Boolean = p.exists {
    case Filter(c, _) => c.toString.contains("might_contain")
    case _ => false
  }

  private def optimized(sql: String): LogicalPlan =
    spark.sql(sql).queryExecution.optimizedPlan

  private val shuffleRegime = Seq(
    "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    RptConf.ENABLED -> "true")

  for ((name, sql) <- Seq("union" -> unionSql, "window" -> windowSql,
      "unsafe window" -> unsafeWindowSql)) {
    test(s"$name barrier query: identical results rule off vs on") {
      val off = withConf(RptConf.ENABLED -> "false")(
        fingerprint(spark.sql(sql)))
      val on = withConf(shuffleRegime: _*)(fingerprint(spark.sql(sql)))
      assert(off == on, s"$name results diverged under the rule")
      assert(off.nonEmpty)
    }
  }

  test("union probe reaches EVERY branch (keys remapped per child)") {
    withConf(shuffleRegime: _*) {
      val unions = optimized(unionSql).collect { case u: Union => u }
      assert(unions.nonEmpty, "union was optimized away")
      unions.foreach { u =>
        assert(u.children.forall(probeFilter),
          "a union branch is missing its probe filter")
      }
    }
  }

  test("window probe lands below the window iff keys are partition keys") {
    withConf(shuffleRegime: _*) {
      val safeWins = optimized(windowSql).collect { case w: Window => w }
      assert(safeWins.nonEmpty, "window was optimized away")
      assert(safeWins.exists(w => probeFilter(w.child)),
        "partition-key probe was not pushed below the window")

      val unsafePlan = optimized(unsafeWindowSql)
      val unsafeWins = unsafePlan.collect { case w: Window => w }
      assert(unsafeWins.nonEmpty)
      assert(!unsafeWins.exists(w => probeFilter(w.child)),
        "probe pushed below a window whose partition keys don't cover it")
      assert(probeFilter(unsafePlan),
        "probe missing entirely from the unsafe-window plan")
    }
  }
}
