package graft.rpt

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec

/**
 * Materialize-once build option (`spark.graft.rpt.cacheBuilds`): the
 * reference's CREATE_BF pays ONE materialization of its child and re-emits
 * rows (reference: src/operators/physical_create_bf.cpp:201-275,441-557);
 * Spark's subquery build form instead re-scans the build side — one scan in
 * the main plan, one in the bloom-filter subquery. With cacheBuilds on,
 * both must read the session-cached in-memory relation: zero file scans of
 * the build table, one cache materialization.
 */
class CacheBuildsSuite extends SparkTestBase {

  /** All physical nodes including AQE innards and subquery plans. */
  private def allNodes(df: DataFrame): Seq[SparkPlan] = {
    val out = collection.mutable.ArrayBuffer[SparkPlan]()
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean]())
    def walk(p: SparkPlan): Unit = {
      if (!seen.add(p)) return
      out += p
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case s: QueryStageExec => walk(s.plan)
        case other =>
          other.children.foreach(walk)
          other.subqueries.foreach(walk)
      }
    }
    walk(df.queryExecution.executedPlan)
    out.toSeq
  }

  private def lineitemFileScans(df: DataFrame): Int = allNodes(df).count {
    case f: FileSourceScanExec => f.metadata("Location").contains("lineitem")
    case _ => false
  }

  private def imrScans(df: DataFrame): Int = allNodes(df).count {
    case _: InMemoryTableScanExec => true
    case _ => false
  }

  private val sql =
    """SELECT count(*) AS n
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE l_quantity > 45""".stripMargin

  test("cacheBuilds reads every build from the cache — no second file scan") {
    withConf(RptConf.ENABLED -> "true",
      RptConf.CACHE_BUILDS -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      try {
        val df = spark.sql(sql)
        val n = df.collect().head.getLong(0)
        // lineitem (filtered unit) is a build side; its unit subtree must
        // come from the cache in BOTH the main plan and the subqueries
        assert(lineitemFileScans(df) === 0,
          "build table still file-scanned with cacheBuilds on")
        assert(imrScans(df) >= 2,
          s"expected cached scans in main plan + build subquery, got ${imrScans(df)}")
        val off = withConf(RptConf.ENABLED -> "false")(
          spark.sql(sql).collect().head.getLong(0))
        assert(n === off, s"cacheBuilds changed the result: $n vs $off")
      } finally {
        spark.catalog.clearCache()
      }
    }
  }

  test("cacheBuilds keeps transfer filters on units nested inside a barrier build") {
    // a Union is a barrier unit of the transfer graph, but the joins INSIDE
    // it still produce nested units that receive transfer filters. If the
    // union unit is cached (it is a build side of the outer edge),
    // substituting the cached relation must not drop the filters spliced
    // onto the nested units — self-containing units are excluded from
    // caching instead.
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    import org.apache.spark.sql.catalyst.plans.logical.Filter
    val nestedSql =
      """SELECT count(*) AS n FROM lineitem
        |JOIN (SELECT l_orderkey AS k
        |      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |      WHERE o_totalprice < 100000
        |      UNION ALL
        |      SELECT o_orderkey AS k FROM orders WHERE o_orderstatus = 'X') u
        |ON lineitem.l_orderkey = u.k""".stripMargin
    def bfFilters(df: DataFrame): Int =
      df.queryExecution.optimizedPlan.collect {
        case f: Filter
            if f.condition.exists(_.isInstanceOf[BloomFilterMightContain]) => f
      }.size
    withConf(RptConf.ENABLED -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val base = bfFilters(spark.sql(nestedSql))
      assert(base >= 2,
        s"expected transfers outside AND inside the union, got $base")
      withConf(RptConf.CACHE_BUILDS -> "true") {
        try {
          val cached = bfFilters(spark.sql(nestedSql))
          assert(cached === base,
            s"cacheBuilds dropped nested transfer filters: $cached vs $base")
          val n = spark.sql(nestedSql).collect().head.getLong(0)
          val off = withConf(RptConf.ENABLED -> "false")(
            spark.sql(nestedSql).collect().head.getLong(0))
          assert(n === off, s"cacheBuilds changed the result: $n vs $off")
        } finally {
          spark.catalog.clearCache()
        }
      }
    }
  }

  test("without cacheBuilds the build side pays a second scan (baseline)") {
    withConf(RptConf.ENABLED -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val df = spark.sql(sql)
      df.collect()
      assert(lineitemFileScans(df) >= 2,
        s"expected main-plan + subquery scans, got ${lineitemFileScans(df)}")
      assert(imrScans(df) === 0)
    }
  }
}
