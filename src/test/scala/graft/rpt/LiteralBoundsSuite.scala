package graft.rpt

import java.nio.file.Files

import graft.SparkTestBase
import org.apache.spark.sql.catalyst.expressions.{GreaterThanOrEqual, LessThanOrEqual, Literal, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.Filter
import org.apache.spark.sql.execution.FileSourceScanExec

/**
 * Two-phase literal bounds (`spark.graft.rpt.literalBounds`): min/max
 * transfer bounds are evaluated at planning time and spliced as LITERAL
 * range predicates, which Spark pushes into the Parquet scan so row-group
 * zone maps skip data before rows materialize — the Spark-native analog of
 * the reference's dynamic ConstantFilter pushdown into LOGICAL_GET
 * (reference: src/optimizer/rpt_optimizer.cpp:1401-1501) and its
 * always-false filter on an empty build side
 * (src/operators/physical_create_bf.cpp:289-297).
 */
class LiteralBoundsSuite extends SparkTestBase {

  // a sorted fact written in many small row groups, so zone-map skipping
  // is observable in the scan's numOutputRows
  private lazy val factDir: String = {
    val dir = Files.createTempDirectory("graft_lb_fact").toString
    spark.range(0, 300000).selectExpr("id AS k", "id % 97 AS v")
      .coalesce(1).sortWithinPartitions("k")
      .write.option("parquet.block.size", 65536).mode("overwrite").parquet(dir)
    dir
  }

  private def registerFixture(): Unit = {
    spark.read.parquet(factDir).createOrReplaceTempView("lb_fact")
    spark.range(100000, 110000).selectExpr("id AS dk1")
      .createOrReplaceTempView("lb_dim1")
    spark.range(105000, 115000).selectExpr("id AS dk2")
      .createOrReplaceTempView("lb_dim2")
  }

  private val sql =
    """SELECT count(*) AS n
      |FROM lb_fact JOIN lb_dim1 ON k = dk1 JOIN lb_dim2 ON k = dk2
      |WHERE dk1 % 2 = 0""".stripMargin

  private val boundsConf = Seq(
    RptConf.ENABLED -> "true",
    RptConf.FILTER_TYPE -> "minmaxOnly",
    RptConf.LITERAL_BOUNDS -> "true",
    RptConf.FILTERED_BUILDS_ONLY -> "false",
    "spark.sql.autoBroadcastJoinThreshold" -> "-1")

  test("bounds are spliced as literals, not subqueries") {
    registerFixture()
    withConf(boundsConf: _*) {
      val plan = spark.sql(sql).queryExecution.optimizedPlan
      val literalBounds = plan.collect { case Filter(cond, _) =>
        cond.collect {
          case GreaterThanOrEqual(_, _: Literal) => 1
          case LessThanOrEqual(_, _: Literal) => 1
        }.sum
      }.sum
      assert(literalBounds >= 2, s"expected literal range bounds, got plan:\n$plan")
      val subqueries = plan.collect { case p =>
        p.expressions.map(_.collect { case s: SubqueryExpression => s }.size).sum
      }.sum
      assert(subqueries === 0,
        s"minmaxOnly + literalBounds must not leave subquery bounds:\n$plan")
    }
  }

  test("literal bounds reach the parquet scan and skip row groups") {
    registerFixture()
    withConf(boundsConf :+ ("spark.sql.adaptive.enabled" -> "false"): _*) {
      val df = spark.sql(sql)
      val n = df.collect().head.getLong(0)
      val factScan = df.queryExecution.executedPlan.collect {
        case f: FileSourceScanExec
            if f.metadata("Location").contains("graft_lb_fact") => f
      }.head
      val pushed = factScan.metadata("PushedFilters")
      assert(pushed.contains("GreaterThanOrEqual(k,") &&
        pushed.contains("LessThanOrEqual(k,"),
        s"bounds not pushed into the scan: $pushed")
      val scanned = factScan.metrics("numOutputRows").value
      assert(scanned < 300000,
        s"scan read all $scanned rows — no row groups were skipped")
      // both dims span [100000,115000): the scan must keep roughly that
      // window (plus row-group rounding), far below the full table
      assert(scanned < 60000, s"scan read $scanned rows, expected ~15k-ish")
      val off = withConf(RptConf.ENABLED -> "false")(
        spark.sql(sql).collect().head.getLong(0))
      assert(n === off, s"literal bounds changed the result: $n vs $off")
    }
  }

  test("empty build side becomes an always-false probe filter") {
    registerFixture()
    spark.range(0, 0).selectExpr("id AS dk3")
      .createOrReplaceTempView("lb_dim3")
    val emptySql =
      """SELECT count(*) AS n
        |FROM lb_fact JOIN lb_dim1 ON k = dk1 JOIN lb_dim3 ON k = dk3""".stripMargin
    withConf(boundsConf: _*) {
      val df = spark.sql(emptySql)
      // the spliced Literal(false) filter lets the remaining optimizer
      // batches collapse the probe subtrees to empty LocalRelations — a
      // STATIC scan-skip, stronger than the reference's runtime
      // always-false filter. Assert no file scan survives.
      val optimized = df.queryExecution.optimizedPlan
      val stillScansFact = optimized.collectLeaves().exists(
        _.toString.contains("graft_lb_fact"))
      val falseFilters = optimized.collect {
        case Filter(cond, _) if cond.exists(_ == Literal.FalseLiteral) => 1
      }.sum
      assert(!stillScansFact || falseFilters >= 1,
        s"no always-false filter and the fact is still scanned:\n$optimized")
      assert(df.collect().head.getLong(0) === 0L)
    }
  }

  test("literal bounds differential vs rule-off (filterType=all, AQE on)") {
    registerFixture()
    withConf(boundsConf :+ (RptConf.FILTER_TYPE -> "all"): _*) {
      val on = fingerprint(spark.sql(sql))
      val off = withConf(RptConf.ENABLED -> "false")(fingerprint(spark.sql(sql)))
      assert(on === off)
    }
  }
}
