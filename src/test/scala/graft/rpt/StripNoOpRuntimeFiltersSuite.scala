package graft.rpt

import java.nio.file.Files

import org.apache.spark.sql.catalyst.expressions.{Add, DynamicPruningExpression, ExprId, Literal}
import org.apache.spark.sql.execution.{InSubqueryExec, SubqueryExec}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

import graft.SparkTestBase

/**
 * `StripNoOpRuntimeFilters` removes exactly the two kinds of runtime
 * filters a v2 scan can never use — and nothing else:
 *
 *  1. `DynamicPruningExpression(true)` — the residue
 *     `PlanAdaptiveDynamicPruningFilters` leaves when it degrades an
 *     `onlyInBroadcast` subquery in the shuffle regime.
 *  2. a runtime group filter keyed on a COMPUTED expression — v2
 *     translation requires a pushable column, so `BatchScanExec` would
 *     execute the filter's subquery, log the per-execution
 *     `WARN Can't translate ... to source filter`, then discard it.
 *
 * Scan runtime filters are never row-evaluated (they only feed source
 * pushdown), so both strips are result-neutral by construction; what
 * needs pinning is the CLASSIFICATION — attribute-keyed filters (the
 * useful ones, including every filter the RPT rule itself delivers)
 * must survive verbatim.
 */
class StripNoOpRuntimeFiltersSuite extends SparkTestBase {

  private lazy val scan: BatchScanExec = {
    val dir = Files.createTempDirectory("graft_strip_").toFile
    dir.deleteOnExit()
    val path = s"${dir.getAbsolutePath}/t.parquet"
    spark.range(0, 100).selectExpr("id AS k", "id % 5 AS g")
      .write.mode("overwrite").parquet(path)
    spark.read.format("graft-parquet").load(path)
      .queryExecution.sparkPlan
      .collectFirst { case b: BatchScanExec => b }
      .getOrElse(fail("graft-parquet did not plan a BatchScanExec"))
  }

  private def inSub(child: org.apache.spark.sql.catalyst.expressions.Expression) =
    InSubqueryExec(
      child,
      SubqueryExec("strip_test_subquery",
        spark.range(0, 3).queryExecution.sparkPlan, None),
      ExprId(0))

  private val rule = StripNoOpRuntimeFilters()

  test("degraded true-literal and computed-key filters are stripped; attribute-keyed survive") {
    val attr = scan.output.head
    val keep = DynamicPruningExpression(inSub(attr))
    val dropTrue = DynamicPruningExpression(Literal.TrueLiteral)
    val dropComputed = DynamicPruningExpression(inSub(Add(attr, Literal(1L))))
    val dirty = scan.copy(
      runtimeFilters = Seq(dropTrue, keep, dropComputed))
    val cleaned = rule(dirty).collectFirst { case b: BatchScanExec => b }.get
    assert(cleaned.runtimeFilters == Seq(keep),
      s"expected only the attribute-keyed filter, got ${cleaned.runtimeFilters}")
  }

  test("a scan with only useful filters is left untouched (no copy churn)") {
    val keep = DynamicPruningExpression(inSub(scan.output.head))
    val clean = scan.copy(runtimeFilters = Seq(keep))
    assert(rule(clean) eq clean, "rule must not rewrite a clean scan")
  }

  test("a filter-free scan is left untouched") {
    assert(rule(scan) eq scan)
  }
}
