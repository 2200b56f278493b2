package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs: RPT extension wired, tables of the
 *  smallest fixture registered as temp views. */
trait SparkTestBase extends AnyFunSuite with BeforeAndAfterAll {
  val sfDir = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = SparkTestBase.session
  lazy val tables: Map[String, DataFrame] = {
    GraftSession.loadTables(spark, sfDir)
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    tables // force init
  }

  /** Collect-and-sort result fingerprint, robust to partitioning order. */
  def fingerprint(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted
    df.select(cols.head, cols.tail: _*).collect()
      .map(_.mkString("")).sorted.toSeq
  }

  def withConf[T](pairs: (String, String)*)(body: => T): T = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}

object SparkTestBase {
  lazy val session: SparkSession = {
    val s = GraftSession.build(master = "local[4]", shufflePartitions = 4,
      appName = "graft-test")
    // plan-shape tests run on the tiny sf0.001 fixture; disable the
    // cost gates so transfers still happen (gating has its own test)
    s.conf.set(rpt.RptConf.MIN_PROBE_ROWS, "0")
    s.conf.set(rpt.RptConf.MIN_BUILD_PROBE_RATIO, "0")
    // the total-work floor would stand the rule down on byte-tiny test
    // fixtures (that is its job); plan-shape tests need transfers planned
    s.conf.set(rpt.RptConf.WAVE_COST_BYTES, "0")
    // tests must SEE rewrite defects, not the production stand-down
    s.conf.set(rpt.RptConf.FAIL_FAST, "true")
    s
  }
}
