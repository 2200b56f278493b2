package graft.rpt

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.ScalarSubquery

/** Shared helpers for the RPT gate suites. */
object RptTestHelpers {

  /** Which table does each injected build subquery BUILD over? The build
    * unit is the LEFT-MOST leaf of the subquery plan (other leaves are its
    * semi-join reducers); classified by the TPC-H column-name prefix of
    * the leaf's first output column. */
  def buildTables(spark: SparkSession, sql: String): Set[String] = {
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
}
