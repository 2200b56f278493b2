package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.ExpressionSet
import org.apache.spark.sql.catalyst.plans.logical.Statistics
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/**
 * `localCheckpoint` with MEASURED statistics.
 *
 * `Dataset.localCheckpoint` truncates lineage by wrapping the materialized
 * RDD in a `LogicalRDD`, and `LogicalRDD.fromDataset` copies the
 * pre-checkpoint plan's ESTIMATED stats into it (`originStats`). For the
 * dedup pipeline those estimates are hazardous: the band/edge tables
 * descend from `documents` through projections that drop the wide `text`
 * column and aggregates whose output size the size-only estimator can
 * only guess, so the checkpointed table can be estimated under the
 * broadcast threshold while actually being gigabytes. A downstream join
 * then plans a STATIC broadcast — which AQE cannot demote — and in local
 * mode the broadcast build collects through the driver and dies on
 * `spark.driver.maxResultSize` (observed: the d04/d08 sf100 probe,
 * 1.8 GiB build of the connected-components min-label table). On a real
 * cluster the same plan ships the full table to every executor.
 *
 * Since `eager = true` has already materialized the RDD, the honest
 * number is sitting in the block manager: replace `originStats` with the
 * measured storage size (memory + disk across all blocks). Downstream
 * join strategy then decides from reality at every scale — genuinely
 * tiny label tables still broadcast; corpus-proportional edge tables
 * never do.
 */
object HonestCheckpoint {

  /** `df.localCheckpoint(eager = true)` whose plan stats are the
    * materialized block-manager size instead of the pre-checkpoint
    * estimate. Falls back to the plain checkpoint if the storage info
    * is unavailable (never worse than the status quo). */
  def localCheckpoint(df: DataFrame): DataFrame = {
    val cp = df.localCheckpoint(eager = true)
    cp.queryExecution.analyzed match {
      case lr: LogicalRDD =>
        val sc = cp.sparkSession.sparkContext
        sc.getRDDStorageInfo.find(_.id == lr.rdd.id) match {
          case Some(info) if info.memSize + info.diskSize > 0 =>
            // originConstraints lives in the (inaccessible) second ctor
            // param list; read it reflectively so the rebuilt node keeps
            // the checkpointed plan's inferred constraints
            val constraints = {
              val f = classOf[LogicalRDD].getDeclaredField("originConstraints")
              f.setAccessible(true)
              f.get(lr).asInstanceOf[Option[ExpressionSet]]
            }
            val honest = new LogicalRDD(lr.output, lr.rdd,
              lr.outputPartitioning, lr.outputOrdering, lr.isStreaming,
              lr.stream)(
              cp.sparkSession.asInstanceOf[ClassicSparkSession],
              Some(Statistics(sizeInBytes = info.memSize + info.diskSize)),
              constraints)
            ClassicDataset.ofRows(
              cp.sparkSession.asInstanceOf[ClassicSparkSession], honest)
          case _ => cp
        }
      case _ => cp
    }
  }
}
