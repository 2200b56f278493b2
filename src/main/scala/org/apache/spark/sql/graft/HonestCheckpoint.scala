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

  /** Test hook: lets the suite simulate a Spark upgrade that removed the
    * reflected field (degradation must be lost constraints, not a failed
    * checkpoint). Production value is the Spark 4.1 field name. */
  private[graft] var constraintsFieldName: String = "originConstraints"

  /** `df.localCheckpoint(eager = true)` whose plan stats are the
    * materialized block-manager size instead of the pre-checkpoint
    * estimate. Falls back to the plain checkpoint if the storage info
    * is unavailable, or if the Spark-version-fragile rebuild (reflective
    * `originConstraints` read + positional `LogicalRDD` ctor) fails on
    * an upgraded Spark (never worse than the status quo). */
  def localCheckpoint(df: DataFrame): DataFrame = {
    val cp = df.localCheckpoint(eager = true)
    cp.queryExecution.analyzed match {
      case lr: LogicalRDD =>
        val sc = cp.sparkSession.sparkContext
        sc.getRDDStorageInfo.find(_.id == lr.rdd.id) match {
          case Some(info) if info.memSize + info.diskSize > 0 =>
            rebuildWithStats(cp, lr, info.memSize + info.diskSize)
              .getOrElse(cp)
          case _ => cp
        }
      case _ => cp
    }
  }

  /** The version-fragile part, isolated: any reflective or constructor
    * mismatch on a future Spark degrades to `None` (caller keeps the plain
    * checkpoint — lost constraints/stats, not a failed query). */
  private[graft] def rebuildWithStats(
      cp: DataFrame, lr: LogicalRDD, measuredBytes: Long): Option[DataFrame] =
    scala.util.Try {
      // originConstraints lives in the (inaccessible) second ctor
      // param list; read it reflectively so the rebuilt node keeps
      // the checkpointed plan's inferred constraints. If the field is
      // gone on a newer Spark, degrade to no constraints rather than
      // failing the checkpoint.
      val constraints = scala.util.Try {
        val f = classOf[LogicalRDD].getDeclaredField(constraintsFieldName)
        f.setAccessible(true)
        f.get(lr).asInstanceOf[Option[ExpressionSet]]
      }.getOrElse(None)
      val honest = new LogicalRDD(lr.output, lr.rdd,
        lr.outputPartitioning, lr.outputOrdering, lr.isStreaming,
        lr.stream)(
        cp.sparkSession.asInstanceOf[ClassicSparkSession],
        Some(Statistics(sizeInBytes = measuredBytes)),
        constraints)
      ClassicDataset.ofRows(
        cp.sparkSession.asInstanceOf[ClassicSparkSession], honest)
    }.toOption
}
