package graft.ops

import org.apache.spark.sql.graft.HonestCheckpoint

import graft.SparkTestBase

/**
 * The measured-stats checkpoint behind the dedup pipeline's materialized
 * intermediates (PairGraph bands/pairs, the CC edge rounds, ClusterLabels).
 *
 * The hazard under test: `localCheckpoint` inherits the PRE-checkpoint
 * plan estimate, and for plans that stack a narrow projection and
 * default-width string estimates on top of `range`/parquet scans, that
 * estimate can sit far under the broadcast threshold while the
 * materialized table is far over it. A downstream self-join then plans a
 * STATIC broadcast AQE cannot demote — at sf100 the connected-components
 * min-label build collected 1.8 GiB through the driver and died on
 * maxResultSize. HonestCheckpoint swaps the inherited estimate for the
 * block-manager size of the already-materialized RDD.
 */
class HonestCheckpointSuite extends SparkTestBase {

  // ~30 MiB materialized, but estimated from range (8 B/row) times a
  // default 20 B string width — the estimate lands ~3 MiB
  private def wide() = spark.range(0, 200000L, 1, 4)
    .selectExpr("id", "repeat('x', 150) AS s")

  test("honest stats reflect the materialized size; inherited stats do not") {
    val naive = wide().localCheckpoint(eager = true)
    val honest = HonestCheckpoint.localCheckpoint(wide())
    val naiveSize = naive.queryExecution.optimizedPlan.stats.sizeInBytes
    val honestSize = honest.queryExecution.optimizedPlan.stats.sizeInBytes
    val actual = 200000L * 158 // 150-char string + id, before row overhead
    assert(honestSize >= actual,
      s"honest=$honestSize must be at least the raw payload $actual")
    assert(naiveSize < actual / 2,
      s"precondition lost: naive=$naiveSize no longer underestimates " +
        s"(actual >= $actual) — the suite's hazard setup needs a new shape")
    // rows unchanged
    assert(honest.count() === 200000L)
  }

  test("a self-join of the checkpoint no longer broadcasts a " +
      "GB-at-scale side the estimate called small") {
    withConf("spark.sql.autoBroadcastJoinThreshold" -> (10L << 20).toString) {
      def joined(cp: org.apache.spark.sql.DataFrame) = {
        val j = cp.as("a").join(cp.as("b"), "id")
        j.queryExecution.executedPlan.toString
      }
      val naivePlan = joined(wide().localCheckpoint(eager = true))
      val honestPlan = joined(HonestCheckpoint.localCheckpoint(wide()))
      assert(naivePlan.contains("BroadcastHashJoin"),
        s"precondition lost: the naive checkpoint no longer broadcasts\n$naivePlan")
      assert(!honestPlan.contains("BroadcastHashJoin"),
        s"honest stats must keep the oversized side off broadcast\n$honestPlan")
    }
  }

  test("genuinely small checkpoints still broadcast") {
    withConf("spark.sql.autoBroadcastJoinThreshold" -> (10L << 20).toString) {
      val small = HonestCheckpoint.localCheckpoint(
        spark.range(0, 100).selectExpr("id", "repeat('x', 10) AS s"))
      val big = wide().localCheckpoint(eager = true)
      val plan = big.join(small, "id").queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"a tiny honest side must still broadcast\n$plan")
    }
  }
}
