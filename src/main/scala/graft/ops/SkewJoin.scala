package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Salted equi-join for skewed keys: when a handful of hot keys dominate
 * `left`, a plain shuffle join sends every row of a hot key to ONE
 * reducer. Salting splits each key's rows across `salts` reducers (left
 * rows get a deterministic salt, right rows are replicated over all
 * salts) at the cost of a `salts`-times larger right side — the standard
 * remedy when AQE's skew-join splitting can't apply (e.g. the skewed side
 * feeds an aggregation, or partitions are skewed beyond AQE thresholds).
 *
 * Result is identical to `left.join(right, leftKey === rightKey)`; only
 * the shuffle distribution changes.
 */
object SkewJoin {

  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    // deterministic salt from the full row content: stable across retries
    // (a nondeterministic salt would break task re-execution semantics)
    val saltedLeft = left.withColumn("__graft_salt",
      pmod(xxhash64(struct(left.columns.map(col): _*)), lit(salts)))
    val explodedRight = right.withColumn("__graft_salt",
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    saltedLeft.join(explodedRight,
        saltedLeft(leftKey) === explodedRight(rightKey) &&
          saltedLeft("__graft_salt") === explodedRight("__graft_salt"))
      .drop("__graft_salt")
  }
}
