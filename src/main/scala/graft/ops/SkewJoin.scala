package graft.ops

import java.util.concurrent.atomic.AtomicLong

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
 * The salt is `monotonically_increasing_id() mod salts` — i.e. partition id
 * plus per-partition row index. This spreads even *identical* rows of a hot
 * key across all salts (a content-derived hash would map duplicates to one
 * salt, exactly the massively-duplicated-row case salting exists for), and
 * it is stable under task retries as long as the left input enumerates each
 * partition deterministically (true for file scans; a nondeterministic
 * upstream would make ANY salting scheme unstable).
 *
 * Result is identical to `left.join(right, leftKey === rightKey)`; only
 * the shuffle distribution changes. The salt column name is unique per
 * call, so inputs may carry any user columns.
 */
object SkewJoin {

  private val callId = new AtomicLong()

  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val taken = left.columns.toSet ++ right.columns.toSet
    val saltCol = Iterator.continually(s"__graft_salt_${callId.incrementAndGet()}")
      .dropWhile(taken.contains).next()
    val saltedLeft = left.withColumn(saltCol,
      pmod(monotonically_increasing_id(), lit(salts.toLong)))
    val explodedRight = right.withColumn(saltCol,
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    saltedLeft.join(explodedRight,
        saltedLeft(leftKey) === explodedRight(rightKey) &&
          saltedLeft(saltCol) === explodedRight(saltCol))
      .drop(saltCol)
  }
}
