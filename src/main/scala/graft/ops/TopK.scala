package graft.ops

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/**
 * Bounded top-k aggregate: keeps at most `2k` candidates per partial
 * buffer and trims to `k` at merge/finish — a map-side-combining top-k
 * whose shuffle carries at most ~2k rows per group per partition (the
 * trim only fires when the buffer exceeds 2k, so a partial serialized at
 * shuffle time can hold up to 2k+1 candidates) instead of every row.
 * The scale-correct alternative to `row_number() OVER (...) <= k` when
 * groups are huge (the window form sorts every row of every group).
 *
 * Returns the top `k` (value, id) pairs ordered by value desc, id asc
 * (deterministic tie-break). Rows with a NULL value or id are ignored,
 * like built-in aggregates ignore null inputs (the window form would
 * instead ORDER the nulls — callers needing null ranking should coalesce
 * first).
 *
 * Ranking goes through Double, which is exact only for |value| <= 2^53:
 * a caller feeding larger longs (e.g. a full 60-bit hash) loses ranking
 * precision and can diverge from a window-form oracle. p07 guards this
 * with a 40-bit hash truncation; new callers must do the same.
 */
object TopK {

  type Pair = (Double, Long)
  /** Boxed input type so NULL value/id rows decode instead of failing. */
  type In = (java.lang.Double, java.lang.Long)

  final class TopKAggregator(k: Int)
      extends Aggregator[In, Seq[Pair], Seq[Pair]] {
    require(k > 0)

    private def order(p: Pair): (Double, Long) = (-p._1, p._2)
    private def trim(buf: Seq[Pair], n: Int): Seq[Pair] =
      buf.sortBy(order).take(n)

    override def zero: Seq[Pair] = Vector.empty

    override def reduce(buf: Seq[Pair], in: In): Seq[Pair] = {
      if (in._1 == null || in._2 == null) return buf // null-skip
      val appended = buf :+ ((in._1.doubleValue, in._2.longValue))
      // amortize: only sort-trim when the buffer doubles past k
      if (appended.size > 2 * k) trim(appended, k) else appended
    }

    override def merge(a: Seq[Pair], b: Seq[Pair]): Seq[Pair] =
      trim(a ++ b, k)

    override def finish(buf: Seq[Pair]): Seq[Pair] = trim(buf, k)

    override def bufferEncoder: Encoder[Seq[Pair]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Pair]]()
    override def outputEncoder: Encoder[Seq[Pair]] =
      bufferEncoder
  }

  /** Column form: `df.groupBy(g).agg(TopK.topK(3)(col("v"), col("id")))`. */
  def topK(k: Int): (Column, Column) => Column = {
    val fn = udaf(new TopKAggregator(k))
    (value, id) => fn(value, id)
  }
}
