package graft.queries

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{col, min}

/**
 * Session-cached MinHash-LSH band table and its two derived edge sets,
 * each computed ONCE per (session, fixture dir):
 *
 *  - [[pairs]]: the (doc_a, doc_b) candidate pairs of the d04 banded
 *    self-join — the union of per-(band, sig)-bucket CLIQUES. This is
 *    the QUERY OUTPUT of d04 and d11, so its size is inherently
 *    quadratic in bucket size (a bucket of k identical docs contributes
 *    k·(k−1)/2 pairs). Consumers: d04's pair listing, d11's
 *    contamination matrix. Not materialized at scale: a corpus-sized
 *    pair list does not fit anywhere (the sf100 fixture's 1000-member
 *    exact-dup cliques yield ~2.5e9 pairs; an eager checkpoint or a
 *    DISTINCT shuffle of that list filled the whole disk). Instead the
 *    expansion STREAMS: each pair is emitted by its FIRST matching band
 *    only (both sides carry the minhash vector; a band-b match is kept
 *    iff every earlier band mismatches), which is set-identical to the
 *    DISTINCT of the naive 4-band join but needs no dedup shuffle —
 *    pairs flow straight from the co-partitioned band join into the
 *    consumer's aggregation. One bounded escape hatch: when the EXACT
 *    pair bound (Σ k·(k−1)/2 over the measured band table) fits a few
 *    executor-MB, the expansion is persisted so repeat consumers skip
 *    the band re-join (see the size gate in [[pairs]]).
 *  - [[starEdges]]: one edge per band row to the bucket-minimum doc —
 *    a spanning STAR per bucket, LINEAR in bucket size (≤4 edges per
 *    doc), with exactly the same connected components as the clique
 *    union (every bucket member reaches the bucket min; star edges are
 *    a subset of clique edges). Consumer: the d08/d10/p04 cluster
 *    closure ([[ClusterLabels]]), which only needs connectivity — the
 *    round-12 sf100 probe showed the clique expansion exploding
 *    quadratically on a corpus with 1000-member exact-dup buckets
 *    (boilerplate mega-clusters at web scale) while the star form stays
 *    proportional to the corpus.
 *
 * Both derive from one cached `bands` execution — the expensive front
 * end (shingle → minhash → band explode over the raw corpus) runs once
 * per (session, fixture) no matter which consumers fire, the shape a
 * 100 TB deployment gets by materializing the band table once per dedup
 * cadence. The pair EXPANSION on top of it is cheap relative to the
 * front end and is re-run per consumer (d04, d11) — re-reading the
 * materialized band table is what a production pipeline does too; only
 * the linear-sized band table is ever stored.
 *
 * Keyed by session REFERENCE (identity equality — SparkSession doesn't
 * override equals); stopped sessions evicted lazily, matching
 * [[ClusterLabels]].
 */
object PairGraph {

  private val bandsCache = new ConcurrentHashMap[(SparkSession, String), DataFrame]()
  private val pairsCache = new ConcurrentHashMap[(SparkSession, String), DataFrame]()

  /** Fresh band-table derivations since JVM start — lets tests assert the
    * front end runs once across d04 + d11 + the closure. */
  private[graft] val computations = new AtomicLong(0L)

  /** Fresh pair-expansion PLAN constructions since JVM start (d04 + d11
    * share one plan over the shared band table; each consumer executes
    * it — streaming the band join anew unless the size-gated persist
    * in [[pairs]] cached the expansion). */
  private[graft] val pairExpansions = new AtomicLong(0L)

  /** The (doc_id, band, sig, mh) table of the d04 LSH banding,
    * materialized once per (session, sfDir). Linear in the corpus (4
    * rows per doc); `mh` is the doc's full minhash vector, carried so
    * the pair expansion can test EARLIER bands without a join back. */
  private def bands(spark: SparkSession, sfDir: String): DataFrame = {
    bandsCache.keySet().removeIf(_._1.sparkContext.isStopped)
    bandsCache.computeIfAbsent(
      (spark, sfDir),
      _ => {
        QueryDef.views(spark, sfDir)
        computations.incrementAndGet()
        // measured-stats checkpoint: the band table is estimated through
        // projections that drop `text`, so the inherited estimate can sit
        // under the broadcast threshold while the table is actually
        // corpus-sized — the self-join below must never broadcast a side
        org.apache.spark.sql.graft.HonestCheckpoint.localCheckpoint(
          spark.sql(s"WITH ${DedupQueries.sparkMinhashCtes}\n" +
            "SELECT doc_id, band, sig, mh FROM bands"))
      })
  }

  /** (doc_a, doc_b) candidate pairs, doc_a < doc_b — set-identical to
    * the one-shot d04 SQL (`DedupQueries.minhashPairs`), expanded from
    * the cached band table. Unique by CONSTRUCTION (first-matching-band
    * emission), so no DISTINCT shuffle and no materialization — the
    * output is safe to stream at any clique size. The earlier-band test
    * compares the carried minhash values directly (band j's sig is the
    * ':'-joined render of mh[2j], mh[2j+1] — injective for longs, so
    * value equality ⟺ sig equality); the three disjuncts stay inside
    * whole-stage codegen, no higher-order functions on the 10^10-row
    * hot path. */
  def pairs(spark: SparkSession, sfDir: String): DataFrame = {
    pairsCache.keySet().removeIf(_._1.sparkContext.isStopped)
    pairsCache.computeIfAbsent(
      (spark, sfDir),
      _ => {
        val b = bands(spark, sfDir)
        pairExpansions.incrementAndGet()
        val expanded = b.as("a").join(b.as("b"),
            col("a.band") === col("b.band") &&
            col("a.sig") === col("b.sig") &&
            col("a.doc_id") < col("b.doc_id"))
          .where(org.apache.spark.sql.functions.expr(
            """NOT ((a.band > 0 AND a.mh[0] = b.mh[0] AND a.mh[1] = b.mh[1])
              |  OR (a.band > 1 AND a.mh[2] = b.mh[2] AND a.mh[3] = b.mh[3])
              |  OR (a.band > 2 AND a.mh[4] = b.mh[4] AND a.mh[5] = b.mh[5]))
              |""".stripMargin))
          .selectExpr("a.doc_id AS doc_a", "b.doc_id AS doc_b")
        // Small-corpus escape hatch for the per-consumer re-execution
        // (BENCH note: d04 sf0.1 0.085 s → 0.26 s after the streamed
        // shape landed): when the pair count is PROVABLY small, cache
        // the expansion so the band join runs once per session instead
        // of once per consumer/run. The bound is exact, not a guess —
        // Σ_buckets k·(k−1)/2 over the checkpointed (hence measured,
        // linear-sized) band table, one cheap agg — so a boilerplate
        // mega-clique corpus (the sf100 disk-filler: ~2.5e9 pairs from
        // 1000-member buckets) always streams, while a corpus whose
        // whole pair set fits a few executor-MB gets the materialized
        // form back. 4M pairs ≈ 64 MB cached — noise at executor scale.
        // decimal(38,0) arithmetic: a mega-clique corpus can push
        // Σ k·(k−1) past Long range, and with ANSI off a Long sum wraps
        // silently — a negative wrap would otherwise pass the <= check
        // and persist exactly the expansion the gate exists to reject
        val pairBound = b.groupBy(col("band"), col("sig"))
          .agg(org.apache.spark.sql.functions.count(col("doc_id")).as("k"))
          .agg(org.apache.spark.sql.functions.sum(
            col("k").cast("decimal(38,0)") * (col("k") - 1)))
          .head()
        val maxPairs = spark.conf
          .get("spark.graft.dedup.pairPersistMaxPairs", "4000000").toLong
        val bounded = !pairBound.isNullAt(0) && {
          val half = pairBound.getDecimal(0).toBigInteger
            .divide(java.math.BigInteger.TWO)
          half.signum >= 0 &&
            half.compareTo(java.math.BigInteger.valueOf(maxPairs)) <= 0
        }
        if (bounded) expanded.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        else expanded
      })
  }

  /** Spanning-star edges (bucket-min, member): component-equivalent to
    * [[pairs]] but linear in bucket size. Cheap to derive from the
    * cached bands (one window min), so not separately cached —
    * [[ClusterLabels]] caches the closure it feeds. */
  def starEdges(spark: SparkSession, sfDir: String): DataFrame =
    bands(spark, sfDir)
      .select(col("doc_id"),
        min("doc_id").over(Window.partitionBy("band", "sig")).as("m"))
      .where(col("doc_id") =!= col("m"))
      .selectExpr("m AS doc_a", "doc_id AS doc_b")
      .distinct()
}
