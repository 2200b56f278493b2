package graft.queries

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Session-cached near-duplicate cluster closure: the d08 connected
 * components over the MinHash-LSH pair graph, computed ONCE per
 * (session, fixture dir) and shared by every consumer (d08's cluster
 * listing, d10's survivor election, p04's leakage-safe split).
 *
 * Why: the closure — LSH banding + the iterative large-star/small-star
 * contraction — is the most expensive stage of the dedup pipeline, and
 * before this cache d08, d10 and p04 each recomputed it from scratch
 * (3× the pipeline's dominant cost at every scale; at sf1 that was
 * ~10 s of a 70 s non-s02 bench). One computation, materialized via
 * `localCheckpoint`, turns the other two consumers into a cheap join
 * against a small cached label table.
 *
 * Size: labels cover only docs incident to ≥1 near-dup pair — a small
 * fraction of any real corpus (55 rows at sf0.01) — so pinning the
 * checkpoint blocks for the session's lifetime costs kilobytes per
 * fixture, not gigabytes. A 100 TB deployment would write the labels to
 * a table on the re-cluster cadence and read that everywhere, which is
 * exactly the shape this cache gives the single-session registry.
 */
object ClusterLabels {

  // Keyed by the session REFERENCE (SparkSession doesn't override equals,
  // so tuple equality is identity — collision-free, unlike
  // identityHashCode, which can collide across live objects). Entries for
  // stopped sessions are evicted lazily on the next access so the map
  // never accumulates dead sessions' checkpoint blocks for the JVM's life.
  private val cache = new ConcurrentHashMap[(SparkSession, String), DataFrame]()

  /** Number of full closure computations since JVM start — lets tests
    * assert the sharing actually happens (one computation across
    * d08 + d10 + p04). */
  private[graft] val computations = new AtomicLong(0L)

  /** (doc_id, rep_id) for every doc incident to ≥1 near-dup pair;
    * rep_id = component-minimum doc_id. Computed on first request per
    * (session, sfDir), materialized, then served from cache. */
  def labels(spark: SparkSession, sfDir: String): DataFrame = {
    cache.keySet().removeIf(_._1.sparkContext.isStopped)
    cache.computeIfAbsent(
      (spark, sfDir),
      _ => {
        QueryDef.views(spark, sfDir)
        computations.incrementAndGet()
        // Component-equivalent STAR edges, not the clique pair list: the
        // closure only needs connectivity, and the star form is linear
        // in LSH-bucket size where the pair list is quadratic (the
        // round-12 sf100 probe: 1000-member exact-dup buckets made the
        // clique expansion spill past the disk; the band front end is
        // still shared with d04/d11 via PairGraph's cached band table).
        // ClusterLabelsSuite pins label equality against the full-pair
        // closure; the d08 oracle (recursive closure over the d04 pairs)
        // stays byte-identical because every bucket member reaches the
        // bucket minimum through the star.
        // measured-stats checkpoint: consumers join these labels against
        // the corpus — genuinely tiny label tables should broadcast,
        // corpus-proportional ones (dup-heavy corpora) must not
        org.apache.spark.sql.graft.HonestCheckpoint.localCheckpoint(
          graft.ops.ConnectedComponents
            .labels(PairGraph.starEdges(spark, sfDir), "doc_a", "doc_b")
            .selectExpr("node_id AS doc_id", "rep_id"))
      })
  }
}
