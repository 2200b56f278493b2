package graft.queries

import graft.SparkTestBase

/** The d08 closure must be computed ONCE per (session, fixture) and
  * shared by every consumer — d08, d10, p04 (VERDICT r07 "What's wrong"
  * #2: tripling the most expensive pipeline stage). */
class ClusterLabelsSuite extends SparkTestBase {

  private def run(name: String) = {
    val d = graft.SparkEntry.allDefs.find(_.name == name).get
    d.fn(spark, sfDir).collect()
  }

  test("d08 + d10 + p04 share one connected-components execution") {
    val before = ClusterLabels.computations.get()
    run("d08_dup_clusters")
    run("d10_cluster_survivors")
    run("p04_leakage_split")
    val after = ClusterLabels.computations.get()
    // at most one fresh computation across all three (zero if an earlier
    // suite in this JVM already populated the cache for this session+sf)
    assert(after - before <= 1L,
      s"expected <=1 closure computation, saw ${after - before}")
    // and the cache really serves this fixture now: another consumer run
    // adds nothing
    run("d10_cluster_survivors")
    assert(ClusterLabels.computations.get() === after)
  }

  test("d04 + d11 + the closure share one banded-join execution") {
    val before = PairGraph.computations.get()
    run("d04_minhash_lsh")
    run("d11_source_contamination")
    run("d08_dup_clusters")
    val after = PairGraph.computations.get()
    assert(after - before <= 1L,
      s"expected <=1 pair-graph computation, saw ${after - before}")
    run("d04_minhash_lsh")
    assert(PairGraph.computations.get() === after)
    // and the cached graph is the real one
    assert(fingerprint(PairGraph.pairs(spark, sfDir)) ===
      fingerprint(DedupQueries.minhashPairs(spark)))
  }

  test("pair expansion persists when the pair bound is small, streams " +
      "when it is not — results identical either way") {
    // fresh sessions: the pairs cache is keyed by session reference, so
    // each regime gets its own plan construction
    val small = spark.newSession()
    val pSmall = PairGraph.pairs(small, sfDir)
    assert(pSmall.storageLevel.useMemory || pSmall.storageLevel.useDisk,
      "sf0.001's provably tiny pair set should be persisted")
    val big = spark.newSession()
    big.conf.set("spark.graft.dedup.pairPersistMaxPairs", "0")
    val pBig = PairGraph.pairs(big, sfDir)
    assert(pBig.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
      "over-bound pair sets must stream, never materialize")
    assert(fingerprint(pSmall) === fingerprint(pBig))
  }

  test("labels table matches a direct closure computation") {
    val direct = graft.ops.ConnectedComponents
      .labels(DedupQueries.minhashPairs(spark), "doc_a", "doc_b")
      .selectExpr("node_id AS doc_id", "rep_id")
    assert(fingerprint(ClusterLabels.labels(spark, sfDir)) ===
      fingerprint(direct))
  }
}
