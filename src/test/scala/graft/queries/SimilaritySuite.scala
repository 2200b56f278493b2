package graft.queries

import graft.SparkTestBase

/**
 * Quality gates for the approximate similarity paths: s04 (LSH) and s05
 * (IVF) must actually retrieve a reasonable share of the exact top-5
 * neighborhood (s01, the brute-force ground truth) — an ANN variant that
 * is fast but retrieves garbage would still pass the oracle (it matches
 * its own definition), so recall is pinned separately. Deterministic:
 * fixed fixtures + deterministic hyperplanes/centroids.
 */
class SimilaritySuite extends SparkTestBase {

  private def run(name: String): Set[(Long, Long)] =
    SimilarityQueries.defs.find(_.name == name).get
      .fn(spark, sfDir)
      .selectExpr("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  lazy val exact: Set[(Long, Long)] = run("s01_cosine_topk")

  test("s04 LSH ANN recalls a meaningful share of the exact top-5") {
    val lsh = run("s04_ann_lsh")
    assert(lsh.nonEmpty, "LSH ANN returned nothing")
    val hits = lsh.count(exact.contains)
    val recall = hits.toDouble / math.min(lsh.size, exact.size)
    assert(recall >= 0.2,
      f"LSH recall $recall%.2f too low ($hits hits of ${lsh.size} returned)")
  }

  test("s05 IVF ANN recalls a meaningful share of the exact top-5") {
    val ivf = run("s05_ivf_ann")
    assert(ivf.nonEmpty, "IVF ANN returned nothing")
    val hits = ivf.count(exact.contains)
    val recall = hits.toDouble / math.min(ivf.size, exact.size)
    assert(recall >= 0.2,
      f"IVF recall $recall%.2f too low ($hits hits of ${ivf.size} returned)")
  }

  test("approximate candidates never include the query itself") {
    for (name <- Seq("s04_ann_lsh", "s05_ivf_ann")) {
      assert(run(name).forall { case (q, n) => q != n }, s"$name self-match")
    }
  }
}
