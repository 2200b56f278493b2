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

  // s07 semantics re-derived independently of its own SQL: a vector is
  // dropped iff a LOWER-id cell-mate sits above the cosine threshold —
  // so per cell the lowest id is always kept, every drop has a kept-or-
  // earlier witness, and the gate actually fires on the fixtures.
  test("s07 semdedup keeps per-cell lowest ids and drops only with a witness") {
    val rows = SimilarityQueries.defs.find(_.name == "s07_semdedup").get
      .fn(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(rows.nonEmpty)
    val byCell = rows.groupBy(_._2)
    byCell.foreach { case (cid, members) =>
      val lowest = members.minBy(_._1)
      assert(lowest._3, s"cell $cid lowest id ${lowest._1} was dropped")
    }
    assert(rows.exists(!_._3), "fixture corpus should produce drops")
    assert(rows.count(_._3) > rows.length / 2, "gate dropped a majority")

    // every dropped vector must have a lower-id cell-mate above 0.4 cosine
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v")
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    rows.filterNot(_._3).foreach { case (id, cid, _) =>
      val mates = byCell(cid).filter(_._1 < id)
      assert(mates.exists(m => cos(emb(m._1), emb(id)) > 0.4),
        s"dropped vec $id has no lower-id witness above threshold in cell $cid")
    }
  }
}
