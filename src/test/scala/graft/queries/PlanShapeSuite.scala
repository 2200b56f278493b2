package graft.queries

import graft.{SparkEntry, SparkTestBase}

/**
 * Executed-plan regression net for the scale-critical query shapes the
 * rounds have iterated toward. The oracle gate proves VALUES; these pin
 * the PLAN properties that make the values affordable at 100 TB —
 * a future edit that quietly reintroduces a shuffle pipeline, a
 * sort-aggregate, or a row-amplifying cartesian in these queries fails
 * here instead of surfacing as a bench regression next round.
 *
 * Counted on the AQE FINAL plan (after collect), so the assertions hold
 * for what actually ran, not the static estimate.
 */
class PlanShapeSuite extends SparkTestBase {

  private def finalPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect()
    // AdaptiveSparkPlan.toString prints BOTH "== Final Plan ==" and
    // "== Initial Plan ==" — keep only the final section or every
    // token would be double-counted
    val s = df.queryExecution.executedPlan.toString
    val start = s.indexOf("== Final Plan ==")
    val end = s.indexOf("== Initial Plan ==")
    if (start >= 0 && end > start) s.substring(start, end) else s
  }

  private def count(plan: String, token: String): Int =
    token.r.findAllIn(plan).size

  test("s05/s07 IVF paths stay map-only in assignment (no agg/window pipeline)") {
    for (name <- Seq("s05_ivf_ann", "s07_semdedup")) {
      val p = finalPlan(name)
      assert(count(p, "SortAggregate") == 0,
        s"$name regained a sort-aggregate assignment pipeline")
      assert(count(p, "CartesianProduct") == 0, s"$name cartesian")
      assert(count(p, "Exchange hashpartitioning") <= 2,
        s"$name has ${count(p, "Exchange hashpartitioning")} shuffles (expected <=2)")
    }
  }

  test("s03 LSH bucketing computes projections in-row (no row amplification)") {
    val p = finalPlan("s03_lsh_buckets")
    assert(count(p, "CartesianProduct") == 0, "s03 cartesian")
    // one Generate: the 2-band inline explode (2 rows/vector, by design);
    // the 512-coefficient expansion must NOT reappear as a join
    assert(count(p, "Generate") == 1,
      s"s03 has ${count(p, "Generate")} generators (expected 1: band inline)")
    assert(count(p, "Exchange hashpartitioning") <= 1,
      "s03 should shuffle only for the final bucket histogram")
  }

  test("t06 repetition computes the 2-gram metric in-row (single explode)") {
    val p = finalPlan("t06_repetition")
    assert(count(p, "Generate") == 1,
      s"t06 has ${count(p, "Generate")} generators (expected 1: top-word explode)")
    assert(count(p, "CartesianProduct") == 0, "t06 cartesian")
  }

  test("p02/p03 planners stay scan-bound (aggregate-only plans)") {
    for ((name, maxShuffles) <- Seq("p02_token_budget" -> 3,
        "p03_shard_plan" -> 1)) {
      val p = finalPlan(name)
      assert(count(p, "CartesianProduct") == 0, s"$name cartesian")
      assert(count(p, "Generate") == 0, s"$name should not explode")
      assert(count(p, "Exchange hashpartitioning") <= maxShuffles,
        s"$name has ${count(p, "Exchange hashpartitioning")} shuffles")
    }
  }

  test("d03 pair expansion stays an equi-join (no cartesian at any step)") {
    val p = finalPlan("d03_ngram_jaccard")
    assert(count(p, "CartesianProduct") == 0, "d03 cartesian")
  }

  test("p05 reconciles snapshots with one full-outer hash join") {
    val p = finalPlan("p05_snapshot_diff")
    assert(count(p, "CartesianProduct") == 0, "p05 cartesian")
    assert(count(p, "FullOuter") >= 1, "p05 lost its full-outer join")
    assert(count(p, "Generate") == 0, "p05 should not explode")
    // join (2 sides) + final 4-group aggregate
    assert(count(p, "Exchange hashpartitioning") <= 3,
      s"p05 has ${count(p, "Exchange hashpartitioning")} shuffles (expected <=3)")
  }

  test("t07 rarity score: df aggregate + token join, never a cartesian") {
    val p = finalPlan("t07_idf_score")
    assert(count(p, "CartesianProduct") == 0, "t07 cartesian")
    assert(count(p, "SortAggregate") == 0, "t07 regained a sort-aggregate")
    // distinct (doc,tok), df aggregate, join back, doc aggregate
    assert(count(p, "Exchange hashpartitioning") <= 4,
      s"t07 has ${count(p, "Exchange hashpartitioning")} shuffles (expected <=4)")
  }

  test("q34 per-group top-k: bounded aggregate, no window, no per-group sort") {
    val p = finalPlan("q34_lateral_topk")
    assert(count(p, "Window") == 0, "q34 regained a window-rank pipeline")
    assert(count(p, "SortAggregate") == 0, "q34 top-k fell back to sort-agg")
    // the TopK udaf runs as an object-hash aggregate: partial (2k-bounded
    // buffers) + final — the shuffle carries k rows per group per task
    assert(count(p, "ObjectHashAggregate") >= 2,
      "q34 lost the partial/final bounded top-k aggregate")
  }

  test("d06 salted band join spreads hot bands; min combines map-side") {
    val p = finalPlan("d06_simhash_neardup")
    assert(count(p, "CartesianProduct") == 0, "d06 cartesian")
    assert(count(p, "Window") == 0, "d06 window")
    // the salt explode on the mate side is the one Generate
    assert(count(p, "Generate") >= 1, "d06 lost the salt replication")
  }

  test("d09 candidates come from the band equi-join; levenshtein never " +
      "gates a cartesian") {
    val p = finalPlan("d09_editdist_neardup")
    assert(count(p, "CartesianProduct") == 0,
      "d09 cartesian — the verifier must only run on band-mate candidates")
    // the expensive verifier must appear as a post-join filter/projection,
    // not as a join condition forcing a nested-loop plan
    assert(count(p, "BroadcastNestedLoopJoin") == 0, "d09 nested-loop join")
    assert(p.contains("levenshtein"), "d09 lost its levenshtein verifier")
  }
}
