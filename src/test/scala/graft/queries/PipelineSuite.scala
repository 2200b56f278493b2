package graft.queries

import graft.SparkTestBase

/**
 * Invariants of the p-series curation operators that the oracle's
 * hash-compare can't articulate: the p02 budget planner must never
 * allocate more than the budget (capped proportional share), its rates
 * must be valid probabilities, and capping must actually occur on the
 * fixtures (otherwise the `least` branch is dead code).
 */
class PipelineSuite extends SparkTestBase {

  private val budget = 20000L

  test("p01 funnel stages are monotone (each stage filters the previous)") {
    val rows = PipelineQueries.defs.find(_.name == "p01_curation_funnel").get
      .fn(spark, sfDir)
      .selectExpr("source", "n_raw", "n_quality", "n_rep", "n_lang",
        "n_dedup", "n_clean", "n_sampled")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val counts = (1 to 7).map(r.getLong)
      counts.sliding(2).foreach { case Seq(prev, next) =>
        assert(next <= prev,
          s"${r.getString(0)}: stage counts not monotone: $counts")
      }
    }
    // the repetition stage must actually fire on the fixtures
    val qual = rows.map(_.getLong(2)).sum
    val rep = rows.map(_.getLong(3)).sum
    assert(rep < qual, "repetition stage filtered nothing")
  }

  test("p02 token-budget allocations respect the budget and rate bounds") {
    val rows = PipelineQueries.defs.find(_.name == "p02_token_budget").get
      .fn(spark, sfDir)
      .selectExpr("source", "n_tokens", "weight", "keep_rate", "alloc_tokens")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4)))
    assert(rows.length == 20, s"expected 20 sources, got ${rows.length}")

    rows.foreach { case (src, tokens, weight, rate, alloc) =>
      assert(rate > 0.0 && rate <= 1.0, s"$src rate $rate out of (0,1]")
      assert(alloc <= tokens, s"$src allocated more tokens than it has")
      assert(math.abs(alloc - math.floor(rate * tokens)) < 1e-6,
        s"$src alloc $alloc inconsistent with rate $rate * $tokens")
      val expectedW =
        if (Set("src0", "src4", "src8", "src12", "src16")(src)) 3
        else if (Set("src1", "src5", "src9", "src13", "src17")(src)) 2
        else 1
      assert(weight == expectedW, s"$src weight $weight != $expectedW")
    }
    val total = rows.map(_._5).sum
    assert(total <= budget,
      s"total allocation $total exceeds budget $budget")
    assert(total > budget / 2, s"total allocation $total implausibly low")
    // the cap must fire somewhere and not everywhere
    assert(rows.exists(_._4 == 1.0), "no source hit the rate cap")
    assert(rows.exists(_._4 < 1.0), "every source hit the rate cap")
  }

  test("p03 shard plan covers every doc once with balanced shards") {
    val rows = PipelineQueries.defs.find(_.name == "p03_shard_plan").get
      .fn(spark, sfDir)
      .selectExpr("shard", "n_docs", "n_tokens")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSet.subsetOf((0L until 32L).toSet))
    val totalDocs = rows.map(_._2).sum
    val fixtureDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(totalDocs == fixtureDocs,
      s"shards cover $totalDocs docs, fixture has $fixtureDocs")
    // uniform hash: no shard should dominate (≤4x the ideal share)
    val ideal = totalDocs.toDouble / 32
    rows.foreach { case (shard, n, _) =>
      assert(n <= ideal * 4, s"shard $shard has $n docs (ideal $ideal)")
    }
  }

  test("p04 split covers the corpus and no near-dup pair spans splits") {
    val out = PipelineQueries.defs.find(_.name == "p04_leakage_split").get
      .fn(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val fixtureDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(out.map(_._2).sum == fixtureDocs, "splits must partition the corpus")
    assert(out.map(_._1).toSet.subsetOf(Set("train", "val", "test")))
    assert(out.find(_._1 == "train").exists(_._2 > out.map(_._2).sum / 2),
      "train must hold the majority under the 8/1/1 hash split")

    // leakage audit: both endpoints of every d04 near-dup pair must land
    // in the SAME split — recompute the per-doc assignment the way p04
    // derives it and check against the raw pair list
    val labels = graft.ops.ConnectedComponents
      .labels(DedupQueries.minhashPairs(spark), "doc_a", "doc_b")
      .selectExpr("node_id AS doc_id", "rep_id")
    labels.createOrReplaceTempView("p04_labels")
    DedupQueries.minhashPairs(spark).createOrReplaceTempView("p04_pairs")
    val spanning = spark.sql(
      """WITH asg AS (
        |  SELECT d.doc_id,
        |         graft_hash60(concat('split:',
        |           CAST(coalesce(l.rep_id, CAST(d.doc_id AS BIGINT)) AS STRING))) % 10 AS b
        |  FROM documents d LEFT JOIN p04_labels l ON d.doc_id = l.doc_id)
        |SELECT count(*) FROM p04_pairs p
        |JOIN asg a ON a.doc_id = p.doc_a
        |JOIN asg b ON b.doc_id = p.doc_b
        |WHERE a.b <> b.b""".stripMargin)
    assert(spanning.collect()(0).getLong(0) == 0L,
      "a near-dup pair crossed the split boundary — leakage")
  }

  test("p05 snapshot diff classes partition both snapshots exactly") {
    val rows = PipelineQueries.defs.find(_.name == "p05_snapshot_diff").get
      .fn(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == Set("added", "removed", "changed", "unchanged"))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("doc_id").collect().map(_.getLong(0))
    val oldN = docs.count(_ % 7 != 0)
    val newN = docs.count(_ % 5 != 0)
    assert(rows("added") + rows("changed") + rows("unchanged") == newN,
      "added+changed+unchanged must cover the new snapshot")
    assert(rows("removed") + rows("changed") + rows("unchanged") == oldN,
      "removed+changed+unchanged must cover the old snapshot")
    // revision marker fires: every doc in both snapshots with id % 11 == 0
    val changedExpected = docs.count(d => d % 7 != 0 && d % 5 != 0 && d % 11 == 0)
    assert(rows("changed") == changedExpected,
      s"changed=${rows("changed")} expected $changedExpected")
  }

  test("p07 quota sample matches the window form and never exceeds quota") {
    val df = PipelineQueries.defs.find(_.name == "p07_quota_sample").get
      .fn(spark, sfDir)
    // self-oracle: the row_number() window form of the same selection,
    // evaluated by Spark itself (the cross-engine hash equivalence is the
    // DuckDB gate's job; this pins TopK-selection == window-selection)
    val window = spark.sql(
      """WITH h AS (
        |  SELECT doc_id, source, n_chars,
        |         graft_hash60(concat('quota:', CAST(doc_id AS STRING)))
        |           % 1099511627776 AS h40
        |  FROM documents),
        |sel AS (
        |  SELECT source, n_chars, h40,
        |         row_number() OVER (PARTITION BY source ORDER BY h40, doc_id) AS rn
        |  FROM h)
        |SELECT source, count(*) AS n_sel,
        |       sum(n_chars) AS sel_chars,
        |       max(h40) AS h_threshold
        |FROM sel WHERE rn <= 100
        |GROUP BY source""".stripMargin)
    val got = df.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val want = window.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == want, "TopK quota selection diverged from the window form")
    assert(got.nonEmpty && got.values.forall(_._1 <= 100),
      "a source exceeded its quota")
    // the scale shape: payload join-back broadcasts the selected ids —
    // the corpus side must not shuffle for the join
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("BroadcastHashJoin"),
      s"p07 join-back is not broadcast:\n$phys")
  }
}
