package graft.queries

import QueryDef._

/**
 * End-to-end training-data curation pipeline over `documents` — the
 * composition proof for the per-stage operators (t02 quality, t03 langid,
 * d02 exact dedup, d07 decontamination, t05 deterministic sampling): one
 * query runs the whole funnel and reports per-source survivor counts at
 * every stage, so a mix change at any stage is visible in one scan of the
 * output.
 *
 * Stage semantics are cumulative (each stage filters the previous stage's
 * survivors), matching how a real curation run is sequenced:
 *   raw → quality (>=30 tokens) → repetition (t06 gate: top-word and
 *   duplicate-2-gram fractions) → language (en stopword vote) →
 *   exact dedup (min doc_id per md5(text) among language survivors) →
 *   decontamination (no 3-gram shared with the held-out bench set, bench
 *   members themselves dropped) → deterministic per-source hash sample.
 *
 * Scale shape (the reason this funnel survives 100 TB):
 *  - token stats: one explode + hash-aggregate keyed on the UNIQUE doc_id —
 *    embarrassingly parallel, no skew;
 *  - dedup survivors: one hash-aggregate keyed on md5(text) (8-byte-ish
 *    keys, map-side partial min);
 *  - decontamination: the bench side collapses to a DISTINCT set of 60-bit
 *    shingle hashes — tiny next to the corpus, so the contamination probe
 *    is a broadcast hash-join (never an all-pairs compare);
 *  - sampling: a pure map-side deterministic predicate (no rand(), stable
 *    across engines and retried tasks);
 *  - the final rollup groups by `source` (~20 groups) — partial aggregation
 *    makes the funnel's only unavoidable shuffle a few hundred bytes per
 *    task.
 */
object PipelineQueries {

  private val rateCase =
    """CASE WHEN %s IN ('src0', 'src4', 'src8', 'src12', 'src16') THEN 80
      |     WHEN %s IN ('src1', 'src5', 'src9', 'src13', 'src17') THEN 50
      |     ELSE 20 END""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    dialect("p01_curation_funnel",
      s"""WITH tokc AS (
         |  SELECT doc_id, tok, count(*) AS cnt
         |  FROM (SELECT doc_id, tok
         |        FROM documents LATERAL VIEW explode(split(text, ' ')) x AS tok) e
         |  GROUP BY doc_id, tok),
         |stats AS (
         |  SELECT doc_id,
         |         sum(cnt) AS n_tok,
         |         max(cnt) AS top_cnt,
         |         sum(CASE WHEN tok IN ('the', 'a', 'of', 'and') THEN cnt ELSE 0 END) AS en,
         |         sum(CASE WHEN tok IN ('der', 'le', 'el', 'und', 'et', 'y') THEN cnt ELSE 0 END) AS xx
         |  FROM tokc GROUP BY doc_id),
         |${TextQueries.sparkGramsRep},
         |flags AS (
         |  SELECT d.doc_id, d.source, d.text,
         |         (s.n_tok >= 30) AS ok_q,
         |         (s.n_tok >= 30
         |            AND CAST(s.top_cnt AS DOUBLE) / s.n_tok <= CAST(${TextQueries.TopWordFracMax} AS DOUBLE)
         |            AND r.dup_2gram_frac <= CAST(${TextQueries.DupGramFracMax} AS DOUBLE)) AS ok_r,
         |         (s.n_tok >= 30
         |            AND CAST(s.top_cnt AS DOUBLE) / s.n_tok <= CAST(${TextQueries.TopWordFracMax} AS DOUBLE)
         |            AND r.dup_2gram_frac <= CAST(${TextQueries.DupGramFracMax} AS DOUBLE)
         |            AND s.en >= 1 AND s.en >= s.xx) AS ok_l
         |  FROM documents d JOIN stats s ON d.doc_id = s.doc_id
         |  JOIN grm r ON d.doc_id = r.doc_id),
         |surv AS (
         |  SELECT min(doc_id) AS keep_id
         |  FROM flags WHERE ok_l GROUP BY md5(text)),
         |sh AS (${DedupQueries.sparkShingles}),
         |bench AS (SELECT DISTINCT h FROM sh WHERE doc_id % 41 = 0),
         |contam AS (
         |  SELECT DISTINCT s.doc_id FROM sh s JOIN bench b ON s.h = b.h
         |  WHERE s.doc_id % 41 <> 0),
         |staged AS (
         |  SELECT f.source, f.ok_q, f.ok_r, f.ok_l,
         |         (f.ok_l AND v.keep_id IS NOT NULL) AS ok_d,
         |         (f.ok_l AND v.keep_id IS NOT NULL
         |            AND f.doc_id % 41 <> 0 AND c.doc_id IS NULL) AS ok_c,
         |         (f.ok_l AND v.keep_id IS NOT NULL
         |            AND f.doc_id % 41 <> 0 AND c.doc_id IS NULL
         |            AND graft_hash60(concat('smp:', CAST(f.doc_id AS STRING))) % 100
         |                < ${rateCase.format("f.source", "f.source")}) AS ok_s
         |  FROM flags f
         |  LEFT JOIN surv v ON f.doc_id = v.keep_id
         |  LEFT JOIN contam c ON f.doc_id = c.doc_id)
         |SELECT source,
         |       count(*) AS n_raw,
         |       CAST(sum(CASE WHEN ok_q THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
         |       CAST(sum(CASE WHEN ok_r THEN 1 ELSE 0 END) AS BIGINT) AS n_rep,
         |       CAST(sum(CASE WHEN ok_l THEN 1 ELSE 0 END) AS BIGINT) AS n_lang,
         |       CAST(sum(CASE WHEN ok_d THEN 1 ELSE 0 END) AS BIGINT) AS n_dedup,
         |       CAST(sum(CASE WHEN ok_c THEN 1 ELSE 0 END) AS BIGINT) AS n_clean,
         |       CAST(sum(CASE WHEN ok_s THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
         |FROM staged GROUP BY source""".stripMargin,
      s"""WITH tokc AS (
         |  SELECT doc_id, tok, count(*) AS cnt
         |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
         |        FROM documents) e
         |  GROUP BY doc_id, tok),
         |stats AS (
         |  SELECT doc_id,
         |         sum(cnt) AS n_tok,
         |         max(cnt) AS top_cnt,
         |         sum(CASE WHEN tok IN ('the', 'a', 'of', 'and') THEN cnt ELSE 0 END) AS en,
         |         sum(CASE WHEN tok IN ('der', 'le', 'el', 'und', 'et', 'y') THEN cnt ELSE 0 END) AS xx
         |  FROM tokc GROUP BY doc_id),
         |${TextQueries.duckGramsRep},
         |flags AS (
         |  SELECT d.doc_id, d.source, d.text,
         |         (s.n_tok >= 30) AS ok_q,
         |         (s.n_tok >= 30
         |            AND CAST(s.top_cnt AS DOUBLE) / s.n_tok <= CAST(${TextQueries.TopWordFracMax} AS DOUBLE)
         |            AND r.dup_2gram_frac <= CAST(${TextQueries.DupGramFracMax} AS DOUBLE)) AS ok_r,
         |         (s.n_tok >= 30
         |            AND CAST(s.top_cnt AS DOUBLE) / s.n_tok <= CAST(${TextQueries.TopWordFracMax} AS DOUBLE)
         |            AND r.dup_2gram_frac <= CAST(${TextQueries.DupGramFracMax} AS DOUBLE)
         |            AND s.en >= 1 AND s.en >= s.xx) AS ok_l
         |  FROM documents d JOIN stats s ON d.doc_id = s.doc_id
         |  JOIN grm r ON d.doc_id = r.doc_id),
         |surv AS (
         |  SELECT min(doc_id) AS keep_id
         |  FROM flags WHERE ok_l GROUP BY md5(text)),
         |sh AS (${DedupQueries.duckShingles}),
         |bench AS (SELECT DISTINCT h FROM sh WHERE doc_id % 41 = 0),
         |contam AS (
         |  SELECT DISTINCT s.doc_id FROM sh s JOIN bench b ON s.h = b.h
         |  WHERE s.doc_id % 41 <> 0),
         |staged AS (
         |  SELECT f.source, f.ok_q, f.ok_r, f.ok_l,
         |         (f.ok_l AND v.keep_id IS NOT NULL) AS ok_d,
         |         (f.ok_l AND v.keep_id IS NOT NULL
         |            AND f.doc_id % 41 <> 0 AND c.doc_id IS NULL) AS ok_c,
         |         (f.ok_l AND v.keep_id IS NOT NULL
         |            AND f.doc_id % 41 <> 0 AND c.doc_id IS NULL
         |            AND CAST('0x' || substr(md5('smp:' || CAST(f.doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100
         |                < ${rateCase.format("f.source", "f.source")}) AS ok_s
         |  FROM flags f
         |  LEFT JOIN surv v ON f.doc_id = v.keep_id
         |  LEFT JOIN contam c ON f.doc_id = c.doc_id)
         |SELECT source,
         |       count(*) AS n_raw,
         |       CAST(sum(CASE WHEN ok_q THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
         |       CAST(sum(CASE WHEN ok_r THEN 1 ELSE 0 END) AS BIGINT) AS n_rep,
         |       CAST(sum(CASE WHEN ok_l THEN 1 ELSE 0 END) AS BIGINT) AS n_lang,
         |       CAST(sum(CASE WHEN ok_d THEN 1 ELSE 0 END) AS BIGINT) AS n_dedup,
         |       CAST(sum(CASE WHEN ok_c THEN 1 ELSE 0 END) AS BIGINT) AS n_clean,
         |       CAST(sum(CASE WHEN ok_s THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
         |FROM staged GROUP BY source""".stripMargin),

    // token-budget mixture planner — the data-mixing primitive that sits in
    // front of t05's hash sampler: given per-source mixture weights and a
    // total token budget, compute each source's keep rate and allocation
    // (proportional share, capped at 1.0 when a source can't fill its
    // share). Scale shape: one scan + a ~20-group aggregate, then a
    // broadcastable one-row total — the plan is scan-bound at any corpus
    // size and the output is one row per source. The rate/allocation math
    // divides exact integers in a fixed order, so the doubles (and their
    // floor) are bit-identical across engines.
    dialect("p02_token_budget",
      """WITH tok AS (
        |  SELECT source, count(*) AS n_docs,
        |         sum(size(split(text, ' '))) AS n_tokens
        |  FROM documents GROUP BY source),
        |w AS (
        |  SELECT source, n_docs, n_tokens,
        |         CASE WHEN source IN ('src0', 'src4', 'src8', 'src12', 'src16') THEN 3
        |              WHEN source IN ('src1', 'src5', 'src9', 'src13', 'src17') THEN 2
        |              ELSE 1 END AS wgt
        |  FROM tok),
        |tot AS (SELECT sum(wgt) AS wsum FROM w)
        |SELECT w.source,
        |       CAST(w.n_docs AS BIGINT) AS n_docs,
        |       CAST(w.n_tokens AS BIGINT) AS n_tokens,
        |       CAST(w.wgt AS BIGINT) AS weight,
        |       least(CAST(1 AS DOUBLE),
        |             CAST(20000 AS DOUBLE) * w.wgt / t.wsum / w.n_tokens) AS keep_rate,
        |       CAST(floor(least(CAST(1 AS DOUBLE),
        |             CAST(20000 AS DOUBLE) * w.wgt / t.wsum / w.n_tokens)
        |           * w.n_tokens) AS BIGINT) AS alloc_tokens
        |FROM w CROSS JOIN tot t""".stripMargin,
      """WITH tok AS (
        |  SELECT source, count(*) AS n_docs,
        |         sum(len(string_split(text, ' '))) AS n_tokens
        |  FROM documents GROUP BY source),
        |w AS (
        |  SELECT source, n_docs, n_tokens,
        |         CASE WHEN source IN ('src0', 'src4', 'src8', 'src12', 'src16') THEN 3
        |              WHEN source IN ('src1', 'src5', 'src9', 'src13', 'src17') THEN 2
        |              ELSE 1 END AS wgt
        |  FROM tok),
        |tot AS (SELECT sum(wgt) AS wsum FROM w)
        |SELECT w.source,
        |       CAST(w.n_docs AS BIGINT) AS n_docs,
        |       CAST(w.n_tokens AS BIGINT) AS n_tokens,
        |       CAST(w.wgt AS BIGINT) AS weight,
        |       least(CAST(1 AS DOUBLE),
        |             CAST(20000 AS DOUBLE) * w.wgt / t.wsum / w.n_tokens) AS keep_rate,
        |       CAST(floor(least(CAST(1 AS DOUBLE),
        |             CAST(20000 AS DOUBLE) * w.wgt / t.wsum / w.n_tokens)
        |           * w.n_tokens) AS BIGINT) AS alloc_tokens
        |FROM w CROSS JOIN tot t""".stripMargin),

    // output-shard planning — the write-out end of the curation pipeline:
    // every document is assigned to one of 32 shards by a deterministic
    // content-independent hash of its id (so retried writers and both
    // engines agree), and the query audits shard balance (doc/token counts
    // per shard, dominant source per shard via struct-max). At 100 TB this
    // is the pre-write balance check before `repartition(shard)` — a pure
    // map-side shard assignment plus one 32-group aggregate; no skew
    // because the hash is uniform over doc ids.
    dialect("p03_shard_plan",
      """SELECT shard,
        |       count(*) AS n_docs,
        |       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
        |       max(struct(n_tok, doc_id)).doc_id AS largest_doc
        |FROM (
        |  SELECT doc_id,
        |         graft_hash60(concat('shard:', CAST(doc_id AS STRING))) % 32 AS shard,
        |         size(split(text, ' ')) AS n_tok
        |  FROM documents) s
        |GROUP BY shard""".stripMargin,
      """SELECT shard,
        |       count(*) AS n_docs,
        |       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
        |       (max({'n_tok': n_tok, 'doc_id': doc_id})).doc_id AS largest_doc
        |FROM (
        |  SELECT doc_id,
        |         CAST('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 32 AS shard,
        |         len(string_split(text, ' ')) AS n_tok
        |  FROM documents) s
        |GROUP BY shard""".stripMargin),

    // leakage-safe train/val/test split: the split key is the NEAR-DUP
    // CLUSTER representative (d08's connected components over the minhash
    // pair graph), not the document — a doc-keyed split leaks near-
    // duplicate pairs across the train/eval boundary, the classic
    // contamination bug in training-data pipelines. Unclustered docs are
    // their own group. Assignment is a deterministic hash of the group id
    // (stable across engines, retries, and reruns); 8/1/1 buckets. Scale
    // shape: CC rounds + one broadcast-sized label join (labels cover only
    // docs with >= 1 near-dup pair, a small fraction of any real corpus)
    // + a 3-group aggregate. The invariant — no cluster spans splits — is
    // structural: every member hashes the same group id.
    QueryDef("p04_leakage_split",
      (spark, sfDir) => {
        QueryDef.views(spark, sfDir)
        // session-cached closure — shared with d08/d10 (ClusterLabels)
        val labels = ClusterLabels.labels(spark, sfDir)
        spark.table("documents")
          .join(labels, Seq("doc_id"), "left")
          .selectExpr(
            "coalesce(rep_id, CAST(doc_id AS BIGINT)) AS grp",
            "rep_id")
          // hash once per doc, branch on the bucket (mirrors the oracle's
          // inner-select shape; two inline hash copies also drift apart
          // under future edits)
          .selectExpr("grp", "rep_id",
            "graft_hash60(concat('split:', CAST(grp AS STRING))) % 10 AS bucket")
          .selectExpr(
            """CASE WHEN bucket < 8 THEN 'train'
              |     WHEN bucket = 8 THEN 'val'
              |     ELSE 'test' END AS split""".stripMargin,
            "grp", "rep_id")
          .groupBy("split")
          .agg(org.apache.spark.sql.functions.expr("count(*)").as("n_docs"),
            org.apache.spark.sql.functions.expr("count(DISTINCT grp)").as("n_groups"),
            org.apache.spark.sql.functions
              .expr("CAST(sum(CASE WHEN rep_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)")
              .as("n_clustered"))
      },
      Some(s"""${DedupQueries.duckClusterLabels},
         |asg AS (
         |  SELECT coalesce(l.rep_id, CAST(d.doc_id AS BIGINT)) AS grp, l.rep_id
         |  FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc_id)
         |SELECT CASE WHEN h % 10 < 8 THEN 'train'
         |            WHEN h % 10 = 8 THEN 'val'
         |            ELSE 'test' END AS split,
         |       count(*) AS n_docs,
         |       count(DISTINCT grp) AS n_groups,
         |       CAST(sum(CASE WHEN rep_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_clustered
         |FROM (SELECT grp, rep_id,
         |             CAST('0x' || substr(md5('split:' || CAST(grp AS VARCHAR)), 1, 15) AS BIGINT) AS h
         |      FROM asg)
         |GROUP BY 1""".stripMargin)),

    // corpus snapshot reconciliation — what changed between two crawls?
    // Two snapshots are derived deterministically from the fixture (old =
    // doc_id % 7 <> 0; new = doc_id % 5 <> 0 with every 11th text revised)
    // and reconciled by a FULL OUTER hash join on doc_id comparing content
    // hashes: added / removed / changed / unchanged, with doc and token
    // volumes per class. At 100 TB this is the standard incremental-crawl
    // audit: one shuffle per side on the join key, md5 computed in the
    // scan projection, and a 4-group aggregate — no full-text compare
    // (hashes stand in for the payload everywhere past the scan).
    dialect("p05_snapshot_diff",
      """WITH old_snap AS (
        |  SELECT doc_id, md5(text) AS h, size(split(text, ' ')) AS n_tok
        |  FROM documents WHERE doc_id % 7 <> 0),
        |new_snap AS (
        |  SELECT doc_id,
        |         md5(CASE WHEN doc_id % 11 = 0 THEN concat(text, ' [revised]')
        |                  ELSE text END) AS h,
        |         size(split(CASE WHEN doc_id % 11 = 0 THEN concat(text, ' [revised]')
        |                         ELSE text END, ' ')) AS n_tok
        |  FROM documents WHERE doc_id % 5 <> 0)
        |SELECT CASE WHEN o.doc_id IS NULL THEN 'added'
        |            WHEN n.doc_id IS NULL THEN 'removed'
        |            WHEN o.h <> n.h THEN 'changed'
        |            ELSE 'unchanged' END AS status,
        |       count(*) AS n_docs,
        |       CAST(sum(coalesce(n.n_tok, o.n_tok)) AS BIGINT) AS n_tokens
        |FROM old_snap o FULL OUTER JOIN new_snap n ON o.doc_id = n.doc_id
        |GROUP BY 1""".stripMargin,
      """WITH old_snap AS (
        |  SELECT doc_id, md5(text) AS h, len(string_split(text, ' ')) AS n_tok
        |  FROM documents WHERE doc_id % 7 <> 0),
        |new_snap AS (
        |  SELECT doc_id,
        |         md5(CASE WHEN doc_id % 11 = 0 THEN text || ' [revised]'
        |                  ELSE text END) AS h,
        |         len(string_split(CASE WHEN doc_id % 11 = 0 THEN text || ' [revised]'
        |                               ELSE text END, ' ')) AS n_tok
        |  FROM documents WHERE doc_id % 5 <> 0)
        |SELECT CASE WHEN o.doc_id IS NULL THEN 'added'
        |            WHEN n.doc_id IS NULL THEN 'removed'
        |            WHEN o.h <> n.h THEN 'changed'
        |            ELSE 'unchanged' END AS status,
        |       count(*) AS n_docs,
        |       CAST(sum(coalesce(n.n_tok, o.n_tok)) AS BIGINT) AS n_tokens
        |FROM old_snap o FULL OUTER JOIN new_snap n ON o.doc_id = n.doc_id
        |GROUP BY 1""".stripMargin),

    // sequence-packing plan — the "documents → fixed-size training
    // windows" step: per source, documents are laid out in doc_id order,
    // each starts at the running token offset, and the 512-token window
    // it starts in is its chunk. The audit reports docs/tokens per chunk
    // and how many docs straddle a window boundary (straddlers get split
    // by the downstream tokenizer — the packing-efficiency signal).
    // Deterministic integer math only (cumulative sums + div), so both
    // engines agree exactly. Scale shape: ONE window pass per source
    // partition (shuffle on source, in-partition ORDER BY doc_id) + a
    // (source, chunk) aggregate; at 100 TB the partition key would be
    // p03's shard instead of source — same plan, finer keys, and the
    // window sort is the write-out sort the packer needs anyway.
    dialect("p06_sequence_pack",
      """WITH tok AS (
        |  SELECT source, doc_id, size(split(text, ' ')) AS n_tok
        |  FROM documents),
        |off AS (
        |  SELECT source, doc_id, n_tok,
        |         coalesce(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off0
        |  FROM tok)
        |SELECT source,
        |       CAST(off0 div 512 AS BIGINT) AS chunk_id,
        |       count(*) AS n_docs,
        |       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
        |       CAST(sum(CASE WHEN off0 div 512 <> (off0 + n_tok - 1) div 512
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_straddlers
        |FROM off
        |GROUP BY source, off0 div 512""".stripMargin,
      """WITH tok AS (
        |  SELECT source, doc_id, len(string_split(text, ' ')) AS n_tok
        |  FROM documents),
        |off AS (
        |  SELECT source, doc_id, n_tok,
        |         coalesce(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off0
        |  FROM tok)
        |SELECT source,
        |       CAST(off0 // 512 AS BIGINT) AS chunk_id,
        |       count(*) AS n_docs,
        |       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
        |       CAST(sum(CASE WHEN off0 // 512 <> (off0 + n_tok - 1) // 512
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_straddlers
        |FROM off
        |GROUP BY source, off0 // 512""".stripMargin),

    // exact per-source document quotas — the budgeted counterpart of t05's
    // RATE sampling: a training mix that says "exactly 100 docs from every
    // source", selected in deterministic hash order so the pick is
    // reproducible across engines, reruns, and retried tasks (no rand(),
    // no arbitrary file order). Scale shape: the selection uses the
    // bounded TopK aggregate over the 40-bit doc hash — shuffle carries at
    // most `quota` rows per source per partition instead of sorting every
    // doc of every source the way the oracle's row_number() window does;
    // the payload join-back then BROADCASTS the selected ids (quota ×
    // n_sources rows) against the corpus, so no corpus shuffle at all.
    // The hash is truncated to 40 bits because TopK ranks through a
    // Double (exact ≤ 2^53); ordering ties (~n²/2^41) break on doc_id in
    // both engines, so the pick stays exact even with collisions.
    QueryDef("p07_quota_sample",
      (spark, sfDir) => {
        QueryDef.views(spark, sfDir)
        import org.apache.spark.sql.functions._
        val quota = 100
        val h40 = spark.table("documents").selectExpr(
          "source", "doc_id",
          "graft_hash60(concat('quota:', CAST(doc_id AS STRING))) % 1099511627776 AS h40")
        val selected = h40.groupBy("source")
          .agg(graft.ops.TopK.topK(quota)(
            -col("h40").cast("double"), col("doc_id")).as("tk"))
          .select(col("source"), explode(col("tk")).as("t"))
          .select(col("source"),
            (-col("t._1")).cast("long").as("h40"),
            col("t._2").as("doc_id"))
        spark.table("documents").select("doc_id", "n_chars")
          .join(broadcast(selected), "doc_id")
          .groupBy("source")
          .agg(count(lit(1)).as("n_sel"),
            sum("n_chars").as("sel_chars"),
            max("h40").as("h_threshold"))
      },
      Some("""WITH h AS (
        |  SELECT doc_id, source, n_chars,
        |         CAST('0x' || substr(md5('quota:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
        |           % 1099511627776 AS h40
        |  FROM documents),
        |sel AS (
        |  SELECT source, doc_id, n_chars, h40,
        |         row_number() OVER (PARTITION BY source ORDER BY h40, doc_id) AS rn
        |  FROM h)
        |SELECT source, count(*) AS n_sel,
        |       CAST(sum(n_chars) AS BIGINT) AS sel_chars,
        |       max(h40) AS h_threshold
        |FROM sel WHERE rn <= 100
        |GROUP BY source""".stripMargin))
  )
}
