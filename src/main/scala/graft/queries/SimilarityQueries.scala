package graft.queries

import QueryDef._

/**
 * Similarity search over the `embeddings` table (64-dim float vectors).
 *
 * - brute-force cosine top-k: the exactness baseline. Arrays are cast to
 *   double on BOTH engines and the dot product folds sequentially, so the
 *   IEEE arithmetic matches bit-for-bit.
 * - LSH (random-hyperplane) bucketing: the scale path — at 100 TB the
 *   bucket join replaces the all-pairs product; buckets come from
 *   md5-derived deterministic hyperplanes so the oracle can re-derive them.
 *   Only the SIGN of each projection matters, making the bucket assignment
 *   robust to accumulation-order noise.
 */
object SimilarityQueries {

  // cosine(a, b) with double accumulation in list order. The Spark side
  // uses the codegen'd graft.functions.VectorDot (same strict left fold,
  // bit-identical to aggregate(zip_with(...)) but ~20× faster): vectors are
  // cast to double and their norms computed ONCE per row in `e`, so the
  // per-pair work is a single fused dot-product loop.
  private val sparkNormalized =
    """SELECT vec_id, label, v, sqrt(graft_dot(v, v)) AS nrm
      |FROM (SELECT vec_id, label, CAST(embedding AS ARRAY<DOUBLE>) AS v
      |      FROM embeddings)""".stripMargin

  // list_transform/list_reduce (the `expr::DOUBLE[].apply(...)` dot syntax
  // is rejected by DuckDB's parser); list_reduce's seedless left fold equals
  // Spark's aggregate-with-0.0-seed bit-for-bit since 0.0 + x == x in IEEE
  private def duckCos(a: String, b: String): String =
    s"""list_reduce(list_transform(list_zip($a::DOUBLE[], $b::DOUBLE[]), t -> t[1] * t[2]), (acc, v) -> acc + v)
       | / (sqrt(list_reduce(list_transform($a::DOUBLE[], v -> v * v), (acc, v) -> acc + v))
       |    * sqrt(list_reduce(list_transform($b::DOUBLE[], v -> v * v), (acc, v) -> acc + v)))""".stripMargin

  // Random-hyperplane LSH: 8 planes in 2 BANDS of 4 (16 buckets per
  // band); candidates collide when EITHER band agrees — the standard
  // band-OR construction (a single 8-plane band demands all 8 sign
  // agreements and was measured at 5% recall of the exact top-5; two
  // 4-plane bands lift recall while the band join stays an equi-join).
  // Coefficients are md5-derived and deterministic; only projection SIGNS
  // are used, so bucket assignment is robust to accumulation-order noise.
  // Shared by s03/s04.
  //
  // Single-pass shape (round 4): the 8 coefficient vectors materialize ONCE
  // in a one-row `planes` relation (512 md5 calls total, broadcast to every
  // task), and each embedding row computes all 8 projections with the
  // codegen'd graft_dot in one projection — both band buckets fall out of
  // the same row. The previous shape expanded embeddings × 512 coefficient
  // rows and re-aggregated (a 512× row amplification per vector plus a
  // (vec_id, p) hash-agg); at 100 TB that CROSS JOIN was the scale-killer.
  // The strict index-order fold of graft_dot / list_reduce also makes the
  // projection value (not just its sign) identical on both engines, where
  // the old sum() group-by only pinned the sign.
  private def sparkPlane(p: Int): String =
    s"""transform(sequence(1, 64), d ->
       |           (CAST(conv(substr(md5(concat($p, '_', d)), 1, 15), 16, 10) AS BIGINT) % 2001 - 1000) / CAST(1000 AS DOUBLE)) AS a$p""".stripMargin

  private def duckPlane(p: Int): String =
    s"""list_transform(generate_series(1, 64), d ->
       |           (CAST('0x' || substr(md5($p || '_' || d), 1, 15) AS BIGINT) % 2001 - 1000) / 1000.0) AS a$p""".stripMargin

  private def duckDot(a: String, b: String): String =
    s"list_reduce(list_transform(list_zip($a, $b), t -> t[1] * t[2]), (acc, y) -> acc + y)"

  // band bucket = 4 sign bits of planes [4*band, 4*band+3], weights 1/2/4/8
  private def bandBits(dot: Int => String, band: Int): String =
    (0 until 4).map { i =>
      s"CASE WHEN ${dot(4 * band + i)} > 0 THEN ${1 << i} ELSE 0 END"
    }.mkString(" + ")

  // IVF coarse quantizer (shared by s05/s07): 16 deterministic centroids
  // (the first 16 vectors) collected into ONE broadcast row, so every
  // per-vector assignment or probe ranking folds IN-ROW over the centroid
  // array — a map-only scan with no cross-join row amplification, no
  // aggregate, no shuffle (the same single-pass shape as the s03/s04
  // planes). Spark inlines CTEs, so each reference to an assignment CTE
  // re-runs its subtree; map-only copies make that re-run a cheap scan
  // instead of a shuffle pipeline. array_max / list max over
  // struct(sim, cid) ties to the larger cid identically on both engines.
  // Expects a CTE `e(vec_id, v, nrm)` in scope.
  private val sparkCents =
    """cents AS (
      |  SELECT collect_list(struct(vec_id AS cid, v AS cv, nrm AS cnrm)) AS cs
      |  FROM e WHERE vec_id < 16)""".stripMargin

  // per-vector (sim, cid) array against all 16 centroids — ONE shared
  // expression so s05's simsarr and s07's av can never disagree on the
  // similarity definition (expects relations `e` and `cents c` in scope)
  private val sparkSimArrExpr =
    """transform(c.cs, x ->
      |           struct(graft_dot(e.v, x.cv) / (e.nrm * x.cnrm) AS sim,
      |                  x.cid AS cid))""".stripMargin

  private val sparkSimsArr =
    s"""simsarr AS (
       |  SELECT e.vec_id, $sparkSimArrExpr AS sa
       |  FROM e CROSS JOIN cents c)""".stripMargin

  private[queries] val duckNormalized =
    """SELECT vec_id, label, embedding::DOUBLE[] AS v,
      |       sqrt(list_reduce(list_transform(embedding::DOUBLE[], x -> x * x), (acc, x) -> acc + x)) AS nrm
      |FROM embeddings""".stripMargin

  private[queries] val duckCents =
    """cents AS (
      |  SELECT list({'cid': vec_id, 'cv': v, 'cnrm': nrm}) AS cs
      |  FROM e WHERE vec_id < 16)""".stripMargin

  private val duckSimArrExpr =
    """list_transform(c.cs, x ->
      |           {'sim': list_reduce(list_transform(list_zip(e.v, x.cv), t -> t[1] * t[2]), (acc, y) -> acc + y)
      |                     / (e.nrm * x.cnrm),
      |            'cid': x.cid})""".stripMargin

  private[queries] val duckSimsArr =
    s"""simsarr AS (
       |  SELECT e.vec_id, $duckSimArrExpr AS sa
       |  FROM e CROSS JOIN cents c)""".stripMargin

  private val sparkLsh = {
    def dot(p: Int) = s"graft_dot(eb.v, pl.a$p)"
    s"""planes AS (
       |  SELECT ${(0 to 7).map(sparkPlane).mkString(",\n         ")}),
       |sgn AS (
       |  SELECT eb.vec_id,
       |         CAST(${bandBits(dot, 0)} AS BIGINT) AS b0,
       |         CAST(${bandBits(dot, 1)} AS BIGINT) AS b1
       |  FROM (SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS v FROM embeddings) eb
       |  CROSS JOIN planes pl),
       |buckets AS (
       |  SELECT vec_id, band, bucket
       |  FROM sgn
       |  LATERAL VIEW inline(array(
       |    struct(CAST(0 AS BIGINT) AS band, b0 AS bucket),
       |    struct(CAST(1 AS BIGINT) AS band, b1 AS bucket))) t AS band, bucket)""".stripMargin
  }

  private val duckLsh = {
    def dot(p: Int) = duckDot("eb.v", s"pl.a$p")
    s"""planes AS (
       |  SELECT ${(0 to 7).map(duckPlane).mkString(",\n         ")}),
       |sgn AS (
       |  SELECT eb.vec_id,
       |         CAST(${bandBits(dot, 0)} AS BIGINT) AS b0,
       |         CAST(${bandBits(dot, 1)} AS BIGINT) AS b1
       |  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings) eb
       |  CROSS JOIN planes pl),
       |buckets AS (
       |  SELECT vec_id, CAST(0 AS BIGINT) AS band, b0 AS bucket FROM sgn
       |  UNION ALL
       |  SELECT vec_id, CAST(1 AS BIGINT) AS band, b1 AS bucket FROM sgn)""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(

    // brute-force cosine top-k for a query set (rank only — float values
    // stay out of the output, ranking ties broken by id)
    dialect("s01_cosine_topk",
      s"""WITH e AS ($sparkNormalized)
         |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank FROM (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |         row_number() OVER (PARTITION BY q.vec_id
         |                            ORDER BY graft_dot(q.v, c.v) / (q.nrm * c.nrm) DESC,
         |                                     c.vec_id) AS rank
         |  FROM e q JOIN e c ON q.vec_id <> c.vec_id
         |  WHERE q.vec_id < 20) t
         |WHERE rank <= 5""".stripMargin,
      s"""SELECT query_id, neighbor_id, rank FROM (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |         row_number() OVER (PARTITION BY q.vec_id
         |                            ORDER BY ${duckCos("q.embedding", "c.embedding")} DESC,
         |                                     c.vec_id) AS rank
         |  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
         |  WHERE q.vec_id < 20) t
         |WHERE rank <= 5""".stripMargin),

    // exact-cosine near-duplicate audit over a SAMPLED probe set (the s08
    // pattern): the 20 audit vectors are compared against the full corpus —
    // linear in corpus size, never all-pairs. The ungated O(n²) form this
    // replaces was the registry's one cartesian-class plan (71 s of the
    // 142 s sf1 bench; ~2 h alone at sf10); the exact-compare semantics it
    // was the baseline FOR survive intact because the audit runs the same
    // exact cosine — s04/s05/s07 remain the full-corpus scale paths.
    dialect("s02_cosine_neardup",
      s"""WITH e AS ($sparkNormalized)
         |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |       CAST(a.label = b.label AS BOOLEAN) AS same_label
         |FROM e a JOIN e b ON a.vec_id < b.vec_id
         |WHERE a.vec_id < 20
         |  AND graft_dot(a.v, b.v) / (a.nrm * b.nrm) > 0.95""".stripMargin,
      s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |       (a.label = b.label) AS same_label
         |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         |WHERE a.vec_id < 20
         |  AND ${duckCos("a.embedding", "b.embedding")} > 0.95""".stripMargin),

    // LSH bucket histogram — the coarse-quantizer statistics view
    dialect("s03_lsh_buckets",
      s"""WITH $sparkLsh
         |SELECT CAST(band AS BIGINT) AS band, CAST(bucket AS BIGINT) AS bucket, count(*) AS n
         |FROM buckets GROUP BY 1, 2""".stripMargin,
      s"""WITH $duckLsh
         |SELECT CAST(band AS BIGINT) AS band, CAST(bucket AS BIGINT) AS bucket, count(*) AS n
         |FROM buckets GROUP BY 1, 2""".stripMargin),

    // LSH-bucketed approximate nearest neighbors — the scale path: the
    // all-pairs product of s01 is replaced by a candidate equi-join on
    // bucket (at 100 TB: shuffle on bucket id co-locates candidates;
    // per-bucket skew is bounded by 2^planes buckets), cosine-reranked
    // with the codegen'd graft_dot and top-3 per query via window rank
    dialect("s04_ann_lsh",
      s"""WITH e AS ($sparkNormalized),
         |$sparkLsh,
         |cand AS (
         |  SELECT DISTINCT bq.vec_id AS query_id, bc.vec_id AS neighbor_id
         |  FROM buckets bq JOIN buckets bc
         |    ON bq.band = bc.band AND bq.bucket = bc.bucket
         |   AND bq.vec_id <> bc.vec_id
         |  WHERE bq.vec_id < 20)
         |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank FROM (
         |  SELECT c.query_id, c.neighbor_id,
         |         row_number() OVER (PARTITION BY c.query_id
         |                            ORDER BY graft_dot(q.v, n.v) / (q.nrm * n.nrm) DESC,
         |                                     c.neighbor_id) AS rank
         |  FROM cand c
         |  JOIN e q ON q.vec_id = c.query_id
         |  JOIN e n ON n.vec_id = c.neighbor_id) t
         |WHERE rank <= 3""".stripMargin,
      s"""WITH $duckLsh,
         |cand AS (
         |  SELECT DISTINCT bq.vec_id AS query_id, bc.vec_id AS neighbor_id
         |  FROM buckets bq JOIN buckets bc
         |    ON bq.band = bc.band AND bq.bucket = bc.bucket
         |   AND bq.vec_id <> bc.vec_id
         |  WHERE bq.vec_id < 20)
         |SELECT query_id, neighbor_id, rank FROM (
         |  SELECT c.query_id, c.neighbor_id,
         |         row_number() OVER (PARTITION BY c.query_id
         |                            ORDER BY ${duckCos("q.embedding", "n.embedding")} DESC,
         |                                     c.neighbor_id) AS rank
         |  FROM cand c
         |  JOIN embeddings q ON q.vec_id = c.query_id
         |  JOIN embeddings n ON n.vec_id = c.neighbor_id) t
         |WHERE rank <= 3""".stripMargin),

    // IVF (inverted-file) ANN — the second scale path next to LSH (s04):
    // a 16-centroid coarse quantizer (deterministic: the first 16 vectors),
    // each vector assigned to its best cell by an IN-ROW argmax over the
    // broadcast centroid array (map-only — no n×16 row amplification, no
    // aggregate, no shuffle; ties break to the larger centroid id
    // identically on both engines), queries rank their nprobe=2 nearest
    // cells in-row too (sort by struct(-sim, cid) replicates
    // `ORDER BY sim DESC, cid` for finite sims; a zero-norm centroid's
    // NaN cell would rank last here where the old window form ranked it
    // first — degenerate input both engines agree on, and the s06 audit
    // exists to flag zero vectors before search), candidates re-ranked
    // with the exact cosine. Cell population bounds the candidate set the same way
    // LSH buckets do.
    dialect("s05_ivf_ann",
      s"""WITH e AS ($sparkNormalized),
         |$sparkCents,
         |$sparkSimsArr,
         |assign AS (
         |  SELECT vec_id, array_max(sa).cid AS cid FROM simsarr),
         |qprobe AS (
         |  SELECT vec_id,
         |         explode(array(element_at(top2, 1).cid, element_at(top2, 2).cid)) AS cid
         |  FROM (
         |    SELECT vec_id,
         |           slice(array_sort(transform(sa, s ->
         |             struct(-s.sim AS negsim, s.cid AS cid))), 1, 2) AS top2
         |    FROM simsarr WHERE vec_id < 20) q),
         |cand AS (
         |  SELECT DISTINCT q.vec_id AS query_id, a.vec_id AS neighbor_id
         |  FROM qprobe q JOIN assign a ON a.cid = q.cid
         |  WHERE a.vec_id <> q.vec_id)
         |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank FROM (
         |  SELECT c.query_id, c.neighbor_id,
         |         row_number() OVER (PARTITION BY c.query_id
         |                            ORDER BY graft_dot(q.v, n.v) / (q.nrm * n.nrm) DESC,
         |                                     c.neighbor_id) AS rank
         |  FROM cand c
         |  JOIN e q ON q.vec_id = c.query_id
         |  JOIN e n ON n.vec_id = c.neighbor_id) t
         |WHERE rank <= 3""".stripMargin,
      s"""WITH e AS ($duckNormalized),
         |$duckCents,
         |$duckSimsArr,
         |assign AS (
         |  SELECT vec_id, (list_aggregate(sa, 'max')).cid AS cid FROM simsarr),
         |qprobe AS (
         |  SELECT vec_id,
         |         unnest([top2[1].cid, top2[2].cid]) AS cid
         |  FROM (
         |    SELECT vec_id,
         |           list_sort(list_transform(sa, s ->
         |             {'negsim': -s.sim, 'cid': s.cid}))[1:2] AS top2
         |    FROM simsarr WHERE vec_id < 20) q),
         |cand AS (
         |  SELECT DISTINCT q.vec_id AS query_id, a.vec_id AS neighbor_id
         |  FROM qprobe q JOIN assign a ON a.cid = q.cid
         |  WHERE a.vec_id <> q.vec_id)
         |SELECT query_id, neighbor_id, rank FROM (
         |  SELECT c.query_id, c.neighbor_id,
         |         row_number() OVER (PARTITION BY c.query_id
         |                            ORDER BY list_reduce(list_transform(list_zip(q.v, n.v), t -> t[1] * t[2]), (acc, y) -> acc + y)
         |                                       / (q.nrm * n.nrm) DESC,
         |                                     c.neighbor_id) AS rank
         |  FROM cand c
         |  JOIN e q ON q.vec_id = c.query_id
         |  JOIN e n ON n.vec_id = c.neighbor_id) t
         |WHERE rank <= 3""".stripMargin),

    // embedding-corpus QA audit: per-label norm histogram (quarter-unit
    // buckets). The ops team's "are these embeddings sane" pass — catches
    // zero vectors, collapsed norms, and per-label distribution drift
    // before any similarity search runs. One map-side-aggregable GROUP BY
    // (no joins, no explode): scan-bound at any corpus size. Bucket edges
    // are safe cross-engine because the norm folds are bit-identical
    // (graft_dot ≡ list_reduce strict left fold, see header).
    dialect("s06_embedding_stats",
      s"""WITH e AS ($sparkNormalized)
         |SELECT label, CAST(floor(nrm * 4) AS BIGINT) AS norm_bucket,
         |       count(*) AS n, min(vec_id) AS first_vec
         |FROM e GROUP BY 1, 2""".stripMargin,
      s"""WITH e AS (
         |  SELECT vec_id, label,
         |         sqrt(list_reduce(list_transform(embedding::DOUBLE[], x -> x * x), (acc, x) -> acc + x)) AS nrm
         |  FROM embeddings)
         |SELECT label, CAST(floor(nrm * 4) AS BIGINT) AS norm_bucket,
         |       count(*) AS n, min(vec_id) AS first_vec
         |FROM e GROUP BY 1, 2""".stripMargin),

    // semantic (embedding-space) dedup, the SemDeDup shape: vectors are
    // grouped by their IVF cell (the s05 coarse quantizer), near-duplicate
    // pairs are detected by exact cosine WITHIN a cell only, and each
    // duplicate group keeps its lowest-id representative (a vector is
    // dropped iff a lower-id cell-mate sits above the threshold). At 100 TB
    // this is the scale story of embedding dedup: the all-pairs compare of
    // s02 collapses to per-cell blocks whose population the quantizer
    // bounds, and the pair join is an equi-join on cid. The 0.4 threshold
    // sits inside the fixture's observed within-cell cosine distribution
    // (max ~0.49; s02's 0.95 gate matches nothing at small sf) so both the
    // kept and dropped branches are exercised.
    // Plan note: Spark inlines CTEs, so the `av` assignment runs once per
    // reference (3×). With the aggregate-based assignment (s05's shape)
    // each copy cost an n×16 cross join + argmax aggregate + 2 shuffles;
    // here the argmax folds IN-ROW over a one-row broadcast centroid array
    // (the same single-pass trick as the s03/s04 planes), so every copy is
    // a map-only scan — no shuffle, no aggregate — and the pair join
    // carries v/nrm directly instead of re-joining `e`. array_max over
    // struct(sim, cid) ties to the larger cid on both engines, matching
    // s05's max(struct(sim, cid)) assignment exactly.
    dialect("s07_semdedup",
      s"""WITH e AS ($sparkNormalized),
         |$sparkCents,
         |av AS (
         |  SELECT e.vec_id, e.v, e.nrm,
         |         array_max($sparkSimArrExpr).cid AS cid
         |  FROM e CROSS JOIN cents c),
         |dup AS (
         |  SELECT DISTINCT a.vec_id
         |  FROM av a JOIN av b ON a.cid = b.cid AND b.vec_id < a.vec_id
         |  WHERE graft_dot(a.v, b.v) / (a.nrm * b.nrm) > CAST(0.4 AS DOUBLE))
         |SELECT a.vec_id, CAST(a.cid AS BIGINT) AS cid,
         |       (d.vec_id IS NULL) AS kept
         |FROM av a LEFT JOIN dup d ON a.vec_id = d.vec_id""".stripMargin,
      s"""WITH e AS ($duckNormalized),
         |$duckCents,
         |av AS (
         |  SELECT e.vec_id, e.v, e.nrm,
         |         (list_aggregate($duckSimArrExpr, 'max')).cid AS cid
         |  FROM e CROSS JOIN cents c),
         |dup AS (
         |  SELECT DISTINCT a.vec_id
         |  FROM av a JOIN av b ON a.cid = b.cid AND b.vec_id < a.vec_id
         |  WHERE list_reduce(list_transform(list_zip(a.v, b.v), t -> t[1] * t[2]), (acc, y) -> acc + y)
         |           / (a.nrm * b.nrm) > CAST(0.4 AS DOUBLE))
         |SELECT a.vec_id, CAST(a.cid AS BIGINT) AS cid,
         |       (d.vec_id IS NULL) AS kept
         |FROM av a LEFT JOIN dup d ON a.vec_id = d.vec_id""".stripMargin),

    // ANN recall audit — the "did my index degrade?" production check, as
    // an oracle-gated query instead of a one-off test: per query vector,
    // how many of the EXACT top-5 neighbors (the s01 brute-force path)
    // does the s04 LSH candidate set contain? Output is pure integer
    // counts (n_exact / n_cand / hits), so both engines agree exactly and
    // a recall regression from any future change to the plane derivation
    // or banding fails the correctness gate, not just a tolerance test.
    // Scale shape: the exact side stays capped to the 20 audit queries
    // (the s01 cap) — at 100 TB this audit runs on a sampled query set by
    // construction, never on the full corpus.
    dialect("s08_ann_recall",
      s"""WITH e AS ($sparkNormalized),
         |$sparkLsh,
         |exact AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |           row_number() OVER (PARTITION BY q.vec_id
         |                              ORDER BY graft_dot(q.v, c.v) / (q.nrm * c.nrm) DESC,
         |                                       c.vec_id) AS rank
         |    FROM e q JOIN e c ON q.vec_id <> c.vec_id
         |    WHERE q.vec_id < 20) t
         |  WHERE rank <= 5),
         |cand AS (
         |  SELECT DISTINCT bq.vec_id AS query_id, bc.vec_id AS neighbor_id
         |  FROM buckets bq JOIN buckets bc
         |    ON bq.band = bc.band AND bq.bucket = bc.bucket
         |   AND bq.vec_id <> bc.vec_id
         |  WHERE bq.vec_id < 20),
         |ccnt AS (SELECT query_id, count(*) AS n_cand FROM cand GROUP BY query_id)
         |SELECT x.query_id,
         |       count(*) AS n_exact,
         |       CAST(coalesce(max(ccnt.n_cand), 0) AS BIGINT) AS n_cand,
         |       CAST(sum(CASE WHEN c.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits
         |FROM exact x
         |LEFT JOIN cand c ON c.query_id = x.query_id AND c.neighbor_id = x.neighbor_id
         |LEFT JOIN ccnt ON ccnt.query_id = x.query_id
         |GROUP BY x.query_id""".stripMargin,
      s"""WITH $duckLsh,
         |exact AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |           row_number() OVER (PARTITION BY q.vec_id
         |                              ORDER BY ${duckCos("q.embedding", "c.embedding")} DESC,
         |                                       c.vec_id) AS rank
         |    FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
         |    WHERE q.vec_id < 20) t
         |  WHERE rank <= 5),
         |cand AS (
         |  SELECT DISTINCT bq.vec_id AS query_id, bc.vec_id AS neighbor_id
         |  FROM buckets bq JOIN buckets bc
         |    ON bq.band = bc.band AND bq.bucket = bc.bucket
         |   AND bq.vec_id <> bc.vec_id
         |  WHERE bq.vec_id < 20),
         |ccnt AS (SELECT query_id, count(*) AS n_cand FROM cand GROUP BY query_id)
         |SELECT x.query_id,
         |       count(*) AS n_exact,
         |       CAST(coalesce(max(ccnt.n_cand), 0) AS BIGINT) AS n_cand,
         |       CAST(sum(CASE WHEN c.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits
         |FROM exact x
         |LEFT JOIN cand c ON c.query_id = x.query_id AND c.neighbor_id = x.neighbor_id
         |LEFT JOIN ccnt ON ccnt.query_id = x.query_id
         |GROUP BY x.query_id""".stripMargin)
  )
}
