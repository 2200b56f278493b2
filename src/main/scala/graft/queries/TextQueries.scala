package graft.queries

import QueryDef._

/**
 * Text-analysis operators over the `documents` table: token counting,
 * quality scoring, language-ID (stopword-vote heuristic), and document
 * fingerprinting. All expressed as portable SQL so DuckDB can oracle-check
 * them; the determinism trick for cross-engine hashes is
 * `md5()` (identical in both engines) and integer/single-division outputs.
 *
 * Scale notes: every query is a scan + explode + hash-aggregate on doc_id —
 * embarrassingly parallel, no skewed shuffles (doc_id is unique), and the
 * explode fan-out (~tokens/doc) is bounded.
 */
object TextQueries {

  /** Repetition-gate thresholds — the single source of truth shared by
   *  t06, the p01 funnel's repetition stage, and the streaming
   *  `repetitionGate` defaults (they must agree or the funnel's n_rep
   *  stage silently desyncs from the standalone gate). Chosen inside the
   *  fixture's observed distribution (top-word median ~0.09 / p90 ~0.14,
   *  dup-2-gram median ~0.03 / p90 ~0.065) so both branches fire. */
  val TopWordFracMax = 0.12
  val DupGramFracMax = 0.05

  /** Shared CTE `grm(doc_id, n_tok, dup_2gram_frac)` over `documents`:
   *  the duplicate-2-gram fraction computed IN-ROW with array ops (no
   *  explode — a doc carries all its grams). Used by t06 and p01. */
  val sparkGramsRep: String =
    """grm AS (
      |  SELECT doc_id, n_tok,
      |         CASE WHEN size(grams) > 0
      |              THEN CAST(1 AS DOUBLE)
      |                   - CAST(size(array_distinct(grams)) AS DOUBLE) / size(grams)
      |              ELSE CAST(0 AS DOUBLE) END AS dup_2gram_frac
      |  FROM (
      |    SELECT doc_id, size(toks) AS n_tok,
      |           zip_with(slice(toks, 1, size(toks) - 1),
      |                    slice(toks, 2, size(toks) - 1),
      |                    (a, b) -> concat(a, ' ', b)) AS grams
      |    FROM (SELECT doc_id, split(text, ' ') AS toks FROM documents) w) b)""".stripMargin

  val duckGramsRep: String =
    """grm AS (
      |  SELECT doc_id, n_tok,
      |         CASE WHEN len(grams) > 0
      |              THEN CAST(1 AS DOUBLE)
      |                   - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams)
      |              ELSE CAST(0 AS DOUBLE) END AS dup_2gram_frac
      |  FROM (
      |    SELECT doc_id, len(toks) AS n_tok,
      |           list_transform(list_zip(toks[1:len(toks)-1], toks[2:len(toks)]),
      |                          t -> t[1] || ' ' || t[2]) AS grams
      |    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) w) b)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // token counting: whitespace tokens + BPE-ish regex word extraction
    dialect("t01_token_stats",
      """SELECT doc_id,
        |       CAST(size(split(text, ' ')) AS BIGINT) AS n_tokens,
        |       CAST(size(regexp_extract_all(text, '[a-z]+', 0)) AS BIGINT) AS n_words,
        |       CAST(length(text) AS BIGINT) AS n_chars,
        |       CAST(length(replace(text, ' ', '')) AS DOUBLE)
        |         / CAST(size(split(text, ' ')) AS DOUBLE) AS avg_token_len
        |FROM documents""".stripMargin,
      """SELECT doc_id,
        |       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |       CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS n_words,
        |       CAST(length(text) AS BIGINT) AS n_chars,
        |       CAST(length(replace(text, ' ', '')) AS DOUBLE)
        |         / CAST(len(string_split(text, ' ')) AS DOUBLE) AS avg_token_len
        |FROM documents""".stripMargin),

    // quality scoring: stopword ratio, distinct-token ratio, length class
    dialect("t02_quality_score",
      """SELECT doc_id,
        |       CAST(n_stop AS DOUBLE) / n_tok AS stop_ratio,
        |       CAST(n_distinct AS DOUBLE) / n_tok AS distinct_ratio,
        |       CASE WHEN n_tok < 30 THEN 'short'
        |            WHEN n_tok < 90 THEN 'medium' ELSE 'long' END AS len_class
        |FROM (
        |  SELECT doc_id,
        |         count(*) AS n_tok,
        |         count(DISTINCT tok) AS n_distinct,
        |         sum(CASE WHEN tok IN ('the', 'a', 'of', 'and', 'to', 'in')
        |                  THEN 1 ELSE 0 END) AS n_stop
        |  FROM (SELECT doc_id, tok
        |        FROM documents LATERAL VIEW explode(split(text, ' ')) x AS tok) e
        |  GROUP BY doc_id
        |) s""".stripMargin,
      """SELECT doc_id,
        |       CAST(n_stop AS DOUBLE) / n_tok AS stop_ratio,
        |       CAST(n_distinct AS DOUBLE) / n_tok AS distinct_ratio,
        |       CASE WHEN n_tok < 30 THEN 'short'
        |            WHEN n_tok < 90 THEN 'medium' ELSE 'long' END AS len_class
        |FROM (
        |  SELECT doc_id,
        |         count(*) AS n_tok,
        |         count(DISTINCT tok) AS n_distinct,
        |         sum(CASE WHEN tok IN ('the', 'a', 'of', 'and', 'to', 'in')
        |                  THEN 1 ELSE 0 END) AS n_stop
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |        FROM documents) e
        |  GROUP BY doc_id
        |) s""".stripMargin),

    // language-ID: n-gram/stopword vote heuristic, compared to the label
    dialect("t03_langid",
      """SELECT lang, predicted, count(*) AS n
        |FROM (
        |  SELECT lang,
        |         CASE WHEN en >= 1 AND en >= xx THEN 'en'
        |              WHEN xx >= 1 THEN 'xx' ELSE 'und' END AS predicted
        |  FROM (
        |    SELECT doc_id, lang,
        |           sum(CASE WHEN tok IN ('the', 'a', 'of', 'and') THEN 1 ELSE 0 END) AS en,
        |           sum(CASE WHEN tok IN ('der', 'le', 'el', 'und', 'et', 'y') THEN 1 ELSE 0 END) AS xx
        |    FROM (SELECT doc_id, lang, tok
        |          FROM documents LATERAL VIEW explode(split(text, ' ')) x AS tok) e
        |    GROUP BY doc_id, lang
        |  ) v
        |) p GROUP BY lang, predicted""".stripMargin,
      """SELECT lang, predicted, count(*) AS n
        |FROM (
        |  SELECT lang,
        |         CASE WHEN en >= 1 AND en >= xx THEN 'en'
        |              WHEN xx >= 1 THEN 'xx' ELSE 'und' END AS predicted
        |  FROM (
        |    SELECT doc_id, lang,
        |           sum(CASE WHEN tok IN ('the', 'a', 'of', 'and') THEN 1 ELSE 0 END) AS en,
        |           sum(CASE WHEN tok IN ('der', 'le', 'el', 'und', 'et', 'y') THEN 1 ELSE 0 END) AS xx
        |    FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
        |          FROM documents) e
        |    GROUP BY doc_id, lang
        |  ) v
        |) p GROUP BY lang, predicted""".stripMargin),

    // document fingerprinting: exact hash + order-insensitive content hash
    dialect("t04_fingerprint",
      """SELECT doc_id,
        |       md5(text) AS exact_fp,
        |       md5(concat_ws(' ', array_sort(array_distinct(split(text, ' '))))) AS content_fp
        |FROM documents""".stripMargin,
      """SELECT doc_id,
        |       md5(text) AS exact_fp,
        |       md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS content_fp
        |FROM documents""".stripMargin),

    // deterministic stratified sampling / data mixing: per-source keep
    // rates applied by hashing the doc id into a percentile bucket — the
    // training-mix primitive. No rand(): the sample is reproducible across
    // runs, engines, and (crucially at 100 TB) across retried tasks; the
    // predicate is a pure map-side filter, so the only shuffle is the
    // final per-source rollup. Rates: every 4th source is "high quality"
    // (80%), offset-1 sources mid (50%), the rest tail (20%).
    dialect("t05_hash_sample",
      """SELECT source,
        |       count(*) AS n_total,
        |       CAST(sum(CASE WHEN bucket < rate_pct THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |       min(CASE WHEN bucket < rate_pct THEN doc_id END) AS first_kept
        |FROM (
        |  SELECT doc_id, source,
        |         CASE WHEN source IN ('src0', 'src4', 'src8', 'src12', 'src16') THEN 80
        |              WHEN source IN ('src1', 'src5', 'src9', 'src13', 'src17') THEN 50
        |              ELSE 20 END AS rate_pct,
        |         graft_hash60(concat('smp:', CAST(doc_id AS STRING))) % 100 AS bucket
        |  FROM documents) r
        |GROUP BY source""".stripMargin,
      """SELECT source,
        |       count(*) AS n_total,
        |       CAST(sum(CASE WHEN bucket < rate_pct THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |       min(CASE WHEN bucket < rate_pct THEN doc_id END) AS first_kept
        |FROM (
        |  SELECT doc_id, source,
        |         CASE WHEN source IN ('src0', 'src4', 'src8', 'src12', 'src16') THEN 80
        |              WHEN source IN ('src1', 'src5', 'src9', 'src13', 'src17') THEN 50
        |              ELSE 20 END AS rate_pct,
        |         CAST('0x' || substr(md5('smp:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100 AS bucket
        |  FROM documents) r
        |GROUP BY source""".stripMargin),

    // repetition-based quality signals (the Gopher/C4 family): per doc the
    // most-common-word fraction and the duplicate-2-gram fraction, plus the
    // keep/drop gate a curation run would apply. Thresholds sit inside the
    // fixture's observed distribution (top-word median ~0.09/p90 ~0.14,
    // dup-2-gram median ~0.03/p90 ~0.065) so both branches are exercised.
    // Scale shape: the 2-gram metric is computed INSIDE the row with array
    // ops (no explode — a doc carries all its grams); only the top-word
    // count needs the one explode + (doc_id, tok) hash-aggregate, keyed by
    // the unique doc_id so it shuffles without skew. Ratios divide exact
    // integers, so the doubles are bit-identical across engines.
    dialect("t06_repetition",
      s"""WITH $sparkGramsRep,
         |top AS (
         |  SELECT doc_id, max(cnt) AS top_cnt FROM (
         |    SELECT doc_id, tok, count(*) AS cnt
         |    FROM (SELECT doc_id, tok
         |          FROM documents LATERAL VIEW explode(split(text, ' ')) x AS tok) e
         |    GROUP BY doc_id, tok) c
         |  GROUP BY doc_id)
         |SELECT r.doc_id,
         |       CAST(r.n_tok AS BIGINT) AS n_tok,
         |       CAST(t.top_cnt AS DOUBLE) / r.n_tok AS top_word_frac,
         |       r.dup_2gram_frac,
         |       (CAST(t.top_cnt AS DOUBLE) / r.n_tok <= CAST($TopWordFracMax AS DOUBLE)
         |        AND r.dup_2gram_frac <= CAST($DupGramFracMax AS DOUBLE)) AS keep
         |FROM grm r JOIN top t ON r.doc_id = t.doc_id""".stripMargin,
      s"""WITH $duckGramsRep,
         |top AS (
         |  SELECT doc_id, max(cnt) AS top_cnt FROM (
         |    SELECT doc_id, tok, count(*) AS cnt
         |    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
         |          FROM documents) e
         |    GROUP BY doc_id, tok) c
         |  GROUP BY doc_id)
         |SELECT r.doc_id,
         |       CAST(r.n_tok AS BIGINT) AS n_tok,
         |       CAST(t.top_cnt AS DOUBLE) / r.n_tok AS top_word_frac,
         |       r.dup_2gram_frac,
         |       (CAST(t.top_cnt AS DOUBLE) / r.n_tok <= CAST($TopWordFracMax AS DOUBLE)
         |        AND r.dup_2gram_frac <= CAST($DupGramFracMax AS DOUBLE)) AS keep
         |FROM grm r JOIN top t ON r.doc_id = t.doc_id""".stripMargin),

    // token-rarity (inverse-df) content score — the language-model-free
    // perplexity proxy: rare vocabulary scores high, boilerplate scores
    // low. Deliberately INTEGER arithmetic end to end (score = sum of
    // 1e6 div document-frequency over the doc's distinct tokens) so both
    // engines agree bit-for-bit — a log-prob variant would hinge on ln()
    // ULP parity across engines. Scale shape: one distinct (doc, token)
    // explode, a token-keyed df aggregate (map-side combinable; vocab is
    // tiny next to the corpus), a token-keyed join back (hot function
    // words skew the key — AQE skew handling splits them), and a doc-
    // keyed final aggregate. Two shuffles total at any corpus size.
    dialect("t07_idf_score",
      """WITH dt AS (
        |  SELECT DISTINCT doc_id, tok
        |  FROM documents LATERAL VIEW explode(split(text, ' ')) x AS tok),
        |df AS (SELECT tok, count(*) AS df FROM dt GROUP BY tok)
        |SELECT doc_id,
        |       count(*) AS n_distinct_tok,
        |       CAST(sum(1000000 div df) AS BIGINT) AS idf_score
        |FROM dt JOIN df USING (tok)
        |GROUP BY doc_id""".stripMargin,
      """WITH dt AS (
        |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |df AS (SELECT tok, count(*) AS df FROM dt GROUP BY tok)
        |SELECT doc_id,
        |       count(*) AS n_distinct_tok,
        |       CAST(sum(1000000 // df) AS BIGINT) AS idf_score
        |FROM dt JOIN df USING (tok)
        |GROUP BY doc_id""".stripMargin),

    // per-source vocabulary divergence: pairwise cosine similarity of the
    // sources' term-frequency vectors — the corpus-mixing diagnostic that
    // tells you whether two "sources" are really the same distribution.
    // Determinism across engines: ALL aggregates are over exact integers
    // (dot products and norms of BIGINT counts; exact while per-(source,
    // tok) counts stay < ~3e9 — at larger scale switch the counts to
    // per-shard double frequencies); the single double division at the
    // end is one IEEE expression both engines evaluate identically. The
    // tok self-join is bounded: each token contributes at most
    // sources^2/2 joined rows, so hot tokens cannot skew beyond the
    // (tiny, fixed) source count. Spark's non-ANSI BIGINT sums WRAP
    // silently past that bound while DuckDB promotes to HUGEINT, so the
    // Spark dialect carries an assert_true guard on max per-(source,tok)
    // count: past the bound the query THROWS instead of silently
    // hash-mismatching the oracle.
    dialect("t08_vocab_divergence",
      """WITH tf AS (
        |  SELECT source, tok, count(*) AS c
        |  FROM documents LATERAL VIEW explode(split(text, ' ')) x AS tok
        |  GROUP BY source, tok),
        |nrm AS (SELECT source, sum(c * c) AS n2, max(c) AS c_max
        |        FROM tf GROUP BY source),
        |dots AS (
        |  SELECT a.source AS source_a, b.source AS source_b,
        |         sum(a.c * b.c) AS dot, count(*) AS shared_vocab
        |  FROM tf a JOIN tf b ON a.tok = b.tok AND a.source < b.source
        |  GROUP BY a.source, b.source)
        |SELECT d.source_a, d.source_b,
        |       CAST(d.shared_vocab AS BIGINT) AS shared_vocab,
        |       CAST(d.dot AS DOUBLE)
        |         / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))
        |         AS cosine
        |FROM dots d
        |JOIN nrm na ON na.source = d.source_a
        |JOIN nrm nb ON nb.source = d.source_b
        |WHERE assert_true(na.c_max <= 3037000499L AND nb.c_max <= 3037000499L,
        |  't08: per-(source,tok) count exceeds the exact-BIGINT cosine bound')
        |  IS NULL""".stripMargin,
      """WITH tf AS (
        |  SELECT source, tok, count(*) AS c
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
        |        FROM documents) e
        |  GROUP BY source, tok),
        |nrm AS (SELECT source, sum(c * c) AS n2 FROM tf GROUP BY source),
        |dots AS (
        |  SELECT a.source AS source_a, b.source AS source_b,
        |         sum(a.c * b.c) AS dot, count(*) AS shared_vocab
        |  FROM tf a JOIN tf b ON a.tok = b.tok AND a.source < b.source
        |  GROUP BY a.source, b.source)
        |SELECT d.source_a, d.source_b,
        |       CAST(d.shared_vocab AS BIGINT) AS shared_vocab,
        |       CAST(d.dot AS DOUBLE)
        |         / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))
        |         AS cosine
        |FROM dots d
        |JOIN nrm na ON na.source = d.source_a
        |JOIN nrm nb ON nb.source = d.source_b""".stripMargin)
  )
}
