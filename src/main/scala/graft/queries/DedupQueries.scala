package graft.queries

import QueryDef._

/**
 * Deduplication operators over `documents`: exact (hash group-by),
 * word-shingle Jaccard (shared-shingle join — the exact algorithm),
 * MinHash+LSH banding, and SimHash fingerprints.
 *
 * Portability: the hash everywhere is `md5` reduced to a 60-bit bigint —
 * `conv(substr(md5(x),1,15),16,10)` in Spark ≡
 * `CAST('0x'||substr(md5(x),1,15) AS BIGINT)` in DuckDB — so even the
 * MinHash/LSH pipeline is oracle-checkable end to end. (A production run at
 * 100 TB would swap md5 for xxhash64 — same plan shape, cheaper hash; see
 * graft.functions.)
 *
 * Scale notes: all pair generation goes through equi-joins on
 * shingle/band keys (shuffle on the key, never a cartesian product);
 * signatures are fixed-width aggregates per doc_id.
 */
object DedupQueries {

  // docs with <3 tokens produce no shingles (guarded explicitly: Spark's
  // sequence(1, 0) yields DESCENDING [1, 0] and slice(w, 0, 3) then throws)
  private val sparkShingles =
    """SELECT DISTINCT doc_id, concat_ws(' ', slice(w, i, 3)) AS shingle
      |FROM (SELECT doc_id, split(text, ' ') AS w FROM documents
      |      WHERE size(split(text, ' ')) >= 3) d
      |LATERAL VIEW explode(sequence(1, size(w) - 2)) t AS i""".stripMargin

  // unnest(range(...)) instead of lateral generate_series (DuckDB's binder
  // rejects lateral column refs in table functions); range(1, n+1) is empty
  // for n <= 0, so short docs drop out naturally
  private val duckShingles =
    """SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS shingle
      |FROM (SELECT doc_id, w,
      |             unnest(range(1, greatest(len(w) - 2, 0) + 1)) AS i
      |      FROM (SELECT doc_id, string_split(text, ' ') AS w
      |            FROM documents))""".stripMargin

  private val sparkHash60 =
    "CAST(conv(substr(md5(%s), 1, 15), 16, 10) AS BIGINT)"
  private val duckHash60 =
    "CAST('0x' || substr(md5(%s), 1, 15) AS BIGINT)"

  val defs: Seq[QueryDef] = Seq(

    // exact dedup: group-size histogram of identical texts
    common("d01_exact_dedup",
      """SELECT dup_count, count(*) AS n_groups
        |FROM (SELECT md5(text) AS h, count(*) AS dup_count
        |      FROM documents GROUP BY md5(text)) g
        |GROUP BY dup_count""".stripMargin),

    // exact dedup survivors: smallest doc_id per distinct text, per source
    common("d02_exact_survivors",
      """SELECT source, count(*) AS n_survivors, min(keep_id) AS first_keep
        |FROM (SELECT source, md5(text) AS h, min(doc_id) AS keep_id
        |      FROM documents GROUP BY source, md5(text)) s
        |GROUP BY source""".stripMargin),

    // exact n-gram Jaccard via shared-shingle equi-join (no LSH, no
    // cartesian): candidates share >=1 shingle; emit integer set sizes.
    // The join key is the 60-bit shingle hash, not the string — at scale
    // the self-join shuffle moves 8-byte ints instead of full shingles
    // (collisions: identical on both engines, so results stay comparable)
    dialect("d03_ngram_jaccard",
      s"""WITH sh AS ($sparkShingles),
         |shh AS (SELECT doc_id, ${sparkHash60.format("shingle")} AS h FROM sh),
         |sizes AS (SELECT doc_id, count(*) AS sz FROM shh GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter_cnt
         |  FROM shh a JOIN shh b ON a.h = b.h AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id)
         |SELECT doc_a, doc_b, inter_cnt,
         |       sa.sz + sb.sz - inter_cnt AS union_cnt
         |FROM inter
         |JOIN sizes sa ON sa.doc_id = doc_a
         |JOIN sizes sb ON sb.doc_id = doc_b
         |WHERE inter_cnt * 2 >= sa.sz + sb.sz - inter_cnt""".stripMargin,
      s"""WITH sh AS ($duckShingles),
         |shh AS (SELECT doc_id, ${duckHash60.format("shingle")} AS h FROM sh),
         |sizes AS (SELECT doc_id, count(*) AS sz FROM shh GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter_cnt
         |  FROM shh a JOIN shh b ON a.h = b.h AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id)
         |SELECT doc_a, doc_b, inter_cnt,
         |       sa.sz + sb.sz - inter_cnt AS union_cnt
         |FROM inter
         |JOIN sizes sa ON sa.doc_id = doc_a
         |JOIN sizes sb ON sb.doc_id = doc_b
         |WHERE inter_cnt * 2 >= sa.sz + sb.sz - inter_cnt""".stripMargin),

    // MinHash (8 permutations) + LSH (4 bands of 2): candidate pairs.
    // ONE md5 per distinct shingle; the 8 permutations are universal
    // hashes (a*h + b) mod p over the 30-bit base — integer arithmetic
    // both engines evaluate identically (all intermediates < 2^46, no
    // overflow on either side). 8x less hashing than md5-per-seed.
    dialect("d04_minhash_lsh",
      s"""WITH sh AS ($sparkShingles),
         |shh AS (SELECT doc_id,
         |               ${sparkHash60.format("shingle")} % 1073741789 AS hb
         |        FROM sh),
         |seeds AS (
         |  SELECT seed,
         |         ${sparkHash60.format("concat('a', seed)")} % 32749 + 1 AS a,
         |         ${sparkHash60.format("concat('b', seed)")} % 1073741789 AS b
         |  FROM (SELECT explode(sequence(0, 7)) AS seed)),
         |hs AS (
         |  SELECT doc_id, seed, min((hb * a + b) % 1073741789) AS mh
         |  FROM shh CROSS JOIN seeds
         |  GROUP BY doc_id, seed),
         |bands AS (
         |  SELECT doc_id, CAST(seed / 2 AS INT) AS band,
         |         concat(min(CASE WHEN seed % 2 = 0 THEN mh END), ':',
         |                min(CASE WHEN seed % 2 = 1 THEN mh END)) AS sig
         |  FROM hs GROUP BY doc_id, CAST(seed / 2 AS INT))
         |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |FROM bands a JOIN bands b
         |  ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id""".stripMargin,
      s"""WITH sh AS ($duckShingles),
         |shh AS (SELECT doc_id,
         |               ${duckHash60.format("shingle")} % 1073741789 AS hb
         |        FROM sh),
         |seeds AS (
         |  SELECT seed,
         |         ${duckHash60.format("'a' || seed")} % 32749 + 1 AS a,
         |         ${duckHash60.format("'b' || seed")} % 1073741789 AS b
         |  FROM generate_series(0, 7) AS s(seed)),
         |hs AS (
         |  SELECT doc_id, seed, min((hb * a + b) % 1073741789) AS mh
         |  FROM shh CROSS JOIN seeds
         |  GROUP BY doc_id, seed),
         |bands AS (
         |  SELECT doc_id, CAST(seed // 2 AS INT) AS band,
         |         concat(min(CASE WHEN seed % 2 = 0 THEN mh END), ':',
         |                min(CASE WHEN seed % 2 = 1 THEN mh END)) AS sig
         |  FROM hs GROUP BY doc_id, CAST(seed // 2 AS INT))
         |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |FROM bands a JOIN bands b
         |  ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id""".stripMargin),

    // SimHash: 48-bit locality-sensitive fingerprint per document
    dialect("d05_simhash",
      s"""WITH toks AS (
         |  SELECT DISTINCT doc_id, tok
         |  FROM documents LATERAL VIEW explode(split(text, ' ')) x AS tok),
         |th AS (SELECT doc_id, ${sparkHash60.format("tok")} AS h FROM toks),
         |bits AS (
         |  SELECT doc_id, j,
         |         sum(CASE WHEN (shiftright(h, j) & 1) = 1 THEN 1 ELSE -1 END) AS bal
         |  FROM th LATERAL VIEW explode(sequence(0, 47)) b AS j
         |  GROUP BY doc_id, j)
         |SELECT doc_id,
         |       CAST(sum(CASE WHEN bal > 0 THEN shiftleft(CAST(1 AS BIGINT), j)
         |                ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS simhash
         |FROM bits GROUP BY doc_id""".stripMargin,
      s"""WITH toks AS (
         |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
         |  FROM documents),
         |th AS (SELECT doc_id, ${duckHash60.format("tok")} AS h FROM toks),
         |bits AS (
         |  SELECT doc_id, j,
         |         sum(CASE WHEN ((h >> j) & 1) = 1 THEN 1 ELSE -1 END) AS bal
         |  FROM th, generate_series(0, 47) AS b(j)
         |  GROUP BY doc_id, j)
         |SELECT doc_id,
         |       CAST(sum(CASE WHEN bal > 0 THEN (CAST(1 AS BIGINT) << j)
         |                ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS simhash
         |FROM bits GROUP BY doc_id""".stripMargin)
  )
}
