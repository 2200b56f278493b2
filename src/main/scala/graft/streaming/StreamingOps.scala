package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Raw event as carried by the `events` fixture / an event stream. */
case class Event(
    event_id: Long,
    ts: Timestamp,
    user_id: Long,
    event_type: String,
    value: Double)

/** Document row as carried by an ingest stream (subset of the
 *  `documents` fixture schema the simhash operators need). */
case class SimDoc(doc_id: Long, text: String)

/** One closed session emitted by [[StreamingOps.sessionize]]. */
case class Session(
    user_id: Long,
    session_start: Timestamp,
    session_end: Timestamp,
    n_events: Long)

private case class SessionState(
    start: Long, last: Long, n: Long)

/** One survivor change emitted by [[StreamingOps.survivorElect]]. */
case class SurvivorUpdate(rep_id: Long, survivor_id: Long, n_tok: Int)

private case class SurvivorState(survivorId: Long, nTok: Int)

/** One chunk assignment emitted by [[StreamingOps.packAssign]]. */
case class PackAssignment(source: String, doc_id: Long, chunk_id: Long)

private case class PackState(offset: Long)

/**
 * Streaming counterparts of the batch event queries (q24/q25): the same
 * transformations expressed over an unbounded source, the way a production
 * ingest pipeline would run them. Works identically on any streaming source
 * (`readStream` over files/Kafka-like sources or MemoryStream in tests) —
 * the transformations only assume the [[Event]] schema.
 *
 * Scale design: both operators are keyed (window+type / user_id), so state
 * and shuffle partition by key across executors; watermarks bound state
 * size — nothing here is driver-resident.
 */
object StreamingOps {

  /** Watermarked hourly rollup per event type — streaming analog of
   *  q24_events_hourly. Late events beyond `watermark` are dropped and
   *  windows finalize (append mode emits each window once). */
  def hourlyRollup(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(floor(col("value") * 100).cast("long")).as("value_cents"))
      .select(
        unix_micros(col("window.start")).as("bucket_us"),
        col("event_type"), col("n"), col("value_cents"))

  /** Exact microsecond view of a Timestamp. `getTime` is millisecond-grain
   *  and silently truncates sub-ms digits — the batch oracle compares
   *  `unix_micros`, so a sub-ms arrival exactly at the gap boundary would
   *  merge under ms arithmetic where the oracle splits (caught by the
   *  round-11 exact-gap boundary test; fixture timestamps are ms-aligned,
   *  which is why the gates never saw it). */
  private def tsMicros(t: Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  private def microsTs(us: Long): Timestamp = {
    val t = new Timestamp(math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Event-time timeout for a session whose last event is at `lastUs`:
   *  the earliest millisecond AT OR AFTER last+gap (ceiling — firing a
   *  sub-ms early could close a session the oracle keeps open). */
  private def timeoutMsFor(lastUs: Long, gapUs: Long, watermarkMs: Long): Long =
    math.max(math.floorDiv(lastUs + gapUs + 999L, 1000L), watermarkMs + 1)

  /** Gap-based sessionization with custom keyed state — the streaming
   *  analog of q25_events_sessionize, built on flatMapGroupsWithState with
   *  event-time timeouts. A session closes when `gapSeconds` pass without
   *  an event for that user (decided by watermark progress, so out-of-order
   *  events within the watermark still join their session). */
  def sessionize(
      events: Dataset[Event],
      gapSeconds: Long = 1800,
      watermark: String = "30 minutes"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapSeconds * 1000000L

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // gap elapsed (watermark passed last+gap): close the session
            val s = state.get
            state.remove()
            Iterator.single(
              Session(userId, microsTs(s.start), microsTs(s.last), s.n))
          } else {
            val sorted = rows.toSeq.map(e => tsMicros(e.ts)).sorted
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { t =>
              cur match {
                case Some(s) if t - s.last <= gapUs =>
                  // min(start, t): a cross-batch event earlier than the
                  // session start (but within the gap) widens the start,
                  // matching the batch oracle and the native
                  // session_window merge (in-order arrival makes this a
                  // no-op: t >= last >= start)
                  cur = Some(SessionState(math.min(s.start, t),
                    math.max(s.last, t), s.n + 1))
                case Some(s) =>
                  closed ::= Session(userId, microsTs(s.start),
                    microsTs(s.last), s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // a group fed from a stale file AFTER the global watermark
              // advanced past last+gap would set an in-the-past timeout,
              // which Spark rejects; clamp forward — the session closes at
              // the next watermark advance, the earliest legal moment, with
              // identical boundaries (surfaced by the multi-batch
              // StreamBench run; the single-drain gates never see it)
              state.setTimeoutTimestamp(
                timeoutMsFor(s.last, gapUs, state.getCurrentWatermarkMs()))
            }
            closed.reverseIterator
          }
      }
  }

  /** Primitive-state variant of [[sessionize]] — identical session
   *  semantics and output, leaner per-row cost. The stateful operator is
   *  the op a 100 TB/day ingest feels first (STREAMBENCH r10), and its
   *  per-row price is dominated by the typed-Encoder round-trip: the
   *  standard form decodes all 5 [[Event]] fields (including a string)
   *  per row and round-trips a case-class state. This form projects to
   *  `(user_id, ts)` BEFORE the stateful op — the shuffle to the state
   *  store carries 2 columns instead of 5, the per-row decode is two
   *  primitives, and state is a flat (start, last, n) tuple. The session
   *  logic is byte-for-byte the same decisions on the same two fields,
   *  so output is bit-identical (pinned by StreamingOpsSuite and the v09
   *  oracle gate). */
  def sessionizeLite(
      events: Dataset[Event],
      gapSeconds: Long = 1800,
      watermark: String = "30 minutes"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapSeconds * 1000000L

    events
      .withWatermark("ts", watermark)
      .select(col("user_id"), col("ts"))
      .as[(Long, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long), Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[(Long, Timestamp)],
            state: GroupState[(Long, Long, Long)]) =>
          if (state.hasTimedOut) {
            val (start, last, n) = state.get
            state.remove()
            Iterator.single(
              Session(userId, microsTs(start), microsTs(last), n))
          } else {
            val sorted = rows.map(r => tsMicros(r._2)).toSeq.sorted
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { t =>
              cur match {
                case Some((start, last, n)) if t - last <= gapUs =>
                  // same out-of-order start widening as sessionize
                  cur = Some((math.min(start, t), math.max(last, t), n + 1))
                case Some((start, last, n)) =>
                  closed ::= Session(userId, microsTs(start),
                    microsTs(last), n)
                  cur = Some((t, t, 1L))
                case None =>
                  cur = Some((t, t, 1L))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // same stale-file timeout clamp as sessionize
              state.setTimeoutTimestamp(
                timeoutMsFor(s._2, gapUs, state.getCurrentWatermarkMs()))
            }
            closed.reverseIterator
          }
      }
  }

  /** Built-in `session_window` form of [[sessionize]] — the fully native
   *  path: a streaming session-window AGGREGATION (merging session state
   *  store, codegen'd aggregation, no per-row Scala closure or typed
   *  Encoder round-trip anywhere). Spark merges session windows on
   *  OVERLAP OR ADJACENCY (`currentEnd >= nextStart`, i.e. an event at
   *  exactly `last + gap` joins the session) — the same inclusive
   *  `ts - last <= gap` boundary as [[sessionize]] and the batch oracle,
   *  so the gap passes through unmodified (pinned by the exact-gap
   *  boundary test below: exactly-gap merges, gap + 1 microsecond
   *  splits). The emitted `session_end` subtracts the gap off
   *  `window.end` (= last event + gap), recovering the last event time
   *  exactly in integer microsecond arithmetic. Output is bit-identical
   *  to [[sessionize]]/[[sessionizeLite]] whenever each user's events
   *  never regress across batches by more than the gap (any order WITHIN
   *  a batch is fine — the closure forms sort, the aggregation is
   *  order-free; a within-gap cross-batch regression widens the session
   *  start identically in all three forms). Past that envelope the forms
   *  legitimately diverge: the merging session store can hold several
   *  open sessions per user and fuse them through a late middle event,
   *  while the closure forms carry exactly one open session and fold a
   *  >gap-early event into it — single-session state cannot represent
   *  the split (StreamingOpsSuite pins the in-envelope identity; the
   *  gates feed range-ordered files, inside the envelope by
   *  construction). Another boundary divergence is rows arriving LATER
   *  than the watermark allows — discarded data by contract in both forms, but at slightly
   *  different cutoffs: flatMapGroupsWithState drops rows with
   *  `ts < watermark`, while the aggregation drops sessions whose window
   *  end has passed, i.e. `ts + gap < watermark` — this form salvages up
   *  to one gap more of lateness. Choose per pipeline; the gates feed
   *  ordered single-batch sources where the cutoffs never engage. */
  def sessionizeNative(
      events: Dataset[Event],
      gapSeconds: Long = 1800,
      watermark: String = "30 minutes"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMicros = gapSeconds * 1000000L
    events
      .withWatermark("ts", watermark)
      .select(col("user_id"), col("ts"))
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapMicros microseconds"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        col("session_window.start").as("session_start"),
        timestamp_micros(unix_micros(col("session_window.end")) - gapMicros)
          .as("session_end"),
        col("n_events"))
      .as[Session]
  }

  /** Streaming exact deduplication — the streaming analog of the batch
   *  d01/d02 dedup family: keep the FIRST document per content hash,
   *  emit survivors as they arrive. State is keyed by the 128-bit content
   *  hash (never the text itself), so the dedup shuffle and store carry
   *  16-byte keys at any corpus size; `dropDuplicatesWithinWatermark`
   *  expires state once the watermark passes, bounding the store — the
   *  dedup window is the watermark horizon (an unbounded-history exact
   *  dedup of an infinite stream is impossible in finite state; batch d01
   *  covers the full-corpus pass).
   *
   *  Input must carry an event-time column `ts` plus the document
   *  columns; output is the surviving rows unchanged. */
  def dedupExact(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("graft_content_hash", md5(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("graft_content_hash")
      .drop("graft_content_hash")

  /** Stream-stream interval join: pair each left event with right events
   *  of the same user within `withinSeconds` AFTER it (e.g. click →
   *  follow-up purchase attribution). Both sides are watermarked, and the
   *  time-range conjunct bounds each side's join state to the interval +
   *  watermark horizon — the canonical Spark stream-stream join shape
   *  (state keyed by user_id, partitioned across executors; nothing
   *  driver-resident).
   *
   *  Input schemas: left/right both [[Event]]-shaped DataFrames. Output:
   *  one row per qualifying pair with both event ids and timestamps. */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      withinSeconds: Long = 600,
      watermark: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark("ts", watermark)
      .select(col("event_id").as("l_event_id"), col("ts").as("l_ts"),
        col("user_id").as("l_user_id"), col("event_type").as("l_type"))
    val r = right.withWatermark("ts", watermark)
      .select(col("event_id").as("r_event_id"), col("ts").as("r_ts"),
        col("user_id").as("r_user_id"), col("event_type").as("r_type"))
    l.join(r,
      col("l_user_id") === col("r_user_id") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $withinSeconds SECONDS"))
      .select(col("l_user_id").as("user_id"), col("l_event_id"),
        col("r_event_id"), col("l_ts"), col("r_ts"), col("l_type"),
        col("r_type"))
  }

  /** Stateless streaming SimHash — the per-row form of the batch d05
   *  fingerprint, bit-identical on the same rows. The batch shape
   *  aggregates (doc, token) rows across a shuffle; a stream computes the
   *  whole fingerprint inside ONE row (a document carries all its tokens),
   *  so the operator is a pure map: no state, no watermark, no shuffle —
   *  it runs at ingest rate at any scale. Bit parity with d05: distinct
   *  tokens, 60-bit md5-prefix hash (`graft_hash60`), 48 per-bit ±1
   *  balances, sign bits folded to a 48-bit fingerprint. */
  def simhash(docs: DataFrame): DataFrame =
    // one native codegen'd loop per row (graft.functions.SimHash48) —
    // the higher-order-function form of the same arithmetic is
    // interpreted and allocation-heavy (measured 339 s vs <2 s at sf1)
    docs.withColumn("simhash",
      expr("graft_simhash48(array_distinct(split(text, ' ')))"))

  /** Banded Hamming-LSH assignment over the streaming fingerprint — the
   *  d06 band derivation (4 bands × 12 bits) as a stateless explode:
   *  4 rows per document, keyed (band, band_value). */
  def simhashBands(docs: DataFrame): DataFrame =
    simhash(docs)
      .select(col("doc_id"), col("simhash"), expr(
        """explode(transform(sequence(0, 3),
          |  b -> struct(b AS band,
          |              shiftright(simhash, b * 12) & 4095 AS band_value)))"""
          .stripMargin).as("bd"))
      .select(col("doc_id"), col("simhash"),
        col("bd.band"), col("bd.band_value"))

  /** Near-duplicate probe of an incoming document stream against a known
   *  corpus — the ingest-time analog of batch d06: the stream's band rows
   *  equi-join the corpus band table (stream-static join, stateless; the
   *  corpus side partitions/broadcasts by Spark's normal join planning)
   *  and band-mates are exact-checked with `bit_count(xor)`. Emits one
   *  row per (probe, corpus match) per agreeing band; distinct-ness and
   *  representative election stay downstream, keeping this operator
   *  state-free. `corpusBands` must carry (doc_id, simhash, band,
   *  band_value) — the [[simhashBands]] shape. */
  def neardupProbe(
      stream: DataFrame,
      corpusBands: DataFrame,
      maxHamming: Int = 8): DataFrame = {
    val probe = simhashBands(stream).select(
      col("doc_id").as("probe_id"), col("simhash").as("probe_simhash"),
      col("band"), col("band_value"))
    probe.join(corpusBands, Seq("band", "band_value"))
      .where(expr(s"bit_count(probe_simhash ^ simhash) <= $maxHamming") &&
        col("probe_id") =!= col("doc_id"))
      .select(col("probe_id"), col("doc_id").as("match_id"),
        expr("CAST(bit_count(probe_simhash ^ simhash) AS INT)").as("hamming"))
  }

  /** Stateless per-row 3-token shingle hashes — the streaming form of the
   *  batch shingle CTE (DedupQueries d03/d07): a document carries all its
   *  tokens, so its DISTINCT shingle-hash set is computed inside the row
   *  (pure map, no state, no shuffle). Emits one (doc_id, h) row per
   *  distinct shingle, bit-identical to the batch `sparkShingles` rows on
   *  the same documents. */
  def shingleHashes(docs: DataFrame): DataFrame =
    docs
      .withColumn("graft_w", split(col("text"), " "))
      .where(size(col("graft_w")) >= 3)
      // full 60-bit hashes (modP = false): d03/d07 join on the FULL hash
      .select(col("doc_id"),
        explode(expr("graft_shingles60(graft_w, false)")).as("h"))

  /** Ingest-time benchmark decontamination — the streaming analog of batch
   *  d07: the stream's per-document shingle hashes equi-join a STATIC
   *  distinct benchmark-hash set (stream-static join, stateless; the bench
   *  side is tiny next to the corpus, so Spark broadcasts it). Emits one
   *  row per (doc, matching hash); counting/thresholding stays downstream,
   *  keeping the operator state-free like [[neardupProbe]]. `benchHashes`
   *  must carry the 60-bit hash column `h` — e.g.
   *  `shingleHashes(benchDocs).select("h").distinct().cache()`. CACHE it:
   *  Spark re-evaluates the static side of a stream-static join every
   *  micro-batch, so an uncached bench plan would re-shingle and
   *  re-distinct the whole benchmark corpus once per trigger. */
  def decontaminationProbe(
      stream: DataFrame, benchHashes: DataFrame): DataFrame =
    shingleHashes(stream).join(benchHashes, "h")
      .select(col("doc_id"), col("h").as("bench_h"))

  /** Repetition quality gate — the streaming form of batch t06 (the
   *  Gopher/C4 repetition family): per document the most-common-word
   *  fraction and duplicate-2-gram fraction, plus the keep/drop flag. A
   *  document carries all its tokens, so BOTH metrics compute inside the
   *  row (the batch shape needs an explode + (doc_id, tok) aggregate for
   *  the top-word count; a stream trades that shuffle for an in-row
   *  sort + run-length max — O(n log n) in tokens/doc): no state, no
   *  watermark, no shuffle. Fractions divide the same exact integers as
   *  the batch query, so the doubles are bit-identical. Default
   *  thresholds are the t06 gate's (graft.queries.TextQueries). */
  def repetitionGate(
      docs: DataFrame,
      maxTopWordFrac: Double = graft.queries.TextQueries.TopWordFracMax,
      maxDup2GramFrac: Double = graft.queries.TextQueries.DupGramFracMax)
      : DataFrame =
    // integer repetition stats in one native pass (graft.functions
    // .RepStats: top multiplicity + distinct adjacent 2-grams — equal to
    // the batch t06 counts); fraction DOUBLES stay in SQL so stream and
    // batch round identically. The HOF form measured 4.7 s at sf1.
    docs
      .withColumn("graft_rs", expr("graft_repstats(split(text, ' '))"))
      .withColumn("top_word_frac",
        expr("CAST(graft_rs.top_cnt AS DOUBLE) / graft_rs.n_tok"))
      .withColumn("dup_2gram_frac", expr(
        """CASE WHEN graft_rs.n_grams > 0
          |     THEN CAST(1 AS DOUBLE)
          |          - CAST(graft_rs.distinct_grams AS DOUBLE)
          |            / graft_rs.n_grams
          |     ELSE CAST(0 AS DOUBLE) END""".stripMargin))
      .withColumn("keep",
        col("top_word_frac") <= maxTopWordFrac &&
          col("dup_2gram_frac") <= maxDup2GramFrac)
      .drop("graft_rs")

  /** Deterministic hash sampling — the streaming form of batch t05: keep a
   *  row iff its doc_id hashes under `ratePct` (0–100; any per-row
   *  expression, e.g. a per-source rate). No rand(): the decision is a
   *  pure function of doc_id, so retried tasks, replayed micro-batches,
   *  and batch/stream runs of the same pipeline keep exactly the same
   *  rows. A stateless map — runs at ingest rate at any scale. */
  def hashSample(docs: DataFrame, ratePct: Column): DataFrame =
    docs.where(
      expr("graft_hash60(concat('smp:', CAST(doc_id AS STRING))) % 100")
        < ratePct)

  /** Streaming IVF cell assignment — the ingest-time form of the s05/s07
   *  coarse quantizer: each arriving embedding is routed to its best cell
   *  by an in-row argmax against a STATIC broadcast centroid array (the
   *  stream-static analog of the batch `cents` one-row relation). A
   *  stateless map — the op that routes vectors to ANN shards / SemDeDup
   *  blocks at ingest rate. `centroids` must carry (cid, cv) with cv
   *  already cast to double; ties break to the larger cid exactly like
   *  the batch argmax. Input needs (vec_id, embedding). */
  def ivfAssign(vecs: DataFrame, centroids: DataFrame): DataFrame = {
    val cents = centroids
      .select(col("cid"), col("cv"),
        expr("sqrt(graft_dot(cv, cv))").as("cnrm"))
      .agg(collect_list(struct(col("cid"), col("cv"), col("cnrm"))).as("cs"))
    vecs
      .withColumn("graft_v", expr("CAST(embedding AS ARRAY<DOUBLE>)"))
      .withColumn("graft_nrm", expr("sqrt(graft_dot(graft_v, graft_v))"))
      .crossJoin(broadcast(cents))
      .withColumn("cid", expr(
        """array_max(transform(cs, x ->
          |  struct(graft_dot(graft_v, x.cv) / (graft_nrm * x.cnrm) AS sim,
          |         x.cid AS cid))).cid""".stripMargin))
      .drop("graft_v", "graft_nrm", "cs")
  }

  /** Deterministic output-shard assignment — the streaming form of batch
   *  p03: each row gets its shard from a content-independent hash of
   *  doc_id, so replayed micro-batches, retried writers, and batch/stream
   *  runs agree on every row's shard. A stateless map; the downstream
   *  writer partitions by `shard` (e.g. `partitionBy("shard")` on a file
   *  sink), which at any scale is the one shuffle the write-out needs. */
  def shardAssign(docs: DataFrame, nShards: Int = 32): DataFrame =
    docs.withColumn("shard",
      expr(s"graft_hash60(concat('shard:', CAST(doc_id AS STRING))) % $nShards"))

  /** Stateless in-row MinHash band signatures — the streaming form of the
   *  batch d04 pipeline, bit-identical on the same rows. The batch shape
   *  aggregates (doc, shingle-hash) rows across a shuffle; a stream
   *  computes all 8 permutation minima inside ONE row (array_min over the
   *  in-row distinct shingle-hash set) and emits the 4 (band, sig) keys as
   *  a bounded explode — a pure map, no state, no shuffle. Constants and
   *  sig rendering are shared with batch d04 (DedupQueries.minhashAB), so
   *  stream and corpus band keys join exactly. Docs with <3 tokens carry
   *  no shingles and drop out, exactly like the batch CTE. */
  def minhashBands(docs: DataFrame): DataFrame = {
    val base = docs
      .withColumn("graft_w", split(col("text"), " "))
      .where(size(col("graft_w")) >= 3)
      // one native pass for tokenized shingling + md5 + distinct + mod
      // (graft.functions.ShingleHashes60) — the HOF composition
      // (transform/array_distinct/slice/concat_ws lambdas, which never
      // codegen) measured 6.1 s at sf1 vs 2.2 s for the batch twin
      .withColumn("graft_hb", expr("graft_shingles60(graft_w)"))
    // one native pass for all 8 permutation minima (graft.functions
    // .MinHash8) — the 8-lambda HOF form measured 6.4 s at sf1
    base
      .withColumn("graft_mins", expr("graft_minhash8(graft_hb)"))
      .select(col("doc_id"), expr(
        """explode(array(
          |  struct(0 AS band, concat(graft_mins[0], ':', graft_mins[1]) AS sig),
          |  struct(1 AS band, concat(graft_mins[2], ':', graft_mins[3]) AS sig),
          |  struct(2 AS band, concat(graft_mins[4], ':', graft_mins[5]) AS sig),
          |  struct(3 AS band, concat(graft_mins[6], ':', graft_mins[7]) AS sig)))"""
          .stripMargin).as("bd"))
      .select(col("doc_id"), col("bd.band"), col("bd.sig"))
  }

  /** Ingest-time duplicate-CLUSTER assignment — the streaming analog of
   *  batch d08: each arriving document's in-row minhash band keys probe a
   *  STATIC corpus band table labeled with d08's connected-component
   *  representatives, so a new document joins an existing duplicate
   *  cluster the moment it arrives (stream-static equi-join, stateless;
   *  no CC iteration on the hot path — the closure is precomputed batch-
   *  side and refreshed on whatever cadence the corpus re-clusters).
   *  Emits one (probe_id, rep_id) row per agreeing (band, sig) corpus
   *  match; representative election (min rep) stays downstream, keeping
   *  the operator state-free like [[neardupProbe]]. `corpusBands` must
   *  carry (band, sig, rep_id) — [[minhashBands]] of the corpus joined to
   *  its d08 labels — and MUST be a materialized table (`.cache()` +
   *  an action, or a written-out table re-read): Spark re-evaluates the
   *  static side of a stream-static join every micro-batch, so an
   *  unmaterialized corpus plan would re-run its whole derivation (the
   *  LSH pipeline and CC closure included) once per trigger. This
   *  operator dedups the static side below, but dedup of an unmaterialized
   *  plan still re-derives it — materialization is the caller's contract,
   *  same as [[decontaminationProbe]]'s bench side. */
  def clusterAssign(stream: DataFrame, corpusBands: DataFrame): DataFrame =
    minhashBands(stream)
      .select(col("doc_id").as("probe_id"), col("band"), col("sig"))
      // dedup the static side to one row per (band, sig, rep): duplicate
      // CORPUS members share all their band keys (that is the whole
      // premise), so joining the raw member-level table would emit one
      // identical output row per cluster member — cluster-size-fold
      // amplification on the hot path
      .join(corpusBands.select(col("band"), col("sig"), col("rep_id"))
        .dropDuplicates("band", "sig", "rep_id"), Seq("band", "sig"))
      .select(col("probe_id"), col("rep_id"))

  /** Ingest-time survivor election — the streaming form of batch d10: as
   *  cluster members arrive (e.g. from [[clusterAssign]] + a token count),
   *  each cluster's current best copy is tracked in keyed state (the d10
   *  policy exactly: most tokens, smallest doc_id on ties) and a row is
   *  emitted ONLY when the survivor changes — downstream consumers see a
   *  changelog of survivor handoffs, not a per-arrival firehose. State is
   *  12 bytes per cluster (survivor id + token count), bounded by cluster
   *  count, partitioned by rep_id across executors. The election is a max
   *  under a total order, so replayed/reordered micro-batches converge to
   *  the same final survivor. Input must carry (rep_id, doc_id, n_tok). */
  def survivorElect(members: DataFrame): Dataset[SurvivorUpdate] = {
    val spark = members.sparkSession
    import spark.implicits._
    members
      .selectExpr("CAST(rep_id AS LONG) AS rep_id",
        "CAST(doc_id AS LONG) AS doc_id", "CAST(n_tok AS INT) AS n_tok")
      .as[(Long, Long, Int)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SurvivorState, SurvivorUpdate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (rep: Long, rows: Iterator[(Long, Long, Int)],
            state: GroupState[SurvivorState]) =>
          var cur = state.getOption
          var changed = false
          rows.foreach { case (_, id, nt) =>
            val better = cur match {
              case None => true
              case Some(s) => nt > s.nTok || (nt == s.nTok && id < s.survivorId)
            }
            if (better) { cur = Some(SurvivorState(id, nt)); changed = true }
          }
          if (changed) {
            state.update(cur.get)
            Iterator.single(SurvivorUpdate(rep, cur.get.survivorId, cur.get.nTok))
          } else Iterator.empty
      }
  }

  /** Ingest-time sequence-pack assignment — the streaming form of batch
   *  p06: one running token offset per source lives in keyed state (8
   *  bytes), and each arriving document is assigned the `windowTokens`-
   *  sized chunk its offset starts in. Packing order is arrival order —
   *  the streaming semantics — with doc_id order inside a micro-batch so
   *  replays of a batch assign identically. Input must carry (source,
   *  doc_id, n_tok). Feeding documents in doc_id order reproduces the
   *  batch p06 layout exactly (tested). */
  def packAssign(docs: DataFrame, windowTokens: Long = 512L): Dataset[PackAssignment] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .selectExpr("CAST(source AS STRING) AS source",
        "CAST(doc_id AS LONG) AS doc_id", "CAST(n_tok AS LONG) AS n_tok")
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[PackState, PackAssignment](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (src: String, rows: Iterator[(String, Long, Long)],
            state: GroupState[PackState]) =>
          var off = state.getOption.map(_.offset).getOrElse(0L)
          val out = rows.toSeq.sortBy(_._2).map { case (_, id, nt) =>
            val chunk = off / windowTokens
            off += nt
            PackAssignment(src, id, chunk)
          }
          state.update(PackState(off))
          out.iterator
      }
  }

  /** File-source entry point: tail a directory of event parquet as a
   *  stream (the readStream → transform → writeStream shape of
   *  SURVEY.md §7's roadmap). */
  def readEventStream(spark: SparkSession, dir: String): Dataset[Event] = {
    import spark.implicits._
    spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE")
      .parquet(dir)
      .as[Event]
  }
}
