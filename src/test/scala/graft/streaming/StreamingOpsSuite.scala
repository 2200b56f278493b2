package graft.streaming

import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/**
 * Streaming semantics checked against their batch analogs: the same rows
 * through the streaming operators (via MemoryStream + watermark
 * advancement) must produce the same aggregates the batch queries produce.
 */
class StreamingOpsSuite extends SparkTestBase {

  private def ts(minutes: Long): Timestamp =
    new Timestamp(1704067200000L + minutes * 60000L) // 2024-01-01 00:00 UTC

  private def ev(id: Long, minutes: Long, user: Long, typ: String,
      value: Double): Event = Event(id, ts(minutes), user, typ, value)

  test("hourlyRollup (streaming) matches batch window aggregation") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = StreamingOps.hourlyRollup(input.toDF(), watermark = "1 minute")
      .writeStream.format("memory").queryName("rollup_sink")
      .outputMode("append").start()
    try {
      val events = Seq(
        ev(1, 5, 1, "click", 1.0), ev(2, 15, 2, "click", 2.5),
        ev(3, 61, 1, "view", 4.0), ev(4, 70, 3, "click", 0.5))
      input.addData(events: _*)
      query.processAllAvailable()
      // sentinel far in the future finalizes all real windows
      input.addData(ev(99, 24 * 60, 9, "zz", 0.0))
      query.processAllAvailable()

      val streamed = spark.table("rollup_sink")
        .where("event_type <> 'zz'")
        .collect().map(_.mkString(",")).sorted.toSeq
      val batch = StreamingOps.hourlyRollup(
        events.toDF(), watermark = "1 minute")
      // batch DataFrame of the same shape: compute expected via groupBy
      val expected = spark.createDataFrame(events)
        .selectExpr("window(ts, '1 hour') AS w", "event_type", "value")
        .groupBy("w", "event_type")
        .agg(org.apache.spark.sql.functions.count("*").as("n"),
          org.apache.spark.sql.functions.sum(
            org.apache.spark.sql.functions.expr(
              "CAST(floor(value * 100) AS BIGINT)")).as("value_cents"))
        .selectExpr("unix_micros(w.start) AS bucket_us", "event_type", "n",
          "value_cents")
        .collect().map(_.mkString(",")).sorted.toSeq
      assert(streamed == expected,
        s"streamed=$streamed\nexpected=$expected")
      assert(batch.isStreaming == false)
    } finally query.stop()
  }

  test("dedupExact (streaming) keeps first doc per content, matches batch d01") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    case class Doc(doc_id: Long, ts: Timestamp, text: String, source: String)
    val input = MemoryStream[(Long, Timestamp, String, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text", "source")
    val query = StreamingOps.dedupExact(docs, watermark = "10 minutes")
      .writeStream.format("memory").queryName("dedup_sink")
      .outputMode("append").start()
    try {
      // batch 1: three texts, one duplicated; batch 2: re-sends a dup
      // within the watermark plus one new text
      input.addData(
        (1L, ts(0), "alpha beta gamma", "s1"),
        (2L, ts(1), "alpha beta gamma", "s1"),
        (3L, ts(2), "delta epsilon", "s2"))
      query.processAllAvailable()
      input.addData(
        (4L, ts(3), "alpha beta gamma", "s2"),
        (5L, ts(4), "zeta eta", "s1"))
      query.processAllAvailable()

      val survivors = spark.table("dedup_sink")
        .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
      // first arrival per distinct text survives — same survivor count as
      // batch d01's distinct-text groups over the same rows
      assert(survivors.map(_._2).toSeq.sorted ==
        Seq("alpha beta gamma", "delta epsilon", "zeta eta"))
      assert(survivors.map(_._1).toSeq == Seq(1L, 3L, 5L),
        s"wrong survivors: ${survivors.toSeq}")
      val batchDistinct = Seq(
        "alpha beta gamma", "alpha beta gamma", "delta epsilon",
        "alpha beta gamma", "zeta eta")
        .toDF("text").groupBy("text").count().count()
      assert(survivors.length == batchDistinct)
    } finally query.stop()
  }

  test("intervalJoin (stream-stream) matches the batch interval join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val buys = MemoryStream[Event]
    val query = StreamingOps.intervalJoin(
      clicks.toDF(), buys.toDF(), withinSeconds = 300, watermark = "1 minute")
      .writeStream.format("memory").queryName("ij_sink")
      .outputMode("append").start()
    try {
      // user 1: click at 0, buys at 2 (within) and 20 (outside 5 min)
      // user 2: click at 10, buy at 12 (within); user 3: buy only
      clicks.addData(ev(1, 0, 1, "click", 0), ev(2, 10, 2, "click", 0))
      buys.addData(ev(50, 2, 1, "buy", 1), ev(51, 20, 1, "buy", 2),
        ev(52, 12, 2, "buy", 3), ev(53, 15, 3, "buy", 4))
      query.processAllAvailable()
      clicks.addData(ev(99, 24 * 60, 9, "zz", 0)) // advance watermarks
      buys.addData(ev(98, 24 * 60, 9, "zz", 0))
      query.processAllAvailable()

      val streamed = spark.table("ij_sink")
        .where("l_type <> 'zz'")
        .selectExpr("user_id", "l_event_id", "r_event_id")
        .as[(Long, Long, Long)].collect().sorted.toSeq
      assert(streamed == Seq((1L, 1L, 50L), (2L, 2L, 52L)),
        s"got $streamed")
      // batch analog over the same rows must agree
      val allClicks = Seq(ev(1, 0, 1, "click", 0), ev(2, 10, 2, "click", 0))
      val allBuys = Seq(ev(50, 2, 1, "buy", 1), ev(51, 20, 1, "buy", 2),
        ev(52, 12, 2, "buy", 3), ev(53, 15, 3, "buy", 4))
      val batch = StreamingOps.intervalJoin(
        allClicks.toDF(), allBuys.toDF(), withinSeconds = 300)
        .selectExpr("user_id", "l_event_id", "r_event_id")
        .as[(Long, Long, Long)].collect().sorted.toSeq
      assert(batch == streamed, s"batch=$batch streamed=$streamed")
    } finally query.stop()
  }

  test("streaming simhash matches batch d05 fingerprints on fixture rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the SAME physical rows through both paths: 60 fixture documents
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text").as[SimDoc].collect().take(60)
    val batchD05 = graft.queries.DedupQueries.defs
      .find(_.name == "d05_simhash").get.fn(spark, sfDir)
      .where($"doc_id".isin(docs.map(_.doc_id): _*))
      .as[(Long, Long)].collect().sorted.toSeq

    val input = MemoryStream[SimDoc]
    val query = StreamingOps.simhash(input.toDF())
      .select("doc_id", "simhash")
      .writeStream.format("memory").queryName("simhash_sink")
      .outputMode("append").start()
    try {
      input.addData(docs.take(30): _*)
      query.processAllAvailable()
      input.addData(docs.drop(30): _*)
      query.processAllAvailable()
      val streamed = spark.table("simhash_sink")
        .as[(Long, Long)].collect().sorted.toSeq
      assert(streamed == batchD05,
        s"streaming simhash diverges from batch d05 " +
          s"(first mismatch: ${streamed.zip(batchD05).find(p => p._1 != p._2)})")
    } finally query.stop()
  }

  test("streaming band assignment + neardup probe match batch d06 semantics") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      SimDoc(1, "the quick brown fox jumps over the lazy dog"),
      SimDoc(2, "an entirely different document about spark and scala"),
      SimDoc(3, "streams of tokens flow into fingerprints"))
    val corpusBands = StreamingOps.simhashBands(corpus.toDF())
    // band derivation parity: 4 bands of 12 bits, recomputed from the
    // fingerprint exactly as batch d06 derives them
    val bands = corpusBands.as[(Long, Long, Int, Long)].collect()
    assert(bands.length == corpus.size * 4)
    bands.foreach { case (_, sh, b, bv) =>
      assert(bv == ((sh >> (b * 12)) & 4095L), s"band $b of $sh wrong: $bv")
    }

    // probe: an exact duplicate (hamming 0 → must match in every band)
    // and an unrelated text (no band-mate with hamming <= 8 expected)
    val input = MemoryStream[SimDoc]
    val probes = StreamingOps.neardupProbe(input.toDF(), corpusBands)
    val query = probes.writeStream.format("memory").queryName("probe_sink")
      .outputMode("append").start()
    try {
      input.addData(
        SimDoc(100, "the quick brown fox jumps over the lazy dog"),
        SimDoc(101, "completely unrelated payload zz yy xx ww vv uu tt"))
      query.processAllAvailable()
      val matches = spark.table("probe_sink")
        .select("probe_id", "match_id", "hamming")
        .as[(Long, Long, Int)].collect().toSeq
      val dup = matches.filter(_._1 == 100L).distinct
      assert(dup.contains((100L, 1L, 0)),
        s"exact duplicate not matched to doc 1: $matches")
      // the exact duplicate agrees in all 4 bands -> 4 pair rows pre-distinct
      assert(matches.count(m => m._1 == 100L && m._2 == 1L) == 4)
      assert(!matches.exists(m => m._1 == 101L && m._3 > 8))
    } finally query.stop()
  }

  test("streaming minhash bands are bit-identical to the batch d04 bands") {
    import spark.implicits._
    // the SAME 60 fixture docs through the in-row (stream-shaped) path and
    // the batch aggregate CTE — band keys must agree exactly or stream-
    // static cluster joins silently miss
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text").as[SimDoc].collect().take(60)
    val batch = spark.sql(
      s"WITH ${graft.queries.DedupQueries.sparkMinhashCtes}\n" +
        "SELECT doc_id, band, sig FROM bands")
      .where($"doc_id".isin(docs.map(_.doc_id): _*))
      .as[(Long, Int, String)].collect().sorted.toSeq
    val inRow = StreamingOps.minhashBands(docs.toSeq.toDF())
      .as[(Long, Int, String)].collect().sorted.toSeq
    assert(inRow == batch,
      s"in-row minhash bands diverge from batch d04 " +
        s"(first mismatch: ${inRow.zip(batch).find(p => p._1 != p._2)})")
  }

  test("streaming cluster assignment routes arrivals to batch d08 clusters") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // batch side: d08 labels over the fixture corpus + corpus band table
    val labels = graft.queries.DedupQueries.defs
      .find(_.name == "d08_dup_clusters").get.fn(spark, sfDir)
      .selectExpr("doc_id", "rep_id")
    val labelMap = labels.as[(Long, Long)].collect().toMap
    assert(labelMap.nonEmpty, "fixture corpus has no duplicate clusters")
    val corpusDocs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text")
    val corpusBands = StreamingOps.minhashBands(corpusDocs)
      .join(labels, Seq("doc_id"))
      .select($"band", $"sig", $"rep_id")

    // stream side: re-ingest 3 clustered docs (shifted ids so they read as
    // new arrivals) and one unrelated text
    val members = labelMap.keys.toSeq.sorted.take(3)
    val texts = corpusDocs.where($"doc_id".isin(members: _*))
      .as[SimDoc].collect().sortBy(_.doc_id)
    val input = MemoryStream[SimDoc]
    val assigned = StreamingOps.clusterAssign(input.toDF(), corpusBands)
    val query = assigned.writeStream.format("memory")
      .queryName("cluster_sink").outputMode("append").start()
    try {
      input.addData(texts.map(d => SimDoc(d.doc_id + 1000000L, d.text)): _*)
      input.addData(SimDoc(9999999L, "zz yy xx unrelated ww vv uu tt ss rr"))
      query.processAllAvailable()
      val got = spark.table("cluster_sink")
        .groupBy("probe_id").agg(org.apache.spark.sql.functions.min("rep_id"))
        .as[(Long, Long)].collect().toMap
      texts.foreach { d =>
        assert(got.get(d.doc_id + 1000000L).contains(labelMap(d.doc_id)),
          s"arrival ${d.doc_id} not routed to its batch cluster " +
            s"${labelMap(d.doc_id)} (got ${got.get(d.doc_id + 1000000L)})")
      }
      assert(!got.contains(9999999L), "unrelated text matched a cluster")
    } finally query.stop()
  }

  test("streaming survivor election converges to the batch d10 choice") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // batch truth on the fixture corpus
    val batch = graft.queries.DedupQueries.defs
      .find(_.name == "d10_cluster_survivors").get.fn(spark, sfDir)
      .selectExpr("rep_id", "survivor_id")
      .as[(Long, Long)].collect().toMap
    assert(batch.nonEmpty)
    // stream the SAME cluster members (rep_id, doc_id, n_tok), split
    // across two micro-batches in doc_id order — survivor handoffs may
    // fire mid-stream; only the FINAL update per cluster must agree
    val members = graft.queries.ClusterLabels.labels(spark, sfDir)
      .join(spark.table("documents"), "doc_id")
      .selectExpr("rep_id", "doc_id", "size(split(text, ' ')) AS n_tok")
      .orderBy("doc_id")
      .as[(Long, Long, Int)].collect()
    val input = MemoryStream[(Long, Long, Int)]
    val updates = StreamingOps.survivorElect(
      input.toDF().toDF("rep_id", "doc_id", "n_tok"))
    val query = updates.writeStream.format("memory")
      .queryName("survivor_sink").outputMode("append").start()
    try {
      val (first, second) = members.splitAt(members.length / 2)
      input.addData(first.toIndexedSeq)
      query.processAllAvailable()
      input.addData(second.toIndexedSeq)
      query.processAllAvailable()
      // the winning update per rep (best by the d10 policy) must be the
      // batch survivor — re-derived from the changelog rather than from
      // sink row order, so the assertion is order-independent
      val got = spark.table("survivor_sink")
        .as[SurvivorUpdate].collect()
        .groupBy(_.rep_id)
        .map { case (rep, ups) =>
          rep -> ups.minBy(u => (-u.n_tok, u.survivor_id)).survivor_id
        }
      assert(got == batch,
        s"streaming survivors diverge from batch d10 " +
          s"(first mismatch: ${got.toSeq.sorted.zip(batch.toSeq.sorted)
            .find(p => p._1 != p._2)})")
    } finally query.stop()
  }

  test("streaming pack assignment in doc_id order reproduces batch p06") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // batch truth: per-doc chunk assignment re-derived with the p06 window
    val batch = spark.sql(
      """SELECT source, doc_id,
        |       CAST(coalesce(sum(size(split(text, ' ')))
        |         OVER (PARTITION BY source ORDER BY doc_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |         div 512 AS BIGINT) AS chunk_id
        |FROM documents""".stripMargin)
      .as[(String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val members = spark.sql(
      """SELECT source, doc_id, size(split(text, ' ')) AS n_tok
        |FROM documents ORDER BY doc_id""".stripMargin)
      .as[(String, Long, Int)].collect()

    val input = MemoryStream[(String, Long, Int)]
    val assigned = StreamingOps.packAssign(
      input.toDF().toDF("source", "doc_id", "n_tok"))
    val query = assigned.writeStream.format("memory")
      .queryName("pack_sink").outputMode("append").start()
    try {
      val (first, second) = members.splitAt(members.length / 2)
      input.addData(first.toIndexedSeq)
      query.processAllAvailable()
      input.addData(second.toIndexedSeq)
      query.processAllAvailable()
      val got = spark.table("pack_sink").as[PackAssignment].collect()
        .map(p => (p.source, p.doc_id) -> p.chunk_id).toMap
      assert(got.size == members.length)
      assert(got == batch,
        s"streaming pack diverges from batch p06 (first mismatch: ${
          got.toSeq.sortBy(_._1).zip(batch.toSeq.sortBy(_._1))
            .find(p => p._1 != p._2)})")
    } finally query.stop()
  }

  test("streaming decontamination probe matches batch d07 shingle overlap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // fixture rows through both paths: bench set = every 41st doc (the
    // batch d07 convention), stream = 40 non-bench docs
    val all = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text").as[SimDoc].collect()
    val bench = all.filter(_.doc_id % 41 == 0)
    val probeDocs = all.filter(_.doc_id % 41 != 0).take(40)
    val benchHashes = StreamingOps.shingleHashes(bench.toSeq.toDF())
      .select("h").distinct()

    val input = MemoryStream[SimDoc]
    val query = StreamingOps.decontaminationProbe(input.toDF(), benchHashes)
      .writeStream.format("memory").queryName("decon_sink")
      .outputMode("append").start()
    try {
      input.addData(probeDocs.take(20): _*)
      query.processAllAvailable()
      input.addData(probeDocs.drop(20): _*)
      query.processAllAvailable()
      val streamed = spark.table("decon_sink")
        .groupBy("doc_id").count()
        .as[(Long, Long)].collect().sorted.toSeq
      // batch analog: the d07 join over the same rows (shingleHashes works
      // identically on a batch frame — same expressions, no state)
      val expected = StreamingOps.shingleHashes(probeDocs.toSeq.toDF())
        .join(benchHashes, "h")
        .groupBy("doc_id").count()
        .as[(Long, Long)].collect().sorted.toSeq
      assert(streamed == expected,
        s"streamed=${streamed.take(5)}... expected=${expected.take(5)}...")
      assert(streamed.nonEmpty, "fixture corpus should contain overlap")
    } finally query.stop()
  }

  test("streaming repetition gate matches batch t06 metrics bit-for-bit") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the SAME physical rows through both paths: 60 fixture documents
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text").as[SimDoc].collect().take(60)
    val batchT06 = graft.queries.TextQueries.defs
      .find(_.name == "t06_repetition").get.fn(spark, sfDir)
      .where($"doc_id".isin(docs.map(_.doc_id): _*))
      .select("doc_id", "top_word_frac", "dup_2gram_frac", "keep")
      .as[(Long, Double, Double, Boolean)].collect().sortBy(_._1).toSeq

    val input = MemoryStream[SimDoc]
    val query = StreamingOps.repetitionGate(input.toDF())
      .select("doc_id", "top_word_frac", "dup_2gram_frac", "keep")
      .writeStream.format("memory").queryName("rep_sink")
      .outputMode("append").start()
    try {
      input.addData(docs.take(30): _*)
      query.processAllAvailable()
      input.addData(docs.drop(30): _*)
      query.processAllAvailable()
      val streamed = spark.table("rep_sink")
        .as[(Long, Double, Double, Boolean)].collect().sortBy(_._1).toSeq
      assert(streamed == batchT06,
        s"streaming repetition gate diverges from batch t06 (first " +
          s"mismatch: ${streamed.zip(batchT06).find(p => p._1 != p._2)})")
      assert(streamed.exists(_._4) && streamed.exists(!_._4),
        "fixture slice should exercise both keep and drop branches")
    } finally query.stop()
  }

  test("streaming IVF assignment matches the batch s07 cell grouping") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    // centroids exactly as the batch quantizer defines them
    val centroids = emb.where($"vec_id" < 16)
      .selectExpr("vec_id AS cid", "CAST(embedding AS ARRAY<DOUBLE>) AS cv")
    val batchCells = graft.queries.SimilarityQueries.defs
      .find(_.name == "s07_semdedup").get.fn(spark, sfDir)
      .selectExpr("vec_id", "cid")
      .as[(Long, Long)].collect().toMap

    val rows = emb.selectExpr("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().take(60)
    val input = MemoryStream[(Long, Array[Float])]
    val query = StreamingOps.ivfAssign(
        input.toDF().toDF("vec_id", "embedding"), centroids)
      .select("vec_id", "cid")
      .writeStream.format("memory").queryName("ivf_sink")
      .outputMode("append").start()
    try {
      input.addData(rows: _*)
      query.processAllAvailable()
      val streamed = spark.table("ivf_sink")
        .as[(Long, Long)].collect().toMap
      assert(streamed.nonEmpty)
      streamed.foreach { case (id, cid) =>
        assert(batchCells(id) == cid,
          s"vec $id routed to cell $cid, batch assigns ${batchCells(id)}")
      }
    } finally query.stop()
  }

  test("streaming curation funnel composes gate -> sample -> shard") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the ingest-time funnel: repetition gate, deterministic 50% sample,
    // shard assignment — all stateless, so the composed stream must keep
    // exactly the rows (and shards) the same composition keeps in batch
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text").as[SimDoc].collect().take(80)
    def funnel(df: org.apache.spark.sql.DataFrame) =
      StreamingOps.shardAssign(
        StreamingOps.hashSample(
          StreamingOps.repetitionGate(df).where(org.apache.spark.sql
            .functions.col("keep")),
          org.apache.spark.sql.functions.lit(50)))
        .select("doc_id", "shard")

    val input = MemoryStream[SimDoc]
    val query = funnel(input.toDF())
      .writeStream.format("memory").queryName("funnel_sink")
      .outputMode("append").start()
    try {
      input.addData(docs.take(40): _*)
      query.processAllAvailable()
      input.addData(docs.drop(40): _*)
      query.processAllAvailable()
      val streamed = spark.table("funnel_sink")
        .as[(Long, Long)].collect().sorted.toSeq
      val batch = funnel(docs.toSeq.toDF())
        .as[(Long, Long)].collect().sorted.toSeq
      assert(streamed == batch, "composed funnel diverges from batch")
      assert(streamed.nonEmpty && streamed.size < docs.size,
        "funnel should keep a strict non-empty subset")
    } finally query.stop()
  }

  test("streaming shard assignment agrees with the batch p03 plan") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text").as[SimDoc].collect().take(50)

    val input = MemoryStream[SimDoc]
    val query = StreamingOps.shardAssign(input.toDF())
      .select("doc_id", "shard")
      .writeStream.format("memory").queryName("shard_sink")
      .outputMode("append").start()
    try {
      input.addData(docs: _*)
      query.processAllAvailable()
      val streamed = spark.table("shard_sink")
        .as[(Long, Long)].collect().toMap
      // batch p03 aggregates per shard; re-derive per-doc via the same
      // expression on a batch frame (stateless ⇒ identical by definition)
      // and cross-check per-shard doc counts against the p03 aggregate
      val batch = StreamingOps.shardAssign(docs.toSeq.toDF())
        .select("doc_id", "shard").as[(Long, Long)].collect().toMap
      assert(streamed == batch)
      val p03 = graft.queries.PipelineQueries.defs
        .find(_.name == "p03_shard_plan").get.fn(spark, sfDir)
        .selectExpr("shard", "n_docs").as[(Long, Long)].collect().toMap
      val full = spark.read.parquet(s"$sfDir/documents.parquet")
        .select($"doc_id", $"text").as[SimDoc].collect()
      val expected = StreamingOps.shardAssign(full.toSeq.toDF())
        .groupBy("shard").count().as[(Long, Long)].collect().toMap
      assert(p03 == expected,
        "p03 shard counts diverge from the shardAssign expression")
    } finally query.stop()
  }

  test("streaming hash sample keeps exactly the deterministic batch rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text").as[SimDoc].collect().take(60)
    val rate = org.apache.spark.sql.functions.lit(40)
    val input = MemoryStream[SimDoc]
    val query = StreamingOps.hashSample(input.toDF(), rate)
      .select("doc_id")
      .writeStream.format("memory").queryName("sample_sink")
      .outputMode("append").start()
    try {
      input.addData(docs: _*)
      query.processAllAvailable()
      // replay the same rows: a deterministic sample must not change
      input.addData(docs.take(10): _*)
      query.processAllAvailable()
      val streamed = spark.table("sample_sink")
        .as[Long].collect().distinct.sorted.toSeq
      val batch = StreamingOps.hashSample(docs.toSeq.toDF(), rate)
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(streamed == batch, s"streamed=$streamed batch=$batch")
      assert(batch.nonEmpty && batch.size < docs.size,
        s"rate-40 sample should be a strict non-empty subset: ${batch.size}/${docs.size}")
    } finally query.stop()
  }

  test("file-source stream resumes from checkpoint exactly-once") {
    // the production recovery story: a file-source stream with a
    // checkpointed file sink, killed and restarted — rows written before
    // the stop must NOT be reprocessed, rows arriving while down must be
    // picked up. hashSample(rate=100) keeps every row, so the assertion is
    // pure exactly-once accounting.
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val (in, chk, out) = (s"$base/in", s"$base/chk", s"$base/out")
    def docs(ids: Range) = ids.map(i => (i.toLong, s"text $i")).toDF("doc_id", "text")
    docs(0 until 10).write.mode("append").parquet(in)

    def startQuery() = StreamingOps.hashSample(
      spark.readStream.schema("doc_id LONG, text STRING").parquet(in),
      org.apache.spark.sql.functions.lit(100))
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", chk)
      .outputMode("append").start()

    val q1 = startQuery()
    q1.processAllAvailable(); q1.stop()
    docs(10 until 20).write.mode("append").parquet(in) // arrives while down
    val q2 = startQuery()
    q2.processAllAvailable(); q2.stop()

    val got = spark.read.parquet(out).select("doc_id")
      .as[Long].collect().sorted.toSeq
    assert(got == (0L until 20L), // each row exactly once across the restart
      s"expected 0..19 exactly once, got ${got.size} rows: $got")
  }

  test("packAssign running-offset state survives a checkpointed restart") {
    // the stateful-recovery story for the packer: 20 docs of 100 tokens
    // each arrive across a kill/restart; chunk ids must continue from the
    // recovered offset (doc i starts at token 100*i -> chunk (100*i)/512),
    // exactly the layout a single uninterrupted run would produce
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_pack_ckpt").toString
    val (in, chk, out) = (s"$base/in", s"$base/chk", s"$base/out")
    def docs(ids: Range) =
      ids.map(i => ("srcA", i.toLong, 100)).toDF("source", "doc_id", "n_tok")
    docs(0 until 10).write.mode("append").parquet(in)

    def startQuery() = StreamingOps.packAssign(
      spark.readStream.schema("source STRING, doc_id LONG, n_tok INT").parquet(in))
      .toDF()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", chk)
      .outputMode("append").start()

    val q1 = startQuery()
    q1.processAllAvailable(); q1.stop()
    docs(10 until 20).write.mode("append").parquet(in) // arrives while down
    val q2 = startQuery()
    q2.processAllAvailable(); q2.stop()

    val got = spark.read.parquet(out)
      .select("doc_id", "chunk_id").as[(Long, Long)].collect().toMap
    assert(got.keySet == (0L until 20L).toSet, s"lost/duplicated docs: $got")
    (0L until 20L).foreach { i =>
      assert(got(i) == (100 * i) / 512,
        s"doc $i: chunk ${got(i)} != ${(100 * i) / 512} — offset state lost")
    }
  }

  test("sessionize closes sessions on gap and matches expected counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = StreamingOps.sessionize(input.toDS(), gapSeconds = 600,
      watermark = "1 minute")
      .writeStream.format("memory").queryName("session_sink")
      .outputMode("append").start()
    try {
      // user 1: events at 0,5 min (one session), then 30,32 (second session)
      // user 2: single event at 3
      input.addData(
        ev(1, 0, 1, "a", 0), ev(2, 5, 1, "a", 0),
        ev(3, 3, 2, "a", 0),
        ev(4, 30, 1, "a", 0), ev(5, 32, 1, "a", 0))
      query.processAllAvailable()
      input.addData(ev(99, 24 * 60, 9, "zz", 0)) // advance watermark
      query.processAllAvailable()

      val sessions = spark.table("session_sink").as[Session].collect()
        .filter(_.user_id != 9)
        .sortBy(s => (s.user_id, s.session_start.getTime))
      assert(sessions.map(s => (s.user_id, s.n_events)).toSeq ==
        Seq((1L, 2L), (1L, 2L), (2L, 1L)),
        s"got ${sessions.toSeq}")
      val first = sessions.head
      assert(first.session_start == ts(0) && first.session_end == ts(5))
    } finally query.stop()
  }

  test("sessionizeLite is bit-identical to sessionize on the events fixture") {
    // the primitive-state variant must make the SAME session decisions on
    // the same (user_id, ts) pairs — compare full output sets over the
    // fixture, multi-batch (watermark advances between files) like a live
    // ingest, including out-of-order arrivals within the watermark
    import spark.implicits._
    val evDf = graft.GraftSession.normalizeTs(
      spark.read.parquet(s"$sfDir/events.parquet"))
      .select("event_id", "ts", "user_id", "event_type", "value")
    val tmp = java.nio.file.Files.createTempDirectory("graft_sesslite_").toFile
    tmp.deleteOnExit()
    val dir = s"${tmp.getAbsolutePath}/events"
    evDf.repartitionByRange(4, org.apache.spark.sql.functions.col("ts"))
      .write.mode("overwrite").parquet(dir)
    // FileStreamSource feeds files in MODIFICATION-TIME order, which for
    // same-second part files is effectively random — a later range
    // arriving first advances the watermark and late-DROPS earlier
    // ranges, and the two stateful machineries drop late rows at
    // different boundaries (flatMapGroupsWithState: ts < watermark;
    // session-window aggregation: ts + gap < watermark), so bit-identity
    // only holds under in-watermark arrival. Stamp mtimes in range order
    // (part-0000k is the k-th range) so batches arrive in ts order, as
    // the single-file+sentinel v09 gate guarantees by construction.
    new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
      .zipWithIndex.foreach { case (f, i) =>
        f.setLastModified(1600000000000L + i * 60000L) }
    // without a sentinel the emitted suffix depends on which sessions'
    // timers/windows the final watermark reached before the drain went
    // idle — a far-future event (the v09 gate's pattern) pushes the
    // watermark past every session end so ALL sessions emit in every
    // form and the comparison is over complete, deterministic sets
    val maxTs = evDf.agg(org.apache.spark.sql.functions.max("ts"))
      .head.getTimestamp(0)
    def drain(mk: org.apache.spark.sql.Dataset[Event] => org.apache.spark.sql.Dataset[Session],
        sink: String): Set[(Long, Long, Long, Long)] = {
      val src = spark.readStream
        .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE")
        .option("maxFilesPerTrigger", "1").parquet(dir).as[Event]
      val q = mk(src).writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        Seq((-1L, new Timestamp(maxTs.getTime + 100L * 3600 * 1000), -1L,
          "sentinel", 0.0))
          .toDF("event_id", "ts", "user_id", "event_type", "value")
          .write.mode("append").parquet(dir)
        q.processAllAvailable()
        spark.table(sink).as[Session].collect().toSet.map(
          (s: Session) => (s.user_id, s.session_start.getTime,
            s.session_end.getTime, s.n_events))
          .filter(_._1 >= 0) // drop the sentinel's own session if closed
      } finally {
        q.stop()
        spark.catalog.dropTempView(sink)
      }
    }
    val std = drain(StreamingOps.sessionize(_), "sess_std_sink")
    val lite = drain(StreamingOps.sessionizeLite(_), "sess_lite_sink")
    assert(std.nonEmpty, "fixture drain produced no sessions")
    assert(lite === std,
      s"lite diverged: only-std=${(std -- lite).take(3)} only-lite=${(lite -- std).take(3)}")
    val native = drain(StreamingOps.sessionizeNative(_), "sess_nat_sink")
    assert(native === std,
      s"native diverged: only-std=${(std -- native).take(3)} only-nat=${(native -- std).take(3)}")
  }

  test("sessionizeNative merges an EXACT-gap arrival like the closure forms") {
    // the built-in session_window merges on OVERLAP OR ADJACENCY
    // (currentEnd >= nextStart, window end = ts + gap), so an event at
    // exactly last + gap joins the session — the same inclusive
    // diff <= gap boundary as sessionize and the batch oracle, with the
    // gap passed through UNMODIFIED. Pinned here because no fixture row
    // is guaranteed to land exactly on the boundary: exactly-gap must
    // merge, gap + 1us must split, in both forms
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // exact-gap chain: 0, +1800s (exactly gap: MUST merge), then
    // +1800.000001s after that (gap + 1us: MUST split)
    def runBoundary(mk: org.apache.spark.sql.Dataset[Event] => org.apache.spark.sql.Dataset[Session],
        sink: String): Set[(Long, Long, Long, Long)] = {
      val ms = MemoryStream[Event]
      val base = 1700000000000000L
      def ev(id: Long, us: Long) = { val t = new Timestamp(us / 1000)
        t.setNanos(((us % 1000000) * 1000).toInt)
        Event(id, t, 7L, "click", 0.0) }
      ms.addData(
        ev(1, base),
        ev(2, base + 1800L * 1000000),                      // exactly gap
        ev(3, base + 1800L * 1000000 + 1800L * 1000000 + 1)) // gap + 1us
      val q = mk(ms.toDS()).writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        ms.addData(ev(99, base + 100L * 3600 * 1000000))
        q.processAllAvailable()
        spark.table(sink).as[Session].collect().toSet.map(
          (s: Session) => (s.user_id, s.session_start.getTime,
            s.session_end.getTime, s.n_events))
      } finally { q.stop(); spark.catalog.dropTempView(sink) }
    }
    val std = runBoundary(StreamingOps.sessionize(_), "bnd_std")
    val nat = runBoundary(StreamingOps.sessionizeNative(_), "bnd_nat")
    assert(std.exists(_._4 == 2L),
      s"closure form must merge the exact-gap arrival: $std")
    assert(nat === std, s"native boundary diverged: std=$std nat=$nat")
  }

  test("cross-batch within-gap regression widens the start in all forms") {
    // an event from a LATER batch that is EARLIER than the open session's
    // start, still inside the gap and the watermark: the native
    // aggregation widens window.start; the closure forms must take
    // min(start, t) so the three stay bit-identical in this envelope
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000000000L // us
    def ev(id: Long, us: Long) = { val t = new Timestamp(us / 1000)
      t.setNanos(((us % 1000000) * 1000).toInt)
      Event(id, t, 7L, "click", 0.0) }
    def run(mk: org.apache.spark.sql.Dataset[Event] =>
        org.apache.spark.sql.Dataset[Session], sink: String)
        : Set[(Long, Long, Long, Long)] = {
      val ms = MemoryStream[Event]
      val q = mk(ms.toDS()).writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try {
        ms.addData(ev(1, base), ev(2, base + 60L * 1000000))
        q.processAllAvailable()
        // 10 min BEFORE the session start, within the 30-min gap and the
        // 30-min watermark (watermark = base+60s - 30min < base-10min)
        ms.addData(ev(3, base - 600L * 1000000))
        q.processAllAvailable()
        ms.addData(ev(99, base + 100L * 3600 * 1000000)) // close sentinel
        q.processAllAvailable()
        spark.table(sink).as[Session].collect().toSet.map(
          (s: Session) => (s.user_id, s.session_start.getTime,
            s.session_end.getTime, s.n_events))
      } finally { q.stop(); spark.catalog.dropTempView(sink) }
    }
    val std = run(StreamingOps.sessionize(_), "oo_std")
    val lite = run(StreamingOps.sessionizeLite(_), "oo_lite")
    val nat = run(StreamingOps.sessionizeNative(_), "oo_nat")
    val expectStart = (base - 600L * 1000000) / 1000
    assert(std.exists(s => s._2 == expectStart && s._4 == 3L),
      s"closure form must widen the start to the late-early event: $std")
    assert(lite === std, s"lite diverged: $lite vs $std")
    assert(nat === std, s"native diverged: $nat vs $std")
  }
}
