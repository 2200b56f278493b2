package graft.queries

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.streaming.StreamingOps

/**
 * Oracle-gated registry entries for the DETERMINISTIC streaming operators
 * (graft.streaming.StreamingOps): each one runs as a REAL Structured
 * Streaming query — file-source read of the fixture parquet → the
 * operator → a memory sink drained to completion — and its output is
 * hash-compared against the same DuckDB SQL that gates the batch analog.
 * This closes the gap the suite-only streaming tests left: a change that
 * breaks stream/batch parity now fails the external correctness gate,
 * not just `sbt test`.
 *
 * Only operators whose output is a pure function of the input SET are
 * gated here (fingerprints, band keys, shard/IVF/sample assignment, the
 * repetition gate, and pack assignment — which is arrival-ordered in
 * general but reproduces the batch layout exactly when the whole fixture
 * arrives as one file = one micro-batch, StreamingOps.packAssign's
 * documented contract). Event-time operators whose output depends on
 * watermark progress (hourlyRollup, sessionize, dedupExact,
 * intervalJoin) stay suite-gated: in append mode their final windows
 * only emit on watermark advancement, which a drain-to-completion batch
 * run can't trigger deterministically.
 *
 * Scale note: drains write through the parquet FILE sink (the production
 * shape — output stays distributed; the memory sink's driver-side collect
 * hit `spark.driver.maxResultSize` on the round-12 sf100 probe) and the
 * returned frame reads the sink directory back via its metadata log.
 */
object StreamingQueries {

  private val sinkId = new AtomicLong(0L)

  /** Stateful-shuffle bound for gate drains (see drain()). */
  private val StreamShufflePartitions = 8

  /** Runs `op` over a file-streaming read of `table`, drains every
    * available micro-batch into a parquet file sink, stops the query, and
    * returns a frame over the sink (one fixture file ⇒ one micro-batch). */
  private def runStream(spark: SparkSession, sfDir: String, table: String)(
      op: DataFrame => DataFrame): DataFrame = {
    val path = s"$sfDir/$table.parquet"
    val schema = spark.read.parquet(path).schema
    // The file stream source requires a DIRECTORY. Driver fixtures write
    // each table as a single FILE (stream the parent dir, glob-filtered to
    // the table's file name — pathGlobFilter matches LEAF names only);
    // Spark-written fixtures (ScaleFixtures) write a DIRECTORY of part
    // files (stream it directly — the leaf-only glob would match nothing
    // and silently yield an empty stream).
    val src =
      if (new java.io.File(path).isDirectory)
        spark.readStream.schema(schema).parquet(path)
      else
        spark.readStream.schema(schema)
          .option("pathGlobFilter", s"$table.parquet").parquet(sfDir)
    drain(spark, op(src))
  }

  /** Starts `streamed` (a plan over one or more readStream sources),
    * drains to completion — including the no-data micro-batch that fires
    * event-time timeouts and append-mode window emission after the final
    * watermark advance — and returns the sink contents.
    *
    * Concurrency caveat: the drain temporarily rewrites the SESSION-global
    * `spark.sql.shuffle.partitions` (and restores it after). Any batch
    * query planned on the same session while a drain is in flight would
    * silently plan with the capped value, and two overlapping drains would
    * race the save/restore. The gate harness runs queries strictly
    * sequentially, so this is safe there; a caller that runs drains
    * concurrently with other work must pass a dedicated session (the
    * streamed plan is bound to its own session, so a `newSession()` clone
    * must be used from plan construction onward, not just here). */
  private def drain(spark: SparkSession, streamed: DataFrame): DataFrame = {
    val name = s"graft_stream_sink_${sinkId.incrementAndGet()}"
    // Stateful streaming cost at gate scale is dominated by per-partition
    // state-store COMMITS (delta + snapshot per partition per micro-batch;
    // a stream-stream join keeps two stores per partition), not by data
    // volume — at 32 shuffle partitions the interval join pays 64 store
    // commits per batch (measured: v10 at sf1 9.5 s -> 3.7 s at 8).
    // Bound the stateful shuffle for the drain and restore after; a
    // production deployment sizes this to sustained throughput instead.
    // The streaming query pins the value from the session conf at start
    // (OffsetSeqMetadata), so restoring after stop() cannot race batch 0.
    val partKey = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(partKey)
    spark.conf.set(partKey,
      math.min(before.toInt, StreamShufflePartitions).toString)
    // FILE sink, not the memory sink: the memory sink collects every
    // output row onto the driver, which is fine at gate scale but dies on
    // spark.driver.maxResultSize at bench scale (the round-12 sf100 probe:
    // v09's ~1.8 GiB of sessions). The parquet sink is the production
    // shape — output stays distributed, the returned frame reads it back
    // through the sink's own metadata log (exactly-once file listing).
    val dir = java.nio.file.Files.createTempDirectory("graft_drain_")
    drainDirs.add(dir)
    val outPath = dir.resolve("out").toString
    try {
      val query = streamed.writeStream.format("parquet")
        .option("path", outPath)
        .option("checkpointLocation", dir.resolve("ckpt").toString)
        .queryName(name).outputMode("append").start()
      try query.processAllAvailable()
      finally query.stop()
    } finally spark.conf.set(partKey, before)
    // Explicit schema: a zero-row drain leaves no parquet footer to infer
    // from, and the sink never reorders or renames columns.
    spark.read.schema(streamed.schema).parquet(outPath)
  }

  /** Every drain's temp dir, deleted at JVM exit (a returned frame stays
    * readable for the whole run — callers may re-scan it, so eager
    * per-drain deletion is not safe). */
  private val drainDirs =
    java.util.Collections.synchronizedList(
      new java.util.ArrayList[java.nio.file.Path]())
  Runtime.getRuntime.addShutdownHook(new Thread(() =>
    drainDirs.forEach { d =>
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(d.toFile)
    }))

  /** Sentinel suffix on `event_type` marking the watermark-advancing row;
    * every gated query filters it (or its effects) back out. */
  private val Sentinel = "__graft_sentinel"

  /** The `events` fixture as a STREAMABLE directory: ts converted from
    * raw nanos to a real timestamp (the batch `loadTables` convention,
    * exact integer division) plus ONE far-future sentinel event (+4 h,
    * user_id/event_id −1). The sentinel is what makes event-time
    * operators gateable at all: append-mode windowed aggregates and
    * event-time timeouts only EMIT once the watermark passes them, and a
    * drain-to-completion run of the bare fixture ends with its final
    * windows still open. The sentinel advances the global watermark past
    * every real window/gap/session, so the drained output is the
    * operator's complete answer — comparable row-for-row to the batch
    * oracle. Written once per (session, sfDir).
    *
    * Parallel write (r14, VERDICT r13 #6): the fixture used to be
    * `coalesce(1)` — a single-threaded write of the whole events table,
    * which at sf100 (~400M rows) dominated v08's wall and made the
    * family read as super-linear (30× for 10× events). All files are
    * still consumed in ONE micro-batch (no maxFilesPerTrigger is set, so
    * the source takes every available file at trigger 0), and batch-0
    * arrival order is irrelevant to every gated operator: watermarks
    * advance AFTER the batch, windows/sessions/dedup are event-time- or
    * set-gated, so multi-file arrival is observationally identical to
    * the old single file. Spark's partial aggregation already bounds
    * per-batch state updates to one per touched (window, type) key, so
    * the stateful side needs no pre-aggregation beyond what the plan
    * does. */
  private val evDirs = scala.collection.concurrent.TrieMap[String, String]()
  private def eventStreamDir(spark: SparkSession, sfDir: String): String =
    evDirs.getOrElseUpdate(s"${spark.hashCode}:$sfDir", {
      import org.apache.spark.sql.functions._
      val raw = graft.GraftSession
        .normalizeTs(spark.read.parquet(s"$sfDir/events.parquet"))
        .select("event_id", "ts", "user_id", "event_type", "value")
      val maxTs = raw.agg(max("ts")).head.getTimestamp(0)
      val sentinel = spark.range(1).select(
        lit(-1L).as("event_id"),
        lit(new java.sql.Timestamp(maxTs.getTime + 4L * 3600 * 1000)).as("ts"),
        lit(-1L).as("user_id"),
        lit(Sentinel).as("event_type"),
        lit(0.0).as("value"))
      val dir = java.nio.file.Files
        .createTempDirectory("graft_evstream_").toFile
      dir.deleteOnExit()
      // size the file count to the data (1 file per ~64 MB of estimated
      // input, max 32): tiny gate fixtures keep their single
      // deterministic file, decade fixtures write and scan in parallel
      val estBytes = raw.queryExecution.optimizedPlan.stats.sizeInBytes
      val files = math.max(1L, math.min(32L,
        (estBytes / (64L * 1024 * 1024)).toLong)).toInt
      raw.unionByName(sentinel).repartition(files)
        .write.mode("overwrite").parquet(dir.getAbsolutePath)
      dir.getAbsolutePath
    })

  private def dirStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(dir).schema
    spark.readStream.schema(schema).parquet(dir)
  }

  val defs: Seq[QueryDef] = Seq(

    // d05's fingerprint, computed in-row at ingest (StreamingOps.simhash)
    QueryDef("v01_stream_simhash",
      (spark, sfDir) => runStream(spark, sfDir, "documents")(
        StreamingOps.simhash(_).select("doc_id", "simhash")),
      Some(DedupQueries.defs.find(_.name == "d05_simhash").get.oracle.get)),

    // d04's (band, sig) keys, computed in-row at ingest
    QueryDef("v02_stream_minhash_bands",
      (spark, sfDir) => runStream(spark, sfDir, "documents")(
        StreamingOps.minhashBands(_)
          .selectExpr("doc_id", "CAST(band AS BIGINT) AS band", "sig")),
      Some(s"""WITH ${DedupQueries.duckMinhashCtes}
         |SELECT doc_id, CAST(band AS BIGINT) AS band, sig
         |FROM bands""".stripMargin)),

    // p03's deterministic shard assignment as a stateless stream map
    QueryDef("v03_stream_shard_assign",
      (spark, sfDir) => runStream(spark, sfDir, "documents")(
        StreamingOps.shardAssign(_).select("doc_id", "shard")),
      Some("""SELECT doc_id,
         |       CAST('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 32 AS shard
         |FROM documents""".stripMargin)),

    // s05's IVF cell routing against a static broadcast centroid table
    QueryDef("v04_stream_ivf_assign",
      (spark, sfDir) => {
        val cents = spark.read.parquet(s"$sfDir/embeddings.parquet")
          .where("vec_id < 16")
          .selectExpr("vec_id AS cid", "CAST(embedding AS ARRAY<DOUBLE>) AS cv")
          .cache()
        cents.count() // materialize: static side of a stream-static join
        try runStream(spark, sfDir, "embeddings")(
          StreamingOps.ivfAssign(_, cents)
            .selectExpr("vec_id", "CAST(cid AS BIGINT) AS cid"))
        finally cents.unpersist()
      },
      Some(s"""WITH e AS (${SimilarityQueries.duckNormalized}),
         |${SimilarityQueries.duckCents},
         |${SimilarityQueries.duckSimsArr}
         |SELECT vec_id, CAST((list_aggregate(sa, 'max')).cid AS BIGINT) AS cid
         |FROM simsarr""".stripMargin)),

    // t06's repetition gate, computed in-row (sorted-run max) at ingest
    QueryDef("v05_stream_repetition_gate",
      (spark, sfDir) => runStream(spark, sfDir, "documents")(
        StreamingOps.repetitionGate(_)
          .select("doc_id", "top_word_frac", "dup_2gram_frac", "keep")),
      Some(s"""WITH ${TextQueries.duckGramsRep},
         |top AS (
         |  SELECT doc_id, max(cnt) AS top_cnt FROM (
         |    SELECT doc_id, tok, count(*) AS cnt
         |    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
         |          FROM documents) e
         |    GROUP BY doc_id, tok) c
         |  GROUP BY doc_id)
         |SELECT r.doc_id,
         |       CAST(t.top_cnt AS DOUBLE) / r.n_tok AS top_word_frac,
         |       r.dup_2gram_frac,
         |       (CAST(t.top_cnt AS DOUBLE) / r.n_tok <= CAST(${TextQueries.TopWordFracMax} AS DOUBLE)
         |        AND r.dup_2gram_frac <= CAST(${TextQueries.DupGramFracMax} AS DOUBLE)) AS keep
         |FROM grm r JOIN top t ON r.doc_id = t.doc_id""".stripMargin)),

    // t05's deterministic per-source hash sampling at ingest
    QueryDef("v06_stream_hash_sample",
      (spark, sfDir) => runStream(spark, sfDir, "documents") { docs =>
        StreamingOps.hashSample(docs, org.apache.spark.sql.functions.expr(
          """CASE WHEN source IN ('src0', 'src4', 'src8', 'src12', 'src16') THEN 80
            |     WHEN source IN ('src1', 'src5', 'src9', 'src13', 'src17') THEN 50
            |     ELSE 20 END""".stripMargin))
          .select("source", "doc_id")
      },
      Some("""SELECT source, doc_id FROM (
         |  SELECT doc_id, source,
         |         CASE WHEN source IN ('src0', 'src4', 'src8', 'src12', 'src16') THEN 80
         |              WHEN source IN ('src1', 'src5', 'src9', 'src13', 'src17') THEN 50
         |              ELSE 20 END AS rate_pct,
         |         CAST('0x' || substr(md5('smp:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100 AS bucket
         |  FROM documents) r
         |WHERE bucket < rate_pct""".stripMargin)),

    // p06's running-offset chunk assignment in keyed state — the one
    // STATEFUL op gated here: with the fixture arriving as a single
    // micro-batch, packAssign's in-batch doc_id ordering reproduces the
    // batch p06 layout exactly (its documented replay contract)
    QueryDef("v07_stream_pack_assign",
      (spark, sfDir) => runStream(spark, sfDir, "documents")(docs =>
        StreamingOps.packAssign(
          docs.selectExpr("source", "doc_id",
            "size(split(text, ' ')) AS n_tok")).toDF()),
      Some("""WITH tok AS (
         |  SELECT source, doc_id, len(string_split(text, ' ')) AS n_tok
         |  FROM documents),
         |off AS (
         |  SELECT source, doc_id,
         |         coalesce(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off0
         |  FROM tok)
         |SELECT source, doc_id, CAST(off0 // 512 AS BIGINT) AS chunk_id
         |FROM off""".stripMargin)),

    // ---- event-time operators (v08–v11): gated through the sentinel
    // fixture (eventStreamDir) — the watermark-advancing row is what
    // lets append-mode windows, session timeouts, and dedup state fully
    // EMIT in a drain-to-completion run, closing the "suite-only" gap
    // the r07 verdict flagged for exactly these four ops.

    // q24's hourly window aggregate, computed by the watermarked
    // streaming rollup. The sentinel's own window stays OPEN (the
    // watermark never passes it) and its type is filtered for safety.
    QueryDef("v08_stream_hourly_rollup",
      (spark, sfDir) => drain(spark, StreamingOps.hourlyRollup(
          dirStream(spark, eventStreamDir(spark, sfDir))))
        .where(s"event_type <> '$Sentinel'"),
      RelationalQueries.defs.find(_.name == "q24_events_hourly").get.oracle),

    // q25's gap sessionization via flatMapGroupsWithState with
    // event-time timeouts: the sentinel advances the watermark past
    // every user's last+gap, so ALL sessions close and the per-user
    // session counts equal the batch window-function oracle. Runs the
    // primitive-state sessionizeLite form — bit-identical decisions,
    // +26% rows/sec over the full-Event form (STREAMBENCH_r11: the
    // stateful shuffle carries 2 columns instead of 5 and skips the
    // per-row string decode).
    QueryDef("v09_stream_sessionize",
      (spark, sfDir) => {
        import spark.implicits._
        val sessions = drain(spark, StreamingOps.sessionizeLite(
          dirStream(spark, eventStreamDir(spark, sfDir))
            .select("event_id", "ts", "user_id", "event_type", "value")
            .as[graft.streaming.Event], gapSeconds = 1800,
          watermark = "30 minutes").toDF())
        sessions.where("user_id >= 0").groupBy("user_id")
          .agg(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n_sessions"))
      },
      RelationalQueries.defs.find(_.name == "q25_events_sessionize").get.oracle),

    // Stream-stream interval join (click → purchase attribution within
    // 10 min). Inner-join matches emit eagerly; the sentinel (filtered
    // out by the type predicates before it reaches either side) is not
    // needed for emission, only for state cleanup — included via the
    // shared fixture anyway.
    QueryDef("v10_stream_interval_join",
      (spark, sfDir) => {
        val dir = eventStreamDir(spark, sfDir)
        val out = drain(spark, StreamingOps.intervalJoin(
          dirStream(spark, dir).where("event_type = 'click'"),
          dirStream(spark, dir).where("event_type = 'purchase'")))
        out.selectExpr("user_id", "l_event_id", "r_event_id",
          "unix_micros(l_ts) AS l_us", "unix_micros(r_ts) AS r_us")
      },
      Some("""SELECT l.user_id, l.event_id AS l_event_id,
         |       r.event_id AS r_event_id,
         |       epoch_us(l.ts) AS l_us, epoch_us(r.ts) AS r_us
         |FROM events l JOIN events r
         |  ON l.user_id = r.user_id
         | AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 600 SECOND
         |WHERE l.event_type = 'click'
         |  AND r.event_type = 'purchase'""".stripMargin)),

    // Watermarked exact dedup (dropDuplicatesWithinWatermark). WHICH
    // duplicate survives is arrival-order-dependent, so the gated
    // projection is the content-hash SET — one row per distinct hash,
    // no duplicate emitted twice, no hash dropped.
    QueryDef("v11_stream_dedup_exact",
      (spark, sfDir) => runStream(spark, sfDir, "documents")(docs =>
        StreamingOps.dedupExact(docs.withColumn("ts",
          // offset: a row AT the initial watermark (epoch 0) would be
          // dropped as late before it ever reached the dedup state
          org.apache.spark.sql.functions.expr(
            "timestamp_micros(1000000000 + doc_id)"))))
        .selectExpr("md5(text) AS h"),
      Some("SELECT DISTINCT md5(text) AS h FROM documents"))
  )
}
