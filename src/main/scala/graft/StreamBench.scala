package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.{Event, StreamingOps}

/**
 * Sustained-throughput pin for the stateful streaming operators (v08–v11).
 * The correctness gates drain the whole fixture in ~one micro-batch, which
 * hides the per-batch state-store commit cost that dominates a production
 * micro-batched deployment (the r9 finding: commit cost, not data volume,
 * priced the gate drains). This main splits the fixture into
 * SPARK_GRAFT_STREAM_BATCHES time-ranged files, streams them one file per
 * trigger, and reports per-op: batches, rows, rows/sec over the summed
 * trigger time, and state-store commit ms per batch — from
 * StreamingQueryProgress, the engine's own accounting.
 *
 * Output: a human table plus ONE machine line prefixed STREAMBENCH_JSON.
 */
object StreamBench {

  private case class OpResult(
      name: String, batches: Int, rows: Long, totalTrigMs: Long,
      addBatchMs: Long, commitMs: Long,
      stateRowsMax: Long, stateMemMax: Long, stateCurMemMax: Long) {
    def rowsPerSec: Double =
      if (totalTrigMs <= 0) 0.0 else rows * 1000.0 / totalTrigMs
    def commitPerBatch: Double =
      if (batches == 0) 0.0 else commitMs.toDouble / batches
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_STREAM_BATCHES", "20").toInt
    // SPARK_GRAFT_STREAM_KEYMULT=K scales DISTINCT STATE KEYS: the event
    // fixture is unioned K times with shifted user_ids (same time range,
    // so ~K x sessions are live at any watermark position) and the doc
    // fixture K times with salted text (K x distinct content hashes in the
    // dedup store). This is the state-SIZE axis of the store crossover —
    // rows/batch grows too (a state entry needs a row), so compare
    // rows/sec at equal K across stores, not across K.
    val keyMult = sys.env.getOrElse("SPARK_GRAFT_STREAM_KEYMULT", "1").toInt
    // SPARK_GRAFT_STREAM_UNIQUE_USERS=1 makes EVERY event its own state
    // key (user_id := event_id), so live state entries ~= streamed rows.
    // This reaches the multi-million-entry capacity boundary the
    // STREAMBENCH_r12 rule extrapolates (~5M entries/executor) with ~100x
    // fewer streamed rows than key-multiplying the natural user axis —
    // the boundary is a STATE-SIZE property, not a row-volume one.
    val uniqueUsers =
      sys.env.get("SPARK_GRAFT_STREAM_UNIQUE_USERS").contains("1")
    // optional op allowlist for the crossover matrix (substring match)
    val onlyOps: Set[String] = sys.env.get("SPARK_GRAFT_STREAM_OPS")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty)
    val spark = GraftSession.build(appName = "graft-stream-bench")
    // the gate-drain finding: per-partition state-store commits dominate
    // small batches; a sustained deployment sizes this to throughput
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    // SPARK_GRAFT_STREAM_STORE=rocksdb benches the off-heap store — the
    // 100 TB/day configuration (state out of the JVM heap, incremental
    // snapshot uploads) — against the default HDFS-backed in-memory map
    val store = sys.env.getOrElse("SPARK_GRAFT_STREAM_STORE", "default")
    if (store == "rocksdb") spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import spark.implicits._

    val tmp = Files.createTempDirectory("graft_streambench_").toFile
    tmp.deleteOnExit()
    val eventsDir = s"${tmp.getAbsolutePath}/events"
    val docsDir = s"${tmp.getAbsolutePath}/docs"
    // time-ranged files: triggers arrive in rough event-time order, so
    // watermarks advance across batches like a live ingest
    val baseEvents0 =
      GraftSession.normalizeTs(spark.read.parquet(s"$sfDir/events.parquet"))
        .select("event_id", "ts", "user_id", "event_type", "value")
    val baseEvents =
      if (!uniqueUsers) baseEvents0
      else baseEvents0.withColumn("user_id", col("event_id"))
    // the salting domains must be checked, not assumed: a user_id at or
    // past the 1e8 step would collide across copies (silently understating
    // the distinct-key axis the crossover matrix measures), and
    // `id * keyMult` on an unbounded id wraps Long
    if (keyMult > 1) {
      val mx = baseEvents.agg(max("user_id"), max("event_id")).head
      require(mx.getLong(0) < 100000000L,
        s"user_id ${mx.getLong(0)} >= 1e8 salting step: copies would collide")
      require(mx.getLong(1) <= (Long.MaxValue - keyMult) / keyMult,
        s"event_id ${mx.getLong(1)} * keyMult $keyMult would overflow Long")
    }
    val multEvents =
      if (keyMult <= 1) baseEvents
      else baseEvents
        .crossJoin(spark.range(keyMult).toDF("graft_copy"))
        .select(
          (col("event_id") * keyMult + col("graft_copy")).as("event_id"),
          col("ts"),
          (col("user_id") + col("graft_copy") * 100000000L).as("user_id"),
          col("event_type"), col("value"))
    multEvents
      .repartitionByRange(nBatches, col("ts"))
      .write.mode("overwrite").parquet(eventsDir)
    val baseDocs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    if (keyMult > 1) {
      val mxDoc = baseDocs.agg(max("doc_id")).head.getLong(0)
      require(mxDoc <= (Long.MaxValue - keyMult) / keyMult,
        s"doc_id $mxDoc * keyMult $keyMult would overflow Long")
    }
    val multDocs =
      if (keyMult <= 1) baseDocs
      else baseDocs
        .crossJoin(spark.range(keyMult).toDF("graft_copy"))
        .select(
          (col("doc_id") * keyMult + col("graft_copy")).as("doc_id"),
          concat(col("text"), lit(" #"), col("graft_copy")).as("text"))
    multDocs
      .select(col("doc_id"), col("text"),
        expr("timestamp_micros(1000000000 + doc_id)").as("ts"))
      .repartitionByRange(nBatches, col("ts"))
      .write.mode("overwrite").parquet(docsDir)
    // FileStreamSource feeds files in MODIFICATION-TIME order, which for
    // same-second part files is effectively random — stamp mtimes in range
    // order (part-0000k is the k-th time range) so triggers really do
    // arrive in event-time order and runs are comparable across rounds
    // (unordered arrival late-drops rows at the stateful ops)
    Seq(eventsDir, docsDir).foreach { d =>
      new java.io.File(d).listFiles()
        .filter(_.getName.startsWith("part-")).sortBy(_.getName)
        .zipWithIndex.foreach { case (f, i) =>
          f.setLastModified(1600000000000L + i * 60000L) }
    }

    def eventStream(): DataFrame = spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE")
      .option("maxFilesPerTrigger", "1").parquet(eventsDir)
    def docStream(): DataFrame = spark.readStream
      .schema("doc_id LONG, text STRING, ts TIMESTAMP")
      .option("maxFilesPerTrigger", "1").parquet(docsDir)

    val ops: Seq[(String, () => DataFrame)] = Seq(
      "v08_hourly_rollup" -> (() => StreamingOps.hourlyRollup(eventStream())),
      "v09_sessionize" -> (() => StreamingOps.sessionize(
        eventStream().as[Event]).toDF()),
      // primitive-state variant (same semantics, 2-column state shuffle):
      // benched side by side to price the typed-Encoder round-trip
      "v09_sessionize_lite" -> (() => StreamingOps.sessionizeLite(
        eventStream().as[Event]).toDF()),
      // built-in session_window aggregation (no per-row closure at all):
      // the fully-native candidate benched against both closure forms
      "v09_sessionize_native" -> (() => StreamingOps.sessionizeNative(
        eventStream().as[Event]).toDF()),
      "v10_interval_join" -> (() => StreamingOps.intervalJoin(
        eventStream().where("event_type = 'click'"),
        eventStream().where("event_type = 'purchase'"))),
      "v11_dedup_exact" -> (() => StreamingOps.dedupExact(docStream())))

    val results = ops
      .filter { case (name, _) =>
        onlyOps.isEmpty || onlyOps.exists(name.contains) }
      .map { case (name, mk) => run(spark, name, mk()) }

    println(f"${"op"}%-22s ${"batches"}%8s ${"rows"}%12s ${"rows/sec"}%12s ${"commit ms/batch"}%16s ${"state rows"}%12s ${"state MB"}%9s")
    results.foreach { r =>
      println(f"${r.name}%-22s ${r.batches}%8d ${r.rows}%,12d ${r.rowsPerSec}%,12.0f ${r.commitPerBatch}%16.1f ${r.stateRowsMax}%,12d ${math.max(r.stateMemMax, r.stateCurMemMax) / 1048576.0}%9.1f")
    }
    val qJson = results.map { r =>
      f""""${r.name}":{"batches":${r.batches},"rows":${r.rows},"rows_per_sec":${r.rowsPerSec}%.1f,"trig_ms":${r.totalTrigMs},"add_batch_ms":${r.addBatchMs},"commit_ms":${r.commitMs},"commit_ms_per_batch":${r.commitPerBatch}%.1f,"state_rows_max":${r.stateRowsMax},"state_mem_max":${r.stateMemMax},"state_cur_mem_max":${r.stateCurMemMax}}"""
    }.mkString(",")
    println(s"""STREAMBENCH_JSON {"sf":"$sfDir","files_per_op":$nBatches,"shuffle_partitions":8,"store":"$store","key_mult":$keyMult,"unique_users":$uniqueUsers,"ops":{$qJson}}""")
    spark.stop()
  }

  private def run(spark: SparkSession, name: String,
      streamed: DataFrame): OpResult = {
    val sink = s"graft_streambench_${name}"
    val query = streamed.writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try {
      query.processAllAvailable()
      val progress = query.recentProgress.filter(_.numInputRows > 0)
      def dur(key: String): Long = progress.map(p =>
        Option(p.durationMs.get(key)).map(_.longValue).getOrElse(0L)).sum
      OpResult(
        name,
        batches = progress.length,
        rows = progress.map(_.numInputRows).sum,
        totalTrigMs = dur("triggerExecution"),
        addBatchMs = dur("addBatch"),
        commitMs = progress.flatMap(_.stateOperators.map(_.commitTimeMs)).sum,
        // the state-SIZE axis: peak live entries and the store's own
        // memory accounting (for RocksDB this is off-heap block/memtable
        // usage; for the default store the in-heap map estimate)
        stateRowsMax = (0L +: progress.flatMap(
          _.stateOperators.map(_.numRowsTotal))).max,
        stateMemMax = (0L +: progress.flatMap(
          _.stateOperators.map(_.memoryUsedBytes))).max,
        // `memoryUsedBytes` on the default store is the size of the
        // provider's retained-VERSION cache (`loadedMaps`), which is
        // legitimately empty when no old versions are retained at metric
        // time — the earlier sf100-sequence runs reported 640 B (8
        // partitions x empty TreeMap) for half-GB state. The custom metric
        // `stateOnCurrentVersionSizeBytes` is the CURRENT committed map's
        // estimate, the number capacity planning actually needs; RocksDB
        // reports real managed memory in both.
        stateCurMemMax = (0L +: progress.flatMap(_.stateOperators.map(so =>
          Option(so.customMetrics.get("stateOnCurrentVersionSizeBytes"))
            .map(_.longValue).getOrElse(0L)))).max)
    } finally {
      query.stop()
      spark.catalog.dropTempView(sink)
    }
  }
}
