package graft.queries

import org.apache.spark.sql.functions._

import QueryDef._

/**
 * Multimodal-column plumbing: media is modeled as opaque `binary` payloads
 * with typed metadata. The container has no image/audio codecs, so the
 * decode step is a clearly-marked deterministic FAKE
 * ([[graft.multimodal.FakeCodec]]) — what's real and tested is the
 * Spark-side plumbing: binary columns, typed Datasets, partition-parallel
 * decode via mapPartitions, schema of the extracted features.
 */
object MultimodalQueries {

  val defs: Seq[QueryDef] = Seq(

    // binary column metadata: payload byte stats per source
    dialect("m01_binary_meta",
      """SELECT source, count(*) AS n,
        |       CAST(sum(octet_length(CAST(text AS BINARY))) AS BIGINT) AS total_bytes,
        |       CAST(max(octet_length(CAST(text AS BINARY))) AS BIGINT) AS max_bytes
        |FROM documents GROUP BY source""".stripMargin,
      """SELECT source, count(*) AS n,
        |       CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
        |       CAST(max(octet_length(encode(text))) AS BIGINT) AS max_bytes
        |FROM documents GROUP BY source""".stripMargin),

    // typed decode pipeline: binary payload -> fake-decoded image metadata
    // + deterministic frame sampling, distributed via mapPartitions
    QueryDef("m02_decode_features",
      (spark, sfDir) => {
        views(spark, sfDir)
        import spark.implicits._
        val payloads = spark.table("documents")
          .select(col("doc_id"), col("source"),
            col("text").cast("binary").as("payload"))
          .as[graft.multimodal.MediaPayload]
        graft.multimodal.FakeCodec.decodeFeatures(payloads).toDF()
      },
      // the fake decode is pure byte arithmetic, so an oracle CAN re-derive
      // it: width/height from the first two bytes, frame count from length,
      // checksum over a stride-16 byte sample
      // unnest(range(...)) in a derived table instead of a correlated
      // generate_series (DuckDB's binder rejects lateral column refs in
      // table functions)
      Some("""WITH idx AS (
        |  SELECT doc_id, text,
        |         unnest(range(0, CAST((length(text) - 1) / 16 AS BIGINT) + 1)) AS i
        |  FROM documents),
        |cs AS (
        |  SELECT doc_id,
        |         CAST(sum(ascii(substr(text, CAST(1 + i * 16 AS INT), 1))) AS BIGINT)
        |           AS sample_checksum
        |  FROM idx GROUP BY doc_id)
        |SELECT d.doc_id,
        |       CAST(ascii(substr(d.text, 1, 1)) AS BIGINT) AS width,
        |       CAST(ascii(substr(d.text, 2, 1)) AS BIGINT) AS height,
        |       CAST(length(d.text) % 7 + 1 AS BIGINT) AS n_frames,
        |       cs.sample_checksum
        |FROM documents d JOIN cs ON d.doc_id = cs.doc_id""".stripMargin)),

    // "resize" analog: fixed-size thumbnail signature — 8 bytes sampled at
    // a stride of len/8 (the downsampling access pattern of a real resize,
    // minus the codec); pure per-row projection, no shuffle at any scale
    dialect("m03_thumbnail",
      s"""SELECT doc_id, concat_ws('-', ${m03SampleSpark.mkString(", ")}) AS thumb
         |FROM documents WHERE length(text) >= 8""".stripMargin,
      s"""SELECT doc_id, ${m03SampleDuck.mkString(" || '-' || ")} AS thumb
         |FROM documents WHERE length(text) >= 8""".stripMargin),

    // frame sampling as its OWN row stream: one row per decoded "frame"
    // (the FakeCodec convention: n_frames = len % 7 + 1, frame f starts at
    // f * (len / n_frames)), each with a per-frame sample byte. The
    // explode fan-out is bounded by n_frames — the video-pipeline shape
    // where per-frame rows feed downstream feature extraction; stays
    // embarrassingly parallel (explode then no shuffle).
    dialect("m04_frame_sample",
      """SELECT doc_id, CAST(f AS BIGINT) AS frame_idx,
        |       CAST(ascii(substr(text,
        |         CAST(1 + f * (length(text) DIV (length(text) % 7 + 1)) AS INT),
        |         1)) AS BIGINT) AS frame_ck
        |FROM documents
        |LATERAL VIEW explode(sequence(0, length(text) % 7)) t AS f
        |WHERE length(text) >= 8""".stripMargin,
      """SELECT doc_id, CAST(f AS BIGINT) AS frame_idx,
        |       CAST(ascii(substr(text,
        |         CAST(1 + f * (length(text) // (length(text) % 7 + 1)) AS INT),
        |         1)) AS BIGINT) AS frame_ck
        |FROM (SELECT doc_id, text,
        |             unnest(range(0, length(text) % 7 + 1)) AS f
        |      FROM documents)
        |WHERE length(text) >= 8""".stripMargin)
  )

  // byte i*stride for i in 0..7, stride = len/8 (integer division)
  private lazy val m03SampleSpark = (0 until 8).map(i =>
    s"ascii(substr(text, CAST(1 + $i * (length(text) DIV 8) AS INT), 1))")
  private lazy val m03SampleDuck = (0 until 8).map(i =>
    s"CAST(ascii(substr(text, CAST(1 + $i * (length(text) // 8) AS INT), 1)) AS VARCHAR)")
}
