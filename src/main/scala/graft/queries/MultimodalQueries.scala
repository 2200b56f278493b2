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
      Some("""SELECT doc_id,
        |       CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS width,
        |       CAST(ascii(substr(text, 2, 1)) AS BIGINT) AS height,
        |       CAST(length(text) % 7 + 1 AS BIGINT) AS n_frames,
        |       CAST((SELECT sum(ascii(substr(d2.text, 1 + (s.i * 16), 1)))
        |             FROM generate_series(0, CAST((length(d2.text) - 1) / 16 AS BIGINT)) AS s(i))
        |            AS BIGINT) AS sample_checksum
        |FROM documents d2""".stripMargin))
  )
}
