package graft.multimodal

import org.apache.spark.sql.Dataset

/** An opaque media payload: the storage model for multimodal columns —
 *  binary blob + typed identity/metadata columns. */
case class MediaPayload(doc_id: Long, source: String, payload: Array[Byte])

/** Features "decoded" from a payload. */
case class MediaFeatures(
    doc_id: Long,
    width: Long,
    height: Long,
    n_frames: Long,
    sample_checksum: Long)

/**
 * STUB CODEC — the container ships no image/audio/video libraries, so the
 * decode is a deterministic fake over raw bytes (header bytes → dimensions,
 * length → frame count, stride-16 byte sample → checksum). In production
 * this is where an actual codec (libjpeg/ffmpeg bindings) plugs in; the
 * surrounding Spark plumbing — typed `Dataset`, per-partition batch decode,
 * fixed output schema — is the real, tested part and is exactly what a
 * 100 TB media pipeline needs (decode parallelism = partition count, no
 * driver involvement, constant memory per task).
 */
object FakeCodec {

  def decodeHeader(payload: Array[Byte]): (Long, Long, Long) = {
    val width = if (payload.length > 0) payload(0) & 0xffL else 0L
    val height = if (payload.length > 1) payload(1) & 0xffL else 0L
    val nFrames = payload.length % 7 + 1L
    (width, height, nFrames)
  }

  /** Deterministic "frame sampling": one byte every 16, summed. */
  def sampleChecksum(payload: Array[Byte]): Long = {
    var i = 0
    var sum = 0L
    while (i < payload.length) {
      sum += payload(i) & 0xffL
      i += 16
    }
    sum
  }

  /** Partition-parallel decode: the shape of a real media feature-extract
   *  stage (batched per partition, no shuffle). */
  def decodeFeatures(ds: Dataset[MediaPayload]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { m =>
        val (w, h, f) = decodeHeader(m.payload)
        MediaFeatures(m.doc_id, w, h, f, sampleChecksum(m.payload))
      }
    }
  }
}
