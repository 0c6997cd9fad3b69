package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed per-partition in batches.
  *
  * The actual byte decoders (JPEG/PNG/audio codecs) are NOT on this
  * classpath, so `decodeStub` is a clearly-marked deterministic fake — the
  * Spark-side contract (schema, partitioning, batch shape, per-partition
  * iteration mirroring a Pandas-UDF/mapInPandas deployment) is real and
  * tested. Swapping in a real decoder changes only the function body.
  */
object Multimodal {

  /** Typed media row: payload + metadata travel together; metadata stays
    * columnar-prunable because Spark maps case-class fields to columns.
    */
  case class MediaRow(
      media_id: Long,
      kind: String,             // "image" | "audio" | "video"
      payload: Array[Byte],
      format: String,
      width: Int,
      height: Int)

  case class MediaFeatures(
      media_id: Long,
      kind: String,
      byte_len: Long,
      // STUB output: stands in for decoded-pixel / spectrogram features
      features: Array[Float])

  case class Frame(
      media_id: Long,
      frame_idx: Int,
      frame_payload: Array[Byte])

  /** Build a media table from any binary payload column. */
  def mediaTable(df: DataFrame, idCol: String, payloadCol: String,
      kind: String, format: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(kind).as("kind"),
      col(payloadCol).cast("binary").as("payload"),
      lit(format).as("format"),
      lit(0).as("width"), lit(0).as("height"))
      .as[MediaRow]
  }

  /** ==== STUB ====
    * Deterministic fake "decode + feature extract": real deployments run a
    * vectorized decode per batch here (mapInPandas / JNI codec). The fake
    * derives `dim` floats from a rolling hash of the payload so tests have
    * stable expectations.
    */
  def fakeDecode(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < payload.length) {
      h ^= (payload(i) & 0xffL); h *= 0x100000001b3L
      out(i % dim) += ((h >>> 32).toInt % 1000) / 1000.0f
      i += 1
    }
    out
  }

  /** Per-partition batched decode — the mapInPandas shape: one iterator in,
    * one iterator out, nothing materialized per partition beyond the batch.
    */
  def decodeStub(media: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        MediaFeatures(m.media_id, m.kind,
          if (m.payload == null) 0L else m.payload.length.toLong,
          fakeDecode(if (m.payload == null) Array.emptyByteArray else m.payload, dim))
      }
    }
  }

  /** Frame sampling for "video" payloads: every `stride`-th chunk of
    * `frameSize` bytes becomes a frame row (explode pattern; real codecs
    * replace the chunking, the fan-out shape is identical).
    */
  def sampleFrames(media: Dataset[MediaRow], frameSize: Int = 64,
      stride: Int = 2): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { m =>
      val p = if (m.payload == null) Array.emptyByteArray else m.payload
      val nFrames = math.max(p.length / frameSize, 0)
      (0 until nFrames by stride).map { i =>
        Frame(m.media_id, i, p.slice(i * frameSize, (i + 1) * frameSize))
      }
    }
  }

  /** Resize stub: metadata-only transform (dimensions change, payload is
    * re-stamped deterministically).
    */
  def resizeStub(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map(m => m.copy(width = w, height = h))
  }
}
