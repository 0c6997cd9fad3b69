package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
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

  // --- perceptual-hash near-duplicates (dHash over the stubbed decode) ----

  /** ==== STUB decode for the perceptual hash ====
    * The 65-"pixel" grayscale probe is derived from the payload's SHA-256
    * hex digest (byte `(5i+1) mod 32` of the digest is pixel `i` — stride
    * 5 is coprime to 32 so all digest bytes are used), because no image
    * codec exists on this classpath. A REAL deployment replaces only this
    * function with downsampled luma from the decoded image; the dHash
    * gradient bits, the band join, and the hamming verification below are
    * the production operator unchanged. Digest-derived pixels also make
    * the whole operator exactly replayable by any engine with sha256.
    */
  private def stubPixels(payload: Column): IndexedSeq[Column] = {
    val dh = sha2(payload.cast("binary"), 256) // 64 lowercase hex chars
    def hexPair(bytePos: Int): Column =
      conv(dh.substr(bytePos * 2 + 1, 2), 16, 10).cast("int")
    (0 to 64).map(i => hexPair((i * 5 + 1) % 32))
  }

  /** The four 16-bit dHash bands of a payload: dHash (public technique)
    * sets bit b iff pixel(b) > pixel(b+1); band q packs bits 16q..16q+15.
    * Band values never exceed 2^16, so no engine hits signed-shift
    * overflow replaying them. Pure static projection — stays inside
    * whole-stage codegen, no UDF, no HOF lambda.
    */
  def dhashBands(payload: Column): IndexedSeq[Column] = {
    val pix = stubPixels(payload)
    (0 until 4).map { q =>
      (0 until 16).map { j =>
        val b = 16 * q + j
        when(pix(b) > pix(b + 1), lit(1 << j)).otherwise(lit(0))
      }.reduce(_ + _)
    }
  }

  /** Perceptual-hash near-duplicate pairs over media payloads — the
    * image analog of SimHash text dedup. Candidates come from 4×16-bit
    * band equality (pigeonhole-complete for hamming <= 3 when any of the
    * 4 bands must match); every candidate is verified by the exact
    * hamming distance over the four band values.
    *
    * Scale shape (the SimHash discipline exactly): signature build is a
    * per-row projection; the self-join exchange carries
    * (band, 16-bit value, id, 4 band ints) only — payloads never shuffle;
    * bucketing by band value bounds the candidate fan-out.
    */
  def phashPairs(media: DataFrame, idCol: String, payloadCol: String,
      maxHamming: Int = 3, maxBucket: Long = 2000): DataFrame = {
    val bands = dhashBands(col("__p"))
    val sigs = DataOps.parallelismFloor(
        media.select(col(idCol).as("id"), col(payloadCol).as("__p")))
      .select(col("id") +: (0 until 4).map(q => bands(q).as(s"b$q")): _*)
      .localCheckpoint(true) // feeds BOTH sides of the band self-join
    val banded = sigs.select(col("id"), col("b0"), col("b1"), col("b2"), col("b3"),
      explode(array((0 until 4).map(q =>
        struct(lit(q).as("band"), col(s"b$q").as("h"))): _*)).as("__bh"))
      .select(col("id"), col("b0"), col("b1"), col("b2"), col("b3"),
        col("__bh.band").as("band"), col("__bh.h").as("h"))
      // Skew guard (the simhash/minhash discipline): a 16-bit band value
      // shared by b images fans the self-join out b² — low-entropy media
      // (solid frames, boilerplate thumbnails) would otherwise go
      // quadratic. One window pass over (band, h); the cap never binds on
      // a diverse library, so the all-pairs oracle stays exact.
      .withColumn("__bn", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("band", "h")))
      .where(col("__bn") >= 2 && col("__bn") <= maxBucket)
      .drop("__bn")
    val l = banded.select(col("band"), col("h"), col("id").as("id_a"),
      col("b0").as("a0"), col("b1").as("a1"), col("b2").as("a2"), col("b3").as("a3"))
    val r = banded.select(col("band"), col("h"), col("id").as("id_b"),
      col("b0").as("c0"), col("b1").as("c1"), col("b2").as("c2"), col("b3").as("c3"))
    l.join(r, Seq("band", "h"))
      .where(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming",
        (0 until 4).map(q => bit_count(col(s"a$q").bitwiseXOR(col(s"c$q"))))
          .reduce(_ + _).cast("long"))
      .where(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  // --- audio frame features (stub decode over the payload bytes) ----------

  /** One analysis frame of a stub-decoded audio payload: exact integer
    * sufficient statistics (centered sample sum, energy, zero crossings)
    * plus the one derived float (RMS — IEEE sqrt of exact integers, so
    * engines agree without rounding).
    */
  case class AudioFrame(
      media_id: Long,
      frame_idx: Int,
      n_samples: Int,
      sum_c: Long,       // sum of centered samples (byte - 128)
      energy: Long,      // sum of squared centered samples
      zero_crossings: Long,
      rms: Double)

  /** ==== STUB decode ====
    * Frame-level audio features — RMS energy and zero-crossing rate, the
    * first two features of any audio-quality / silence-trim pass. No
    * audio codec exists on this classpath, so the "decode" treats the
    * payload bytes THEMSELVES as unsigned 8-bit PCM centered at 128
    * (deterministic, and exactly replayable by any engine that can read
    * the same bytes); a real deployment swaps only the byte→sample step.
    *
    * Runs in the mapPartitions batch shape (the mapInPandas contract):
    * one iterator in, one out, one frame row per full `frameSize` window
    * — the trailing partial window is dropped, as annotated. Per-frame
    * state is three longs, so a partition streams regardless of payload
    * sizes.
    */
  def audioFrames(media: Dataset[MediaRow], frameSize: Int = 256): Dataset[AudioFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { m =>
        val p = if (m.payload == null) Array.emptyByteArray else m.payload
        val nFrames = p.length / frameSize
        (0 until nFrames).iterator.map { f =>
          var i = f * frameSize
          val end = i + frameSize
          var sum = 0L; var energy = 0L; var zc = 0L
          var prev = 0
          while (i < end) {
            val s = (p(i) & 0xff) - 128
            sum += s
            energy += s.toLong * s
            // adjacent-pair strict sign change (a zero sample breaks the
            // crossing) — the definition the oracle replays verbatim
            if (i > f * frameSize && s.toLong * prev < 0) zc += 1
            prev = s
            i += 1
          }
          AudioFrame(m.media_id, f, frameSize, sum, energy, zc,
            math.sqrt(energy.toDouble / frameSize))
        }
      }
    }
  }
}
