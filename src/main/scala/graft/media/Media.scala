package graft.media

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing for a training-data pipeline: image/audio/
  * video payloads ride as opaque `binary` columns with typed metadata, and
  * decode / feature-extraction / resize / frame-sampling run as typed
  * batch transforms over `mapPartitions` (the Scala analogue of a Pandas
  * UDF over mapInPandas: one partition = one batch of rows through a
  * vectorised kernel).
  *
  * The actual codec step is STUBBED (no image/audio libraries in this
  * container): `decodeStub` derives deterministic pseudo-metadata and
  * pseudo-features from the bytes (first-bytes hash), so the Spark-side
  * contract — schema, batch shape, partitioning, null handling — is real
  * and tested, and a production codec drops into `MediaCodec` unchanged.
  */
object Media {

  /** The typed row for decoded media metadata + features. */
  case class MediaFeatures(
      media_id: Long,
      kind: String,          // "image" | "audio" | "video"
      n_bytes: Long,
      width: Int,            // pixels (image/video) or 0
      height: Int,
      sample_rate: Int,      // Hz (audio) or 0
      n_frames: Int,         // video frames / audio windows sampled
      feature: Array[Float]) // fixed-width feature vector

  val FeatureDim = 16

  /** Codec seam: swap for a real implementation (JNI ffmpeg, javacv, ...)
    * on a cluster with the native libs installed. */
  trait MediaCodec extends Serializable {
    def decode(kind: String, bytes: Array[Byte]): (Int, Int, Int, Int) // w, h, rate, frames
    def features(bytes: Array[Byte], dim: Int): Array[Float]
  }

  /** Deterministic stand-in codec. Metadata derives from the first 60 bits
    * of md5(uppercase-hex(payload)) — a hash both Spark SQL and the DuckDB
    * oracle can recompute (`md5(hex(payload))`), so the m_media_features
    * driver query verifies end-to-end; features use a splitmix64 sample
    * walk (not oracled). */
  object StubCodec extends MediaCodec {
    private def mix(bytes: Array[Byte], salt: Long): Long = {
      var h = salt
      var i = 0
      while (i < bytes.length) {
        h = graft.io.Corpus.splitmix64(h ^ (bytes(i) & 0xffL) ^ (i.toLong << 32))
        i += math.max(1, bytes.length / 64) // sample up to ~64 positions
      }
      h
    }
    /** First 15 hex digits (60 bits) of md5 of the uppercase hex rendering:
      * positive in a signed 64-bit lane on both engines. */
    def md5Meta(bytes: Array[Byte]): Long = {
      val hex = bytes.map(b => f"$b%02X").mkString
      val md = java.security.MessageDigest.getInstance("MD5")
      val digest = md.digest(hex.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(digest.substring(0, 15), 16)
    }
    override def decode(kind: String, bytes: Array[Byte]): (Int, Int, Int, Int) = {
      val h = md5Meta(bytes)
      kind match {
        case "image" => (64 + ((h & 0x3ff).toInt), 64 + (((h >>> 10) & 0x3ff).toInt), 0, 1)
        case "audio" => (0, 0, 8000 + (((h >>> 20) & 0x7fff).toInt), 1 + (((h >>> 36) & 0xff).toInt))
        case _       => (320 + ((h & 0x3ff).toInt), 240 + (((h >>> 10) & 0x3ff).toInt), 0,
                          1 + (((h >>> 20) & 0x3ff).toInt))
      }
    }
    override def features(bytes: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var i = 0
      while (i < dim) {
        out(i) = ((mix(bytes, i.toLong * 0x9E37L) >>> 11).toDouble / (1L << 53).toDouble).toFloat
        i += 1
      }
      out
    }
  }

  /** Batch decode + feature extraction: (media_id, kind, payload) →
    * MediaFeatures. Runs partition-at-a-time; null payloads are dropped
    * (recorded upstream by the caller's quality gate). */
  def extractFeatures(media: DataFrame, codec: MediaCodec = StubCodec): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("kind").cast("string"),
        col("payload").cast("binary"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.collect { case (id, kind, bytes) if bytes != null =>
          val (w, h, rate, frames) = codec.decode(kind, bytes)
          MediaFeatures(id, kind, bytes.length.toLong, w, h, rate, frames,
            codec.features(bytes, FeatureDim))
        }
      }
  }

  /** Frame sampling plan for video rows: every `stride`-th frame up to
    * `maxFrames`, as (media_id, frame_index) — the shuffle-friendly shape
    * for a downstream per-frame decode. */
  def sampleFrames(features: Dataset[MediaFeatures], stride: Int, maxFrames: Int): DataFrame = {
    val spark = features.sparkSession
    import spark.implicits._
    features.filter(_.kind == "video")
      .flatMap(f => (0 until f.n_frames by stride).take(maxFrames).map(i => (f.media_id, i)))
      .toDF("media_id", "frame_index")
  }

  /** Resize plan: target box (maxW, maxH) preserving aspect ratio —
    * pure-metadata computation (the pixel op lives behind MediaCodec). */
  def resizePlan(features: Dataset[MediaFeatures], maxW: Int, maxH: Int): DataFrame = {
    val spark = features.sparkSession
    import spark.implicits._
    features.filter(f => f.kind != "audio" && f.width > 0 && f.height > 0)
      .map { f =>
        val scale = math.min(1.0, math.min(maxW.toDouble / f.width, maxH.toDouble / f.height))
        (f.media_id, f.width, f.height,
          math.max(1, math.round(f.width * scale).toInt),
          math.max(1, math.round(f.height * scale).toInt))
      }
      .toDF("media_id", "width", "height", "target_width", "target_height")
  }

  /** Deterministic synthetic media table for tests/benchmarks: payload
    * bytes derive from (seed, id); kind cycles image/audio/video. */
  def syntheticMedia(spark: org.apache.spark.sql.SparkSession, n: Long, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    spark.range(0, n).map { i =>
      val kind = (i % 3) match { case 0 => "image"; case 1 => "audio"; case _ => "video" }
      val len = 256 + (graft.io.Corpus.splitmix64(seed ^ i) & 0x3ff).toInt
      val bytes = new Array[Byte](len)
      var j = 0
      var h = graft.io.Corpus.splitmix64(seed + i)
      while (j < len) {
        h = graft.io.Corpus.splitmix64(h)
        bytes(j) = (h & 0xff).toByte
        j += 1
      }
      (i, kind, bytes)
    }.toDF("media_id", "kind", "payload")
  }
}
