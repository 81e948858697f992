package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` + typed metadata.
  *
  * The Spark-side machinery is real — schema, partition-friendly batch
  * iteration, deterministic outputs; only the actual media decode is a
  * clearly-marked STUB (this container ships no image/audio codecs). On a
  * real cluster `decodeStub` is replaced by the codec call with the same
  * signature; nothing else changes.
  */
object Multimodal {

  final case class MediaMeta(media_id: Long, kind: String, width: Int,
      height: Int, n_frames: Int, bytes: Long)

  /** Deterministic fake "media store": derive a binary payload + metadata
    * from the documents table (text bytes stand in for encoded media). */
  def synthesize(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, lit("image"))
        .when(col("doc_id") % 3 === 1, lit("audio"))
        .otherwise(lit("video")).as("kind"),
      encode(col("text"), "UTF-8").cast("binary").as("payload"))

  /** STUB decode: a real implementation would call the image/audio codec
    * here (e.g. via JNI or a vendored pure-JVM decoder). The stub derives
    * deterministic pseudo-pixels from the payload so every downstream
    * stage (feature extraction, resize, frame sampling) is exercised with
    * stable expected values. */
  def decodeStub(payload: Array[Byte], kind: String): Array[Float] = {
    // ??? <- real codec goes here; deterministic fake below
    val n = 16
    val out = new Array[Float](n)
    var i = 0
    while (i < payload.length) {
      out(i % n) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  /** Feature extraction over media batches: binary → fixed-width feature
    * vector + metadata. `mapPartitions` so a real decoder can amortize
    * per-batch setup (model load, codec contexts) exactly like a Pandas
    * UDF batch would. */
  def extractFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select("media_id", "kind", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { batch =>
        // per-partition decoder setup would happen here
        batch.map { case (id, kind, payload) =>
          val feat = decodeStub(payload, kind)
          val norm = math.sqrt(feat.map(x => x.toDouble * x).sum)
          (id, kind, payload.length.toLong, feat, norm)
        }
      }
      .toDF("media_id", "kind", "n_bytes", "features", "feature_norm")
      .orderBy($"media_id")
  }

  /** Frame sampling for video rows: every `stride`-th 4-byte window of the
    * payload is a "frame"; real decoders substitute frame extraction with
    * the same (media_id, frame_idx, frame_bytes) output shape. */
  def sampleFrames(spark: SparkSession, media: DataFrame, stride: Int = 64, maxFrames: Int = 4): DataFrame = {
    import spark.implicits._
    media.filter(col("kind") === "video")
      .select("media_id", "payload").as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        (0 until maxFrames).iterator
          .map(f => (id, f, payload.slice(f * stride, f * stride + 4)))
          .filter(_._3.nonEmpty)
      }
      .toDF("media_id", "frame_idx", "frame_bytes")
      .orderBy($"media_id", $"frame_idx")
  }
}
