package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, batched feature extraction via mapPartitions.
  *
  * The decode step is a clearly-marked deterministic FAKE (this container
  * has no image/audio codecs); everything around it — schema, batch shape,
  * partition-parallel execution, output contract — is real and tested.
  * Swap `FakeCodec` for a JNI/FFI codec at deploy time.
  */
object Multimodal {

  /** Typed metadata carried next to the opaque payload. */
  final case class MediaMeta(kind: String, width: Int, height: Int,
                             sampleRateHz: Int, durationMs: Long)

  final case class MediaRow(id: String, meta: MediaMeta, payload: Array[Byte])

  final case class MediaFeatures(id: String, kind: String,
                                 featureDim: Int, features: Array[Float])

  /** STUB decode/feature-extract: deterministic bytes→features transform
    * standing in for a real image decoder / audio resampler. Marked fake;
    * the Spark-side contract (batch-per-partition, fixed featureDim) is the
    * real deliverable.
    */
  object FakeCodec {
    val FeatureDim = 16
    def decodeAndExtract(payload: Array[Byte]): Array[Float] = {
      val out = new Array[Float](FeatureDim)
      var i = 0
      while (i < payload.length) {
        out(i % FeatureDim) += (payload(i) & 0xFF) / 255.0f
        i += 1
      }
      val n = math.max(payload.length / FeatureDim, 1)
      var d = 0
      while (d < FeatureDim) { out(d) /= n; d += 1 }
      out
    }
  }

  /** Batched per-partition feature extraction — the Scala analogue of a
    * Pandas `mapInPandas` UDF: one codec init per partition, rows streamed
    * through it. Keeps the payload column pruned out of the result.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition codec init would go here (expensive handle, once)
      rows.map { r =>
        MediaFeatures(r.id, r.meta.kind, FakeCodec.FeatureDim,
          FakeCodec.decodeAndExtract(r.payload))
      }
    }
  }

  /** Frame sampling plan for video rows: every `everyMs` milliseconds,
    * computed from metadata only (no decode) — shows the pushdown-friendly
    * pattern: plan on metadata columns, decode only sampled frames.
    */
  def frameSamplePlan(media: DataFrame, everyMs: Long): DataFrame = {
    media.where(col("meta.kind") === "video")
      .select(col("id"), col("meta.durationMs"),
        sequence(lit(0L), col("meta.durationMs"), lit(everyMs)).as("sampleTimesMs"))
      .select(col("id"), explode(col("sampleTimesMs")).as("frameAtMs"))
  }

  /** Deterministic synthetic media table for tests (seeded bytes). */
  def synth(spark: SparkSession, n: Int = 64, seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    (0 until n).map { i =>
      val kind = Seq("image", "audio", "video")(i % 3)
      val len = 64 + (i * 37) % 192
      val payload = Array.tabulate[Byte](len) { j =>
        (((seed + i * 131 + j * 17) % 251) & 0xFF).toByte
      }
      MediaRow(f"m$i%04d", MediaMeta(kind, 64 + i, 48 + i, 16000, 1000L + i * 250L), payload)
    }.toDS()
  }
}
