package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing: image/audio/video payloads are opaque
 * `binary` columns with typed metadata; decode / feature-extract /
 * frame-sample run as partition-batched functions over typed Datasets —
 * the Scala analog of `mapInPandas` (same batch boundary, same schema
 * contract; an Arrow-backed Pandas UDF would slot into the identical plan
 * position in PySpark).
 *
 * STUB BOUNDARY: no image/audio codecs ship in this container, so
 * [[FakeCodec]] is a clearly-marked deterministic stand-in — it produces
 * stable pseudo-features from the bytes. Everything around it (schema,
 * partitioning, batch shape, null handling) is real and tested; swapping
 * `FakeCodec.decode*` for a JNI/javacpp codec changes no plan shape.
 */
object Multimodal {

  case class MediaRow(media_id: String, kind: String, bytes: Array[Byte],
                      mime: String, width: Int, height: Int, duration_ms: Long)
  case class MediaFeatures(media_id: String, kind: String, ok: Boolean,
                           features: Array[Float], n_frames: Int)
  case class FrameSample(media_id: String, frame_idx: Int, ts_ms: Long,
                         features: Array[Float])

  /** Deterministic stand-in for a real decoder. DO NOT ship: ??? -> real codec. */
  object FakeCodec {
    private def mix(seed: Long, i: Int): Long = {
      var h = seed ^ (i * 0x9e3779b97f4a7c15L)
      h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
      h
    }
    def bytesSeed(bytes: Array[Byte]): Long = {
      var h = 1125899906842597L
      var i = 0
      while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
      h
    }
    /** "Decode" to a dim-sized feature vector; deterministic in the bytes. */
    def decodeFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
      val seed = bytesSeed(bytes)
      Array.tabulate(dim)(i => ((mix(seed, i) % 2000L) / 1000.0f))
    }
    /** Fake stream length -> frame count at fps over duration. */
    def frameCount(durationMs: Long, fps: Int): Int =
      math.max(1, (durationMs * fps / 1000L).toInt)
  }

  /** Build a media table from the synthetic pages' media spans (binary payloads). */
  def mediaTable(pages: DataFrame): DataFrame =
    pages.select(explode(filter(col("spans"), s => s.getField("kind") === "media")).as("s"))
      .select(col("s.media_ref").as("media_id"))
      .dropDuplicates("media_id")
      .withColumn("kind", element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(xxhash64(col("media_id")), lit(3)) + 1).cast("int")))
      // opaque binary payload: deterministic pseudo-bytes from the ref hash
      .withColumn("bytes", unhex(repeat(lpad(lower(hex(xxhash64(col("media_id")))), 16, "0"), 8)))
      .withColumn("mime", when(col("kind") === "image", "image/png")
        .when(col("kind") === "audio", "audio/wav").otherwise("video/mp4"))
      .withColumn("width", when(col("kind") === "image", (pmod(xxhash64(lit("w"), col("media_id")), lit(1920)) + 1).cast("int")).otherwise(lit(0)))
      .withColumn("height", when(col("kind") === "image", (pmod(xxhash64(lit("h"), col("media_id")), lit(1080)) + 1).cast("int")).otherwise(lit(0)))
      .withColumn("duration_ms", when(col("kind") =!= "image",
        (pmod(xxhash64(lit("d"), col("media_id")), lit(60000L)) + 1000L)).otherwise(lit(0L)))

  /**
   * Partition-batched feature extraction (the mapInPandas analog): rows are
   * processed per-partition so a real codec could amortize model/codec init
   * once per task; output schema is fixed and typed.
   */
  def extractFeatures(spark: SparkSession, media: DataFrame, dim: Int = 32): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("bytes"), col("mime"),
      col("width"), col("height"), col("duration_ms"))
      .as[MediaRow]
      .mapPartitions { rows =>
        // per-task init happens HERE in a real impl (load codec/model once)
        rows.map { r =>
          if (r.bytes == null || r.bytes.isEmpty)
            MediaFeatures(r.media_id, r.kind, ok = false, Array.empty, 0)
          else MediaFeatures(r.media_id, r.kind, ok = true,
            FakeCodec.decodeFeatures(r.bytes, dim),
            if (r.kind == "video") FakeCodec.frameCount(r.duration_ms, fps = 2) else 1)
        }
      }
  }

  /** Frame sampling for video: explode deterministic frame timestamps, featurize each. */
  def sampleFrames(spark: SparkSession, media: DataFrame, fps: Int = 2, dim: Int = 16): Dataset[FrameSample] = {
    import spark.implicits._
    media.filter(col("kind") === "video")
      .select(col("media_id"), col("kind"), col("bytes"), col("mime"),
        col("width"), col("height"), col("duration_ms"))
      .as[MediaRow]
      .flatMap { r =>
        val n = FakeCodec.frameCount(r.duration_ms, fps)
        (0 until n).map { i =>
          val tsMs = i.toLong * 1000L / fps
          FrameSample(r.media_id, i, tsMs,
            FakeCodec.decodeFeatures(r.bytes ++ BigInt(i).toByteArray, dim))
        }
      }
  }

  /** Metadata-level resize: pure column math (no decode needed for planning). */
  def resizePlan(media: DataFrame, maxDim: Int): DataFrame = {
    val scale = when(greatest(col("width"), col("height")) <= maxDim, lit(1.0))
      .otherwise(lit(maxDim.toDouble) / greatest(col("width"), col("height")))
    media.withColumn("target_width", ceil(col("width") * scale).cast("int"))
      .withColumn("target_height", ceil(col("height") * scale).cast("int"))
  }
}
