package graft.multimodal

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal asset pipeline (SURVEY.md §2.11 `multimodal_cols` family):
  * image/audio/video modeled as opaque BINARY payload columns with a typed
  * metadata struct, plus decode / feature-extract / resize / frame-sample
  * stages as batched partition transforms.
  *
  * The container has no codec libraries, so the decoder behind the pipeline
  * is a pluggable trait with a DETERMINISTIC FAKE implementation (features
  * derived arithmetically from the payload bytes) — clearly marked below.
  * Everything Spark-side is real and tested: the schema, the Dataset
  * encoders, the batched mapPartitions shape (mirroring Arrow-batch
  * processing: decode amortized per batch, not per row), and the
  * partition-parallel execution.
  *
  * 100 TB notes: payloads stay columnar-binary end to end (parquet BYTE_ARRAY
  * → InternalRow binary, never driver-collected); feature extraction is
  * embarrassingly partition-parallel; batch size bounds per-task peak memory
  * exactly like maxRecordsPerBatch does for Arrow. */
object Multimodal {

  /** One asset: opaque payload + typed metadata (the multimodal column). */
  final case class Asset(asset_id: Long, kind: String, payload: Array[Byte],
    lang: String, source: String)

  /** Decoded per-asset features (what a real image/audio decoder yields). */
  final case class Features(asset_id: Long, kind: String, width: Int,
    height: Int, n_frames: Int, mean_intensity: Double)

  /** Codec abstraction — swap in a real JNI/ffmpeg-backed decoder outside
    * this container. Must be deterministic per payload. */
  trait Decoder extends Serializable {
    def decode(kind: String, payload: Array[Byte]): Features.PartialDecode
  }

  object Features {
    final case class PartialDecode(width: Int, height: Int, n_frames: Int,
      meanIntensity: Double)
  }

  /** STUB decoder: deterministic fake "decode" from payload arithmetic.
    * A real implementation would hand the bytes to a codec; the pipeline
    * around it does not change. */
  object FakeDecoder extends Decoder {
    override def decode(kind: String, payload: Array[Byte]): Features.PartialDecode = {
      val n = payload.length
      var sum = 0L
      var i = 0
      while (i < n) { sum += (payload(i) & 0xff); i += 1 }
      val width = 16 + (n % 64)
      val height = 16 + (sum % 64).toInt
      val frames = if (kind == "video") 1 + (n % 30) else 1
      Features.PartialDecode(width, height, frames,
        if (n == 0) 0.0 else sum.toDouble / n)
    }
  }

  /** Build the asset table from the documents fixture: payload = UTF-8 bytes
    * (stands in for decoded media bytes), kind derived deterministically. */
  def assets(spark: SparkSession, dir: String): Dataset[Asset] = {
    import spark.implicits._
    Tables(spark, dir, "documents")
      .select(col("doc_id").as("asset_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        encode(col("text"), "utf-8").as("payload"),
        col("lang"), col("source"))
      .as[Asset]
  }

  /** Batched feature extraction: the Scala analog of mapInPandas — each
    * partition iterator is processed in fixed-size batches so a real decoder
    * can amortize model/codec setup per batch and memory stays bounded. */
  def extractFeatures(ds: Dataset[Asset], decoder: Decoder,
      batchSize: Int = 64): Dataset[Features] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch setup would go here (codec init, model load)
        batch.iterator.map { a =>
          val d = decoder.decode(a.kind, a.payload)
          Features(a.asset_id, a.kind, d.width, d.height, d.n_frames,
            d.meanIntensity)
        }
      }
    }
  }

  /** Resize stage stub: pure metadata transform (a real one maps payload →
    * payload; the plumbing — a typed map over the Dataset — is identical). */
  def resize(ds: Dataset[Features], maxDim: Int): Dataset[Features] = {
    import ds.sparkSession.implicits._
    ds.map { f =>
      val scale = math.min(1.0, maxDim.toDouble / math.max(f.width, f.height))
      f.copy(width = math.max(1, (f.width * scale).toInt),
        height = math.max(1, (f.height * scale).toInt))
    }
  }

  /** Frame-sample stage stub: every k-th frame index per video asset —
    * one-to-many, the flatMap shape of real frame extraction. */
  def sampleFrames(ds: Dataset[Features], everyK: Int): DataFrame = {
    import ds.sparkSession.implicits._
    ds.flatMap { f =>
      (0 until f.n_frames by everyK).map(i => (f.asset_id, i))
    }.toDF("asset_id", "frame_idx")
  }
}
