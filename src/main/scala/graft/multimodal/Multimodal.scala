package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata; decode / feature-extract / resize /
  * frame-sample run as batched per-partition transforms.
  *
  * The actual codec libraries are not available in this environment, so the
  * decode kernel is a STUB — a deterministic fake that reads header bytes —
  * but the Spark-side plumbing is real and tested: binary column schema,
  * fixed-size batching inside `mapPartitions` (the Scala analogue of a
  * `mapInPandas` batch UDF: one kernel invocation per batch, not per row),
  * and a fixed-shape feature-vector output schema. Swapping the stub for a
  * real JNI/FFI decoder changes nothing in the plan.
  */
object Multimodal {

  /** One media record: id + raw payload. */
  final case class MediaRow(doc_id: Long, payload: Array[Byte])

  /** Decoded metadata + fixed-shape features (the stub's output schema). */
  final case class DecodedRow(
      doc_id: Long,
      n_bytes: Int,
      width: Int,
      height: Int,
      channels: Int,
      mean_byte: Double,
      features: Array[Float])

  val BatchSize = 64
  val FeatureDim = 8

  /** Attach a synthetic binary payload derived from the text column (test
    * stand-in for a real media blob column in the source table). */
  def withPayload(documents: DataFrame): DataFrame =
    documents.withColumn("payload", unhex(md5(col("text"))))

  /** STUB decode kernel: a real implementation would hand `batch` to an
    * image/audio codec; this fake derives shape metadata from header bytes
    * and a FeatureDim-vector from byte averages. Deterministic. */
  def decodeBatch(batch: Seq[MediaRow]): Seq[DecodedRow] = batch.map { r =>
    val b = r.payload.map(_ & 0xff)
    val mean = b.sum.toDouble / b.length
    val features = Array.tabulate(FeatureDim) { i =>
      (b(i % b.length) + b((i * 3 + 1) % b.length)).toFloat / 510.0f
    }
    DecodedRow(r.doc_id, b.length, 1 + b(0) % 64, 1 + b(1) % 64, 1 + b(2) % 3, mean, features)
  }

  /** Batched decode over partitions: groups the partition iterator into
    * BatchSize chunks and invokes the kernel once per chunk — the batch
    * shape a vectorized decoder needs, with no whole-partition
    * materialization. */
  def decode(media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap(chunk => decodeBatch(chunk))
    }
  }

  /** Frame-sampling stub: every `stride`-th byte as a "frame" (a video
    * decoder would emit keyframe offsets); pure expression, no kernel. */
  def frameSample(payload: org.apache.spark.sql.Column, stride: Int): org.apache.spark.sql.Column =
    transform(sequence(lit(1), ((length(payload) + (stride - 1)) / stride).cast("int")),
      i => payload.substr((i - 1) * stride + 1, lit(1)))

  def decodeDocuments(spark: SparkSession, documents: DataFrame): Dataset[DecodedRow] = {
    import spark.implicits._
    val media = withPayload(documents)
      .select(col("doc_id").cast("long").as("doc_id"), col("payload"))
      .as[MediaRow]
    decode(media)
  }
}
