package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support: image/audio/video payloads ride through
  * the engine as opaque `binary` columns next to a typed metadata
  * struct; per-modality kernels (decode, feature-extract, resize,
  * frame-sample) run as batched partition-local functions.
  *
  * Spark-side plumbing is real — schema, partition batching, kernel
  * signature, output shape — while the codec itself is a STUB: this
  * container has no image/audio libraries, so `decodeStub` derives a
  * deterministic fake "decode" from the bytes. Swapping in a real
  * decoder (e.g. javacv / a JNI codec) changes ONE function body and
  * nothing else. At cluster scale the binary column stays columnar
  * parquet (never materialized on the driver), kernels are
  * embarrassingly parallel per partition, and `maxPartitionBytes`
  * governs batch memory, exactly as with a Pandas-UDF pipeline.
  */
object Multimodal {

  /** Typed metadata carried beside every payload. */
  val metaSchema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false)))

  /** media table schema: (doc_id, kind, payload, meta). */
  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", metaSchema, nullable = false)))

  /** Deterministic synthetic media table derived from `documents`
    * (the container ships no real image fixtures): payload bytes are
    * a sha2 chain over the text, metadata derives from `n_chars`.
    * Pure column expressions — the synthesis itself is codegen'd. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(typedlit(Seq("image", "audio", "video")),
        (col("doc_id") % 3 + 1).cast(IntegerType)).as("kind"),
      // 96-byte fake payload: three chained sha2-256 digests.
      concat(
        unhex(sha2(col("text"), 256)),
        unhex(sha2(concat(col("text"), lit("1")), 256)),
        unhex(sha2(concat(col("text"), lit("2")), 256))).as("payload"),
      struct(
        element_at(typedlit(Seq("png", "wav", "mp4")),
          (col("doc_id") % 3 + 1).cast(IntegerType)).as("format"),
        (col("n_chars") % 640 + 16).cast(IntegerType).as("width"),
        (col("n_chars") % 480 + 16).cast(IntegerType).as("height"),
        (col("n_chars") % 24 + 1).cast(IntegerType).as("n_frames")).as("meta"))

  /** Feature row emitted by [[extractFeatures]]. */
  case class MediaFeatures(doc_id: Long, kind: String, n_bytes: Int,
                           features: Array[Float])

  val FeatureDim = 16

  /** === STUB decode kernel ===
    * Stands in for a real image/audio decoder: reduces the payload to
    * a 16-bin byte histogram, L1-normalized. Deterministic, so specs
    * and the driver's rows-check are stable. A real implementation
    * would decode pixels/samples here and emit e.g. a CLIP or
    * mel-spectrogram embedding — same signature, same plumbing. */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val bins = new Array[Float](FeatureDim)
    payload.foreach(b => bins((b & 0xFF) % FeatureDim) += 1f)
    val n = math.max(payload.length, 1).toFloat
    bins.map(_ / n)
  }

  /** Batched per-partition feature extraction: the Scala analog of a
    * `mapInPandas` kernel — one iterator pass per partition, no
    * per-row lambda dispatch, constant memory. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.select("doc_id", "kind", "payload").as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, kind, payload) =>
          MediaFeatures(id, kind, payload.length, decodeStub(payload))
        }
      }
  }

  /** Frame sampling for `video` payloads: the payload is treated as
    * `n_frames` equal chunks; every `stride`-th chunk (anchored at
    * frame 0) is emitted as its own row. Explode happens executor-side
    * via flatMap — output rows ≈ |videos|·frames/stride, never
    * driver-materialized. */
  case class Frame(doc_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  def sampleFrames(media: DataFrame, stride: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(col("kind") === "video")
      .select(col("doc_id"), col("payload"), col("meta.n_frames"))
      .as[(Long, Array[Byte], Int)]
      .mapPartitions { it =>
        it.flatMap { case (id, payload, nFrames) =>
          val frameLen = math.max(payload.length / math.max(nFrames, 1), 1)
          (0 until nFrames by stride).iterator.map { f =>
            val from = f * frameLen
            Frame(id, f, payload.slice(from,
              math.min(from + frameLen, payload.length)))
          }
        }
      }
  }

  /** "Resize": metadata-level scale plus a payload signature re-chunk —
    * a STUB for a real pixel resample with the true plumbing (struct
    * rewrite stays columnar; only the kernel body is fake). */
  def resize(media: DataFrame, maxDim: Int): DataFrame = {
    val scale = least(
      lit(maxDim) / col("meta.width").cast(DoubleType),
      lit(maxDim) / col("meta.height").cast(DoubleType), lit(1.0))
    media.withColumn("meta", struct(
      col("meta.format").as("format"),
      floor(col("meta.width") * scale).cast(IntegerType).as("width"),
      floor(col("meta.height") * scale).cast(IntegerType).as("height"),
      col("meta.n_frames").as("n_frames")))
  }
}
