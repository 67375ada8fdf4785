package graft.queries

import graft.multimodal.Multimodal
import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column surface over the synthetic media table derived
  * from `documents` (see [[graft.multimodal.Multimodal]]: real Spark
  * plumbing, stubbed codec). Metadata/shape queries carry full DuckDB
  * oracles; the feature kernel itself is rows-only checked (float
  * vectors) and unit-tested in MultimodalSpec.
  */
object MultimodalQueries {

  private def media(spark: SparkSession, dir: String): DataFrame =
    Multimodal.mediaFromDocuments(Tables.documents(spark, dir))

  /** Payload + typed metadata projection — proves the binary column
    * and its struct survive the scan/shuffle path bit-exactly. */
  private def mediaMeta(spark: SparkSession, dir: String): DataFrame =
    media(spark, dir).select(
      col("doc_id"), col("kind"),
      length(col("payload")).as("n_bytes"),
      col("meta.format").as("format"),
      col("meta.width").as("width"),
      col("meta.height").as("height"),
      col("meta.n_frames").as("n_frames"))
      .orderBy("doc_id")

  private val mediaMetaSql =
    """SELECT doc_id,
      |  ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)] AS kind,
      |  96 AS n_bytes,
      |  ['png','wav','mp4'][CAST(doc_id % 3 + 1 AS INT)] AS format,
      |  CAST(n_chars % 640 + 16 AS INT) AS width,
      |  CAST(n_chars % 480 + 16 AS INT) AS height,
      |  CAST(n_chars % 24 + 1 AS INT) AS n_frames
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Resize metadata contract (kernel stub, real struct rewrite). */
  private def mediaResize(spark: SparkSession, dir: String): DataFrame =
    Multimodal.resize(media(spark, dir), maxDim = 64).select(
      col("doc_id"),
      col("meta.width").as("width"),
      col("meta.height").as("height"))
      .orderBy("doc_id")

  private val mediaResizeSql =
    """SELECT doc_id,
      |  CAST(floor((n_chars % 640 + 16) * LEAST(64.0 / (n_chars % 640 + 16), 64.0 / (n_chars % 480 + 16), 1.0)) AS INT) AS width,
      |  CAST(floor((n_chars % 480 + 16) * LEAST(64.0 / (n_chars % 640 + 16), 64.0 / (n_chars % 480 + 16), 1.0)) AS INT) AS height
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Per-video sampled-frame counts (stride 4, anchored at frame 0). */
  private def frameSample(spark: SparkSession, dir: String): DataFrame =
    Multimodal.sampleFrames(media(spark, dir), stride = 4)
      .groupBy("doc_id").agg(count(lit(1)).as("n_sampled"))
      .orderBy("doc_id")

  private val frameSampleSql =
    """SELECT doc_id,
      |  CAST(ceil((n_chars % 24 + 1) / 4.0) AS BIGINT) AS n_sampled
      |FROM documents WHERE doc_id % 3 = 2 ORDER BY doc_id""".stripMargin

  /** Batched partition-local feature extraction (STUB codec). The
    * kernel's 16-bin byte histogram is recovered as EXACT integer bin
    * counts (`round(f_k · n_bytes)` un-normalizes the float bins), so
    * the whole mapPartitions path is hash-checked against a DuckDB
    * oracle that recomputes the histogram from the sha2-chain payload's
    * hex low-nibbles — bin(b) = b mod 16 = the low hex digit. */
  private def mediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    val bins = (0 until Multimodal.FeatureDim).map(k =>
      round(element_at(col("features"), k + 1) * col("n_bytes"))
        .cast("long").as(s"b$k"))
    Multimodal.extractFeatures(media(spark, dir)).toDF()
      .select(Seq(col("doc_id"), col("kind"), col("n_bytes")) ++ bins: _*)
      .orderBy("doc_id")
  }

  private val mediaFeaturesSql = {
    // payload = unhex(sha256(text) || sha256(text||'1') || sha256(text||'2')):
    // 96 bytes = 192 hex chars; byte i's low nibble is hex char 2i (1-based).
    val binCols = (0 until Multimodal.FeatureDim).map { k =>
      val hexDigit = Integer.toHexString(k)
      s"CAST(len(list_filter(generate_series(1, 96), i -> substr(hx, 2*i, 1) = '$hexDigit')) AS BIGINT) AS b$k"
    }.mkString(",\n  ")
    s"""SELECT doc_id,
       |  ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)] AS kind,
       |  96 AS n_bytes,
       |  $binCols
       |FROM (SELECT doc_id, sha256(text) || sha256(text || '1') || sha256(text || '2') AS hx
       |      FROM documents)
       |ORDER BY doc_id""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("q_media_meta", mediaMeta, Some(mediaMetaSql)),
    Q("q_media_resize", mediaResize, Some(mediaResizeSql)),
    Q("q_frame_sample", frameSample, Some(frameSampleSql)),
    Q("q_media_features", mediaFeatures, Some(mediaFeaturesSql)),
  )
}
