package graft.queries

import graft.sim.Similarity
import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** ANN surface over `embeddings` (rows-only driver checks — float
  * reductions are engine-order-sensitive; correctness is covered by
  * ScalaTest invariants instead, see SimilaritySpec). */
object SimilarityQueries {

  /** Brute-force cosine top-10 for a deterministic query subset
    * (vec_id ≡ 0 mod 50): the exact baseline every ANN variant is
    * measured against. */
  private def annTopK(spark: SparkSession, dir: String): DataFrame =
    Similarity.bruteTopK(Tables.embeddings(spark, dir), queryMod = 50L, k = 10)
      .orderBy("qid", "rank")

  /** IVF (inverted-file) top-10: nearest-centroid bucketing + probe-
    * limited exact search — the scale path for top-k (LSH is the
    * scale path for threshold near-dup). */
  private def annIvf(spark: SparkSession, dir: String): DataFrame =
    Similarity.ivfTopK(Tables.embeddings(spark, dir), queryMod = 50L, k = 10)
      .orderBy("qid", "rank")

  /** LSH-bucketed near-duplicate pairs at cosine ≥ 0.9 — the scale
    * path (bucket join instead of |corpus|² cross product). */
  private def embedNearDup(spark: SparkSession, dir: String): DataFrame =
    Similarity.lshNearDup(Tables.embeddings(spark, dir), minCos = 0.9)
      .orderBy("id_a", "id_b")

  /** Per-label vector statistics with an exact oracle: norms are
    * reduced left-to-right in doubles on both engines (IEEE ops are
    * order-identical), quantized to integer thousandths per row, then
    * summed as integers — so the group aggregate is bit-equal no
    * matter the combine order. The pattern for any "float stats at
    * scale must still be checkable" pipeline. */
  private def embedStats(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    Tables.embeddings(spark, dir)
      .select(col("label"),
        floor(Similarity.l2norm(col("embedding")) * 1000 + lit(1e-6)).as("norm_mil"),
        size(col("embedding")).as("dim"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        sum(col("norm_mil")).as("sum_norm_mil"),
        min(col("dim")).as("min_dim"), max(col("dim")).as("max_dim"))
      .orderBy("label")
  }

  private val embedStatsSql =
    """SELECT label, COUNT(*) AS n,
      |  CAST(SUM(norm_mil) AS BIGINT) AS sum_norm_mil,
      |  CAST(MIN(dim) AS INT) AS min_dim, CAST(MAX(dim) AS INT) AS max_dim
      |FROM (
      |  SELECT label,
      |    CAST(floor(sqrt(list_reduce(list_prepend(0.0,
      |      list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
      |      (a, b) -> a + b)) * 1000 + 0.000001) AS BIGINT) AS norm_mil,
      |    len(embedding) AS dim
      |  FROM embeddings)
      |GROUP BY label ORDER BY label""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q_ann_topk", annTopK, None),
    Q("q_ann_ivf", annIvf, None),
    Q("q_embed_neardup", embedNearDup, None),
    Q("q_embed_stats", embedStats, Some(embedStatsSql)),
  )
}
