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

  val all: Seq[Q] = Seq(
    Q("q_ann_topk", annTopK, None),
    Q("q_ann_ivf", annIvf, None),
    Q("q_embed_neardup", embedNearDup, None),
  )
}
