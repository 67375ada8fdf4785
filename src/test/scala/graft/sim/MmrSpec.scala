package graft.sim

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Brute-force twin of q_mmr_rerank: pool, pairwise cosines, and the
  * 5-round greedy recomputed driver-side; plus the diversity premise
  * (the MMR list differs from plain top-5 somewhere in the cohort). */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  test("q_mmr_rerank equals the brute greedy MMR; diversity changes the list") {
    val got = SparkEntry.queries("q_mmr_rerank")(spark, sf0001)
      .select("qid", "vec_id", "pick", "mmr_q")
      .as[(Long, Long, Int, Long)].collect().toSeq

    val embs = graft.tables.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .collect().sortBy(_._1)
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val vecs = embs.toMap
    val norms = embs.map { case (id, v) => id -> math.sqrt(dot(v, v)) }.toMap
    def cos(a: Long, b: Long): Double =
      dot(vecs(a), vecs(b)) / (norms(a) * norms(b))

    val qids = embs.map(_._1).filter(_ % 50 == 0)
    var anyDiverged = false
    val brute = qids.flatMap { q =>
      val pool = embs.map(_._1).filter(_ != q).map(d => (d, cos(q, d)))
        .sortBy { case (d, c) => (-c, d.toDouble) }.take(20)
      val rel = pool.toMap
      var selected = Vector.empty[(Long, Int, Long)]
      for (k <- 1 to 5) {
        val remaining = pool.map(_._1).filterNot(selected.map(_._1).contains)
        val scoredR = remaining.map { d =>
          val pen = if (selected.isEmpty) 0.0
            else selected.map(s => cos(d, s._1)).max
          (d, graft.ops.Num.floorEpsLong((rel(d) * 0.7 - pen * 0.3) * 1e6))
        }
        val (d, sc) = scoredR.minBy { case (d, s) => (-s, d) }
        selected :+= ((d, k, sc))
      }
      val plainTop5 = pool.take(5).map(_._1).toSeq
      if (selected.map(_._1).toSeq != plainTop5) anyDiverged = true
      selected.map { case (d, k, sc) => (q, d, k, sc) }
    }
    assert(got === brute.toSeq)
    // the diversity term must actually bite somewhere in the cohort
    assert(anyDiverged, "MMR never diverged from plain top-5 — pool too uniform")
  }

  test("the greedy loop's plan is CONSTANT-DEPTH after 5 rounds — the eager per-round checkpoint holds") {
    // each round references the prior selection twice (left-anti +
    // penalty join): left lazy, the plan subtree would roughly DOUBLE
    // per round (~2^5 copies of round 1 by round 5, amplified under
    // host contention). The eager localCheckpoint(true) per round
    // truncates the lineage, so the returned frame's optimized plan
    // must be a single leaf over the checkpointed rows — this pins
    // the discipline structurally, not just by timing.
    val df = graft.queries.SimilarityQueries.all
      .find(_.name == "q_mmr_rerank").get.run(spark, sf0001)
    // the registered query adds a rename + sort over the checkpointed
    // leaf: LogicalRDD + Project + Sort = 3 nodes; a lazy loop would
    // be dozens (joins/windows re-nested per round)
    val nodes = df.queryExecution.optimizedPlan.collect { case p => p }
    assert(nodes.size <= 4,
      s"expected a checkpoint-truncated plan (leaf+readout), got " +
        s"${nodes.size} nodes:\n${df.queryExecution.optimizedPlan}")
  }
}
