package graft.sim

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Brute-force twin of q_hybrid_retrieval: recompute both channels
  * (BM25 with top-3 keyword queries, exact cosine) and the RRF fusion
  * driver-side, and assert the full fused output matches. */
class HybridRetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("q_hybrid_retrieval equals the brute-force RRF of brute BM25 + brute cosine") {
    val got = SparkEntry.queries("q_hybrid_retrieval")(spark, sf0001)
      .select("qid", "doc_id", "lex_rank", "vec_rank", "rrf_micro", "fused_rank")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq

    val docs = graft.tables.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      .map { case (id, t) => id -> t.split(' ') }.sortBy(_._1)
    val embs = graft.tables.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .collect().sortBy(_._1)
    val qids = docs.map(_._1).filter(_ % 100 == 0)

    // --- lexical channel: BM25, query = top-3 terms by (tf desc, term)
    val tf = docs.map { case (id, t) =>
      id -> t.groupBy(identity).view.mapValues(_.size.toDouble).toMap
    }.toMap
    val dfm = tf.values.flatMap(_.keys).groupBy(identity).view
      .mapValues(_.size.toDouble).toMap
    val dl = docs.map { case (id, t) => id -> t.length.toDouble }.toMap
    val nDocs = docs.length.toDouble
    val avgdl = dl.values.sum / nDocs
    // any doc matching >= 1 query term ranks (even at quantized score 0),
    // mirroring the engine's posting join
    def bm25All(qid: Long): Seq[(Long, Long)] = { // (doc_id, lex_rank)
      val qt = tf(qid).toSeq.sortBy { case (t, f) => (-f, t) }.take(3).map(_._1)
      docs.map(_._1).filter(_ != qid)
        .flatMap { d =>
          val matched = qt.filter(tf(d).contains)
          if (matched.isEmpty) None
          else Some((d, matched.map { t =>
            val idf = math.log((nDocs - dfm(t) + 0.5) / (dfm(t) + 0.5) + 1.0)
            val x = idf * (tf(d)(t) * 2.2) /
              (tf(d)(t) + 1.2 * (0.25 + 0.75 * dl(d) / avgdl))
            math.floor(x * 10000 + 1e-6).toLong
          }.sum))
        }.sortBy { case (d, s) => (-s, d) }.take(10)
        .zipWithIndex.map { case ((d, _), i) => (d, (i + 1).toLong) }
    }

    // --- dense channel: exact cosine, sequential left-to-right doubles
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < math.min(a.length, b.length)) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val norms = embs.map { case (id, v) => id -> math.sqrt(dot(v, v)) }.toMap
    val vecMap = embs.toMap
    def cosTop(qid: Long): Seq[(Long, Long)] =
      embs.map(_._1).filter(_ != qid).map { d =>
        (d, dot(vecMap(d), vecMap(qid)) / (norms(d) * norms(qid)))
      }.sortBy { case (d, c) => (-c, d.toDouble) }.take(10)
        .zipWithIndex.map { case ((d, _), i) => (d, (i + 1).toLong) }

    // --- RRF fusion
    val brute = qids.flatMap { qid =>
      val l = bm25All(qid).toMap
      val v = cosTop(qid).toMap
      (l.keySet ++ v.keySet).toSeq.map { d =>
        val lr = l.getOrElse(d, 0L)
        val vr = v.getOrElse(d, 0L)
        val rrf = (if (lr > 0) 1000000L / (60 + lr) else 0L) +
          (if (vr > 0) 1000000L / (60 + vr) else 0L)
        (qid, d, lr, vr, rrf)
      }.sortBy { case (_, d, _, _, rrf) => (-rrf, d) }.take(10)
        .zipWithIndex.map { case ((q, d, lr, vr, rrf), i) =>
          (q, d, lr, vr, rrf, (i + 1).toLong)
        }
    }
    assert(got === brute)
    // fusion sanity: at least one fused row per query draws from BOTH
    // channels somewhere in the cohort (the hybrid premise)
    assert(got.exists(r => r._3 > 0 && r._4 > 0))
    assert(got.groupBy(_._1).keySet === qids.toSet)
  }
}
