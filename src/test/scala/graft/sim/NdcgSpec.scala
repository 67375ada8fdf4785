package graft.sim

import graft.{SparkEntry, SparkSpec}
import graft.tables.Tables

/** q_ndcg: the graded-relevance evaluation must equal an independent
  * driver-side recompute from the two rankings, and the fixture must
  * exercise it away from the degenerate 0/1 endpoints. */
class NdcgSpec extends SparkSpec {
  import spark.implicits._

  test("q_ndcg equals the brute driver-side fold; fixture is mid-range") {
    val got = SparkEntry.queries("q_ndcg")(spark, sf0001)
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    val emb = Tables.embeddings(spark, sf0001)
    val brute = Similarity.bruteTopK(emb, queryMod = 50L, k = 10)
      .select("qid", "vec_id", "rank").as[(Long, Long, Int)].collect()
      .map { case (q, v, r) => (q, v) -> (11L - r) }.toMap
    val ann = Similarity.ivfPqRerank(emb, queryMod = 50L, kCand = 100, k = 10)
      .select("qid", "vec_id", "rank").as[(Long, Long, Int)].collect()
    graft.ops.SideCache.releaseAll()
    val idcg = (1 to 10).map(i => (11.0 - i) / math.log(i + 1.0)).sum
    val expect = ann.groupBy(_._1).map { case (q, rows) =>
      val sorted = rows.sortBy(_._3)
      val rels = sorted.map { case (_, v, _) => brute.getOrElse((q, v), 0L) }
      var dcg = 0.0
      sorted.zip(rels).foreach { case ((_, _, r), rel) =>
        dcg += rel.toDouble / math.log(r + 1.0)
      }
      (q, rels.count(_ > 0).toLong,
        math.floor(dcg * 1000000 + 1e-6).toLong,
        math.floor(dcg / idcg * 1000000 + 1e-6).toLong)
    }.toSeq.sortBy(_._1)
    assert(got === expect)
    // mid-range fixture: neither a perfect index (all 1e6) nor a
    // useless one (all ~0); and at least one query IS perfect, so the
    // 1.0 endpoint is exercised too
    val ndcgs = got.map(_._4)
    assert(ndcgs.max === 1000000L)
    assert(ndcgs.min < 500000L)
    val mean = ndcgs.sum / ndcgs.length
    assert(mean > 200000L && mean < 900000L, s"mean ndcg $mean")
  }

  test("q_nprobe_curve: recall is monotone in nProbe and each point equals the brute overlap") {
    val got = SparkEntry.queries("q_nprobe_curve")(spark, sf0001)
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got.map(_._1) === Seq(1L, 2L, 4L))
    // nested probe sets => recall cannot decrease
    assert(got.map(_._3).sliding(2).forall(p => p.head <= p.last))
    // each point recomputed: ivfTopK overlap with the brute set
    val emb = Tables.embeddings(spark, sf0001)
    val brute = Similarity.bruteTopK(emb, queryMod = 50L, k = 10)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    got.foreach { case (p, nExact, hits, bp) =>
      assert(nExact === brute.size.toLong)
      val ivf = Similarity.ivfTopK(emb, queryMod = 50L, k = 10,
          nProbe = p.toInt)
        .select("qid", "vec_id").as[(Long, Long)].collect().toSet
      assert(hits === (ivf & brute).size.toLong, s"nprobe $p")
      assert(bp === hits * 10000 / nExact)
    }
    graft.ops.SideCache.releaseAll()
    // the sweep is a genuine curve on the fixture: the endpoints differ
    assert(got.last._4 > got.head._4)
  }
}
