package graft.sim

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q_ann_mips: the norm-augmentation reduction's two defining
  * identities, verified against the raw vectors — (1) every augmented
  * corpus vector has norm exactly M, (2) ranking by augmented cosine
  * is the ranking by inner product. Plus a brute-force top-10. */
class MipsSpec extends SparkSpec {
  import spark.implicits._

  test("augmented-cosine order == inner-product order; brute top-10 matches") {
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
    val m = norms.values.max

    // (1) augmentation really produces constant norm M (exact algebra:
    // ||x||^2 + (M^2 - ||x||^2) = M^2), checked numerically
    embs.foreach { case (id, v) =>
      val aug = math.sqrt(dot(v, v) + (m * m - dot(v, v)))
      assert(math.abs(aug - m) < 1e-12, s"vec $id augmented norm $aug != $m")
    }

    val got = SparkEntry.queries("q_ann_mips")(spark, sf0001)
      .select("qid", "vec_id", "rank", "ip_x10k", "aug_cos_x10k")
      .as[(Long, Long, Int, Long, Long)].collect().toSeq

    // (2) + brute force: top-10 by ip == top-10 by augmented cosine
    val qids = embs.map(_._1).filter(_ % 50 == 0)
    val brute = qids.flatMap { q =>
      val scored = embs.map(_._1).filter(_ != q)
        .map(d => (d, dot(vecs(d), vecs(q))))
      val byIp = scored.sortBy { case (d, ip) => (-ip, d.toDouble) }.take(10)
      val byAug = scored.map { case (d, ip) => (d, ip / (m * norms(q))) }
        .sortBy { case (d, c) => (-c, d.toDouble) }.take(10).map(_._1)
      assert(byIp.map(_._1).toSeq === byAug.toSeq,
        s"qid $q: ip order != augmented-cosine order")
      byIp.zipWithIndex.map { case ((d, ip), i) =>
        (q, d, i + 1,
          math.floor(ip * 10000 + 0.5).toLong,
          math.floor(ip / (m * norms(q)) * 10000 + 0.5).toLong)
      }
    }
    assert(got === brute.toSeq)
  }

  test("q_ann_recall equals recomputation from the component queries") {
    val got = SparkEntry.queries("q_ann_recall")(spark, sf0001)
      .select("variant", "n_exact", "hits", "recall_bp")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.keySet === Set("hnsw", "ivf", "ivf_pq", "pq"))

    val brute = SparkEntry.queries("q_ann_topk")(spark, sf0001)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    def hitsOf(q: String): Long =
      SparkEntry.queries(q)(spark, sf0001)
        .select("qid", "vec_id").as[(Long, Long)].collect()
        .count(brute.contains).toLong
    // the hnsw tier serves from the stored graph's t10 segment
    val hnswHits = {
      val gRoot = graft.sim.Hnsw.ensureGraph(spark,
        graft.tables.Tables.embeddings(spark, sf0001), sf0001)
      spark.read.parquet(s"$gRoot/t10")
        .select(col("qid"), col("dst")).as[(Long, Long)].collect()
        .count(brute.contains).toLong
    }
    Seq("ivf" -> "q_ann_ivf", "ivf_pq" -> "q_ann_ivf_pq", "pq" -> "q_ann_pq")
      .foreach { case (v, q) =>
        val r = got(v)
        assert(r._2 === brute.size.toLong, v)
        assert(r._3 === hitsOf(q), v)
        assert(r._4 === r._3 * 10000 / r._2, v)
        assert(r._4 > 0 && r._4 <= 10000, v)
      }
    val rh = got("hnsw")
    assert(rh._2 === brute.size.toLong)
    assert(rh._3 === hnswHits)
    assert(rh._4 === rh._3 * 10000 / rh._2)
    assert(rh._4 > 0 && rh._4 <= 10000)
    // quantization only ever loses recall on top of the coarse tier
    assert(got("ivf")._4 >= got("ivf_pq")._4)
    assert(got("pq")._4 >= got("ivf_pq")._4)
  }

  test("q_embedding_drift equals the brute per-dim micro-sum recompute") {
    val got = SparkEntry.queries("q_embedding_drift")(spark, sf0001)
      .select("dim", "n_a", "n_b", "sum_a", "sum_b", "drift_micro")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)

    val embs = graft.tables.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .collect()
    val dim = embs.head._2.length
    val brute = (0 until dim).map { d =>
      val a = embs.filter(_._1 % 2 == 0)
        .map(e => graft.ops.Num.floorEpsLong(e._2(d).toDouble * 1e6))
      val b = embs.filter(_._1 % 2 != 0)
        .map(e => graft.ops.Num.floorEpsLong(e._2(d).toDouble * 1e6))
      val drift = graft.ops.Num.floorEpsLong(
        math.abs(a.sum * b.length - b.sum * a.length).toDouble /
          (a.length.toLong * b.length))
      (d.toLong, a.length.toLong, b.length.toLong, a.sum, b.sum, drift)
    }
    assert(got === brute)
    // parity halves of one distribution: drift stays small relative to
    // the component scale (sanity, not a tight bound)
    assert(got.map(_._6).max < 200000L, "parity halves should not 'drift'")
  }
}
