package graft.text

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Behavior specs for the bigram-LM perplexity filter (q_perplexity)
  * and PMI collocation miner (q_pmi). The DuckDB oracle pins exact
  * values; these pin the SEMANTICS against independent driver-side
  * recomputes of the same model. */
class PerplexityPmiSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs: Seq[(Long, Array[String])] =
    graft.tables.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      .toSeq.map { case (id, t) => id -> t.split(' ') }

  test("q_perplexity equals the brute-force add-one bigram LM") {
    val got = SparkEntry.queries("q_perplexity")(spark, sf0001)
      .select("doc_id", "n_bigrams", "nll_micro", "avg_nll_micro", "ppl_bucket")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)

    val bigrams = docs.flatMap { case (id, t) =>
      t.iterator.sliding(2).withPartial(false).map(p => (id, p(0), p(1)))
    }
    val c2 = bigrams.groupBy(b => (b._2, b._3)).view.mapValues(_.size.toLong).toMap
    val c1 = bigrams.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val vocab = docs.flatMap(_._2).distinct.size.toLong
    def lpQ(l: String, r: String): Long =
      graft.ops.Num.floorEpsLong(
        math.log((c2((l, r)) + 1).toDouble / (c1(l) + vocab).toDouble) * 1e6)
    val brute = docs.sortBy(_._1).map { case (id, t) =>
      val bs = t.iterator.sliding(2).withPartial(false).toSeq
      val nll = -bs.map(p => lpQ(p(0), p(1))).sum
      val n = bs.size.toLong
      val avg = if (n == 0) 0L else nll / n
      (id, n, nll, avg, avg / 100000L)
    }
    assert(got.toSeq === brute)
    // signal sanity: NLLs are positive (log-probs strictly negative)
    assert(got.forall(r => r._2 == 0 || r._3 > 0))
  }

  test("q_pmi equals the brute-force PMI top-50 and beats-chance holds") {
    val got = SparkEntry.queries("q_pmi")(spark, sf0001)
      .select("l", "r", "n_pair", "pmi_micro")
      .as[(String, String, Long, Long)].collect().toSeq

    val toks = docs.flatMap(_._2)
    val uni = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tTok = toks.size.toLong
    val pairs = docs.flatMap(_._2.iterator.sliding(2).withPartial(false)
      .map(p => (p(0), p(1))))
    val c2 = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bTok = pairs.size.toLong
    val brute = c2.toSeq.filter(_._2 >= 5).map { case ((l, r), n) =>
      val pmi = graft.ops.Num.floorEpsLong(math.log(
        (n.toDouble / bTok) /
          ((uni(l).toDouble / tTok) * (uni(r).toDouble / tTok))) * 1e6)
      (l, r, n, pmi)
    }.sortBy(t => (-t._4, t._1, t._2)).take(50)
    assert(got === brute)
    // every reported collocation genuinely beats chance or the list is
    // exhausted below 50 (PMI can be negative only if fewer than 50
    // positive pairs exist)
    assert(got.size == 50 || got.forall(_._4 > 0))
  }

  test("q_hash_vectorize equals the brute hashing-trick recompute") {
    val got = SparkEntry.queries("q_hash_vectorize")(spark, sf0001)
      .select("doc_id", "bucket", "v", "norm2")
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(r => (r._1, r._2))

    val brute = docs.sortBy(_._1).flatMap { case (id, t) =>
      val ent = t.map { w =>
        val h = graft.functions.Poly.hashBytes(
          w.getBytes("UTF-8"), graft.functions.Poly.Base)
        (h % 16, if ((h / 16) % 2 == 0) 1L else -1L)
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
        .filter(_._2 != 0).sortBy(_._1)
      val n2 = ent.map(e => e._2 * e._2).sum
      ent.map { case (b, v) => (id, b, v, n2) }
    }
    assert(got === brute)
    // sign cancellation must actually be possible but not dominant:
    // every doc keeps at least one non-zero bucket
    assert(got.map(_._1).distinct.size === docs.size)
  }

  test("q_signal_corr equals the brute tie-broken-rank Spearman") {
    val got = SparkEntry.queries("q_signal_corr")(spark, sf0001)
      .select("n", "sum_d2", "rho_micro")
      .as[(Long, Long, Long)].collect().head

    val qa = SparkEntry.queries("q_quality_score")(spark, sf0001)
      .select("doc_id", "quality").as[(Long, Long)].collect().toMap
    val qb = SparkEntry.queries("q_perplexity")(spark, sf0001)
      .select("doc_id", "avg_nll_micro").as[(Long, Long)].collect().toMap
    val ids = qa.keySet.intersect(qb.keySet).toSeq
    def ranks(m: Map[Long, Long]): Map[Long, Long] =
      ids.sortBy(id => (m(id), id)).zipWithIndex
        .map { case (id, i) => id -> (i + 1).toLong }.toMap
    val (ra, rb) = (ranks(qa), ranks(qb))
    val n = ids.size.toLong
    val sumD2 = ids.map(id => { val d = ra(id) - rb(id); d * d }).sum
    assert(got._1 === n && got._2 === sumD2)
    val rho = 1.0 - 6.0 * sumD2 / (n * (n * n - 1))
    assert(got._3 === graft.ops.Num.floorEpsLong(rho * 1e6))
    assert(math.abs(got._3) <= 1000000L) // |rho| <= 1
  }

  test("q_lsh_curve: the measured banding curve S-bends like 1-(1-s^4)^16") {
    val got = SparkEntry.queries("q_lsh_curve")(spark, sf0001)
      .select("decile", "n_pairs", "n_cand", "rate_bp")
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    // the mutation probe populates the whole spectrum
    assert(got.size >= 8, s"only ${got.size} deciles populated")
    val rates = got.map(r => r._1 -> r._4).toMap
    // the S-curve's two flats: near-disjoint pairs almost never
    // collide, near-identical pairs almost always do
    assert(rates(0L) <= 500)
    assert(rates(got.last._1) >= 9500)
    // monotone up to sampling noise
    got.map(_._4).sliding(2).foreach { case Seq(a, b) =>
      assert(b >= a - 500, s"rate dipped $a -> $b")
    }
    // quantitative: deciles with decent support track the theoretical
    // curve 1-(1-s^4)^16 at the bucket midpoint within 30%
    got.filter(_._2 >= 30).foreach { case (d, _, _, rate) =>
      val s = (d + 0.5) / 10.0
      val theory = 1.0 - math.pow(1.0 - math.pow(s, 4), 16)
      assert(math.abs(rate / 10000.0 - theory) <= 0.3,
        s"decile $d: measured ${rate / 10000.0} vs theory $theory")
    }
  }
}
