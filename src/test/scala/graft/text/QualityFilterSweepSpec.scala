package graft.text

import graft.{SparkEntry, SparkSpec}

/** q_quality_filter_sweep: the survival curve must equal a brute
  * driver-side recompute from q_quality_score's per-doc rows, be
  * monotone in the threshold, and show the doc-share/token-share
  * divergence the length term guarantees. */
class QualityFilterSweepSpec extends SparkSpec {
  import spark.implicits._

  test("curve equals brute recompute; monotone; shares diverge") {
    val curve = SparkEntry.queries("q_quality_filter_sweep")(spark, sf0001)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(curve.size > 3, "degenerate quality domain")
    // brute from the per-doc scorer (its own oracle is hash-green)
    val docs = SparkEntry.queries("q_quality_score")(spark, sf0001)
      .select("n_tok", "quality")
      .as[(Int, Long)].collect().toSeq
    graft.ops.SideCache.releaseAll()
    val td = docs.size.toLong
    val tt = docs.map(_._1.toLong).sum
    curve.foreach { case (thr, nd, nt, dpm, tpm) =>
      val surv = docs.filter(_._2 >= thr)
      assert(nd === surv.size.toLong, s"thr=$thr n_docs")
      assert(nt === surv.map(_._1.toLong).sum, s"thr=$thr n_tok")
      assert(dpm === 1000 * nd / td)
      assert(tpm === 1000 * nt / tt)
    }
    // monotone non-increasing in the threshold
    assert(curve.map(_._2) === curve.map(_._2).sorted.reverse)
    assert(curve.map(_._3) === curve.map(_._3).sorted.reverse)
    // quality correlates with length, so the token share must exceed
    // the doc share somewhere strictly between the endpoints
    assert(curve.exists { case (_, _, _, dpm, tpm) =>
      dpm < 1000 && tpm > dpm
    }, "doc and token shares never diverged — the curve carries no signal")
  }
}
