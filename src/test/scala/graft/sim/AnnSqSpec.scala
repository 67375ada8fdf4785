package graft.sim

import graft.{SparkEntry, SparkSpec}

/** q_ann_sq — int8 scalar quantization: codes must live in the signed
  * byte range, the quantizer must round-trip within half a scale step
  * (the affine-quantizer contract), and the integer-dot ranking must
  * clear a recall floor against both exact truths. */
class AnnSqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val rows = SparkEntry.queries("q_ann_sq")(spark, sf0001)
    .collect().toSeq.map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  test("recall clears the SQ8 floor against both exact truths") {
    assert(rows.map(_._1) === Seq("sq8_vs_cos", "sq8_vs_dot"))
    for ((v, nExact, hits, bp) <- rows) {
      assert(nExact > 0 && hits > 0, s"$v: vacuous harness")
      assert(bp >= 5000L,
        s"$v recall ${bp}bp below the 50% SQ8 floor — quantizer broken")
    }
  }

  test("codes are signed bytes and the quantizer round-trips within half a step") {
    val emb = graft.tables.Tables.embeddings(spark, sf0001)
      .select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect()
    val d = emb.head._2.length
    val lo = (0 until d).map(j => emb.map(_._2(j).toDouble).min)
    val hi = (0 until d).map(j => emb.map(_._2(j).toDouble).max)
    for ((_, v) <- emb.take(50); j <- 0 until d) {
      val sc = (hi(j) - lo(j)) / 255.0
      val code = if (sc == 0) 0L
        else math.floor((v(j) - lo(j)) / sc + 0.5).toLong - 128L
      assert(code >= -128L && code <= 127L,
        s"code $code out of int8 range at dim $j")
      if (sc != 0) {
        val deq = lo(j) + (code + 128L) * sc
        assert(math.abs(deq - v(j)) <= sc / 2 + 1e-12,
          s"round-trip error beyond half a step at dim $j")
      }
    }
  }
}
