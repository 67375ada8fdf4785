package graft.pipeline

import graft.{SparkEntry, SparkSpec}

/** q_curriculum: the anneal must genuinely move mass — the top band's
  * share non-increasing over epochs — and the endpoint must equal the
  * plain document shares (uniform weights by construction). */
class CurriculumSpec extends SparkSpec {
  import spark.implicits._

  test("top-band share anneals down; epoch 3 equals the plain mix; shares fold") {
    val rows = SparkEntry.queries("q_curriculum")(spark, sf0001)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val bands = rows.map(_._2).distinct.sorted
    assert(bands.size >= 3, s"degenerate band histogram: $bands")
    val top = bands.max
    val topShares = (1L to 3L).map(e =>
      rows.find(r => r._1 == e && r._2 == top).get._5)
    assert(topShares === topShares.sorted.reverse,
      s"top-band share must anneal down: $topShares")
    assert(topShares.head > topShares.last, "anneal moved nothing")
    // epoch 3: weights all 1 => shares are the plain doc shares
    val e3 = rows.filter(_._1 == 3L)
    assert(e3.forall(_._4 == 1L))
    val total = e3.map(_._3).sum
    e3.foreach { r =>
      assert(r._5 === 1000L * r._3 / total, s"epoch-3 band ${r._2}")
    }
    // per-epoch shares fold to ~1000
    (1L to 3L).foreach { e =>
      val pm = rows.filter(_._1 == e).map(_._5).sum
      assert(pm >= 1000 - bands.size && pm <= 1000, s"epoch $e folds to $pm")
    }
  }
}
