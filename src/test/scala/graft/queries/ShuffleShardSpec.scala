package graft.queries

import graft.{SparkEntry, SparkSpec}

/** q_shuffle_shard invariants: the shuffled positions are an exact
  * permutation consistent with the (sk, doc_id) order, shards are cut
  * sequentially at size S, and the layout is reproducible. */
class ShuffleShardSpec extends SparkSpec {
  import spark.implicits._

  test("positions are the (sk, doc_id)-order permutation; shards sequential") {
    val got = SparkEntry.queries("q_shuffle_shard")(spark, sf0001)
      .select("doc_id", "sk", "pos", "shard", "pos_in_shard")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq

    val n = got.size
    // permutation: every position 0..n-1 exactly once
    assert(got.map(_._3).sorted === (0L until n).toSeq)
    // position order == (sk, doc_id) order
    val bySk = got.sortBy(r => (r._2, r._1)).map(_._3)
    assert(bySk === (0L until n).toSeq)
    // sequential sharding arithmetic
    got.foreach { case (_, _, pos, shard, pis) =>
      assert(shard === pos / 64 && pis === pos % 64)
    }
    // every shard except possibly the last is exactly full
    val sizes = got.groupBy(_._4).toSeq.sortBy(_._1).map(_._2.size)
    assert(sizes.init.forall(_ == 64) && sizes.last <= 64)
    // reproducible: a second run is bit-identical
    val again = SparkEntry.queries("q_shuffle_shard")(spark, sf0001)
      .select("doc_id", "sk", "pos", "shard", "pos_in_shard")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(again.sortBy(_._1) === got.sortBy(_._1))
  }

  test("q_pii_luhn detects the valid plant and rejects the near-miss") {
    val got = SparkEntry.queries("q_pii_luhn")(spark, sf0001)
      .select("doc_id", "n_cand", "n_valid", "n_invalid", "sum_valid_cards")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq

    def luhnOk(n: Long): Boolean = {
      var total = 0L; var x = n; var k = 0
      while (k < 16) {
        val d = x % 10
        total += (if (k % 2 == 1) { val e = d * 2; if (e > 9) e - 9 else e } else d)
        x /= 10; k += 1
      }
      total % 10 == 0
    }
    got.foreach { case (id, nc, nv, ni, sum) =>
      val n0 = (400000000000000L + (id * 987654321L) % 100000000000000L) * 10
      val chk = (0 to 9).find(c => luhnOk(n0 + c)).get
      val expValid = if (id % 10 == 0) 1L else 0L
      val expInvalid = if (id % 15 == 0) 1L else 0L
      assert(nv === expValid, s"doc $id valid")
      assert(ni === expInvalid, s"doc $id invalid")
      assert(nc === expValid + expInvalid)
      assert(sum === (if (id % 10 == 0) n0 + chk else 0L), s"doc $id sum")
      // the near-miss plant really fails Luhn
      if (id % 15 == 0) assert(!luhnOk(n0 + (chk + 5) % 10))
    }
    // both plants actually occur in the corpus, incl. a both-plants doc
    assert(got.exists(_._3 > 0) && got.exists(_._4 > 0))
    assert(got.exists(r => r._3 > 0 && r._4 > 0)) // doc_id % 30 == 0
  }
}
