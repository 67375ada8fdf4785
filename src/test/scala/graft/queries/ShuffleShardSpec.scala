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
}
