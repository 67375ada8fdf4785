package graft.queries

import graft.{SparkEntry, SparkSpec}

/** q_rag_pipeline accounting invariants + cross-check of stage 1
  * against the standalone q_passage_dedup (the composition must not
  * drift from the component). */
class RagPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("stage chain composes and stage 1 equals q_passage_dedup") {
    val rows = SparkEntry.queries("q_rag_pipeline")(spark, sf0001)
      .select("stage", "n_in", "n_out", "m1", "m2")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows.keySet ===
      Set("1_passage_dedup", "2_chunk", "3_vectorize", "4_index"))
    val s1 = rows("1_passage_dedup"); val s2 = rows("2_chunk")
    val s3 = rows("3_vectorize"); val s4 = rows("4_index")

    // the chain: each stage consumes the previous stage's output domain
    assert(s2._2 === s1._3, "s2.n_in != s1.n_out")
    assert(s3._2 === s2._3, "s3.n_in != s2.n_out")
    assert(s4._2 === s3._3, "s4.n_in != s3.n_out")
    // dedup keeps a strict subset of passages; chunks cover every token
    assert(s1._5 < s1._4 && s1._5 > 0)
    assert(s2._4 > 0 && s2._5 <= s2._3) // full chunks <= chunks
    // index: <= 16 buckets, sizes ordered
    assert(s4._3 <= 16 && s4._4 >= s4._5 && s4._5 >= 1)

    // stage-1 cross-check against the standalone component
    val pd = SparkEntry.queries("q_passage_dedup")(spark, sf0001)
      .select("doc_id", "n_passages", "n_kept")
      .as[(Long, Long, Long)].collect()
    assert(s1._2 === pd.length.toLong)
    assert(s1._3 === pd.count(_._3 > 0).toLong)
    assert(s1._4 === pd.map(_._2).sum)
    assert(s1._5 === pd.map(_._3).sum)
  }
}
