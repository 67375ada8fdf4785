package graft.sim

import graft.{SparkEntry, SparkSpec}

/** q_ann_hnsw_delete — tombstone delete + compaction on the graph
  * index: compacted == the stored pre-upsert target at every layer,
  * masked is a strict subset of the target at the layer where the
  * delete bites (the refill delta compaction exists for), and the
  * carried/recomputed algebra partitions the compacted set. */
class HnswDeleteSpec extends SparkSpec {

  private lazy val rows = SparkEntry.queries("q_ann_hnsw_delete")(
    spark, sf0001).collect()
    .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
    .toMap

  test("compaction converges to the never-inserted graph at every layer") {
    for (l <- 0 to Hnsw.MaxLevel)
      assert(rows(s"l${l}_compacted") == rows(s"l${l}_target"),
        s"layer $l compaction diverged from the target graph")
  }

  test("carried and recomputed partition the compacted set") {
    for (l <- 0 to Hnsw.MaxLevel) {
      val c = rows(s"l${l}_carried")
      val r = rows(s"l${l}_recomputed")
      val m = rows(s"l${l}_compacted")
      assert(c._1 + r._1 == m._1, s"layer $l counts")
      assert(c._2 + r._2 == m._2, s"layer $l sums")
      assert((c._3 ^ r._3) == m._3, s"layer $l xors")
    }
  }

  test("the tombstone serve under-fills until compaction refills") {
    // at least one layer lost an edge to the mask AND the refill
    // brought the compacted count back above the masked count
    val bites = (0 to Hnsw.MaxLevel).filter(l =>
      rows(s"l${l}_masked")._1 < rows(s"l${l}_target")._1)
    assert(bites.nonEmpty, "the delete batch masked nothing — vacuous")
    for (l <- bites)
      assert(rows(s"l${l}_compacted")._1 > rows(s"l${l}_masked")._1,
        s"layer $l: compaction did not refill the masked under-fill")
  }
}
