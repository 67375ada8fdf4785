package graft.sim

import graft.{SparkEntry, SparkSpec}

/** The lifecycle-final recall certificate: after the full serving
  * lifecycle (upsert → merge → delete → compact), the stored index's
  * recall@10 against brute cosine over the live survivors must be at
  * least the fresh-index floor — maintenance must not degrade
  * retrieval — and no tombstoned vector may appear in the truth the
  * certificate measures against. */
class AnnLifecycleRecallSpec extends SparkSpec {

  private lazy val rows =
    SparkEntry.queries("q_ann_lifecycle_recall")(spark, sf0001)
      .collect().toSeq.sortBy(_.getString(0))

  test("lifecycle-final recall >= the fresh-index floor") {
    val Seq(fresh, lifecycle) = rows
    assert(fresh.getString(0) === "fresh_upsert" &&
      lifecycle.getString(0) === "lifecycle_final")
    assert(lifecycle.getLong(3) >= fresh.getLong(3),
      s"the serving lifecycle degraded recall: " +
        s"final=${lifecycle.getLong(3)}bp < fresh=${fresh.getLong(3)}bp")
    // both certificates measured over the same query workload
    assert(fresh.getLong(1) === lifecycle.getLong(1))
    // and both tiers retrieve SOMETHING real (a recall certificate of
    // an empty serve would vacuously pass the comparison)
    assert(fresh.getLong(2) > 0 && lifecycle.getLong(2) > 0)
  }

  test("the lifecycle-final serve never returns a tombstoned vector") {
    rows // force the lifecycle run (merge + compact on the fixture)
    import org.apache.spark.sql.functions.col
    val emb = graft.tables.Tables.embeddings(spark, sf0001)
    val path = Similarity.ensureStoredIndex(spark, emb, sf0001,
      split9 = true)
    // the compacted live generation is whatever the livelog resolves
    // for the merged segment — serve it and look for tombstones
    val del = emb.filter(col("vec_id") % 13 === 0).select("vec_id")
    val live = Similarity.ivfPqCompactDelete(spark, path, del,
      Seq("codes_all"))
    val served = Similarity.ivfPqServeStored(emb, path, queryMod = 50L,
      kCand = 100, k = 10, segments = live)
    assert(served.filter(col("vec_id") % 13 === 0).count() === 0L,
      "a tombstoned vector survived the lifecycle into the serve")
  }
}
