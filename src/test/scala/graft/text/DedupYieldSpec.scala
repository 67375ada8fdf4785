package graft.text

import graft.{SparkEntry, SparkSpec}

/** q_dedup_yield: the histogram must partition the corpus exactly
  * (Σ n_docs = corpus size), the removal column must be the
  * keep-one-per-cluster arithmetic, and the multi-doc rows must match
  * a brute recount over the component labels. */
class DedupYieldSpec extends SparkSpec {
  import spark.implicits._

  test("histogram partitions the corpus; removal arithmetic exact; brute agrees") {
    val rows = SparkEntry.queries("q_dedup_yield")(spark, sf0001)
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    val corpus = graft.tables.Tables.documents(spark, sf0001).count()
    assert(rows.map(_._3).sum === corpus,
      "histogram docs must partition the corpus")
    rows.foreach { case (sz, nc, nd, nr) =>
      assert(nd === sz * nc)
      assert(nr === (sz - 1) * nc)
    }
    assert(rows.exists(_._1 >= 3), "no multi-doc family — vacuous yield")
    // brute: recount from the stored labels
    val root = Dedup.ensurePairGraph(spark, sf0001)
    val labels = spark.read.parquet(s"$root/labels")
      .as[(Long, Long)].collect().toSeq
    graft.ops.SideCache.releaseAll()
    val sizes = labels.groupBy(_._2).map(_._2.size.toLong)
      .groupBy(identity).map { case (sz, g) => sz -> g.size.toLong }
    rows.filter(_._1 > 1).foreach { case (sz, nc, _, _) =>
      assert(sizes.get(sz).contains(nc), s"size-$sz cluster count")
    }
    assert(rows.find(_._1 == 1L).get._2 === corpus - labels.size)
  }
}
