package graft.sim

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q_ann_hnsw — the graph-based ANN tier: bounded out-degree, thinning
  * layers, search visits ≪ corpus, and a recall floor in the IVF
  * tier's neighborhood. The oracle hash certifies the exact numbers;
  * these tests pin the STRUCTURAL claims the hash alone can't name. */
class HnswSpec extends SparkSpec {

  private lazy val rows = SparkEntry.queries("q_ann_hnsw")(spark, sf0001)
    .collect().toSeq
    .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
    .toMap

  test("layers thin geometrically and every layer's edges respect the degree bound") {
    val (n0, e0, _) = rows("graph_l0")
    val (n1, e1, _) = rows("graph_l1")
    val (n2, e2, _) = rows("graph_l2")
    assert(n0 > n1 && n1 > n2 && n2 > 0,
      s"layers must thin: $n0 > $n1 > $n2")
    // P(lvl >= l) = 4^-l: each layer within 2x of the geometric mean
    assert(n1 * 2L >= n0 / 4 && n1 <= n0 / 2, s"layer-1 size $n1 vs $n0")
    assert(e0 <= n0 * Hnsw.M && e1 <= n1 * Hnsw.M && e2 <= n2 * Hnsw.M,
      "an out-degree exceeded M")
    // per-node bound, not just the aggregate: recompute adjacency
    val base = Hnsw.withLevels(
      graft.tables.Tables.embeddings(spark, sf0001))
    val maxDeg = Hnsw.adjacency(base, 0)
      .groupBy("src").count().agg(max("count")).head().getLong(0)
    assert(maxDeg <= Hnsw.M, s"a node has out-degree $maxDeg > ${Hnsw.M}")
    graft.ops.SideCache.releaseAll()
  }

  test("search visits a small fraction of the corpus") {
    val (nq, nvis, _) = rows("search")
    val (n0, _, _) = rows("graph_l0")
    assert(nq > 0)
    val perQuery = nvis.toDouble / nq
    assert(perQuery * 8 < n0,
      s"greedy search visited $perQuery of $n0 corpus vectors per " +
        "query — not sublinear")
    // and the theoretical frontier bound holds: entry + every hop's
    // scored neighbor set
    val bound = 1 + (Hnsw.MaxLevel + 1) * Hnsw.Hops * Hnsw.M
    assert(perQuery <= bound, s"visited $perQuery > frontier bound $bound")
  }

  test("recall@10 lands in the IVF tier's neighborhood, far above chance") {
    val (nExact, hits, recallBp) = rows("zz_recall")
    assert(nExact > 0 && hits * 10000L / nExact === recallBp)
    // measured 4800 bp at sf0.001 (IVF nProbe=2 scores 5000); chance
    // for ~30 visited of 500 is ~600 bp — pin a floor with headroom
    assert(recallBp >= 3000L,
      s"greedy graph search recall $recallBp bp below the 3000 floor")
  }
}
