package graft.queries

import graft.{SparkEntry, SparkSpec}
import graft.tables.Tables

/** q_kanon_audit invariants: the ladder is a partition of the table
  * (row totals conserve), every group settled at a releasable level
  * really reaches k, and the audit is minimal — a row settles at
  * level l only because every finer level left its group below k
  * (implied by the CASE ordering; pinned here via the per-level
  * min_group ≥ k bound, which a mis-ordered CASE would break). */
class KanonSpec extends SparkSpec {
  import spark.implicits._

  test("kanon ladder conserves rows and every released group reaches k") {
    val out = SparkEntry.queries("q_kanon_audit")(spark, sf0001)
      .select("level", "n_rows", "n_groups", "min_group")
      .as[(Int, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.nonEmpty)
    val total = Tables.customer(spark, sf0001).count()
    assert(out.map(_._2).sum === total, "rows must conserve across levels")
    out.filter(_._1 <= 3).foreach { case (level, _, nGroups, minGroup) =>
      assert(nGroups >= 1)
      assert(minGroup >= 5, s"level $level released a group of $minGroup < k")
    }
    // sf0.001 is small enough that L0 cells rarely reach k = 5: the
    // ladder must actually be exercised past level 0 here.
    assert(out.exists(_._1 >= 1), "generalization ladder never engaged")
  }

  test("q_l_diversity: homogeneous groups surface; ladder partitions the groups") {
    import org.apache.spark.sql.functions.{col, expr}
    val got = graft.SparkEntry.queries("q_l_diversity")(spark, sf0001)
      .select("l", "n_groups", "n_rows", "max_top_share_ppm")
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    // brute recompute from raw customers
    val rows = graft.tables.Tables.customer(spark, sf0001)
      .select(col("c_nationkey").cast("long"),
        expr("CAST(floor(c_acctbal / 2000) AS BIGINT)"), col("c_mktsegment"))
      .as[(Long, Long, String)].collect()
    val brute = rows.groupBy(r => (r._1, r._2)).values.map { g =>
      val bySeg = g.groupBy(_._3).values.map(_.size.toLong)
      (bySeg.size.toLong, g.size.toLong, 1000000L * bySeg.max / g.size)
    }.toSeq.groupBy(_._1).map { case (l, gs) =>
      (l, gs.size.toLong, gs.map(_._2).sum, gs.map(_._3).max)
    }.toSeq.sortBy(_._1)
    assert(got === brute)
    // the homogeneity attack is REAL on this fixture: l = 1 groups
    // exist and their top share is exactly 10^6
    val l1 = got.find(_._1 == 1L)
    assert(l1.isDefined, "fixture must contain homogeneous groups")
    assert(l1.get._4 === 1000000L)
    // diverse groups exist too, and the ladder covers every customer
    assert(got.exists(r => r._1 >= 3L))
    assert(got.map(_._3).sum === rows.length.toLong)
    // top share can never undercut the 1/l uniform floor
    got.foreach { case (l, _, _, ts) => assert(ts >= 1000000L / l) }
  }
}
