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
}
