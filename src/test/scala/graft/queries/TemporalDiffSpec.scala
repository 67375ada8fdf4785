package graft.queries

import graft.SparkSpec

/** Snapshot-diff semantics ([[TemporalQueries]] `q_snapshot_diff`):
  * the change classes must match the deterministic derivation of the
  * two snapshots (the DuckDB oracle pins exact values). */
class TemporalDiffSpec extends SparkSpec {
  import spark.implicits._

  test("q_snapshot_diff classes match the snapshot derivations") {
    val d = graft.SparkEntry.queries("q_snapshot_diff")(spark, sf0001)
      .select("o_orderkey", "change", "old_status", "new_status")
      .as[(Long, String, Option[String], Option[String])].collect()
    assert(d.nonEmpty)
    val by = d.groupBy(_._2)
    // all three classes occur at this horizon split
    assert(by.keySet === Set("added", "removed", "changed"))
    // removed = the modular delete-set (keys % 97 == 0 present in A)
    by("removed").foreach { case (k, _, old, nw) =>
      assert(k % 97 === 0 && old.nonEmpty && nw.isEmpty)
    }
    // added rows exist only in B (the extended horizon)
    by("added").foreach { case (_, _, old, nw) =>
      assert(old.isEmpty && nw.nonEmpty)
    }
    // the only simulated update is the O→F status backfill
    by("changed").foreach { case (_, _, old, nw) =>
      assert(old.contains("O") && nw.contains("F"))
    }
  }
}
