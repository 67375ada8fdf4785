package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q_mv_join_maintain — join-view IVM with deltas on both sides: the
  * delta-maintained figures must equal the full recompute exactly,
  * the dimension delta must equal Δw times the auxiliary raw sum, and
  * the executed plan's maintenance inputs must be the change feed. */
class MvJoinSpec extends SparkSpec {

  private lazy val df = SparkEntry.queries("q_mv_join_maintain")(
    spark, sf0001)
  private lazy val rows = df.collect().toSeq

  test("maintained == recomputed, every type, both figures") {
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getLong(1) == r.getLong(3), s"n drift at ${r.getString(0)}")
      assert(r.getLong(2) == r.getLong(4),
        s"weighted-sum drift at ${r.getString(0)}")
    }
  }

  test("the dimension delta equals Δw times the raw auxiliary sum") {
    val root = graft.ops.VersionChain.ensure(spark, sf0001)
    val tStar = spark.read.parquet(s"$root/gen1")
      .agg(min("event_type")).head().getString(0)
    val raw3 = spark.read.parquet(s"$root/gen3")
      .filter(col("event_type") === tStar)
      .agg(coalesce(sum("vc"), lit(0L))).head().getLong(0)
    val oldW = (tStar.length % 5 + 1).toLong
    val got = rows.find(_.getString(0) == tStar).get.getLong(2)
    val n3 = spark.read.parquet(s"$root/gen3")
      .filter(col("event_type") === tStar).count()
    assert(n3 > 0, "the corrected type was swept — fixture degenerate")
    // wsum(t*) = (oldW + 10) * raw3 — the +10 applied via raw, not a scan
    assert(got == (oldW + 10L) * raw3)
  }

  test("the maintenance inputs are the change feed, not a base rescan") {
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("cdf/v2") && plan.contains("cdf/v3"),
      "maintenance side does not read the stored deltas")
    assert(plan.contains("gen1") && plan.contains("gen3"))
    // gen2 (the intermediate snapshot) is never scanned: maintenance
    // composes deltas, it does not diff snapshots
    assert(!plan.contains("gen2"),
      "maintenance side rescans an intermediate snapshot")
  }
}
