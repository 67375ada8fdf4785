package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q_mv_maintain: the delta-maintained view must equal the full
  * recompute on every row, the retractions must be genuinely applied
  * (the maintained view differs from the v1 base), and no gen2/gen3
  * table scan may appear on the maintenance side's lineage. */
class MvMaintainSpec extends SparkSpec {
  import spark.implicits._

  test("maintained == recomputed everywhere; retractions really moved the view") {
    val rows = SparkEntry.queries("q_mv_maintain")(spark, sf0001)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r._2 === r._4 && r._3 === r._5,
        s"maintained view diverged from recompute at ${r._1}: $r")
      assert(r._2 > 0)
    }
    // the deltas were non-vacuous: v1's base aggregate differs
    val root = graft.ops.VersionChain.ensure(spark, sf0001)
    val base = spark.read.parquet(s"$root/gen1")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("vc").as("s"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3))
      .toMap
    val moved = rows.count(r => base(r._1) != ((r._2, r._3)))
    assert(moved === rows.size,
      "every event type should have been touched by the sweep/update")
    // and the update alone (not just the sweep) is visible: sums move
    // beyond what pure row removal explains for at least one type
    val v2removed = spark.read.parquet(s"$root/cdf/v2")
      .groupBy("event_type").agg(count(lit(1)).as("nr"), sum("vc").as("sr"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3))
      .toMap
    val updShift = rows.exists { r =>
      val (bn, bs) = base(r._1)
      val (nr, sr) = v2removed.getOrElse(r._1, (0L, 0L))
      // sweep-only prediction; the +100 updates must break it
      r._3 != bs - sr && r._2 == bn - nr
    }
    assert(updShift, "update retract/re-assert pairs left no trace")
  }
}
