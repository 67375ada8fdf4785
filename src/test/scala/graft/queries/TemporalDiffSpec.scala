package graft.queries

import graft.SparkSpec

/** Snapshot-diff semantics ([[TemporalQueries]] `q_snapshot_diff`):
  * the change classes must match the deterministic derivation of the
  * two snapshots (the DuckDB oracle pins exact values). */
class TemporalDiffSpec extends SparkSpec {
  import spark.implicits._

  test("q_rolling_zscore matches a driver-side recompute of the trailing-7 moments") {
    import org.apache.spark.sql.functions._
    val daily = graft.tables.Tables.events(spark, sf0001)
      .where(col("value").isNotNull)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(graft.ops.Num.cents(col("value"))).as("x"))
      .as[(String, java.sql.Date, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2.getTime).map(_._3)).toMap
    val got = graft.SparkEntry.queries("q_rolling_zscore")(spark, sf0001)
      .select(col("event_type"), col("x"), col("z_milli"))
      .as[(String, Long, Option[Long])].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3))).toMap
    assert(got.nonEmpty)
    got.foreach { case (et, rows) =>
      val xs = daily(et)
      // full windows only: one output row per day from the 7th on
      assert(rows.length === xs.length - 6)
      rows.zipWithIndex.foreach { case ((x, z), i) =>
        val win = xs.slice(i, i + 7)
        assert(x === win.last)
        val s = win.sum
        val ss = win.map(v => v * v).sum
        val vr = (ss - s * s / 7.0) / 6.0
        val expect = if (vr > 0)
          Some(graft.ops.Num.floorEpsLong((x - s / 7.0) / math.sqrt(vr) * 1000))
        else None
        assert(z === expect, s"$et day#$i")
      }
    }
  }

  test("q_interpolate: every gap value lies on the segment between its brackets") {
    import org.apache.spark.sql.functions._
    val daily = graft.queries.EventSeries.daily(spark, sf0001)
      .select(col("id"), col("date"), col("dval"))
      .as[(Long, java.sql.Date, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2.getTime)).toMap
    val interp = graft.SparkEntry.queries("q_interpolate")(spark, sf0001)
      .select(col("id"), col("date"), col("interp_x1000"))
      .as[(Long, java.sql.Date, Long)].collect()
    assert(interp.nonEmpty)
    interp.foreach { case (id, d, v1000) =>
      val obs = daily(id)
      val prev = obs.filter(_._2.getTime < d.getTime).last
      val next = obs.find(_._2.getTime > d.getTime).get
      val lo = math.min(prev._3, next._3) * 1000
      val hi = math.max(prev._3, next._3) * 1000
      assert(v1000 >= lo - 1000 && v1000 <= hi,
        s"id=$id date=$d interp=$v1000 outside [$lo, $hi]")
    }
  }

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
