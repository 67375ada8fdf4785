package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AnalyticSpec extends SparkSpec {
  import spark.implicits._

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, sf0001)

  test("q_scd2 intervals tile each user's timeline: no gaps, one current version") {
    val rows = run("q_scd2")
      .select("user_id", "valid_from", "valid_to", "is_current")
      .as[(Long, java.sql.Timestamp, Option[java.sql.Timestamp], Boolean)]
      .collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (u, vs) =>
      val sorted = vs.sortBy(_._2.getTime)
      // exactly one open (current) version per key, and it is the last
      assert(vs.count(_._4) === 1, s"user $u")
      assert(sorted.last._4 && sorted.last._3.isEmpty, s"user $u")
      // every closed version's valid_to equals the next valid_from —
      // the timeline tiles with no gap or overlap
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3.contains(b._2), s"user $u: gap/overlap at ${a._3} -> ${b._2}")
        case _ =>
      }
    }
  }

  test("q_cdc_apply: one final row per key, tombstoned keys absent") {
    val ev = graft.tables.Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_id"),
        col("ts").cast("long").as("tsl"), col("event_type"))
      .as[(Long, Long, Long, String)].collect()
    val out = run("q_cdc_apply")
      .select(col("user_id"), col("event_id"))
      .as[(Long, Long)].collect()
    assert(out.nonEmpty)
    assert(out.map(_._1).distinct.length === out.length, "duplicate keys in final state")
    // a user whose globally-latest event is a post-cutoff purchase is
    // tombstoned; the cutoff only RESCUES pre-cutoff purchases (they
    // enter via the snapshot as upserts), so latest-is-purchase AND
    // present implies that purchase was pre-cutoff
    val t0 = ev.map(_._3).max - 7L * 86400
    val present = out.map(_._1).toSet
    ev.groupBy(_._1).foreach { case (u, es) =>
      val latest = es.maxBy(e => (e._3, e._2))
      if (latest._4 == "purchase" && latest._3 >= t0)
        assert(!present(u), s"user $u should be tombstoned")
    }
  }

  test("q_cube emits all four grouping sets with consistent totals") {
    val rows = run("q_cube")
      .select("gid", "n").as[(Long, Long)].collect()
    val byGid = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    // every grouping set must cover the full row count
    assert(byGid.keySet === Set(0L, 1L, 2L, 3L))
    assert(byGid.values.toSet.size === 1, s"per-set totals differ: $byGid")
  }

  test("q_rank_funcs: rank gaps vs dense_rank, quartiles balanced") {
    val df = run("q_rank_funcs").cache()
    val bad = df.filter(col("rnk") < col("drnk")).count()
    assert(bad === 0, "rank must be >= dense_rank")
    val quartiles = df.select("quartile").distinct().as[Int].collect().sorted
    assert(quartiles.toSeq === Seq(1, 2, 3, 4))
    df.unpersist()
  }

  test("q_unpivot: 3 metrics per group, values match the wide frame") {
    val out = run("q_unpivot").as[(String, String, Long)].collect()
    val perGroup = out.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    perGroup.values.foreach(m =>
      assert(m === Set("n_rows", "sum_qty_c", "sum_price_c")))
  }

  test("q_range_frame: trailing window includes current row, sums are cumulative-bounded") {
    val df = run("q_range_frame")
    assert(df.filter(col("cnt30") < 1).count() === 0)
    // a 30-day trailing sum can never exceed the per-customer total
    val tot = df.groupBy("o_custkey").agg(max(col("cnt30")).as("mx"),
      count(lit(1)).as("n"))
    assert(tot.filter(col("mx") > col("n")).count() === 0)
  }

  test("q_string_sim: levenshtein is 0 iff equal, bounded by max length") {
    val rows = run("q_string_sim")
      .select("n_name", "r_name", "lev").as[(String, String, Int)].collect()
    rows.foreach { case (n, r, d) =>
      assert((d == 0) === (n == r))
      assert(d <= math.max(n.length, r.length))
    }
  }

  test("q_corr_moments: correlation quantized within [-1e6, 1e6]") {
    val rows = run("q_corr_moments").select("corr_x1e6").as[Long].collect()
    assert(rows.nonEmpty)
    rows.foreach(c => assert(c >= -1000000L && c <= 1000000L))
  }
}
