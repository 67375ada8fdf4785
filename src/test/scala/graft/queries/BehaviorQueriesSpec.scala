package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavior-family semantics pinned against independent driver-side
  * recomputation (the DuckDB oracle pins exact values). */
class BehaviorQueriesSpec extends SparkSpec {
  import spark.implicits._

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, sf0001)

  test("q_decay_score: taps reproduce the per-user unrolled recurrence") {
    val got = run("q_decay_score")
      .select("event_id", "decay_sum").as[(Long, Long)].collect().toMap
    assert(got.nonEmpty)
    // independent recompute from the raw events, in the query's own
    // (ts, event_id) window order: last 8 quantized values, each
    // halved per step of age
    val base = graft.tables.Tables.events(spark, sf0001)
      .where(col("value").isNotNull)
      .select(col("user_id"), col("ts").cast("long").as("tsl"), col("event_id"),
        graft.ops.Num.floorEps(col("value") * 1e6).as("v"))
      .as[(Long, Long, Long, Long)].collect()
    base.groupBy(_._1).foreach { case (_, rows) =>
      val ordered = rows.sortBy(r => (r._2, r._3))
      ordered.zipWithIndex.foreach { case ((_, _, eid, _), i) =>
        val window = ordered.slice(math.max(0, i - 7), i + 1).map(_._4)
        val expected = window.reverse.zipWithIndex.map { case (v, k) => v >> k }.sum
        assert(got(eid) === expected)
      }
    }
  }

  test("q_decay_score: all 8 taps fuse into ONE Window node (one user_id shuffle)") {
    val plan = run("q_decay_score").queryExecution.executedPlan.toString
    val windows = "(?m)^\\s*[+:*-]*\\s*\\(?\\d*\\)?\\s*Window ".r
      .findAllIn(plan).length
    assert(windows === 1, s"expected one Window node, plan:\n$plan")
  }

  test("q_markov_transitions: counts conserve and probabilities floor to ppm") {
    val m = run("q_markov_transitions")
      .select("prev_type", "event_type", "n", "p_ppm")
      .as[(String, String, Long, Long)].collect()
    assert(m.nonEmpty)
    // each row's ppm is the floored integral share of its prev-row total
    m.groupBy(_._1).foreach { case (_, rows) =>
      val tot = rows.map(_._3).sum
      rows.foreach { case (_, _, n, ppm) => assert(ppm === n * 1000000L / tot) }
      // floors sum to ≤ 1e6 and within |types| of it
      val s = rows.map(_._4).sum
      assert(s <= 1000000L && s > 1000000L - rows.length)
    }
    // total transitions = total events with a predecessor
    val events = graft.tables.Tables.events(spark, sf0001)
      .groupBy("user_id").agg(count(lit(1)).as("c"))
      .as[(Long, Long)].collect()
    assert(m.map(_._3).sum === events.map(_._2 - 1).sum)
  }

  test("q_attribution: every model distributes exactly 1000 per attributed conversion") {
    val out = graft.SparkEntry.queries("q_attribution")(spark, sf0001)
      .select("model", "event_type", "credit_milli", "n_touches_credited")
      .as[(String, String, Long, Long)].collect().toSeq
    assert(out.map(_._1).toSet === Set("first_touch", "last_touch", "linear"))

    // conversions with >=1 touch, recomputed independently
    val ev = graft.tables.Tables.events(spark, sf0001)
      .select("user_id", "ts", "event_id", "event_type")
      .as[(Long, java.sql.Timestamp, Long, String)].collect().toSeq
    val convs = ev.filter(_._4 == "purchase")
    val touches = ev.filter(e => e._4 == "click" || e._4 == "view")
    val attributed = convs.count { c =>
      touches.exists(t => t._1 == c._1 && t._2.getTime < c._2.getTime &&
        t._2.getTime >= c._2.getTime - 3L * 86400000L)
    }
    assert(attributed > 0)
    // each model's total credit = 1000 * attributed conversions (the
    // conservation law deterministic remainder allocation guarantees)
    Seq("first_touch", "last_touch", "linear").foreach { m =>
      assert(out.filter(_._1 == m).map(_._3).sum === 1000L * attributed, m)
    }
    // first/last credit exactly one touch per conversion; linear >= that
    Seq("first_touch", "last_touch").foreach { m =>
      assert(out.filter(_._1 == m).map(_._4).sum === attributed.toLong, m)
    }
    assert(out.filter(_._1 == "linear").map(_._4).sum >= attributed.toLong)
  }

  test("q_event_paths equals the brute 3-gram count; q_funnel_time consistent with q_funnel") {
    val got = graft.SparkEntry.queries("q_event_paths")(spark, sf0001)
      .select("path", "n").as[(String, Long)].collect().toSeq

    val ev = graft.tables.Tables.events(spark, sf0001)
      .select("user_id", "ts", "event_id", "event_type")
      .as[(Long, java.sql.Timestamp, Long, String)].collect().toSeq
    val brute = ev.groupBy(_._1).values.flatMap { rows =>
      rows.sortBy(r => (r._2.getTime, r._3)).map(_._4)
        .sliding(3).filter(_.size == 3).map(_.mkString(">"))
    }.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (p, n) => (-n, p) }.take(10)
    assert(got === brute)

    // funnel_time edges count exactly the users q_funnel admits
    val ft = graft.SparkEntry.queries("q_funnel_time")(spark, sf0001)
      .select("edge", "n_users", "min_s", "p50_s", "p90_s", "max_s")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val funnel = graft.SparkEntry.queries("q_funnel")(spark, sf0001)
      .select("stage", "n_users").as[(String, Long)].collect().toMap
    assert(ft("1_view_to_click")._2 === funnel("2_click"))
    assert(ft("2_click_to_purchase")._2 === funnel("3_purchase"))
    ft.values.foreach { e =>
      assert(e._3 >= 1 && e._3 <= e._4 && e._4 <= e._5 && e._5 <= e._6,
        s"${e._1}: duration order")
    }
  }

  test("q_seasonal_decompose equals the brute decomposition; residuals bounded") {
    val got = graft.SparkEntry.queries("q_seasonal_decompose")(spark, sf0001)
      .select("day", "total_c", "trend_c", "dow", "seasonal_c", "resid_c")
      .as[(java.sql.Date, Long, Long, Long, Long, Long)].collect().toSeq
      .sortBy(_._1.getTime)

    // brute: daily cents totals -> centered MA7 -> dow means -> residual
    val daily = graft.tables.Tables.events(spark, sf0001)
      .where(col("value").isNotNull)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(graft.ops.Num.cents(col("value"))).as("t"))
      .as[(java.sql.Date, Long)].collect().toSeq.sortBy(_._1.getTime)
    val full = daily.indices.drop(3).dropRight(3).map { i =>
      val win = daily.slice(i - 3, i + 4).map(_._2)
      val trend = graft.ops.Num.floorEpsLong(win.sum.toDouble / 7.0)
      (daily(i)._1, daily(i)._2, trend, daily(i)._2 - trend)
    }
    val cal = java.util.Calendar.getInstance(
      java.util.TimeZone.getTimeZone("UTC"))
    def dow(d: java.sql.Date): Long = {
      cal.setTimeInMillis(d.getTime); cal.get(java.util.Calendar.DAY_OF_WEEK).toLong
    }
    val seas = full.groupBy(r => dow(r._1)).view.mapValues { rs =>
      graft.ops.Num.floorEpsLong(rs.map(_._4).sum.toDouble / rs.size)
    }.toMap
    val brute = full.map { case (d, t, tr, detr) =>
      (d, t, tr, dow(d), seas(dow(d)), detr - seas(dow(d)))
    }
    assert(got === brute)
    // per-dow residual mass is the floor remainder: 0 <= sum < count
    got.groupBy(_._4).foreach { case (dw, rs) =>
      val s = rs.map(_._6).sum
      assert(s >= 0 && s < rs.size, s"dow $dw residual sum $s")
    }
  }
}
