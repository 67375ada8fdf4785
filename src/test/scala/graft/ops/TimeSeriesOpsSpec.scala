package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Date

/** Reference edge cases from SURVEY.md §5.2, as small in-memory
  * frames: censored leading runs (il_analysis_git.py:24-27), groups
  * shorter than the 7-row stride (:153-154), first-date delta fallback
  * (:164), p_vaccine clamp (:137). */
class TimeSeriesOpsSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  test("rebase15 imputes only while the cumulative metric is zero") {
    // id 1: two censored (0) days with new-flags, then a real value.
    val df = Seq(
      (1L, d("2021-01-01"), 0L, 1L),
      (1L, d("2021-01-02"), 0L, 1L),
      (1L, d("2021-01-03"), 100L, 0L),
      (2L, d("2021-01-01"), 50L, 1L)   // no leading zero-run -> no-op
    ).toDF("id", "date", "cval", "new_case")
    val out = TimeSeriesOps.rebase15(df, "id", "date", "cval", "new_case", "cases")
      .orderBy("id", "date")
      .select("cases_cum", "cases_m", "cases_imputed")
      .as[(Long, Long, Long)].collect()
    assert(out === Array((0L, 1L, 1L), (0L, 2L, 2L), (100L, 0L, 100L), (50L, 0L, 50L)))
  }

  test("strideSample keeps the latest date fixed, groups shorter than stride keep 1 row") {
    val df = (1 to 10).map(i => (1L, d(f"2021-01-$i%02d"), i.toLong))
      .toDF("id", "date", "v")
      .union(Seq((2L, d("2021-01-01"), 1L), (2L, d("2021-01-02"), 2L))
        .toDF("id", "date", "v"))
    val out = TimeSeriesOps.strideSample(df, "id", "date", 7)
      .orderBy("id", "date").select("id", "v").as[(Long, Long)].collect()
    // id 1: rows 10 (latest) and 3 (10-7); id 2: latest only
    assert(out === Array((1L, 3L), (1L, 10L), (2L, 2L)))
  }

  test("dailyDelta falls back to own value on the first date") {
    val df = Seq(
      (1L, d("2021-01-01"), 10L),
      (1L, d("2021-01-02"), 15L),
      (1L, d("2021-01-03"), 15L)
    ).toDF("id", "date", "cases")
    val out = TimeSeriesOps.dailyDelta(df, "id", "date", "cases", "delta")
      .orderBy("date").select("delta").as[Long].collect()
    assert(out === Array(10L, 5L, 0L))
  }

  test("rebaseToStart zeroes the first date of every group") {
    val df = Seq(
      (1L, d("2021-01-01"), 10L), (1L, d("2021-01-02"), 25L),
      (2L, d("2021-01-05"), 7L), (2L, d("2021-01-06"), 7L)
    ).toDF("id", "date", "cases")
    val out = TimeSeriesOps.rebaseToStart(df, "id", "date", Seq("cases"))
      .orderBy("id", "date").select("cases").as[Long].collect()
    assert(out === Array(0L, 15L, 0L, 0L))
  }

  test("latestPercent broadcasts the latest ratio and clamps") {
    val df = Seq(
      (1L, d("2021-01-01"), 50L, 100L),
      (1L, d("2021-01-02"), 150L, 100L)  // 150% -> clamped to 100
    ).toDF("id", "date", "vaccine", "pop")
    val out = TimeSeriesOps.latestPercent(df, "id", "date", "vaccine", "pop",
        "p_vaccine", clampTo = Some(100L))
      .select("p_vaccine").as[Long].collect()
    assert(out === Array(100L, 100L))
  }

  test("dailySums produces totals and day-over-day deltas") {
    val df = Seq(
      (1L, d("2021-01-01"), 10L), (2L, d("2021-01-01"), 5L),
      (1L, d("2021-01-02"), 20L)
    ).toDF("id", "date", "cases")
    val out = TimeSeriesOps.dailySums(df, "date", "cases")
      .orderBy("date").select("tot", "delta").as[(Long, Long)].collect()
    assert(out === Array((15L, 15L), (20L, 5L)))
  }

  test("gap fill: contiguous per-id calendar, observed rows exact, gaps carry the fill") {
    import org.apache.spark.sql.functions._
    val out = graft.SparkEntry.queries("q_gap_fill")(spark, sf0001)
      .as[(Long, java.sql.Date, Option[Long], Boolean)].collect()
    assert(out.nonEmpty)
    val daily = graft.queries.EventSeries.daily(spark, sf0001)
      .select(col("id"), col("date"), col("dval"))
      .as[(Long, java.sql.Date, Long)].collect()
      .map { case (id, dt, v) => (id, dt) -> v }.toMap
    out.groupBy(_._1).foreach { case (id, rows) =>
      val sorted = rows.sortBy(_._2.getTime)
      // calendar is contiguous: one row per day, span edges observed
      assert(!sorted.head._4 && !sorted.last._4, s"id $id span edge is a gap")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._2.toLocalDate === a._2.toLocalDate.plusDays(1),
            s"id $id calendar hole after ${a._2}")
        case _ =>
      }
      // observed rows carry their own value; gaps carry the last observed
      var lastSeen: Option[Long] = None
      sorted.foreach { case (_, dt, ff, isGap) =>
        if (!isGap) {
          assert(daily.contains((id, dt)))
          assert(ff === Some(daily((id, dt))))
          lastSeen = ff
        } else {
          assert(!daily.contains((id, dt)))
          assert(ff === lastSeen, s"id $id gap at $dt not forward-filled")
        }
      }
    }
  }
}
