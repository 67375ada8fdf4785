package graft.queries

import graft.{SparkEntry, SparkSpec}

/** q_journey_pipeline accounting invariants + cross-checks against
  * the standalone components (the composition must not drift). */
class JourneyPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("stage chain composes; attribution conserves; sessionize matches standalone") {
    val rows = SparkEntry.queries("q_journey_pipeline")(spark, sf0001)
      .select("stage", "n_in", "n_out", "m1", "m2")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows.keySet ===
      Set("1_sessionize", "2_funnel", "3_attribution", "4_revenue"))
    val s1 = rows("1_sessionize"); val s2 = rows("2_funnel")
    val s3 = rows("3_attribution"); val s4 = rows("4_revenue")

    // chain: sessions feed the funnel; conversions feed attribution
    // and revenue
    assert(s2._2 === s1._3)
    assert(s3._2 === s2._3 && s4._2 === s2._3)
    // funnel narrows: viewed >= clicked >= converted, all <= sessions
    assert(s2._4 >= s2._5 && s2._5 >= s2._3 && s2._4 <= s2._2)
    assert(s2._3 > 0, "no same-session conversions on this corpus")
    // attribution conservation: view + click credit = 1000 per conversion
    assert(s3._4 + s3._5 === 1000L * s3._2)
    // revenue: converted users <= conversions; max <= total
    assert(s4._3 <= s4._2 && s4._5 <= s4._4)

    // stage-1 cross-check against a brute 12h-gap sessionization
    // (q_sessionize_batch uses the 30-min clickstream gap; the
    // flagship's 12h gap matches this fixture's event density)
    val ev = graft.tables.Tables.events(spark, sf0001)
      .select("user_id", "ts", "event_id")
      .as[(Long, java.sql.Timestamp, Long)].collect().toSeq
    val sessions = ev.groupBy(_._1).values.flatMap { rows =>
      val sorted = rows.sortBy(r => (r._2.getTime, r._3))
      val sizes = scala.collection.mutable.ArrayBuffer(0L)
      var prev = Long.MinValue
      sorted.foreach { r =>
        if (prev != Long.MinValue && r._2.getTime - prev > 12L * 3600 * 1000)
          sizes += 0L
        sizes(sizes.length - 1) += 1
        prev = r._2.getTime
      }
      sizes
    }.toSeq
    assert(s1._2 === ev.length.toLong)          // events in
    assert(s1._3 === sessions.length.toLong)    // session count
    assert(s1._4 === ev.map(_._1).distinct.length.toLong)
    assert(s1._5 === sessions.max)
  }
}
