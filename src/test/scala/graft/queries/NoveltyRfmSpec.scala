package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Behavior specs for q_novelty (brute recompute) and q_rfm
  * (quintile arithmetic + segment consistency). */
class NoveltyRfmSpec extends SparkSpec {
  import spark.implicits._

  test("q_novelty equals the brute distinct-shingle df recompute") {
    val got = SparkEntry.queries("q_novelty")(spark, sf0001)
      .select("doc_id", "n_sh", "n_unique", "novelty_milli")
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)

    val docs = graft.tables.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq
    def shingles(t: String): Set[Long] =
      t.split(" ", -1).sliding(6).filter(_.length == 6)
        .map(w => graft.functions.Poly.hashBytes(
          w.mkString(" ").getBytes("UTF-8"), graft.functions.Poly.Base))
        .toSet
    val perDoc = docs.map { case (id, t) => id -> shingles(t) }
    val dfm = perDoc.flatMap(_._2).groupBy(identity).view.mapValues(_.size).toMap
    val brute = perDoc.sortBy(_._1).map { case (id, sh) =>
      val u = sh.count(h => dfm(h) == 1).toLong
      val n = sh.size.toLong
      (id, n, u, if (n == 0) 0L else u * 1000 / n)
    }
    assert(got === brute)
    // the signal spreads: both highly-novel and boilerplate-ish docs exist
    assert(got.exists(_._4 > 500) && got.exists(_._4 < 500))
  }

  test("q_rfm: scores are 1..5 rank-quintiles; segments consistent") {
    val got = SparkEntry.queries("q_rfm")(spark, sf0001)
      .select("user_id", "recency_days", "freq", "monetary_c",
        "r_score", "f_score", "m_score", "segment")
      .as[(Long, Long, Long, Long, Long, Long, Long, String)].collect().toSeq

    assert(got.nonEmpty)
    got.foreach { r =>
      Seq(r._5, r._6, r._7).foreach(s => assert(s >= 1 && s <= 5))
      // segment CASE replay
      val exp =
        if (r._5 >= 4 && r._6 >= 4 && r._7 >= 4) "champion"
        else if (r._5 <= 2 && r._6 >= 3) "at_risk"
        else if (r._5 >= 4 && r._6 <= 2) "recent_light"
        else "regular"
      assert(r._8 === exp, s"user ${r._1}")
    }
    // quintile arithmetic: the best-ranked user on each metric scores 5
    assert(got.minBy(r => (r._2, r._1))._5 === 5)  // most recent
    assert(got.maxBy(r => (r._3, -r._1))._6 === 5) // most frequent
    assert(got.maxBy(r => (r._4, -r._1))._7 === 5) // highest spend
    // recomputed quintile for every user on the frequency metric
    val byF = got.sortBy(r => (-r._3, r._1)).zipWithIndex
    val n = got.size
    byF.foreach { case (r, i) => assert(r._6 === 5 - (i.toLong * 5) / n) }
  }

  test("q_skew_profile equals the brute per-key count stats") {
    val got = SparkEntry.queries("q_skew_profile")(spark, sf0001)
      .select("key_col", "n_rows", "n_keys", "top1_cnt", "top1_share_bp",
        "p99_cnt", "top1_over_avg_x100", "verdict")
      .as[(String, Long, Long, Long, Long, Long, Long, String)]
      .collect().map(r => r._1 -> r).toMap
    assert(got.size === 5)

    def brute(keys: Seq[Long]): (Long, Long, Long, Long) = {
      val counts = keys.groupBy(identity).values.map(_.size.toLong).toSeq.sorted
      val n = keys.size.toLong
      val top = counts.max
      val pos = 0.99 * (counts.size - 1)
      val lo = counts(pos.toInt); val hi = counts(math.ceil(pos).toInt)
      val p99 = graft.ops.Num.floorEpsLong(lo + (hi - lo) * (pos - pos.toInt))
      (n, counts.size.toLong, top, p99)
    }
    val li = graft.tables.Tables.table(spark, sf0001, "lineitem")
      .selectExpr("CAST(l_orderkey AS BIGINT)").as[Long].collect().toSeq
    val (n, k, top, p99) = brute(li)
    val r = got("lineitem.l_orderkey")
    assert((r._2, r._3, r._4, r._6) === ((n, k, top, p99)))
    assert(r._5 === graft.ops.Num.floorEpsLong(top.toDouble * 10000 / n))
    assert(r._7 === graft.ops.Num.floorEpsLong((top * k).toDouble * 100 / n))
    // verdict replay everywhere
    got.values.foreach { r =>
      assert(r._8 === (if (r._7 > 1000) "skewed" else "ok"))
    }
  }

  test("q_survival equals the brute Kaplan-Meier; both arms non-vacuous") {
    val got = SparkEntry.queries("q_survival")(spark, sf0001)
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    // brute: per-user duration hours, administrative censor at 48 h
    val durs = graft.tables.Tables.events(spark, sf0001)
      .groupBy("user_id")
      .agg(min(col("ts")).as("t0"),
        min(when(col("event_type") === "purchase", col("ts"))).as("tp"))
      .select(expr("(unix_timestamp(tp) - unix_timestamp(t0)) div 3600"))
      .as[Long].collect().toSeq
    val horizon = 48L
    val events = durs.filter(_ <= horizon)
    val censored = durs.count(_ > horizon)
    // both arms of the censoring design must genuinely occur
    assert(events.nonEmpty && censored > 0,
      s"degenerate censoring: ${events.size} events, $censored censored")
    val times = events.distinct.sorted
    var s = 1.0
    var expect = Vector.empty[(Long, Long, Long, Long)]
    times.foreach { t =>
      val d = events.count(_ == t).toLong
      val n = durs.count(_ >= t).toLong // censored stay at risk
      s *= 1.0 - d.toDouble / n
      expect :+= ((t, n, d, math.floor(s * 1000000 + 1e-6).toLong))
    }
    assert(got === expect)
    // the curve is a genuine survival function: strictly decreasing,
    // ending above zero BECAUSE of the censored arm
    assert(got.map(_._4).sliding(2).forall(p => p.head > p.last))
    assert(got.last._4 > 0)
  }
}
