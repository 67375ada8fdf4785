package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q_dp_count invariants: the noise is the exact inverse-CDF
  * geometric the Scaladoc claims (brute recompute from the cell
  * hash), the clamp holds, and the mechanism actually perturbs —
  * both signs occur across the release. */
class DpCountSpec extends SparkSpec {
  import spark.implicits._

  test("q_dp_count equals the brute inverse-CDF geometric recompute") {
    val got = SparkEntry.queries("q_dp_count")(spark, sf0001)
      .select("lang", "source", "n_true", "noise", "n_noisy")
      .as[(String, String, Long, Long, Long)].collect().toSeq
      .sortBy(r => (r._1, r._2))

    val cells = graft.tables.Tables.documents(spark, sf0001)
      .groupBy("lang", "source").agg(count(lit(1)).as("n"))
      .as[(String, String, Long)].collect().toSeq.sortBy(r => (r._1, r._2))

    val alpha = "0.6065306597126334".toDouble
    val brute = cells.map { case (lang, src, n) =>
      val h = graft.functions.Poly.hashBytes(
        s"$lang|$src|dp1".getBytes("UTF-8"), graft.functions.Poly.Base)
      val s = (h * h + 7919L * h) % 2147483647L
      val u = (s / 2 + 1).toDouble / 1073741824.0
      val m = graft.ops.Num.floorEpsLong(math.log(u) / math.log(alpha))
      val noise = (if (s % 2 == 0) 1L else -1L) * m
      (lang, src, n, noise, math.max(n + noise, 0L))
    }
    assert(got === brute)
    // the mechanism perturbs in both directions somewhere in the release
    assert(got.exists(_._4 > 0) && got.exists(_._4 < 0))
    // clamp: never negative
    assert(got.forall(_._5 >= 0))
  }

  test("q_anomaly_mad equals the brute modified-z recompute") {
    val got = SparkEntry.queries("q_anomaly_mad")(spark, sf0001)
      .select("event_type", "n", "med_micro", "mad_micro", "n_outliers", "max_absdev")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
      .sortBy(_._1)

    val vals = graft.tables.Tables.events(spark, sf0001)
      .where(col("value").isNotNull)
      .select(col("event_type"), graft.ops.Num.floorEps(col("value") * 1e6))
      .as[(String, Long)].collect().toSeq.groupBy(_._1)

    def medianCont(xs: Seq[Long]): Long = { // quantile_cont(0.5) then floorEps
      val s = xs.sorted
      val pos = 0.5 * (s.length - 1)
      val lo = s(pos.toInt)
      val hi = s(math.ceil(pos).toInt)
      graft.ops.Num.floorEpsLong(lo + (hi - lo) * (pos - pos.toInt))
    }
    val brute = vals.toSeq.sortBy(_._1).map { case (t, rows) =>
      val xs = rows.map(_._2)
      val med = medianCont(xs)
      val ds = xs.map(v => math.abs(v - med))
      val mad = medianCont(ds)
      (t, xs.size.toLong, med, mad,
        ds.count(d => 6745L * d > 35000L * mad).toLong, ds.max)
    }
    assert(got === brute)
    // the detector actually fires somewhere but never flags a majority
    assert(got.exists(_._5 > 0))
    got.foreach { r => assert(r._5 * 2 < r._2, s"${r._1} flags a majority") }
  }

  test("q_cusum equals the textbook max-recursion (the prefix-min identity)") {
    val got = SparkEntry.queries("q_cusum")(spark, sf0001)
      .select("day", "total_c", "dev", "s_pos", "s_neg", "h", "alarm")
      .as[(java.sql.Date, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq.sortBy(_._1.getTime)

    // recompute the RECURSIVE definition directly: the query's
    // window-closed-form must equal it on every day
    var sp = 0L; var sn = 0L
    got.foreach { case (d, _, dev, gotSp, gotSn, h, alarm) =>
      sp = math.max(0L, sp + dev)
      sn = math.max(0L, sn - dev)
      assert(gotSp === sp, s"$d s_pos")
      assert(gotSn === sn, s"$d s_neg")
      assert(alarm === (if (sp > h || sn > h) 1L else 0L), s"$d alarm")
    }
    // deviations sum to ~0 by construction (mean-centred, floor slack)
    val n = got.size
    assert(math.abs(got.map(_._3).sum) <= n.toLong)
  }

  test("q_changepoint localizes the argmax |cum| split with correct segment means") {
    val r = SparkEntry.queries("q_changepoint")(spark, sf0001).head()
    val (splitDay, cusumAbs, nPre, nPost, meanPre, meanPost, delta) =
      (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))
    // brute recompute from the cusum chart's own day frame
    val days = SparkEntry.queries("q_cusum")(spark, sf0001)
      .select("day", "total_c", "dev")
      .as[(java.sql.Date, Long, Long)].collect().toSeq
      .sortBy(_._1.getTime)
    var cum = 0L
    val cums = days.map { case (d, _, dev) => cum += dev; (d.toLocalDate, cum) }
    val best = cums.maxBy(c => (math.abs(c._2), -c._1.toEpochDay))
    assert(splitDay === best._1, "argmax split day")
    assert(cusumAbs === math.abs(best._2))
    val (pre, post) = days.partition(!_._1.toLocalDate.isAfter(splitDay))
    assert(nPre === pre.size.toLong && nPost === post.size.toLong)
    assert(meanPre ===
      math.floor(pre.map(_._2).sum.toDouble / pre.size + 1e-6).toLong)
    assert(meanPost ===
      math.floor(post.map(_._2).sum.toDouble / post.size + 1e-6).toLong)
    assert(delta === meanPost - meanPre)
    // the phenomenon must occur: a genuine level shift, both segments
    // non-empty and the split strictly interior
    assert(nPre > 0 && nPost > 0)
    assert(delta !== 0L, "fixture must show a real level shift")
    graft.ops.SideCache.releaseAll()
  }

  test("q_dq_expectations: six checks, both verdict paths genuinely exercised") {
    val got = SparkEntry.queries("q_dq_expectations")(spark, sf0001)
      .select("check_name", "n_checked", "n_viol", "pass")
      .as[(String, Long, Long, String)].collect().toSeq.sortBy(_._1)
    assert(got.map(_._1) === Seq("discount_domain", "fk_orders",
      "key_not_null", "pk_unique", "quantity_positive", "ships_after_order"))
    got.foreach { case (name, n, v, pass) =>
      assert(n > 0, s"$name checked nothing")
      assert(v >= 0 && v <= n)
      assert(pass === (if (v == 0) "pass" else "fail"))
    }
    // non-vacuous: the fixture FAILS pk_unique and ships_after_order
    // and PASSES the other four
    val verdicts = got.map(r => r._1 -> r._4).toMap
    assert(verdicts("pk_unique") === "fail")
    assert(verdicts("ships_after_order") === "fail")
    assert(Seq("discount_domain", "fk_orders", "key_not_null",
      "quantity_positive").forall(verdicts(_) === "pass"))
    // brute cross-check of one failing and one passing count
    val li = graft.tables.Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_linenumber")
      .as[(Long, Int)].collect().toSeq
    val dupRows = li.groupBy(identity).values.filter(_.size > 1).map(_.size).sum
    assert(got.find(_._1 == "pk_unique").get._3 === dupRows.toLong)
    assert(got.find(_._1 == "quantity_positive").get._3 === 0L)
  }

  test("q_dq_quarantine: precedence routing is a partition of the fact table") {
    val got = SparkEntry.queries("q_dq_quarantine")(spark, sf0001)
      .select("bucket", "n_rows", "key_xor")
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got.keySet === Set("clean", "pk_dup", "ships_early"))
    // a partition: bucket counts sum to the fact row count
    val li = graft.tables.Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_linenumber", "l_shipdate")
      .as[(Long, Int, java.sql.Timestamp)].collect()
    assert(got.values.map(_._1).sum === li.length.toLong)
    // brute routing with the same precedence
    val dupKeys = li.groupBy(r => (r._1, r._2)).filter(_._2.size > 1).keySet
    val orderDate = graft.tables.Tables.orders(spark, sf0001)
      .select("o_orderkey", "o_orderdate")
      .as[(Long, java.sql.Timestamp)].collect().toMap
    val brute = li.groupBy { r =>
      if (dupKeys((r._1, r._2))) "pk_dup"
      else if (orderDate.get(r._1).exists(d => r._3.before(d))) "ships_early"
      else "clean"
    }.map { case (b, rows) =>
      b -> (rows.size.toLong,
        rows.map(r => r._1 * 31 + r._2).foldLeft(0L)(_ ^ _))
    }
    assert(got === brute)
    // all three buckets genuinely populated (this fixture quarantines
    // heavily: ~40% dup rows + ~20% early-ship of the remainder)
    assert(got("pk_dup")._1 > 0 && got("ships_early")._1 > 0)
    assert(got("clean")._1 > 0)
  }

  test("q_bootstrap_ci: CI brackets the mean; replica 0 brute-recomputes") {
    val r = SparkEntry.queries("q_bootstrap_ci")(spark, sf0001).head()
    val (b, n, mean, lo, hi, spread) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
    assert(b === 64L)
    assert(lo <= mean && mean <= hi, s"CI [$lo,$hi] must bracket $mean")
    assert(spread > 0L, "resampling must genuinely vary the replicas")
    assert(hi - lo < spread + 1, "percentile CI is within the spread")
    // brute replica 0: same hash -> uniform -> pinned Poisson inverse CDF
    val rows = graft.tables.Tables.events(spark, sf0001)
      .where(col("value").isNotNull)
      .select(col("event_id"),
        graft.ops.Num.cents(col("value")).as("x"),
        graft.functions.F.polyHash(
          concat_ws(":", lit(0), col("event_id"), lit("boot"))).as("h"))
      .as[(Long, Long, Long)].collect()
    val cdf = ProfilingQueries.poissonCdf.map { case (k, t) => (k, t.toDouble) }
    var num = 0L; var den = 0L
    rows.foreach { case (_, x, h) =>
      val sr = math.floorMod(h * h + 7919L * h, 2147483647L)
      val u = (sr / 2 + 1).toDouble / 1073741824.0
      val k = cdf.find(u <= _._2).map(_._1.toLong).getOrElse(6L)
      num += k * x; den += k
    }
    // replica weights average ~1: effective sample within 20% of n
    assert(den > n * 8 / 10 && den < n * 12 / 10, s"den $den vs n $n")
    val rep0 = math.floor(num.toDouble / den + 1e-6).toLong
    // replica 0's mean must lie inside the replica spread the query saw
    assert(rep0 >= lo - spread && rep0 <= hi + spread)
  }
}
