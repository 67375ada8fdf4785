package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavior specs for the decision-support family ([[DecisionQueries]]).
  * The DuckDB oracle pins exact values; these pin the SEMANTICS against
  * independent formulations (brute-force skyline, count-distinct,
  * window top-k). */
class DecisionQueriesSpec extends SparkSpec {
  import spark.implicits._

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, sf0001)

  test("q_skyline: two-phase result equals the brute-force Pareto front") {
    val got = run("q_skyline")
      .select("p_partkey", "price_c", "sz")
      .as[(Long, Long, Int)].collect().toSet
    val pts = graft.tables.Tables.part(spark, sf0001)
      .select(col("p_partkey"),
        graft.ops.Num.cents(col("p_retailprice")).as("price_c"),
        col("p_size").cast("int").as("sz"))
      .as[(Long, Long, Int)].collect()
    val brute = pts.filter { case (_, p, s) =>
      !pts.exists { case (_, qp, qs) =>
        qp <= p && qs >= s && (qp < p || qs > s)
      }
    }.toSet
    assert(got === brute)
    assert(got.nonEmpty)
  }

  test("q_outlier_iqr: every flagged row lies outside its group fences") {
    val rows = run("q_outlier_iqr")
      .select("v", "lo", "hi").as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (v, lo, hi) => v < lo || v > hi })
  }

  test("q_bitmap_distinct equals count(distinct) per nation") {
    val got = run("q_bitmap_distinct")
      .as[(String, Long)].collect().toMap
    val expected = graft.tables.Tables.customer(spark, sf0001)
      .join(graft.tables.Tables.nation(spark, sf0001),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name").agg(countDistinct("c_custkey").as("n"))
      .as[(String, Long)].collect().toMap
    assert(got === expected)
    assert(got.values.sum > 0)
  }

  test("q_lateral_topk equals the window top-3 formulation") {
    val got = run("q_lateral_topk")
      .select("r_name", "s_name", "bal_c")
      .as[(String, String, Long)].collect().toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("r_name").orderBy(col("s_acctbal").desc, col("s_suppkey"))
    val expected = graft.tables.Tables.supplier(spark, sf0001)
      .join(graft.tables.Tables.nation(spark, sf0001),
        col("s_nationkey") === col("n_nationkey"))
      .join(graft.tables.Tables.region(spark, sf0001),
        col("n_regionkey") === col("r_regionkey"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select(col("r_name"), col("s_name"),
        graft.ops.Num.cents(col("s_acctbal")).as("bal_c"))
      .orderBy(col("r_name"), col("bal_c").desc, col("s_name"))
      .as[(String, String, Long)].collect().toSeq
    assert(got === expected)
  }

  test("q_abtest equals the brute two-proportion z recompute") {
    val got = graft.SparkEntry.queries("q_abtest")(spark, sf0001)
      .select("n_c", "x_c", "n_t", "x_t", "lift_bp", "z_milli", "verdict")
      .as[(Long, Long, Long, Long, Long, Long, String)].collect().head

    val perUser = graft.tables.Tables.events(spark, sf0001)
      .groupBy("user_id")
      .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("np"))
      .as[(Long, Long)].collect().toSeq
    val counts = perUser.map(_._2).sorted
    val pos = 0.5 * (counts.size - 1)
    val med = graft.ops.Num.floorEpsLong(
      counts(pos.toInt) + (counts(math.ceil(pos).toInt) - counts(pos.toInt)) *
        (pos - pos.toInt))
    val conv = perUser.map { case (u, np) => (u % 2, if (np > med) 1L else 0L) }
    val (nc, xc) = (conv.count(_._1 == 0).toLong,
      conv.filter(_._1 == 0).map(_._2).sum)
    val (nt, xt) = (conv.count(_._1 == 1).toLong,
      conv.filter(_._1 == 1).map(_._2).sum)
    assert((got._1, got._2, got._3, got._4) === ((nc, xc, nt, xt)))
    val lift = (xt.toDouble / nt - xc.toDouble / nc)
    assert(got._5 === graft.ops.Num.floorEpsLong(lift * 10000))
    val pbar = (xc + xt).toDouble / (nc + nt)
    val z = lift / math.sqrt(pbar * (1.0 - pbar) * (1.0 / nc + 1.0 / nt))
    assert(got._6 === graft.ops.Num.floorEpsLong(z * 1000))
    assert(got._7 === (if (math.abs(got._6) > 1960) "significant" else "inconclusive"))
    // the median split guarantees a non-degenerate pooled rate
    assert(xc + xt > 0 && xc + xt < nc + nt)
  }

  test("q_ohlc equals the brute per-hour bars") {
    val got = graft.SparkEntry.queries("q_ohlc")(spark, sf0001)
      .select("hour", "n", "open_c", "high_c", "low_c", "close_c")
      .as[(java.sql.Timestamp, Long, Long, Long, Long, Long)]
      .collect().toSeq.sortBy(_._1.getTime)

    val rows = graft.tables.Tables.events(spark, sf0001)
      .where(col("value").isNotNull)
      .select(col("ts"), col("event_id"), graft.ops.Num.cents(col("value")))
      .as[(java.sql.Timestamp, Long, Long)].collect().toSeq
    val brute = rows.groupBy(r => r._1.getTime / 3600000L).toSeq
      .map { case (h, rs) =>
        val sorted = rs.sortBy(r => (r._1.getTime, r._2))
        (new java.sql.Timestamp(h * 3600000L), rs.size.toLong,
          sorted.head._3, rs.map(_._3).max, rs.map(_._3).min, sorted.last._3)
      }.sortBy(_._1.getTime)
    assert(got === brute)
    // bar invariants: low <= open/close <= high, nonempty
    got.foreach { case (_, n, open, high, low, close) =>
      assert(n >= 1)
      assert(low <= open && open <= high)
      assert(low <= close && close <= high)
    }
  }

  test("q_assoc_rules equals the brute-force top-50 rules by lift") {
    val got = run("q_assoc_rules")
      .select("x", "y", "s_xy", "s_x", "s_y",
        "conf_xy_ppm", "conf_yx_ppm", "lift_ppm")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq

    val items = graft.tables.Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_partkey"))
      .as[(Long, Long)].collect().toSet
    val n = items.map(_._1).size.toLong
    val isup = items.groupBy(_._2).map { case (it, rs) =>
      it -> rs.map(_._1).size.toLong }
    val byOrder = items.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val psup = byOrder.values.toSeq
      .flatMap(b => b.toSeq.sorted.combinations(2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter(_._2 >= 2)
    val brute = psup.toSeq.map { case (Seq(x, y), sXy) =>
      val (sX, sY) = (isup(x), isup(y))
      (x, y, sXy, sX, sY,
        1000000L * sXy / sX, 1000000L * sXy / sY,
        (BigInt(1000000) * sXy * n / (BigInt(sX) * sY)).toLong)
    }.sortBy { case (x, y, _, _, _, _, _, lift) => (-lift, x, y) }.take(50)
    assert(got === brute)
    // the measurement is non-degenerate: real co-purchase lift > 1
    assert(got.head._8 > 1000000L)
  }

  test("q_gini equals the brute-force rank-identity Gini per nation") {
    val got = run("q_gini")
      .select("n_name", "n_cust", "gini_ppm")
      .as[(String, Long, Long)].collect()
      .map { case (nm, nc, g) => nm -> ((nc, g)) }.toMap

    val rev = graft.tables.Tables.orders(spark, sf0001)
      .groupBy(col("o_custkey"))
      .agg(sum(graft.ops.Num.cents(col("o_totalprice"))).as("cents"))
      .as[(Long, Long)].collect().toMap
    val custNation = graft.tables.Tables.customer(spark, sf0001)
      .select(col("c_custkey"), col("c_nationkey"))
      .as[(Long, Long)].collect().toMap
    val names = graft.tables.Tables.nation(spark, sf0001)
      .select(col("n_nationkey"), col("n_name"))
      .as[(Long, String)].collect().toMap
    val brute = rev.toSeq
      .map { case (ck, c) => (custNation(ck), ck, c) }
      .groupBy(_._1).map { case (nk, rs) =>
        val xs = rs.sortBy(r => (r._3, r._2)).map(_._3)
        val nc = BigInt(xs.size)
        val s = xs.map(BigInt(_)).sum
        val ws = xs.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
        names(nk) -> ((xs.size.toLong,
          (BigInt(1000000) * (2 * ws - (nc + 1) * s) / (nc * s)).toLong))
      }
    assert(got === brute)
    assert(got.size === 25)
    got.values.foreach { case (_, g) => assert(g >= 0L && g < 1000000L) }
  }

  test("q_assoc_rules_scale: bit-equal rules from a shuffle-capable support join") {
    val base = run("q_assoc_rules").collect().map(_.toSeq)
    val scale = run("q_assoc_rules_scale")
    val got = scale.collect().map(_.toSeq)
    assert(got.toSeq === base.toSeq,
      "shuffle_hash twin diverged from the broadcast plan")
    // plan shape: the item-support joins must be shuffled hash joins,
    // never a driver-side broadcast of the catalog-sized table (the
    // 1-row nbask cross stays broadcast by design)
    val plan = scale.queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"),
      "support joins must plan as ShuffledHashJoin at scale")
    graft.ops.SideCache.releaseAll()
  }

  test("q_auc equals the brute pairwise P(s+ > s-) + half-ties recompute") {
    val r = run("q_auc").head()
    val (np, nn, u2, aucPpm) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val scored = graft.tables.Tables.events(spark, sf0001)
      .where(col("value").isNotNull)
      .select(
        (graft.ops.Num.cents(col("value")) +
          when(col("event_id") % 5 === 0, 5000L).otherwise(0L)).as("s"),
        when(col("event_id") % 5 === 0, 1L).otherwise(0L).as("y"))
      .as[(Long, Long)].collect()
    val pos = scored.filter(_._2 == 1L).map(_._1)
    val neg = scored.filter(_._2 == 0L).map(_._1)
    assert(np === pos.length.toLong && nn === neg.length.toLong)
    // brute O(np*nn) comparison — the definition itself
    var wins2 = 0L
    for (p <- pos; n <- neg)
      wins2 += (if (p > n) 2L else if (p == n) 1L else 0L)
    assert(u2 === wins2)
    assert(aucPpm ===
      math.floor(wins2.toDouble * 1000000 / (np * nn * 2) + 1e-6).toLong)
    // planted operating point: mid-range skill, away from both the
    // 0.5 no-signal and 1.0 separable degeneracies
    assert(aucPpm > 700000L && aucPpm < 950000L, s"auc_ppm $aucPpm")
  }

  test("q_calibration: positives concentrate in the top deciles; brute bins agree") {
    val got = run("q_calibration")
      .select("bin", "n", "n_pos", "pos_rate_pm")
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got.map(_._1) === (0L to 9L))
    // balanced decile cut: every bin within ±2 of n/10
    val total = got.map(_._2).sum
    got.foreach { case (b, n, _, _) =>
      assert(math.abs(n - total / 10) <= 2, s"bin $b size $n")
    }
    // the planted boost concentrates positives: bottom decile near the
    // floor, top decile far above it
    assert(got.head._4 < 50, "bottom decile must be positive-poor")
    assert(got.last._4 > 250, "top decile must be positive-rich")
    // brute recompute from raw scores
    val scored = graft.tables.Tables.events(spark, sf0001)
      .where(col("value").isNotNull)
      .select((graft.ops.Num.cents(col("value")) +
          when(col("event_id") % 5 === 0, 5000L).otherwise(0L)).as("s"),
        when(col("event_id") % 5 === 0, 1L).otherwise(0L).as("y"))
      .as[(Long, Long)].collect()
    val sorted = scored.map(_._1).sorted
    val edges = (1 to 9).map(k =>
      sorted((math.ceil(k / 10.0 * sorted.length) - 1).toInt))
    val brute = scored.groupBy { case (sc, _) => edges.count(sc > _) }
      .map { case (b, rows) =>
        (b.toLong, rows.size.toLong, rows.map(_._2).sum,
          1000L * rows.map(_._2).sum / rows.size)
      }.toSeq.sortBy(_._1)
    assert(got === brute)
  }

  test("q_benford: pinned expectation table and exact deviation accounting") {
    // the pinned literals ARE floor(1e6 * log10(1 + 1/d))
    DecisionQueries.benfordExpectedPpm.foreach { case (d, ppm) =>
      assert(ppm === math.floor(1e6 * math.log10(1.0 + 1.0 / d)).toLong)
    }
    val got = run("q_benford")
      .select("d", "cnt", "obs_ppm", "exp_ppm", "dev_ppm")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got.map(_._1) === (1L to 9L))
    val total = got.map(_._2).sum
    assert(total === graft.tables.Tables.orders(spark, sf0001)
      .where(col("o_totalprice") > 0).count())
    got.foreach { case (_, cnt, obs, exp, dev) =>
      assert(obs === 1000000L * cnt / total)
      assert(dev === math.abs(obs - exp))
    }
  }

  test("q_pr_curve equals the brute per-threshold confusion recompute") {
    val got = run("q_pr_curve")
      .select("decile", "threshold", "tp", "fp", "fn",
        "precision_pm", "recall_pm", "f1_pm")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq.sortBy(_._1)
    assert(got.map(_._1) === (1L to 9L))
    val scored = graft.tables.Tables.events(spark, sf0001)
      .where(col("value").isNotNull)
      .select((graft.ops.Num.cents(col("value")) +
          when(col("event_id") % 5 === 0, 5000L).otherwise(0L)).as("s"),
        when(col("event_id") % 5 === 0, 1L).otherwise(0L).as("y"))
      .as[(Long, Long)].collect()
    val sorted = scored.map(_._1).sorted
    val nPos = scored.map(_._2).sum
    val brute = (1 to 9).map { k =>
      val thr = sorted((math.ceil(k / 10.0 * sorted.length) - 1).toInt)
      val above = scored.filter(_._1 > thr)
      val tp = above.map(_._2).sum
      val fp = above.length - tp
      (k.toLong, thr, tp, fp, nPos - tp,
        1000L * tp / (tp + fp), 1000L * tp / nPos,
        2000L * tp / (2 * tp + fp + (nPos - tp)))
    }
    assert(got === brute)
    // the sweep is a genuine tradeoff curve: recall monotone
    // non-increasing in the threshold, and the planted signal makes
    // precision at the top threshold beat the base rate
    assert(got.map(_._7).sliding(2).forall(p => p.head >= p.last))
    val baseRatePm = 1000L * nPos / scored.length
    assert(got.last._6 > baseRatePm,
      s"top-threshold precision ${got.last._6} <= base rate $baseRatePm")
  }
}
