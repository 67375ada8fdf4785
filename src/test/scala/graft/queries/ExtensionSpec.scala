package graft.queries

import graft.{SparkEntry, SparkSpec}
import graft.ops.Num
import graft.tables.Tables
import org.apache.spark.sql.functions._

class ExtensionSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct stays within 10% of exact per group") {
    val approx = SparkEntry.queries("q_approx_distinct")(spark, sf0001)
      .select("o_orderpriority", "approx_custs").as[(String, Long)]
      .collect().toMap
    val exact = Tables.orders(spark, sf0001)
      .groupBy("o_orderpriority")
      .agg(countDistinct("o_custkey").as("x")).as[(String, Long)]
      .collect().toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, ex) =>
      assert(math.abs(approx(k) - ex).toDouble / ex <= 0.1,
        s"$k: approx=${approx(k)} exact=$ex")
    }
  }

  test("from-scratch HLL estimate stays within 50% of exact per group") {
    // m = 64 ⇒ σ ≈ 13%; the 50% band is the fail-loud contract. The
    // groups hold ~130 distinct keys at sf0.001 — right at the raw
    // estimator's 2.5·m boundary, where its bias is still well inside
    // the band (the sf0.01 oracle runs at ~1300, deep in-range; no
    // small-range correction by design — documented in the query).
    val out = SparkEntry.queries("q_hll_distinct")(spark, sf0001)
      .select("grp", "n_buckets", "n_exact", "est", "err_pct")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(out.length == 5)
    out.foreach { case (grp, nb, exact, est, errPct) =>
      assert(nb >= 1 && nb <= 64, s"$grp: n_buckets $nb")
      assert(exact > 100, s"$grp: exact $exact below the raw-range floor")
      assert(errPct <= 50, s"$grp: est=$est exact=$exact err=$errPct%")
    }
  }

  test("salted join aggregates equal the unsalted join exactly") {
    val salted = SparkEntry.queries("q_join_salted")(spark, sf0001)
      .as[(String, Long, Long)].collect().toSeq
    val plain = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), Num.cents(col("l_extendedprice")).as("price_c"))
      .join(Tables.orders(spark, sf0001), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("price_c")).as("rev_c"), count(lit(1)).as("n"))
      .orderBy("o_orderpriority")
      .as[(String, Long, Long)].collect().toSeq
    assert(salted == plain)
  }

  test("group-map longest censored run matches a hand computation") {
    val daily = Seq(
      // id 1: censored days 1,2 then clean then censored 4,5,6
      (1L, 1, 10L), (1L, 2, 20L), (1L, 3, 99999L),
      (1L, 4, 5L), (1L, 5, 5L), (1L, 6, 5L),
      // id 2: never censored
      (2L, 1, 99999L),
      // id 3: censored days 1 and 3 (gap: day 2 missing) -> runs of 1
      (3L, 1, 0L), (3L, 3, 0L))
      .toDF("id", "day", "dval")
      .withColumn("date", date_add(lit("2021-01-01").cast("date"), col("day")))
    val out = TypedQueries.longestRun(daily, censorBelow = 5000L)
      .orderBy("id").as[(Long, Int, Int)].collect().toSeq
    assert(out == Seq((1L, 6, 3), (2L, 1, 0), (3L, 2, 1)))
  }

  test("nearest as-of really picks the closest dim row, ties to backward") {
    val out = SparkEntry.queries("q_asof_nearest")(spark, sf0001)
      .select("o_orderkey", "id", "date", "near_date", "near_diff_days")
      .as[(Long, Long, java.sql.Date, java.sql.Date, Int)].collect()
    assert(out.nonEmpty)
    // ground truth: min |datediff| over ALL of the key's daily rows
    val truth = Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), col("o_custkey").as("id"),
        to_date(col("o_orderdate")).as("odate"))
      .join(EventSeries.daily(spark, sf0001).select(col("id"), col("date")), Seq("id"))
      .groupBy("o_orderkey")
      .agg(min(abs(datediff(col("date"), col("odate")))).as("best"))
      .as[(Long, Int)].collect().toMap
    out.foreach { case (ok, _, date, nearDate, diff) =>
      truth.get(ok) match {
        case Some(best) =>
          assert(diff === best, s"order $ok: got diff $diff, nearest is $best")
          // tie-to-backward: at equal distance the match is never ahead
          val signed = (nearDate.toLocalDate.toEpochDay
            - date.toLocalDate.toEpochDay).toInt
          assert(math.abs(signed) === diff, s"order $ok inconsistent")
        case None => // key absent from daily -> sentinel
          assert(diff === -1, s"order $ok should be unmatched")
      }
    }
    // both directional windows must fuse into ONE Window node over one
    // (id)-sort — and like every as-of here, there is no join node
    val plan = SparkEntry.queries("q_asof_nearest")(spark, sf0001)
      .queryExecution.executedPlan.toString
    val windowNodes = "\\bWindow \\[".r.findAllIn(plan).size
    assert(windowNodes === 1, s"expected one fused Window node:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"), plan)
  }

  test("grouping sets equal the union of the three separate aggregations") {
    val got = SparkEntry.queries("q_grouping_sets")(spark, sf0001)
      .as[(String, String, Long, Long)].collect().toSeq
    val li = Tables.lineitem(spark, sf0001)
      .select(col("l_returnflag"), col("l_linestatus"),
        Num.cents(col("l_quantity")).as("qc"))
    def agg(gs: Seq[String]) = li.groupBy(gs.map(col): _*)
      .agg(sum("qc").as("s"), count(lit(1)).as("n"))
    val byRf = agg(Seq("l_returnflag"))
      .select(col("l_returnflag"), lit("ALL"), col("s"), col("n"))
    val byLs = agg(Seq("l_linestatus"))
      .select(lit("ALL"), col("l_linestatus"), col("s"), col("n"))
    val total = li.agg(sum("qc").as("s"), count(lit(1)).as("n"))
      .select(lit("ALL"), lit("ALL"), col("s"), col("n"))
    val expect = byRf.union(byLs).union(total)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(got.sorted == expect.sorted)
  }

  test("approx quantiles stay within one exact-quantile neighbor at accuracy 10k") {
    val approx = SparkEntry.queries("q_approx_quantiles")(spark, sf0001)
      .as[(Int, Long)].collect().toMap
    val exact = SparkEntry.queries("q_color_quantiles")(spark, sf0001)
      .as[(Int, Long)].collect().toMap
    assert(approx.keySet == (1 to 19).toSet)
    // with accuracy 10000 >> n at sf0.001, the sketch should be within
    // the exact neighboring quantile values (rank error <= n/accuracy)
    // (open-ended at the edges: the sketch returns dataset values,
    // while exact `percentile` interpolates between them)
    (1 to 19).foreach { i =>
      val lo = if (i > 1) exact(i - 1) else Long.MinValue
      val hi = if (i < 19) exact(i + 1) else Long.MaxValue
      assert(approx(i) >= lo && approx(i) <= hi,
        s"q$i: approx=${approx(i)} outside [$lo, $hi]")
    }
  }
}
