package graft.plans

import graft.SparkSpec
import graft.queries.EventSeries
import graft.tables.Tables
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  /** Force the shuffled sorted-merge path (the strategy would otherwise
    * broadcast every under-threshold right side — ALL test fixtures). */
  private def withShuffledAsOf[T](body: => T): T = {
    spark.conf.set(AsOfJoinStrategy.BroadcastConfKey, "false")
    try body
    finally spark.conf.unset(AsOfJoinStrategy.BroadcastConfKey)
  }

  /** Both physical paths must agree — every semantic test below runs
    * under the default (broadcast, small fixtures) AND the pinned
    * shuffled merge. */
  private def onBothExecs(body: => Unit): Unit = { body; withShuffledAsOf(body) }

  test("native as-of join picks the latest right row at or before the left time") {
    onBothExecs {
      val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"))
        .toDF("k", "t", "tag")
      val right = Seq((1L, 5L, 100L), (1L, 15L, 150L), (2L, 6L, 200L))
        .toDF("rk", "rt", "v")
      val out = AsOf.join(left, right, "k", "rk", "t", "rt")
        .select("k", "t", "tag", "rt", "v")
        .as[(Long, Long, String, Option[Long], Option[Long])]
        .collect().sortBy(r => (r._1, r._2))
      assert(out.toSeq === Seq(
        (1L, 10L, "a", Some(5L), Some(100L)),   // 15 is later than 10
        (1L, 20L, "b", Some(15L), Some(150L)),  // latest <= 20
        (2L, 5L, "c", None, None)))             // right row at 6 is in the future
    }
  }

  test("ties: right row exactly at the left time is taken (inclusive)") {
    onBothExecs {
      val left = Seq((1L, 10L)).toDF("k", "t")
      val right = Seq((1L, 10L, 7L)).toDF("rk", "rt", "v")
      val out = AsOf.join(left, right, "k", "rk", "t", "rt")
        .select("v").as[Option[Long]].head()
      assert(out === Some(7L))
    }
  }

  test("shuffled plan shape: AsOfJoinExec with co-partitioned sorted children") {
    withShuffledAsOf {
      val left = Seq((1L, 10L)).toDF("k", "t")
      val right = Seq((1L, 5L, 1L)).toDF("rk", "rt", "v")
      val phys = AsOf.join(left, right, "k", "rk", "t", "rt")
        .queryExecution.executedPlan.toString
      assert(phys.contains("AsOfJoin"), phys)
      assert(!phys.contains("BroadcastAsOfJoin"), phys)
      assert(phys.contains("Sort"), phys)
      assert(phys.contains("hashpartitioning"), phys)
    }
  }

  test("broadcast plan shape: small right side plans to BroadcastAsOfJoinExec, zero shuffle/sort") {
    val left = Seq((1L, 10L)).toDF("k", "t")
    val right = Seq((1L, 5L, 1L)).toDF("rk", "rt", "v")
    val phys = AsOf.join(left, right, "k", "rk", "t", "rt")
      .queryExecution.executedPlan.toString
    assert(phys.contains("BroadcastAsOfJoin"), phys)
    assert(!phys.contains("Sort"), phys)
    assert(!phys.contains("hashpartitioning"), phys)
  }

  test("broadcast kill switch actually flips the chosen exec") {
    val left = Seq((1L, 10L)).toDF("k", "t")
    val right = Seq((1L, 5L, 1L)).toDF("rk", "rt", "v")
    // string-match the rendered plan: under AQE, executedPlan is an
    // AdaptiveSparkPlanExec LEAF, so collect/collectFirst never reach the
    // join exec — but toString renders the inner plan (same approach as
    // the two plan-shape tests above)
    def execOf(): String = {
      val phys = AsOf.join(left, right, "k", "rk", "t", "rt")
        .queryExecution.executedPlan.toString
      if (phys.contains("BroadcastAsOfJoin")) "broadcast"
      else if (phys.contains("AsOfJoin")) "shuffled"
      else "none"
    }
    assert(execOf() === "broadcast")
    withShuffledAsOf { assert(execOf() === "shuffled") }
  }

  test("edge cases agree across both execs: missing key, null key/time, ties, empty right") {
    // left covers: key with multiple right rows + exact tie (k=1 t=15),
    // key missing from the right entirely (k=3), null key, null time,
    // null key AND time
    val left = Seq(
        (Option(1L), Option(10L), "a"), (Option(1L), Option(15L), "tie"),
        (Option(1L), Option(99L), "late"), (Option(3L), Option(50L), "nokey"),
        (None: Option[Long], Option(20L), "nullk"),
        (Option(1L), None: Option[Long], "nullt"),
        (None: Option[Long], None: Option[Long], "nullkt"))
      .toDF("k", "t", "tag")
    val right = Seq(
        (Option(1L), Option(5L), 100L), (Option(1L), Option(15L), 150L),
        (None: Option[Long], Option(7L), 700L),
        (Option(1L), None: Option[Long], 50L),
        (None: Option[Long], None: Option[Long], 900L))
      .toDF("rk", "rt", "v")
    def run(): Seq[(Option[Long], Option[Long], String, Option[Long])] =
      AsOf.join(left, right, "k", "rk", "t", "rt")
        .select("k", "t", "tag", "v")
        .as[(Option[Long], Option[Long], String, Option[Long])]
        .collect().sortBy(_._3).toSeq
    val bc = run()
    val sh = withShuffledAsOf(run())
    assert(bc === sh)
    // and the values are the as-of semantics: null time orders FIRST
    // (visible to every left row of the key), null keys group together
    assert(bc === Seq(                                   // lexicographic tag order
      (Option(1L), Option(10L), "a", Some(100L)),        // latest <= 10 is rt=5
      (Option(1L), Option(99L), "late", Some(150L)),
      (Option(3L), Option(50L), "nokey", None),          // key absent from right
      (None, Option(20L), "nullk", Some(700L)),          // null-key group, rt=7 <= 20
      (None, None, "nullkt", Some(900L)),
      (Option(1L), None, "nullt", Some(50L)),            // null t: only null-rt row visible
      (Option(1L), Option(15L), "tie", Some(150L))))     // inclusive tie
  }

  test("empty right side: all left rows survive with null right columns, both execs") {
    val left = Seq((1L, 10L, "a"), (2L, 20L, "b")).toDF("k", "t", "tag")
    val right = Seq.empty[(Long, Long, Long)].toDF("rk", "rt", "v")
    def run(): Seq[(Long, String, Option[Long])] =
      AsOf.join(left, right, "k", "rk", "t", "rt")
        .select("k", "tag", "v").as[(Long, String, Option[Long])]
        .collect().sortBy(_._1).toSeq
    val expected = Seq((1L, "a", None), (2L, "b", None))
    assert(run() === expected)
    withShuffledAsOf(assert(run() === expected))
  }

  test("agrees with the union+last-ignoreNulls as-of on real tables (both execs)") {
    val dir = sf0001
    val left = Tables.orders(spark, dir).select(
      col("o_custkey").as("id"), to_date(col("o_orderdate")).as("date"),
      col("o_orderkey"))
    val right = EventSeries.daily(spark, dir).select(
      col("id").as("r_id"), col("date").as("r_date"), col("dval"))
    def runNative(): Array[(Long, java.sql.Date, Long)] =
      AsOf.join(left, right, "id", "r_id", "date", "r_date")
        .select(col("o_orderkey"),
          coalesce(col("r_date"), lit("1900-01-01").cast("date")).as("asof_date"),
          coalesce(col("dval"), lit(-1L)).as("asof_dval"))
        .as[(Long, java.sql.Date, Long)].collect().sortBy(_._1)
    val native = runNative()
    val nativeShuffled = withShuffledAsOf(runNative())
    assert(native.toSeq === nativeShuffled.toSeq)
    // pin the reference to the union-window plan: with AsOfAutoRewrite
    // active, q_join_asof would otherwise plan to the same native exec
    // and the comparison would be native-vs-native
    spark.conf.set(AsOfAutoRewrite.ConfKey, "false")
    val reference =
      try graft.SparkEntry.queries("q_join_asof")(spark, dir)
        .select("o_orderkey", "asof_date", "asof_dval")
        .as[(Long, java.sql.Date, Long)].collect().sortBy(_._1)
      finally spark.conf.unset(AsOfAutoRewrite.ConfKey)
    assert(native.length === reference.length)
    native.zip(reference).foreach { case (n, r) => assert(n === r) }
  }

  test("AsOfColumnPruning shrinks wide inputs to the referenced columns") {
    // wide inputs: all of orders (9 cols) x all of lineitem-derived
    // right side; the query only uses 2 non-key columns.
    val left = Tables.orders(spark, sf0001)
      .withColumn("odate", to_date(col("o_orderdate")))
    val right = Tables.orders(spark, sf0001).select(
      col("o_custkey").as("r_id"), to_date(col("o_orderdate")).as("r_date"),
      col("o_totalprice").as("r_price"), col("o_orderpriority").as("r_prio"),
      col("o_orderstatus").as("r_status"))
    val joined = AsOf.join(left, right, "o_custkey", "r_id", "odate", "r_date")
      .select(col("o_orderkey"), col("r_price"))
    // the optimizer rule must have pushed per-side Projects into the
    // join: the logical children carry only key/time + referenced cols
    val aj = joined.queryExecution.optimizedPlan.collectFirst {
      case a: AsOfJoinPlan => a
    }.getOrElse(fail("no AsOfJoinPlan in optimized plan"))
    assert(aj.left.output.map(_.name).toSet === Set("o_orderkey", "o_custkey", "odate"),
      aj.left.output.map(_.name).mkString(","))
    assert(aj.right.output.map(_.name).toSet === Set("r_id", "r_date", "r_price"),
      aj.right.output.map(_.name).mkString(","))
    // pruning cascades into the parquet scan (ReadSchema, not post-scan)
    val explained = joined.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val readSchemas = explained.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(readSchemas.nonEmpty, explained)
    assert(!readSchemas.exists(_.contains("o_orderstatus")), readSchemas.mkString(";"))
    assert(!readSchemas.exists(_.contains("o_orderpriority")), readSchemas.mkString(";"))
    // and the pruned plan still computes the same rows
    val wide = AsOf.join(left, right, "o_custkey", "r_id", "odate", "r_date")
      .select(col("o_orderkey"), col("r_price"), col("o_orderstatus"))
      .select("o_orderkey", "r_price")
      .as[(Long, Option[Double])].collect().sortBy(_._1).toSeq
    val narrow = joined.as[(Long, Option[Double])].collect().sortBy(_._1).toSeq
    assert(narrow === wide)
  }
}
