package graft.queries

import graft.ops.{Num, NumSql}
import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Further generalized-relational extensions: multi-level aggregation
  * (rollup), cardinality sketches, skew-safe salted joins, and a
  * typed arbitrary group-map — the remaining "absent in the
  * reference, required at 100 TB" surface.
  */
object ExtensionQueries {

  /** ROLLUP over (returnflag, linestatus): per-group, per-flag and
    * grand totals in one pass — Spark expands the grouping sets and
    * still does partial+final hash aggregation. */
  private def rollupPricing(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(Num.cents(col("l_quantity"))).as("sum_qty_c"),
        count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("sum_qty_c"), col("n"))
      .orderBy("rf", "ls")

  private val rollupPricingSql =
    s"""SELECT COALESCE(l_returnflag, 'ALL') AS rf,
       |  COALESCE(l_linestatus, 'ALL') AS ls,
       |  CAST(SUM(${NumSql.cents("l_quantity")}) AS BIGINT) AS sum_qty_c,
       |  COUNT(*) AS n
       |FROM lineitem
       |GROUP BY ROLLUP (l_returnflag, l_linestatus)
       |ORDER BY rf, ls""".stripMargin

  /** HLL++ approximate distinct counts per order priority — the
    * shuffle-light cardinality sketch (sketches merge associatively,
    * so the combine tree is exact-size-independent). Rows-only driver
    * check: sketch estimates are engine-specific; the accuracy bound
    * vs exact distinct is asserted in ExtensionSpec. */
  private def approxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(approx_count_distinct(col("o_custkey"), 0.02).as("approx_custs"),
        count(lit(1)).as("n"))
      .orderBy("o_orderpriority")

  /** Skew-safe salted join: the build side is replicated `Salts` ways,
    * the probe side sprays rows across salts, so one hot key spreads
    * over `Salts` tasks instead of one straggler. Results are
    * identical to the unsalted join — which is exactly what the
    * oracle checks. (AQE skew-join does this adaptively; the explicit
    * form is for engines/pipelines where the skew is known a priori.) */
  private val Salts = 8

  private def joinSalted(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), Num.cents(col("l_extendedprice")).as("price_c"))
      // deterministic spray: any hash that varies within a join key
      .withColumn("salt", pmod(xxhash64(col("l_orderkey"), col("price_c")), lit(Salts)))
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderpriority"))
      .crossJoin(spark.range(Salts).select(col("id").as("salt")))
    li.join(o,
        li("l_orderkey") === o("o_orderkey") && li("salt") === o("salt"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("price_c")).as("rev_c"), count(lit(1)).as("n"))
      .orderBy("o_orderpriority")
  }

  private val joinSaltedSql =
    s"""SELECT o_orderpriority,
       |  CAST(SUM(${NumSql.cents("l_extendedprice")}) AS BIGINT) AS rev_c,
       |  COUNT(*) AS n
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |GROUP BY o_orderpriority
       |ORDER BY o_orderpriority""".stripMargin

  /** GROUPING SETS ((rf), (ls), ()) — the shape rollup/cube cannot
    * express: two independent single-column breakdowns plus the grand
    * total, one Expand + one partial+final agg pass, no self-union of
    * scans. GROUPING() bits disambiguate the synthetic NULLs. */
  private def groupingSetsPricing(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(sum(Num.cents(col("l_quantity"))).as("sum_qty_c"),
        count(lit(1)).as("n"),
        grouping(col("l_returnflag")).as("g_rf"),
        grouping(col("l_linestatus")).as("g_ls"))
      .select(
        when(col("g_rf") === 0, col("l_returnflag")).otherwise(lit("ALL")).as("rf"),
        when(col("g_ls") === 0, col("l_linestatus")).otherwise(lit("ALL")).as("ls"),
        col("sum_qty_c"), col("n"))
      .orderBy("rf", "ls")

  private val groupingSetsPricingSql =
    s"""SELECT CASE WHEN GROUPING(l_returnflag) = 0 THEN l_returnflag ELSE 'ALL' END AS rf,
       |  CASE WHEN GROUPING(l_linestatus) = 0 THEN l_linestatus ELSE 'ALL' END AS ls,
       |  CAST(SUM(${NumSql.cents("l_quantity")}) AS BIGINT) AS sum_qty_c,
       |  COUNT(*) AS n
       |FROM lineitem
       |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
       |ORDER BY rf, ls""".stripMargin

  /** Approximate-quantile twin of q_color_quantiles: the same
    * 19-point color scale via the KLL/GK-style percentile_approx
    * sketch — single-pass, mergeable, bounded-memory (the exact
    * `percentile` materializes every value per group; the sketch is
    * what survives 100 TB). Rows-only driver check: sketch estimates
    * are engine-specific; the error bound vs exact is asserted in
    * ExtensionSpec. */
  private def approxQuantiles(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DoubleType
    val norm = EventSeries.seriesWithPop(spark, dir)
      .select(Num.roundEps(col("cases").cast(DoubleType) / col("pop") * 100000)
        .as("normalized"))
    val qs = (1 to 19).map(_ / 20.0)
    norm.agg(percentile_approx(col("normalized"), typedlit(qs), lit(10000)).as("qv"))
      .select(posexplode(col("qv")))
      .select((col("pos") + 1).as("q_idx"), Num.floorEps(col("col")).as("q_value"))
      .orderBy("q_idx")
  }

  /** Pivot: long→wide event-type counts per user. Explicit value list
    * (the production rule — value discovery costs an extra job and
    * breaks plan caching); one partial+final agg pass underneath. */
  private val EventTypes = Seq("click", "view", "purchase", "signup")

  private def pivotEvents(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
      .na.fill(0, EventTypes)
      .orderBy("user_id")

  private val pivotEventsSql =
    s"""SELECT user_id,
       |${EventTypes.map(t =>
            s"  CAST(COUNT(*) FILTER (WHERE event_type = '$t') AS BIGINT) AS $t")
          .mkString(",\n")}
       |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q_rollup", rollupPricing, Some(rollupPricingSql)),
    Q("q_grouping_sets", groupingSetsPricing, Some(groupingSetsPricingSql)),
    Q("q_approx_distinct", approxDistinct, None),
    Q("q_approx_quantiles", approxQuantiles, None),
    Q("q_join_salted", joinSalted, Some(joinSaltedSql)),
    Q("q_pivot", pivotEvents, Some(pivotEventsSql)),
  )
}
