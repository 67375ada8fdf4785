package graft.queries

import graft.ops.{Num, NumSql}
import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generalized relational surface (SURVEY.md §2.4/§2.5/§2.7 "absent in
  * the reference, free from Spark" note): multi-way broadcast joins,
  * partial+final hash aggregation, semi/anti joins, global and
  * per-group top-k — the standard plans a 100 TB engine must emit.
  *
  * All money aggregates run on per-row integer cents (see [[graft.ops.Num]])
  * so Spark and DuckDB sums are bit-equal regardless of combine order.
  */
object RelationalQueries {

  /** TPC-H Q1-shaped pricing summary: one shuffle, map-side partial
    * aggregation, ~6 aggregates per group. */
  private def aggPricing(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(Num.cents(col("l_quantity"))).as("sum_qty_c"),
        sum(Num.cents(col("l_extendedprice"))).as("sum_base_c"),
        sum(Num.cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_c"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag", "l_linestatus")

  private val aggPricingSql =
    s"""SELECT l_returnflag, l_linestatus,
       |  CAST(SUM(${NumSql.cents("l_quantity")}) AS BIGINT) AS sum_qty_c,
       |  CAST(SUM(${NumSql.cents("l_extendedprice")}) AS BIGINT) AS sum_base_c,
       |  CAST(SUM(${NumSql.cents("l_extendedprice * (1 - l_discount)")}) AS BIGINT) AS sum_disc_c,
       |  COUNT(*) AS n
       |FROM lineitem
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** 5-way star join rolled up to region revenue. lineitem (the only
    * big table) never shuffles: orders⋈customer⋈nation⋈region are all
    * broadcast — at 100 TB this is the canonical star-schema plan
    * (dimension broadcast, single scan of the fact). */
  private def joinAggRegion(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    val c = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val n = Tables.nation(spark, dir).select("n_nationkey", "n_regionkey")
    val r = Tables.region(spark, dir).select("r_regionkey", "r_name")
    li.join(broadcast(o), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        sum(Num.cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue_c"),
        count(lit(1)).as("n"))
      .orderBy("r_name")
  }

  private val joinAggRegionSql =
    s"""SELECT r_name,
       |  CAST(SUM(${NumSql.cents("l_extendedprice * (1 - l_discount)")}) AS BIGINT) AS revenue_c,
       |  COUNT(*) AS n
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY r_name
       |ORDER BY r_name""".stripMargin

  /** Global top-k with deterministic tie-break (SURVEY §2.7: absent in
    * the reference; Spark plans a TakeOrderedAndProject — no full
    * sort). */
  private def topkCustomers(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(sum(Num.cents(col("o_totalprice"))).as("rev_c"))
      .orderBy(col("rev_c").desc, col("c_custkey"))
      .limit(10)

  private val topkCustomersSql =
    s"""SELECT c_custkey, c_name, CAST(SUM(${NumSql.cents("o_totalprice")}) AS BIGINT) AS rev_c
       |FROM orders JOIN customer ON o_custkey = c_custkey
       |GROUP BY c_custkey, c_name
       |ORDER BY rev_c DESC, c_custkey
       |LIMIT 10""".stripMargin

  /** Anti join: customers with no high-value order (NOT EXISTS). */
  private def joinAnti(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir).filter(col("o_totalprice") > 400000.0),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")

  private val joinAntiSql =
    """SELECT c_custkey, c_name FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0)
      |ORDER BY c_custkey""".stripMargin

  /** Semi join: customers with at least one open order (EXISTS). */
  private def joinSemi(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir).filter(col("o_orderstatus") === "O"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")

  private val joinSemiSql =
    """SELECT c_custkey, c_name FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
      |ORDER BY c_custkey""".stripMargin

  /** Per-group top-n (rank window + filter), deterministic tie-break. */
  private def topnPerGroup(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        Num.cents(col("o_totalprice")).as("price_c"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("o_custkey").orderBy(col("price_c").desc, col("o_orderkey"))))
      .filter(col("rn") <= 3)
      .orderBy("o_custkey", "rn")
  }

  private val topnPerGroupSql =
    s"""SELECT o_custkey, o_orderkey, price_c, rn FROM (
       |  SELECT o_custkey, o_orderkey, ${NumSql.cents("o_totalprice")} AS price_c,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
       |                            ORDER BY ${NumSql.cents("o_totalprice")} DESC, o_orderkey) AS INT) AS rn
       |  FROM orders
       |) WHERE rn <= 3
       |ORDER BY o_custkey, rn""".stripMargin

  /** Set ops (SURVEY §2.8): nations that have customers but no
    * suppliers (EXCEPT), and both (INTERSECT), unioned with a tag. */
  private def setExcept(spark: SparkSession, dir: String): DataFrame = {
    val cn = Tables.customer(spark, dir)
      .select(col("c_nationkey").as("nationkey"))
    val sn = Tables.supplier(spark, dir)
      .select(col("s_nationkey").as("nationkey"))
    val only = cn.except(sn).withColumn("tag", lit("customer_only"))
    val both = cn.intersect(sn).withColumn("tag", lit("both"))
    only.union(both).orderBy("tag", "nationkey")
  }

  private val setExceptSql =
    """SELECT nationkey, 'customer_only' AS tag FROM (
      |  SELECT c_nationkey AS nationkey FROM customer
      |  EXCEPT SELECT s_nationkey AS nationkey FROM supplier)
      |UNION ALL
      |SELECT nationkey, 'both' AS tag FROM (
      |  SELECT c_nationkey AS nationkey FROM customer
      |  INTERSECT SELECT s_nationkey AS nationkey FROM supplier)
      |ORDER BY tag, nationkey""".stripMargin

  /** Scalar-function surface (SURVEY §2.9) over part: string/math/date
    * built-ins in one codegen'd projection. */
  private def scalarFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir).select(
      col("p_partkey"),
      upper(col("p_brand")).as("brand_u"),
      substring(col("p_type"), 1, 6).as("type6"),
      length(col("p_name")).as("name_len"),
      (col("p_size") % 10).as("size_mod"),
      Num.roundEps(col("p_retailprice") / greatest(col("p_size"), lit(1)))
        .as("price_per_size"))
      .orderBy("p_partkey")

  private val scalarFuncsSql =
    s"""SELECT p_partkey,
       |  upper(p_brand) AS brand_u,
       |  substring(p_type, 1, 6) AS type6,
       |  CAST(length(p_name) AS INT) AS name_len,
       |  p_size % 10 AS size_mod,
       |  ${NumSql.roundEps("p_retailprice / GREATEST(p_size, 1)")} AS price_per_size
       |FROM part ORDER BY p_partkey""".stripMargin

  /** Exact wide-DECIMAL money aggregation: the 128-bit decimal path
    * (Spark Decimal128 / DuckDB HUGEINT-backed DECIMAL(38)) that money
    * sums need once corpus-scale totals overflow BIGINT cents
    * (9.2e18 cents ≈ $92 quadrillion sounds safe until micro-units ×
    * line-item × 100 TB). Decimals are derived from EXACT integer
    * cents/basis points — never from a raw double cast, whose
    * round-to-scale can legally differ by 1 ulp across engines.
    * Results surface as strings (both engines print scale-0 decimals
    * as plain digits), keeping the hash compare flat. */
  private def decimalAgg(spark: SparkSession, dir: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val vc = Num.cents(col("l_extendedprice")).cast(dec)
    val discBp = round(col("l_discount") * 10000).cast("long")
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), vc.as("vc"),
        (vc * (lit(10000L) - discBp).cast(dec)).as("rev_micro"))
      .groupBy("l_returnflag")
      .agg(sum("vc").cast("string").as("sum_cents"),
        sum("rev_micro").cast("string").as("sum_rev_micro"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  private val decimalAggSql =
    """SELECT l_returnflag,
      |  CAST(SUM(CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS DECIMAL(38,0))) AS VARCHAR) AS sum_cents,
      |  CAST(SUM(CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS DECIMAL(38,0))
      |    * CAST(10000 - CAST(round(l_discount * 10000) AS BIGINT) AS DECIMAL(38,0))) AS VARCHAR) AS sum_rev_micro,
      |  COUNT(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Collection-function surface (SURVEY §2.9 "Array/Map: none in the
    * reference" — added as engine surface): array build / distinct /
    * intersect / position / element_at(-1) / sort+slice plus one HOF
    * (`transform`), in one projection over the documents tokens.
    * Every output is an int or a short string — order-free and
    * hash-verified (array OUTPUTS are never compared directly; only
    * their sizes/elements, so element-order conventions can't bite). */
  private def collectionFuncs(spark: SparkSession, dir: String): DataFrame = {
    val t = split(col("text"), " ")
    Tables.documents(spark, dir).select(
      col("doc_id"),
      size(t).as("n_tok"),
      size(array_distinct(t)).as("n_uniq"),
      size(array_intersect(t, array(lit("the"), lit("a"), lit("of"))))
        .as("n_stop_distinct"),
      array_position(t, "the").as("pos_the"),
      array_max(transform(t, x => length(x))).as("max_tok_len"),
      element_at(t, -1).as("last_tok"),
      concat_ws("_", slice(array_sort(t), 1, 3)).as("sorted3"))
      .orderBy("doc_id")
  }

  private val collectionFuncsSql =
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS INT) AS n_tok,
      |  CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_uniq,
      |  CAST(len(list_distinct(list_filter(string_split(text, ' '),
      |    x -> list_contains(['the','a','of'], x)))) AS INT) AS n_stop_distinct,
      |  CAST(COALESCE(list_position(string_split(text, ' '), 'the'), 0) AS BIGINT) AS pos_the,
      |  CAST(list_aggregate(list_transform(string_split(text, ' '),
      |    x -> length(x)), 'max') AS INT) AS max_tok_len,
      |  (string_split(text, ' '))[-1] AS last_tok,
      |  array_to_string(list_sort(string_split(text, ' '))[1:3], '_') AS sorted3
      |FROM documents ORDER BY doc_id""".stripMargin

  /** FULL OUTER join over two pre-aggregated sides with disjoint-ish
    * key coverage (13 vs 7 of 25 nations), exercising both null
    * branches + the coalesce-key pattern. Both inputs reduce to one
    * row per nation BEFORE the join — the outer join itself is
    * key-proportional, never fact-sized (the rule for outer joins at
    * 100 TB: aggregate first, outer-join the summaries). */
  private def joinOuter(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .filter(col("c_acctbal") > 9900)
      .groupBy(col("c_nationkey").as("ck"))
      .agg(count(lit(1)).as("n_cust"))
    val s = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") > 9000)
      .groupBy(col("s_nationkey").as("sk"))
      .agg(count(lit(1)).as("n_supp"))
    c.join(s, col("ck") === col("sk"), "full_outer")
      .select(coalesce(col("ck"), col("sk")).as("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      .orderBy("nationkey")
  }

  private val joinOuterSql =
    """WITH c AS (
      |  SELECT c_nationkey AS ck, CAST(COUNT(*) AS BIGINT) AS n_cust
      |  FROM customer WHERE c_acctbal > 9900 GROUP BY 1
      |), s AS (
      |  SELECT s_nationkey AS sk, CAST(COUNT(*) AS BIGINT) AS n_supp
      |  FROM supplier WHERE s_acctbal > 9000 GROUP BY 1
      |)
      |SELECT COALESCE(ck, sk) AS nationkey,
      |  COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
      |FROM c FULL OUTER JOIN s ON ck = sk
      |ORDER BY nationkey""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q_agg_pricing", aggPricing, Some(aggPricingSql)),
    Q("q_join_outer", joinOuter, Some(joinOuterSql)),
    Q("q_join_agg_region", joinAggRegion, Some(joinAggRegionSql)),
    Q("q_topk_customers", topkCustomers, Some(topkCustomersSql)),
    Q("q_join_anti", joinAnti, Some(joinAntiSql)),
    Q("q_join_semi", joinSemi, Some(joinSemiSql)),
    Q("q_topn_per_group", topnPerGroup, Some(topnPerGroupSql)),
    Q("q_set_except", setExcept, Some(setExceptSql)),
    Q("q_scalar_funcs", scalarFuncs, Some(scalarFuncsSql)),
    Q("q_collection_funcs", collectionFuncs, Some(collectionFuncsSql)),
    Q("q_decimal_agg", decimalAgg, Some(decimalAggSql)),
  )
}
