package graft.queries

import graft.ops.{Num, NumSql}
import graft.tables.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-profiling / navigation surface: the offset window functions
  * (lead/lag/first/last/nth over an explicit frame), exact-integer
  * histogram binning, and per-column profile stats — the "what is in
  * this 100 TB table" queries that precede any pipeline work.
  */
object ProfilingQueries {

  /** Offset/navigation window family in one pass. Unique sort key
    * (date, orderkey) makes every offset deterministic; the full
    * frame is declared explicitly — Spark's last_value default frame
    * ends at CURRENT ROW, a classic cross-engine trap. */
  private def windowNav(spark: SparkSession, dir: String): DataFrame = {
    val ord = Window.partitionBy(col("o_custkey"))
      .orderBy(col("od"), col("o_orderkey"))
    val full = ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate").cast("date").as("od"),
        Num.cents(col("o_totalprice")).as("price_c"))
      .select(col("o_orderkey"), col("o_custkey"), col("price_c"),
        lag(col("price_c"), 1).over(ord).as("prev_c"),
        lead(col("price_c"), 1).over(ord).as("next_c"),
        first(col("price_c")).over(full).as("first_c"),
        last(col("price_c")).over(full).as("last_c"),
        nth_value(col("price_c"), 2).over(full).as("second_c"))
      .orderBy("o_orderkey")
  }

  private val windowNavSql =
    s"""SELECT o_orderkey, o_custkey, price_c,
       |  lag(price_c, 1) OVER w AS prev_c,
       |  lead(price_c, 1) OVER w AS next_c,
       |  first_value(price_c) OVER wf AS first_c,
       |  last_value(price_c) OVER wf AS last_c,
       |  nth_value(price_c, 2) OVER wf AS second_c
       |FROM (
       |  SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS od,
       |    ${NumSql.cents("o_totalprice")} AS price_c
       |  FROM orders)
       |WINDOW
       |  w AS (PARTITION BY o_custkey ORDER BY od, o_orderkey),
       |  wf AS (PARTITION BY o_custkey ORDER BY od, o_orderkey
       |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
       |ORDER BY o_orderkey""".stripMargin

  /** Exact-integer histogram: fixed [lo, hi) cent range split into
    * `NBins` buckets with pure integer arithmetic (no float binning
    * drift), one partial+final aggregate — the scan-speed profile of
    * a value distribution at any scale. */
  private val NBins = 20
  private val LoC = 0L
  private val HiC = 60000000L // $600k in cents — beyond TPC-H max total

  private def histogram(spark: SparkSession, dir: String): DataFrame = {
    val c = Num.cents(col("o_totalprice"))
    val clamped = least(greatest(c, lit(LoC)), lit(HiC - 1))
    val bucket = ((clamped - LoC) * NBins / (HiC - LoC)).cast("int")
    Tables.orders(spark, dir)
      .select(bucket.as("bucket"), c.as("price_c"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        min(col("price_c")).as("min_c"), max(col("price_c")).as("max_c"))
      .orderBy("bucket")
  }

  private val histogramSql =
    s"""SELECT bucket, COUNT(*) AS n,
       |  CAST(MIN(price_c) AS BIGINT) AS min_c, CAST(MAX(price_c) AS BIGINT) AS max_c
       |FROM (
       |  SELECT CAST(LEAST(GREATEST(${NumSql.cents("o_totalprice")}, $LoC), ${HiC - 1}) * $NBins // ($HiC - $LoC) AS INT) AS bucket,
       |    ${NumSql.cents("o_totalprice")} AS price_c
       |  FROM orders)
       |GROUP BY bucket ORDER BY bucket""".stripMargin

  /** Per-column profile: null count, exact distinct, row count for a
    * fixed column set — one pruned single-column scan per column,
    * unioned. (At 100 TB the same shape runs with approx sketches —
    * see q_approx_distinct — or a single-pass multi-agg; exact
    * distinct per column is the oracle-checkable tier.) */
  private def profile(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    def one(name: String, expr: Column): DataFrame =
      li.select(expr.as("v"))
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_nulls"),
          countDistinct(col("v")).as("n_distinct"))
        .select(lit(name).as("column"), col("n_rows"), col("n_nulls"), col("n_distinct"))
    one("l_returnflag", col("l_returnflag"))
      .unionByName(one("l_linestatus", col("l_linestatus")))
      .unionByName(one("l_quantity", Num.cents(col("l_quantity"))))
      .unionByName(one("l_shipdate", col("l_shipdate").cast("date")))
      .orderBy("column")
  }

  private val profileSql = {
    def one(name: String, expr: String) =
      s"""SELECT '$name' AS "column", COUNT(*) AS n_rows,
         |  CAST(SUM(CASE WHEN $expr IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         |  CAST(COUNT(DISTINCT $expr) AS BIGINT) AS n_distinct
         |FROM lineitem""".stripMargin
    Seq(
      one("l_returnflag", "l_returnflag"),
      one("l_linestatus", "l_linestatus"),
      one("l_quantity", NumSql.cents("l_quantity")),
      one("l_shipdate", "CAST(l_shipdate AS DATE)"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY \"column\"")
  }

  val all: Seq[Q] = Seq(
    Q("q_window_nav", windowNav, Some(windowNavSql)),
    Q("q_histogram", histogram, Some(histogramSql)),
    Q("q_profile", profile, Some(profileSql)),
  )
}
