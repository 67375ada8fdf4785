package graft.queries

import graft.ops.{Num, TimeSeriesOps => TS}
import graft.streaming.EventStream
import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal operator surface: tumbling-window aggregation (the batch
  * twin of the Structured-Streaming path in
  * [[graft.streaming.EventStream]]), as-of join, and event-in-range
  * join — SURVEY.md §2.4's "explicitly absent" list, added as
  * north-star extensions with full DuckDB oracles.
  */
object TemporalQueries {

  /** Tumbling 1-hour window counts — exactly the streaming plan run in
    * batch mode (same code path, oracle-checkable here, incrementally
    * maintained under readStream; see StreamingSpec). */
  private def streamWindow(spark: SparkSession, dir: String): DataFrame =
    EventStream.windowedCounts(Tables.events(spark, dir))
      .orderBy("w_start", "event_type")

  private val streamWindowSql =
    """SELECT
      |  time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS w_start,
      |  time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) + INTERVAL 1 HOUR AS w_end,
      |  event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_vc
      |FROM events
      |GROUP BY 1, 2, 3 ORDER BY w_start, event_type""".stripMargin

  /** As-of join: each order picks up the latest per-(id, date) event
    * aggregate at `date <= o_orderdate` for the same key.
    *
    * Scale design — the union-window trick, NOT a per-row subquery:
    * tag both sides, union on (key, time), one `last(..ignoreNulls)`
    * running window per key carries the most recent right-side value
    * forward onto left rows. One shuffle on the key, O(n log n) sort
    * inside each partition, no join explosion, no skew beyond the
    * key's own distribution — this is how as-of joins stay linear at
    * 100 TB (same pattern as Flink temporal joins / kdb aj).
    */
  private def joinAsof(spark: SparkSession, dir: String): DataFrame = {
    val left = Tables.orders(spark, dir).select(
      col("o_custkey").as("id"), to_date(col("o_orderdate")).as("date"),
      col("o_orderkey"), lit(0).as("side"),
      lit(null).cast("long").as("r_dval"), lit(null).cast("date").as("r_date"))
    val right = EventSeries.daily(spark, dir).select(
      col("id"), col("date"),
      lit(null).cast("long").as("o_orderkey"), lit(1).as("side"),
      col("dval").as("r_dval"), col("date").as("r_date"))
    // Right rows sort before left rows on the same date (side desc:
    // 1 before 0) => an order on date D sees the right row of date D.
    val w = Window.partitionBy("id")
      .orderBy(col("date").asc, col("side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    left.unionByName(right)
      .withColumn("asof_dval", last(col("r_dval"), ignoreNulls = true).over(w))
      .withColumn("asof_date", last(col("r_date"), ignoreNulls = true).over(w))
      .filter(col("side") === 0)
      // null-free output: sentinel date/value for orders with no prior
      // event (keeps the driver's hash compare representation-stable)
      .select(col("o_orderkey"), col("id"), col("date"),
        coalesce(col("asof_date"), lit("1900-01-01").cast("date")).as("asof_date"),
        coalesce(col("asof_dval"), lit(-1L)).as("asof_dval"))
      .orderBy("o_orderkey")
  }

  private val joinAsofSql = EventSeriesSql.withSeries(
    """SELECT o_orderkey, o_custkey AS id, CAST(o_orderdate AS DATE) AS date,
      |  COALESCE(d.date, DATE '1900-01-01') AS asof_date,
      |  COALESCE(d.dval, -1) AS asof_dval
      |FROM orders ASOF LEFT JOIN daily d
      |  ON d.id = o_custkey AND d.date <= CAST(o_orderdate AS DATE)
      |ORDER BY o_orderkey""".stripMargin)

  /** Range join: per order, aggregate the key's events falling in the
    * 7 days ending at the order date. The equality key (`id`) drives
    * the join (hash/SMJ — no nested loop); the date band is a
    * post-join filter. Band width is bounded, so output ≤ 7·|orders|
    * per key — linear, broadcast-free, skew-safe at scale. */
  private def joinRange(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(
      col("o_orderkey"), col("o_custkey").as("id"),
      to_date(col("o_orderdate")).as("odate"))
    val d = EventSeries.daily(spark, dir).select(
      col("id"), col("date"), col("dval"))
    o.join(d, d("id") === o("id") &&
        d("date") > date_sub(col("odate"), 7) && d("date") <= col("odate"))
      .groupBy(col("o_orderkey"), o("id").as("id"), col("odate"))
      .agg(count(lit(1)).as("n_days"), sum(col("dval")).as("week_dval"))
      .orderBy("o_orderkey")
  }

  private val joinRangeSql = EventSeriesSql.withSeries(
    """SELECT o_orderkey, o_custkey AS id, CAST(o_orderdate AS DATE) AS odate,
      |  COUNT(*) AS n_days, CAST(SUM(dval) AS BIGINT) AS week_dval
      |FROM orders JOIN daily d
      |  ON d.id = o_custkey
      | AND d.date > CAST(o_orderdate AS DATE) - 7 AND d.date <= CAST(o_orderdate AS DATE)
      |GROUP BY 1, 2, 3 ORDER BY o_orderkey""".stripMargin)

  val all: Seq[Q] = Seq(
    Q("q_stream_window", streamWindow, Some(streamWindowSql)),
    Q("q_join_asof", joinAsof, Some(joinAsofSql)),
    Q("q_join_range", joinRange, Some(joinRangeSql)),
  )
}
