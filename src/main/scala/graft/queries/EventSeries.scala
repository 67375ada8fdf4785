package graft.queries

import graft.ops.{Num, TimeSeriesOps => TS}
import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parameterization of the reference's MOH fact series onto the driver
  * `events` table (FIXTURES.md §B): `user_id`→id, `cast(ts as date)`→
  * date, integer-cents `value`→daily counts, `purchase`/`signup`
  * events→"new case"/"new vaccine" flags, and `customer`→the area
  * dimension (acctbal-derived `pop`, `c_name`→area_name,
  * `c_nationkey`→socio_economic_rank).
  *
  * The censoring analog: a day whose total is below a threshold
  * contributes 0 to the cumulative series — mirroring the MOH `'<15'`
  * privacy censor (il_analysis_git.py:60-62) that rebase_15 then
  * imputes.
  *
  * Every frame here has an exact DuckDB-SQL twin in [[EventSeriesSql]];
  * all aggregates run on integer cents so both engines are bit-equal.
  */
object EventSeries {

  val CensorCases = 5000L  // daily cents below this -> censored to 0
  val CensorVacc  = 8000L

  /** Per-(id, date) daily increments from raw events.
    * One hash-aggregate after a shuffle on (id, date); at 100 TB this
    * is the classic partial+final combine — no skew beyond key width. */
  def daily(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("user_id").as("id"),
        to_date(col("ts")).as("date"),
        Num.cents(col("value")).as("vc"),
        col("event_type"))
      .groupBy("id", "date")
      .agg(
        sum("vc").as("dval"),
        count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("new_case"),
        sum(when(col("event_type") === "signup", 1L).otherwise(0L)).as("new_vaccine"))

  /** daily + cumulative (censored) series columns. Single shuffle on
    * `id`; all five running sums share one WindowExec sort. */
  def series(spark: SparkSession, dir: String): DataFrame = {
    val w = TS.cumW("id", "date")
    daily(spark, dir)
      .withColumn("cases",
        sum(when(col("dval") < CensorCases, 0L).otherwise(col("dval"))).over(w))
      .withColumn("vaccine",
        sum(when(col("dval") < CensorVacc, 0L).otherwise(col("dval"))).over(w))
      .withColumn("cum_new_case", sum(col("new_case")).over(w))
      .withColumn("cum_new_vaccine", sum(col("new_vaccine")).over(w))
      .withColumn("tests", sum(col("n_events")).over(w) * 100)
  }

  /** series ⋈ customer dimension — broadcast hash join, the analog of
    * the reference's fact⋈shape merge (il_analysis_git.py:126). */
  def seriesWithPop(spark: SparkSession, dir: String): DataFrame = {
    val dim = Tables.customer(spark, dir).select(
      col("c_custkey").as("id"),
      (Num.cents(abs(col("c_acctbal"))) + 100000L).as("pop"),
      col("c_name").as("area_name"),
      col("c_nationkey").as("socio_economic_rank"))
    series(spark, dir).join(broadcast(dim), Seq("id"), "inner")
  }
}

/** DuckDB CTE twins for [[EventSeries]]. DuckDB widens integer SUMs to
  * HUGEINT, so every aggregate is explicitly CAST back to BIGINT to
  * keep parquet schemas hash-identical with Spark's LongType. */
object EventSeriesSql {

  val daily: String =
    s"""daily AS (
       |  SELECT
       |    user_id AS id,
       |    CAST(ts AS DATE) AS date,
       |    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS dval,
       |    COUNT(*) AS n_events,
       |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS new_case,
       |    CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS new_vaccine
       |  FROM events
       |  GROUP BY user_id, CAST(ts AS DATE)
       |)""".stripMargin

  private val w = "PARTITION BY id ORDER BY date ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"

  val series: String =
    s"""series AS (
       |  SELECT id, date, dval, n_events, new_case, new_vaccine,
       |    CAST(SUM(CASE WHEN dval < ${EventSeries.CensorCases} THEN 0 ELSE dval END) OVER ($w) AS BIGINT) AS cases,
       |    CAST(SUM(CASE WHEN dval < ${EventSeries.CensorVacc} THEN 0 ELSE dval END) OVER ($w) AS BIGINT) AS vaccine,
       |    CAST(SUM(new_case) OVER ($w) AS BIGINT) AS cum_new_case,
       |    CAST(SUM(new_vaccine) OVER ($w) AS BIGINT) AS cum_new_vaccine,
       |    CAST(SUM(n_events) OVER ($w) AS BIGINT) * 100 AS tests
       |  FROM daily
       |)""".stripMargin

  val spop: String =
    s"""spop AS (
       |  SELECT s.*,
       |    CAST(round(abs(c.c_acctbal) * 100) AS BIGINT) + 100000 AS pop,
       |    c.c_name AS area_name,
       |    c.c_nationkey AS socio_economic_rank
       |  FROM series s JOIN customer c ON s.id = c.c_custkey
       |)""".stripMargin

  /** `WITH daily, series[, spop]` prefix for oracle queries. */
  def withSeries(body: String): String = s"WITH $daily,\n$series\n$body"
  def withSpop(body: String): String = s"WITH $daily,\n$series,\n$spop\n$body"
}
