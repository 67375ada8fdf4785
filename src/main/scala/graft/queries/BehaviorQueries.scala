package graft.queries

import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Behavioral event analytics over the `events` table: cohort
  * retention and ordered-funnel conversion — the two canonical
  * product-analytics aggregations a general engine must express.
  * Both are pure multi-stage aggregate plans (no windows over the
  * raw stream, no per-user state), so they scale as a handful of
  * user_id-keyed shuffles whose inputs shrink at every stage.
  */
object BehaviorQueries {

  private val Epoch = "2024-01-01"

  /** Activity week index: days since the fixed epoch, div 7. */
  private def week(ts: org.apache.spark.sql.Column) =
    floor(datediff(to_date(ts), lit(Epoch)) / 7).cast("long")

  /** Weekly cohort retention: users bucketed by first-activity week,
    * counted per (cohort week, week offset). Plan: one aggregate for
    * first weeks, one distinct on (user, week), one user-key join
    * (both sides already hash-partitioned by user_id — AQE reuses the
    * exchange), then a small final aggregate. The fact table is
    * scanned once per side with only (user_id, ts) read. */
  private def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), week(col("ts")).as("wk"))
    val firsts = ev.groupBy("user_id").agg(min(col("wk")).as("cohort_wk"))
    val active = ev.distinct()
    active.join(firsts, Seq("user_id"))
      .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("offset_wk"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy("cohort_wk", "offset_wk")
  }

  private val weekSql =
    s"CAST(floor(date_diff('day', DATE '$Epoch', CAST(ts AS DATE)) / 7.0) AS BIGINT)"

  private val cohortRetentionSql =
    s"""WITH ev AS (SELECT user_id, $weekSql AS wk FROM events),
       |firsts AS (SELECT user_id, MIN(wk) AS cohort_wk FROM ev GROUP BY user_id),
       |active AS (SELECT DISTINCT user_id, wk FROM ev)
       |SELECT cohort_wk, wk - cohort_wk AS offset_wk,
       |  COUNT(DISTINCT a.user_id) AS n_users
       |FROM active a JOIN firsts f ON a.user_id = f.user_id
       |GROUP BY 1, 2 ORDER BY cohort_wk, offset_wk""".stripMargin

  /** Ordered funnel view → click → purchase: a user converts a stage
    * only with an event strictly AFTER their earliest completion of
    * the previous stage. Three shrinking aggregate+join stages (the
    * classic sequential-dependency formulation — each stage's input
    * is the previous stage's survivors, so the joins get cheaper as
    * the funnel narrows). */
  private def funnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select("user_id", "event_type", "ts")
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("t1"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, Seq("user_id")).filter(col("ts") > col("t1"))
      .groupBy("user_id").agg(min(col("ts")).as("t2"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, Seq("user_id")).filter(col("ts") > col("t2"))
      .groupBy("user_id").agg(min(col("ts")).as("t3"))
    def stage(df: DataFrame, name: String) =
      df.agg(count(lit(1)).as("n_users")).select(lit(name).as("stage"), col("n_users"))
    stage(v, "1_view").union(stage(c, "2_click")).union(stage(p, "3_purchase"))
      .orderBy("stage")
  }

  private val funnelSql =
    """WITH v AS (
      |  SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id
      |), c AS (
      |  SELECT e.user_id, MIN(e.ts) AS t2 FROM events e JOIN v ON e.user_id = v.user_id
      |  WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id
      |), p AS (
      |  SELECT e.user_id, MIN(e.ts) AS t3 FROM events e JOIN c ON e.user_id = c.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id
      |)
      |SELECT stage, n_users FROM (
      |  SELECT '1_view' AS stage, COUNT(*) AS n_users FROM v
      |  UNION ALL SELECT '2_click', COUNT(*) FROM c
      |  UNION ALL SELECT '3_purchase', COUNT(*) FROM p)
      |ORDER BY stage""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q_cohort_retention", cohortRetention, Some(cohortRetentionSql)),
    Q("q_funnel", funnel, Some(funnelSql)),
  )
}
