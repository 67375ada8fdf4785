package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed Dataset surface: the generic black-box group map — the Spark
  * equivalent of the reference's `apply_parallel(df.groupby(id), f)`
  * combinator (il_analysis_git.py:17-19, SURVEY §3.2). Window
  * expressions cover everything the reference actually computes; this
  * proves the escape hatch for genuinely imperative per-group logic,
  * with the same scale shape (one shuffle on the key, per-group
  * streaming evaluation, no driver involvement).
  */
object TypedQueries {

  case class DayVal(id: Long, day: Int, censored: Boolean)
  case class RunStats(id: Long, n_days: Int, longest_censored_run: Int)

  /** Longest consecutive censored-day run per id, computed
    * imperatively inside `mapGroups` over the date-sorted series —
    * the kind of sequential group algorithm that does not decompose
    * into window functions without gaps-and-islands contortions
    * (which is exactly what the DuckDB oracle uses, proving result
    * equivalence of the two formulations). */
  def longestRun(dailyFrame: DataFrame, censorBelow: Long): DataFrame = {
    val spark = dailyFrame.sparkSession
    import spark.implicits._
    val daily = dailyFrame
      .select(col("id"), datediff(col("date"), lit("1970-01-01").cast("date")).as("day"),
        (col("dval") < censorBelow).as("censored"))
      .as[DayVal]
    daily.groupByKey(_.id)
      .mapGroups { (id, rows) =>
        val sorted = rows.toSeq.sortBy(_.day)
        var best = 0
        var cur = 0
        var prevDay = Int.MinValue
        sorted.foreach { r =>
          cur = if (r.censored) {
            if (r.day == prevDay + 1 && cur > 0) cur + 1 else 1
          } else 0
          if (cur > best) best = cur
          prevDay = r.day
        }
        RunStats(id, sorted.length, best)
      }
      .toDF()
  }

  private def groupMap(spark: SparkSession, dir: String): DataFrame =
    longestRun(EventSeries.daily(spark, dir), EventSeries.CensorCases)
      .orderBy("id")

  private val groupMapSql = EventSeriesSql.withSeries(
    s""", flags AS (
       |  -- islands of calendar-consecutive censored days: row_number
       |  -- runs over the censored subset so day - rn is constant
       |  -- exactly within one gap-free run
       |  SELECT id,
       |    CAST(date - DATE '1970-01-01' AS INT)
       |      - CAST(ROW_NUMBER() OVER (PARTITION BY id ORDER BY date) AS INT) AS grp
       |  FROM daily WHERE dval < ${EventSeries.CensorCases}
       |), runs AS (
       |  SELECT id, COUNT(*) AS run_len
       |  FROM flags GROUP BY id, grp
       |)
       |SELECT d.id, CAST(d.n_days AS INT) AS n_days,
       |  CAST(COALESCE(MAX(r.run_len), 0) AS INT) AS longest_censored_run
       |FROM (SELECT id, COUNT(*) AS n_days FROM daily GROUP BY id) d
       |LEFT JOIN runs r ON d.id = r.id
       |GROUP BY d.id, d.n_days
       |ORDER BY d.id""".stripMargin)

  val all: Seq[Q] = Seq(
    Q("q_group_map", groupMap, Some(groupMapSql)),
  )
}
