package graft

import graft.queries.{AnalyticQueries, BehaviorQueries, CoreQueries, CorpusPipelineQuery, CorpusQueries, DecisionQueries, ExtensionQueries, GeoQueries, GovernancePipelineQuery, GraphQueries, JourneyPipelineQuery, MaintenancePipelineQuery, MultimodalQueries, PipelineQueries, ProfilingQueries, Q, RagPipelineQuery, RelationalQueries, SimilarityQueries, TemporalQueries, TextQueries, TypedQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 is a named query in [[queries]];
  * each SQL-expressible one has a DuckDB oracle twin in [[oracleSql]]
  * with identical column aliases (the driver sorts columns by name
  * before hashing).
  */
object SparkEntry {

  /** All registered queries, in registration order. */
  def registry: Seq[Q] =
    CoreQueries.all ++ RelationalQueries.all ++ ExtensionQueries.all ++
      AnalyticQueries.all ++ ProfilingQueries.all ++ TypedQueries.all ++
      BehaviorQueries.all ++ TemporalQueries.all ++
      TextQueries.all ++ PipelineQueries.all ++ SimilarityQueries.all ++
      GeoQueries.all ++ MultimodalQueries.all ++ GraphQueries.all ++
      DecisionQueries.all ++ CorpusQueries.all ++ CorpusPipelineQuery.all ++
      RagPipelineQuery.all ++ JourneyPipelineQuery.all ++
      MaintenancePipelineQuery.all ++ GovernancePipelineQuery.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.exportFrame(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
