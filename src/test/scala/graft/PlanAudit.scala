package graft

import org.apache.spark.sql.SparkSession

/** Prints physical-plan summaries for headline queries: confirms
  * broadcast joins where intended, parquet filter/column pushdown,
  * and whole-stage-codegen coverage. Run:
  * Test/runMain graft.PlanAudit [sfDir] [queryKey...] */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val keys = if (args.length > 1) args.drop(1).toSeq
      else Seq("q_join_agg_region", "q_agg_pricing", "q_export_frame",
        "q_join_asof", "q_asof_native", "q_rebase15", "q_topk_customers",
        "q_stream_window", "q_cube", "q_range_frame", "q_topn_per_group",
        "q_dedup_minhash", "q_ann_ivf", "q_contamination",
        "q_spatial_join", "q_tfidf", "q_cohort_retention", "q_funnel",
        "q_session_window", "q_incremental_agg", "q_chunking",
        "q_ann_kmeans", "q_grouping_sets", "q_lm_score", "q_write_partitioned",
        "q_ann_pq", "q_ann_ivf_pq", "q_asof_multikey", "q_pagerank",
        "q_heavy_hitters", "q_repeated_passages",
        "q_entropy", "q_triangle_count", "q_gap_fill", "q_recursive_cte",
        "q_scan_geojson_v2", "q_join_outer", "q_decimal_agg",
        "q_collection_funcs")
    keys.foreach { k =>
      val df = SparkEntry.queries(k)(spark, dir)
      // execute THIS df's plan first (collect, not count — count spawns
      // its own QueryExecution): AQE only materializes the final plan
      // (with codegen ids and runtime-chosen join strategies) after a run
      df.collect()
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val lines = plan.linesIterator.toSeq
      println(s"\n===== $k =====")
      // summary: operator lines only
      lines.takeWhile(_.nonEmpty).foreach(println)
      // pushdown + codegen evidence
      lines.filter(l => l.contains("PushedFilters") || l.contains("ReadSchema"))
        .take(6).foreach(l => println("  " + l.trim.take(160)))
      // formatted mode labels codegen stages as "[codegen id : N]"
      val wsc = "codegen id : (\\d+)".r.findAllMatchIn(plan)
        .map(_.group(1)).toSet.size
      val bhj = plan.split("BroadcastHashJoin").length - 1
      val smj = plan.split("SortMergeJoin").length - 1
      println(s"  [audit] wholeStageCodegenBlocks=$wsc broadcastJoins=$bhj sortMergeJoins=$smj")
    }
    spark.stop()
  }
}
