package graft

/** Throwaway audit: list every registered query whose optimized plan
  * contains a partition-less logical Window, for allowlist triage. */
object WindowAudit {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, "/root/testdata/sf0.001")
          .queryExecution.optimizedPlan
        val bare = plan.collect {
          case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.partitionSpec.isEmpty => w
        }
        if (bare.nonEmpty) println(s"[audit] $name ${bare.size}")
      } catch { case e: Throwable => println(s"[audit] $name ERR ${e.getMessage.take(60)}") }
      finally { graft.ops.SideCache.releaseAll(); spark.catalog.clearCache() }
    }
    spark.stop()
  }
}
