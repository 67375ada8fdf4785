package graft

import graft.tables.Tables
import org.apache.spark.sql.functions._

/** Throwaway stage-timing probe for the distributed-rank queries. */
object RankProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val s = System.nanoTime(); val r = f
      println(f"[probe] $label%-24s ${(System.nanoTime() - s) / 1e9}%.2f s"); r
    }
    // warm codegen/JIT on the tiniest SF first
    SparkEntry.queries("q_signal_corr")(spark, "/root/testdata/sf0.001").count()
    graft.ops.SideCache.releaseAll(); spark.catalog.clearCache()
    for (rep <- 1 to 2) {
      // phase-by-phase replica of signalCorr
      val qa = t("qa quality")(
        { val d = SparkEntry.queries("q_quality_score")(spark, dir)
            .select(col("doc_id"), col("quality")); d.count(); d })
      val qb = t("qb perplexity")(
        { val d = SparkEntry.queries("q_perplexity")(spark, dir)
            .select(col("doc_id"), col("avg_nll_micro")); d.count(); d })
      val joined = t("join")({ val d = qa.join(qb, "doc_id"); d.count(); d })
      val r1 = t("rank1")({ val d = graft.ops.Ranks.globalRowNumber(
        joined, "ra", Seq(col("quality"), col("doc_id"))); d.count(); d })
      val r2 = t("rank2")({ val d = graft.ops.Ranks.globalRowNumber(
        r1, "rb", Seq(col("avg_nll_micro"), col("doc_id"))); d.count(); d })
      t("agg")(r2.withColumn("d", col("ra") - col("rb"))
        .agg(count(lit(1)), sum(col("d") * col("d"))).collect())
      graft.ops.SideCache.releaseAll(); spark.catalog.clearCache()
      t(s"FULL q_signal_corr #$rep")(
        SparkEntry.queries("q_signal_corr")(spark, dir).count())
      graft.ops.SideCache.releaseAll(); spark.catalog.clearCache()
    }
    spark.stop()
  }
}
