package graft

import org.apache.spark.sql.functions._

/** Throwaway probe: time q_corpus_pipeline's side legs standalone. */
object CorpusLegProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.tables.Tables.documents(spark, sfDir)
    def t(label: String)(f: => Long): Unit = {
      (1 to 3).foreach { r =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[leg] $label%-16s rep$r ${(System.nanoTime() - t0) / 1e9}%6.2f s (n=$n)")
        spark.catalog.clearCache(); graft.ops.SideCache.releaseAll()
      }
    }
    t("docs_count") { docs.count() }
    t("media_gate") {
      graft.multimodal.Multimodal.curationGate(
        graft.multimodal.Multimodal.mediaFromDocuments(docs)).count()
    }
    t("simhash_pairs") {
      graft.text.Dedup.simhashPairs(docs, maxHamming = 3).count()
    }
    t("contam") {
      val evalHashes = docs.filter(col("doc_id") % 97 === 0)
        .select(explode(graft.functions.F.shingleHashes(col("text"), 5)).as("sh5")).distinct()
      docs.filter(col("doc_id") % 97 =!= 0)
        .select(col("doc_id"), explode(graft.functions.F.shingleHashes(col("text"), 5)).as("sh5"))
        .join(broadcast(evalHashes), Seq("sh5"))
        .select("doc_id").distinct().count()
    }
    spark.stop()
  }
}
