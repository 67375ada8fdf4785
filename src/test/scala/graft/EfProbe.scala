package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object EfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("efprobe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    import graft.sim.{Hnsw, Similarity}
    val emb = graft.tables.Tables.embeddings(spark, dir)
    for (rep <- 1 to 3) {
      var t0 = System.nanoTime()
      def lap(tag: String): Unit = {
        println(f"[efprobe] rep$rep $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
        t0 = System.nanoTime()
      }
      val base = graft.ops.SideCache.persist(Hnsw.withLevels(emb))
      val gRoot = Hnsw.ensureGraph(spark, emb, dir)
      val adjs = (0 to Hnsw.MaxLevel).map(l =>
        graft.ops.SideCache.persist(spark.read.parquet(s"$gRoot/e$l")))
      lap("setup")
      val (vis, fin) = Hnsw.beamSearch(base, adjs, Seq(1, 2, 4, 8))
      lap("beam")
      val brute = graft.ops.SideCache.persist(
        Similarity.ensureBruteBaseline(spark, emb, dir).select("qid", "vec_id"))
      brute.count()
      lap("brute")
      val n = SparkEntry.queries("q_ef_curve")(spark, dir).collect().length
      lap(s"full_query rows=$n")
      graft.ops.SideCache.releaseAll()
    }
    spark.stop()
  }
}
