package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// temporary measurement scratchpad — not part of the engine; removed
// at the end of the optimization round.
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      for (r <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = f
        println(f"[scratch] $name%-28s rep$r ${(System.nanoTime() - t0) / 1e9}%7.3f s  (n=$n)")
        graft.ops.SideCache.releaseAll()
        spark.catalog.clearCache()
      }
    }
    import graft.sim.{Hnsw, Similarity}
    val emb = graft.tables.Tables.embeddings(spark, dir)
    val gRoot = Hnsw.ensureGraph(spark, emb, dir)
    time("ensureGraph (cached)")({ Hnsw.ensureGraph(spark, emb, dir); 0L })
    time("withLevels count")(Hnsw.withLevels(emb).count())
    time("search all")({
      val base = graft.ops.SideCache.persist(Hnsw.withLevels(emb))
      val adjs = (0 to Hnsw.MaxLevel).map(l =>
        graft.ops.SideCache.persist(spark.read.parquet(s"$gRoot/e$l")))
      val (vis, _, top10) = Hnsw.search(base, adjs)
      top10.count()
    })
    time("beamSearch all")({
      val base = graft.ops.SideCache.persist(Hnsw.withLevels(emb))
      val adjs = (0 to Hnsw.MaxLevel).map(l =>
        graft.ops.SideCache.persist(spark.read.parquet(s"$gRoot/e$l")))
      val (vis, fin) = Hnsw.beamSearch(base, adjs, Seq(1, 2, 4, 8))
      vis.count()
    })
    val path = Similarity.ensureStoredIndex(spark, emb, dir, split9 = true)
    time("serveStored")({
      Similarity.ivfPqServeStored(emb, path, queryMod = 50L,
        kCand = 100, k = 10, segments = Seq("codes", "codes_delta")).count()
    })
    val del = emb.filter(col("vec_id") % 13 === 0).select("vec_id")
    time("compactDelete 2 segs")({
      Similarity.ivfPqCompactDelete(spark, path, del,
        Seq("codes", "codes_delta")).length.toLong
    })
    spark.stop()
  }
}
