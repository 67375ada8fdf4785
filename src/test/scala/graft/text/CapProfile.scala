package graft.text

import graft.tables.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage timer for the bounded bucket-pair path (not a test;
  * Test/runMain graft.text.CapProfile [sfDir]). */
object CapProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[cap] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
    }
    for (rep <- 1 to 2) {
      println(s"=== rep $rep ===")
      val docs = Tables.documents(spark, dir)
      val withSh = TextFunctions.shingleTable(docs, "doc_id", "text", 3)
        .filter(size(col("sh")) > 0)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val bands = Dedup.bandTable(
        Dedup.minhashSignature(withSh, "doc_id", "sh"), "doc_id")
      time("bands")(bands.count())
      val bandsP = bands.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("bands cached")(bandsP.count())
      time("collect_list agg")(
        bandsP.groupBy("band", "band_hash")
          .agg(collect_list(col("doc_id")).as("ids"))
          .filter(size(col("ids")).between(2, Int.MaxValue)).count())
      time("capped agg")(
        bandsP.groupBy("band", "band_hash")
          .agg(graft.functions.F.cappedMinIds(col("doc_id"), 1024).as("bk")).count())
      val agged = bandsP.groupBy("band", "band_hash")
        .agg(graft.functions.F.cappedMinIds(col("doc_id"), 1024).as("bk"))
      time("capped agg cache")(agged
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).count())
      time("drop pairs")(
        Dedup.bucketPairs(bandsP, Seq("band", "band_hash"), "doc_id", 1024).count())
      time("star pairs")(
        Dedup.bucketPairs(bandsP, Seq("band", "band_hash"), "doc_id", 1024,
          Dedup.OverCap.Star).count())
      time("full minhashPairs")(Dedup.minhashPairs(docs).count())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
