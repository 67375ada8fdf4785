package graft.text

import graft.tables.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc probe of LSH bucket-size distributions on real test data
  * (not a test; run via Test/runMain graft.text.BucketSizeProbe).
  * Validates that the default `maxBucket` caps sit far above any
  * organic bucket, so capping changes nothing on the oracle data. */
object BucketSizeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = Tables.documents(spark, dir)

    val withSh = TextFunctions.shingleTable(docs, "doc_id", "text", 3)
      .filter(size(col("sh")) > 0)
    val bands = Dedup.bandTable(
      Dedup.minhashSignature(withSh, "doc_id", "sh"), "doc_id")
    println("minhash band buckets:")
    bands.groupBy("band", "band_hash").count()
      .agg(max("count").as("max"), expr("percentile(count, 0.999)").as("p999"),
        count(lit(1)).as("n_buckets"))
      .show(false)

    val fp = Dedup.simhash(docs)
    val blocks = fp.select(col("doc_id"), posexplode(
        array((0 until 4).map(b =>
          pmod(shiftright(col("simhash"), b * 16), lit(65536L))): _*)))
      .toDF("doc_id", "block", "block_val")
    println("simhash block buckets:")
    blocks.groupBy("block", "block_val").count()
      .agg(max("count").as("max"), expr("percentile(count, 0.999)").as("p999"),
        count(lit(1)).as("n_buckets"))
      .show(false)

    val emb = Tables.embeddings(spark, dir)
    val bk = graft.sim.Similarity.buckets(emb).select("vec_id", "table", "bucket")
    println("hyperplane LSH buckets:")
    bk.groupBy("table", "bucket").count()
      .agg(max("count").as("max"), expr("percentile(count, 0.999)").as("p999"),
        count(lit(1)).as("n_buckets"))
      .show(false)
    spark.stop()
  }
}
