package graft.text

import graft.tables.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for minhashPairs (not a test; run via
  * Test/runMain graft.text.MinhashProfile). */
object MinhashProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = Tables.documents(spark, dir)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-18s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
    }
    val toks = TextFunctions.tokens(col("text"))
    val withSh = docs.select(col("doc_id"),
      array_distinct(TextFunctions.wordShingles(toks, 3)).as("sh"))
      .filter(size(col("sh")) > 0)
    time("shingles")(withSh.count())
    val sig = Dedup.minhashSignature(withSh, "doc_id", "sh")
    time("signature")(sig.count())
    val bands = Dedup.bandTable(sig, "doc_id")
    time("bands")(bands.count())
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    time("candidates")(cand.count())
    time("full")(Dedup.minhashPairs(docs).count())
    time("full2")(Dedup.minhashPairs(docs).count())
    spark.stop()
  }
}
