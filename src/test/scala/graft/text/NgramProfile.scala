package graft.text

import graft.tables.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stage profiler for the ngram-Jaccard plan. */
object NgramProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-12s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
    }
    val docs = Tables.documents(spark, dir)
    val sh = TextFunctions.shingleTable(docs, "doc_id", "text", 3)
      .select(col("doc_id"), explode(col("sh")).as("shingle"))
    time("sh")(sh.count())
    time("sh2")(sh.count())
    val shingleUdf = udf((text: String) =>
      text.split(' ').sliding(3).withFilter(_.length == 3)
        .map(_.mkString(" ")).distinct.toArray)
    val shU = docs.select(col("doc_id"), explode(shingleUdf(col("text"))).as("shingle"))
    time("shU")(shU.count())
    time("shU2")(shU.count())
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    time("sizes")(sizes.count())
    val capped = sh.withColumn("df",
        count(lit(1)).over(Window.partitionBy("shingle")))
      .filter(col("df") <= 100).select("doc_id", "shingle")
    time("capped")(capped.count())
    val pairs = capped.as("a").join(capped.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    time("pairs")(pairs.count())
    spark.stop()
  }
}
