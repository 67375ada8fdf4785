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
      }
    }
    val docs = graft.tables.Tables.documents(spark, dir)
    time("docs.count")(docs.count())
    time("docs text len sum")(docs.agg(sum(length(col("text")))).count())
    val pg = docs.where(length(col("text")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(text) - 1), i -> substring(text, i, 2))"))
        .as("pg"))
    time("explode count")(pg.count())
    val agg = pg.groupBy("pg").agg(count(lit(1)).as("n"))
    time("agg count")(agg.count())
    time("full q_bpe_pairs")(
      agg.orderBy(col("n").desc, col("pg")).limit(10).count())
    time("full via queries map")(
      SparkEntry.queries("q_bpe_pairs")(spark, dir).count())
    spark.stop()
  }
}
