package graft

import graft.sim.Similarity
import graft.tables.Tables
import org.apache.spark.sql.functions._

/** Throwaway stage-timing probe for q_mmr_rerank at a given SF. */
object MmrProbe {
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
      println(f"[probe] $label%-18s ${(System.nanoTime() - s) / 1e9}%.2f s"); r
    }
    val emb = Tables.embeddings(spark, dir)
    val base = emb.select(col("vec_id"), col("embedding"),
      Similarity.l2norm(col("embedding")).as("nrm"))
    val pool = graft.ops.SideCache.persist(
      Similarity.bruteTopK(emb, queryMod = 50L, k = 20)
        .select(col("qid"), col("vec_id").as("id"))
        .join(base.select(col("vec_id").as("id"), col("embedding"), col("nrm")),
          Seq("id")))
    t("pool")(pool.count())
    val qs = base.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
        col("nrm").as("qnorm"))
    val cand = graft.ops.SideCache.persist(
      pool.join(broadcast(qs), Seq("qid"))
        .select(col("qid"), col("id"),
          (Similarity.dot(col("embedding"), col("qvec")) /
            (col("nrm") * col("qnorm"))).as("rel"),
          col("embedding"), col("nrm")))
    t("cand")(cand.count())
    val a = cand.select(col("qid"), col("id").as("a"),
      col("embedding").as("ea"), col("nrm").as("na"))
    val b = cand.select(col("qid"), col("id").as("b"),
      col("embedding").as("eb"), col("nrm").as("nb"))
    val pairs = graft.ops.SideCache.persist(
      a.join(b, Seq("qid")).filter(col("a") =!= col("b"))
        .select(col("qid"), col("a"), col("b"),
          (Similarity.dot(col("ea"), col("eb")) / (col("na") * col("nb")))
            .as("cosab")))
    t("pairs")(pairs.count())
    val slim = cand.select("qid", "id", "rel")
    var selected = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("qid",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("pick",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("mmr_q",
          org.apache.spark.sql.types.LongType))))
    for (k <- 1 to 5) {
      val remaining = slim.join(selected.select("qid", "id"), Seq("qid", "id"),
        "left_anti")
      val pen = remaining
        .join(pairs.join(selected.select(col("qid"), col("id").as("b")),
          Seq("qid", "b")).select(col("qid"), col("a").as("id"), col("cosab")),
          Seq("qid", "id"), "left")
        .groupBy("qid", "id")
        .agg(first("rel").as("rel"), max("cosab").as("maxpen"))
      val scoredRound = pen.withColumn("mmr_q",
        graft.ops.Num.floorEps((col("rel") * 0.7 -
          coalesce(col("maxpen"), lit(0.0)) * 0.3) * 1e6).cast("long"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(col("mmr_q").desc, col("id"))
      val picked = scoredRound.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("qid"), col("id"), lit(k).as("pick"), col("mmr_q"))
      selected = t(s"round $k")(selected.union(picked).localCheckpoint(true))
    }
    t("final")(selected.orderBy("qid", "pick").collect().length)
    spark.stop()
  }
}
