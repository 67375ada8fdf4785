package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavior specs for the decision-support family ([[DecisionQueries]]).
  * The DuckDB oracle pins exact values; these pin the SEMANTICS against
  * independent formulations (brute-force skyline, count-distinct,
  * window top-k). */
class DecisionQueriesSpec extends SparkSpec {
  import spark.implicits._

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, sf0001)

  test("q_skyline: two-phase result equals the brute-force Pareto front") {
    val got = run("q_skyline")
      .select("p_partkey", "price_c", "sz")
      .as[(Long, Long, Int)].collect().toSet
    val pts = graft.tables.Tables.part(spark, sf0001)
      .select(col("p_partkey"),
        graft.ops.Num.cents(col("p_retailprice")).as("price_c"),
        col("p_size").cast("int").as("sz"))
      .as[(Long, Long, Int)].collect()
    val brute = pts.filter { case (_, p, s) =>
      !pts.exists { case (_, qp, qs) =>
        qp <= p && qs >= s && (qp < p || qs > s)
      }
    }.toSet
    assert(got === brute)
    assert(got.nonEmpty)
  }

  test("q_outlier_iqr: every flagged row lies outside its group fences") {
    val rows = run("q_outlier_iqr")
      .select("v", "lo", "hi").as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (v, lo, hi) => v < lo || v > hi })
  }

  test("q_bitmap_distinct equals count(distinct) per nation") {
    val got = run("q_bitmap_distinct")
      .as[(String, Long)].collect().toMap
    val expected = graft.tables.Tables.customer(spark, sf0001)
      .join(graft.tables.Tables.nation(spark, sf0001),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name").agg(countDistinct("c_custkey").as("n"))
      .as[(String, Long)].collect().toMap
    assert(got === expected)
    assert(got.values.sum > 0)
  }

  test("q_lateral_topk equals the window top-3 formulation") {
    val got = run("q_lateral_topk")
      .select("r_name", "s_name", "bal_c")
      .as[(String, String, Long)].collect().toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("r_name").orderBy(col("s_acctbal").desc, col("s_suppkey"))
    val expected = graft.tables.Tables.supplier(spark, sf0001)
      .join(graft.tables.Tables.nation(spark, sf0001),
        col("s_nationkey") === col("n_nationkey"))
      .join(graft.tables.Tables.region(spark, sf0001),
        col("n_regionkey") === col("r_regionkey"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select(col("r_name"), col("s_name"),
        graft.ops.Num.cents(col("s_acctbal")).as("bal_c"))
      .orderBy(col("r_name"), col("bal_c").desc, col("s_name"))
      .as[(String, String, Long)].collect().toSeq
    assert(got === expected)
  }
}
