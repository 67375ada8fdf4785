package graft.queries

import graft.{SparkEntry, SparkSpec}

/** q_sssp against exact driver-side Dijkstra on the same weighted
  * edges — proving both correctness and that 6 relaxation rounds
  * CONVERGED (more rounds would change nothing). */
class SsspSpec extends SparkSpec {
  import spark.implicits._

  test("6-round relaxation equals exact Dijkstra; paths are non-trivial") {
    val got = SparkEntry.queries("q_sssp")(spark, sf0001)
      .selectExpr("CAST(n_nationkey AS BIGINT)", "dist")
      .as[(Long, Long)].collect().toMap

    // rebuild the weighted edges exactly as the query defines them
    val lineitem = graft.tables.Tables.table(spark, sf0001, "lineitem")
      .selectExpr("l_orderkey", "l_suppkey")
    val orders = graft.tables.Tables.table(spark, sf0001, "orders")
      .selectExpr("o_orderkey", "o_custkey")
    val customer = graft.tables.Tables.table(spark, sf0001, "customer")
      .selectExpr("c_custkey", "c_nationkey")
    val supplier = graft.tables.Tables.table(spark, sf0001, "supplier")
      .selectExpr("s_suppkey", "s_nationkey")
    val edges = lineitem
      .join(orders, lineitem("l_orderkey") === orders("o_orderkey"))
      .join(customer, orders("o_custkey") === customer("c_custkey"))
      .join(supplier, lineitem("l_suppkey") === supplier("s_suppkey"))
      .selectExpr("CAST(s_nationkey AS BIGINT) AS src",
        "CAST(c_nationkey AS BIGINT) AS dst")
      .filter("src <> dst")
      .groupBy("src", "dst").count()
      .selectExpr("src", "dst", "1000000 div count + 1 AS w")
      .as[(Long, Long, Long)].collect().toSeq

    // exact Dijkstra from the lowest-id supplying nation
    val src0 = edges.map(_._1).min
    val adj = edges.groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3))).toMap
    val dist = scala.collection.mutable.Map(src0 -> 0L)
    val pq = scala.collection.mutable.PriorityQueue((0L, src0))(
      Ordering.by[(Long, Long), Long](-_._1))
    while (pq.nonEmpty) {
      val (d, n) = pq.dequeue()
      if (d == dist(n)) adj.getOrElse(n, Nil).foreach { case (m, w) =>
        if (dist.get(m).forall(_ > d + w)) { dist(m) = d + w; pq.enqueue((d + w, m)) }
      }
    }
    val nations = got.keySet
    nations.foreach { n =>
      assert(got(n) === dist.getOrElse(n, -1L), s"nation $n")
    }
    // non-trivial: at least 3 distinct finite distances (0, direct, multi-hop)
    assert(got.values.filter(_ >= 0).toSet.size >= 3)
  }
}
