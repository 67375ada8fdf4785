package graft.sim

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q_ann_hnsw_upsert — incremental graph maintenance converges to the
  * canonical stored graph: merged == canonical per layer, the carry
  * half is non-vacuous (most level-0 sources never rescore), carried
  * and recomputed partition the edge set, and a carried source's
  * edges equal the canonical graph's bit-for-bit. */
class HnswUpsertSpec extends SparkSpec {
  import spark.implicits._

  private lazy val rows = SparkEntry.queries("q_ann_hnsw_upsert")(
    spark, sf0001).collect()
    .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
    .toMap

  test("merged equals canonical at every layer") {
    for (l <- 0 to Hnsw.MaxLevel) {
      assert(rows(s"l${l}_merged") == rows(s"l${l}_canonical"),
        s"layer $l diverged")
    }
  }

  test("carried and recomputed partition the merged edge count") {
    for (l <- 0 to Hnsw.MaxLevel) {
      val c = rows(s"l${l}_carried")
      val r = rows(s"l${l}_recomputed")
      val m = rows(s"l${l}_merged")
      assert(c._1 + r._1 == m._1, s"layer $l counts do not partition")
      assert(c._2 + r._2 == m._2, s"layer $l ic sums do not partition")
      assert((c._3 ^ r._3) == m._3, s"layer $l xors do not partition")
    }
  }

  test("the carry half is non-vacuous at level 0") {
    val c = rows("l0_carried")
    val m = rows("l0_merged")
    assert(c._1 > 0, "no edge carried — the delta story is vacuous")
    assert(c._1 < m._1, "every edge carried — no upsert happened")
  }

  test("a carried source's stored edges equal the canonical graph's") {
    val uRoot = graft.queries.SimilarityQueries
      .ensureHnswUpsert(spark, sf0001)
    val gRoot = Hnsw.ensureGraph(spark,
      graft.tables.Tables.embeddings(spark, sf0001), sf0001)
    val aff = spark.read.parquet(s"$uRoot/a0")
      .join(spark.read.parquet(s"$uRoot/a0")
        .filter(col("vec_id") % 701 === 5).select("cid").distinct(),
        Seq("cid"))
      .select("vec_id").distinct().as[Long].collect().toSet
    val early = spark.read.parquet(s"$uRoot/early_e0")
      .select("src", "dst", "ic").as[(Long, Long, Long)].collect()
      .filterNot(e => aff(e._1)).toSet
    val canon = spark.read.parquet(s"$gRoot/e0")
      .select("src", "dst", "ic").as[(Long, Long, Long)].collect()
      .filterNot(e => aff(e._1)).toSet
    assert(early.nonEmpty && early == canon,
      "a carried source's pre-upsert edges differ from the canonical graph")
  }
}
