package graft

import graft.tables.Tables
import org.apache.spark.sql.functions._

/** Mergeability proofs for the approx tier (q_approx_distinct /
  * q_approx_quantiles): the property that makes sketches the 100 TB
  * answer is not the estimate itself but that PARTIAL sketches built
  * independently (per partition, per day, per shard) union into
  * exactly the sketch a single pass would have built — so a nightly
  * pipeline maintains yesterday's sketch and merges today's delta
  * instead of rescanning the fact history (same algebraic-merge
  * contract q_incremental_agg proves for sums). */
class SketchMergeSpec extends SparkSpec {
  import spark.implicits._

  test("per-partition HLL sketches union to the single-pass estimate") {
    val li = Tables.lineitem(spark, sf0001).select(col("l_orderkey"))
    // stage 1: one DataSketches-HLL per shuffle partition — at scale,
    // this is the tiny per-day/per-shard artifact you'd persist
    val partials = li.repartition(8, col("l_orderkey"))
      .withColumn("p", spark_partition_id())
      .groupBy("p").agg(hll_sketch_agg(col("l_orderkey")).as("sk"))
    assert(partials.count() === 8)
    // stage 2: union the partials and estimate
    val merged = partials
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .as[Long].head()
    // the single-pass sketch over the same rows
    val single = li.agg(hll_sketch_estimate(hll_sketch_agg(col("l_orderkey"))))
      .as[Long].head()
    // HLL union at equal lgConfigK merges registers losslessly, but a
    // small sketch may still be in sparse (LIST/SET) mode and take a
    // different promotion path than the single-pass sketch — estimates
    // can differ by a rounding hair (observed: 1474 vs 1473), never by
    // a statistically meaningful amount
    assert(math.abs(merged - single).toDouble / single < 0.01,
      s"union estimate $merged != single-pass $single")
    val exact = li.distinct().count()
    assert(math.abs(merged - exact).toDouble / exact < 0.05,
      s"estimate $merged too far from exact $exact")
  }

  test("per-partition quantile summaries merge within the rank-error bound") {
    import org.apache.spark.sql.catalyst.util.QuantileSummaries
    val eps = 0.01
    val vals = Tables.events(spark, sf0001)
      .select(round(col("value") * 100).cast("long").as("vc"))
      .as[Long]
    val n = vals.count()
    // stage 1: one Greenwald-Khanna summary per partition, compressed;
    // stage 2: pairwise merge (what approx_percentile's partial/final
    // aggregation does internally at scale)
    val merged = vals.rdd.repartition(8).mapPartitions { it =>
      var qs = new QuantileSummaries(
        QuantileSummaries.defaultCompressThreshold, eps)
      it.foreach(v => qs = qs.insert(v.toDouble))
      Iterator.single(qs.compress())
    }.treeReduce((a, b) => a.merge(b))
    // GK guarantees rank error, not value equality, under merge: every
    // queried quantile must land within ~eps·n ranks of the true rank
    // (2x slack for the merge of independently-built summaries)
    val sorted = vals.collect().sorted
    for (q <- Seq(0.1, 0.5, 0.9, 0.99)) {
      val est = merged.query(q).get
      val rank = sorted.count(_ <= est)
      val target = q * n
      assert(math.abs(rank - target) <= 2 * eps * n + 1,
        s"q=$q est=$est rank=$rank target=$target n=$n")
    }
  }

  test("q_sketch_rollup: merged-tier estimates equal recompute and bound error") {
    // the DuckDB oracle recomputes every tier FROM ROWS while the
    // engine MERGES cell sketches upward — the hash gate already
    // proves merge == recompute; here we pin the numeric contract
    val rows = SparkEntry.queries("q_sketch_rollup")(spark, sf0001)
      .select("level", "key", "n_exact", "est", "err_pct")
      .as[(String, String, Long, Long, Long)].collect().toSeq
    val langs = rows.filter(_._1 == "lang")
    val all = rows.filter(_._1 == "all")
    assert(langs.size === 5 && all.size === 1)
    // hierarchy sanity: the global exact is at most the sum of lang
    // exacts (hash sets overlap across langs) and at least their max
    assert(all.head._3 <= langs.map(_._3).sum)
    assert(all.head._3 >= langs.map(_._3).max)
    // K=256 KMV: relative error within ~4/sqrt(K) ≈ 25% on every tier
    rows.foreach { r => assert(r._5 <= 25, s"${r._2}: err ${r._5}%") }
  }
}
