package graft.text

import graft.SparkSpec
import graft.functions.F
import org.apache.spark.sql.functions._

/** Adversarial hot-bucket fixtures: a boilerplate cluster of N
  * identical documents lands every doc in the same LSH bucket. The
  * bounded bucket-pair path must (a) keep the aggregation buffer at
  * O(maxBucket) — asserted via the CappedMinIds output shape — and
  * (b) emit O(N) star pairs instead of O(N²), while losing nothing:
  * identical docs all verify against the representative. */
class BoundedBucketSpec extends SparkSpec {
  import spark.implicits._

  val N = 500 // identical docs; uncapped pair count would be 124 750

  lazy val identicalDocs = spark.range(N)
    .select(col("id").as("doc_id"),
      lit("the quick brown fox jumps over the lazy dog again and again").as("text"))
    .cache()

  test("CappedMinIds keeps total count but only the cap smallest ids") {
    val out = spark.range(1000).select(lit(1).as("k"), col("id"))
      .groupBy("k").agg(F.cappedMinIds(col("id"), 16).as("b"))
      .select(col("b.total"), col("b.ids")).as[(Long, Seq[Long])].head()
    assert(out._1 === 1000L)
    assert(out._2 === (0L until 16L))
  }

  test("CappedMinIds is merge-order independent across partitions") {
    // 64 partitions force map-side partials + merges; result must be
    // identical to a single-partition run.
    val wide = spark.range(0, 10000, 1, 64)
      .select((col("id") % 7).as("k"), (col("id") * 37 % 9973).as("v"))
    val narrow = wide.coalesce(1)
    def run(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("k").agg(F.cappedMinIds(col("v"), 25).as("b"))
        .select(col("k"), col("b.total"), col("b.ids"))
        .as[(Long, Long, Seq[Long])].collect().sortBy(_._1)
    assert(run(wide) === run(narrow))
  }

  test("bucketPairs Star bounds a hot bucket to O(N) star pairs") {
    val hot = spark.range(1000).select(lit(42L).as("k"), col("id"))
      .union(Seq((7L, 1L), (7L, 2L), (7L, 3L)).toDF("k", "id"))
    val got = Dedup.bucketPairs(hot, Seq("k"), "id", maxBucket = 10,
        overCap = Dedup.OverCap.Star)
      .as[(Long, Long)].collect().sorted
    // hot bucket: 999 star pairs to min id 0; small bucket: exact 3 pairs
    val star = (1L until 1000L).map((0L, _))
    val small = Seq((1L, 2L), (1L, 3L), (2L, 3L))
    assert(got === (star ++ small).sorted.toArray)
  }

  test("bucketPairs Drop still applies df-cap semantics") {
    val hot = spark.range(100).select(lit(42L).as("k"), col("id"))
      .union(Seq((7L, 1L), (7L, 2L)).toDF("k", "id"))
    val got = Dedup.bucketPairs(hot, Seq("k"), "id", maxBucket = 10)
      .as[(Long, Long)].collect()
    assert(got === Array((1L, 2L)))
  }

  test("minhashPairs on N identical docs emits N-1 pairs, all jaccard 100") {
    val out = Dedup.minhashPairs(identicalDocs, minJaccardPct = 50, maxBucket = 8)
      .select("id_a", "id_b", "jaccard_pct").as[(Long, Long, Long)].collect()
    assert(out.length === N - 1, s"expected ${N - 1} star pairs, got ${out.length}")
    assert(out.forall(p => p._1 === 0L && p._3 === 100L))
    assert(out.map(_._2).sorted === (1L until N.toLong).toArray)
    // and the pair graph still clusters everything together
    val clusters = Dedup.connectedComponents(
      Dedup.minhashPairs(identicalDocs, minJaccardPct = 50, maxBucket = 8))
      .as[(Long, Long)].collect()
    assert(clusters.length === N && clusters.forall(_._2 === 0L))
  }

  test("simhashPairs on N identical docs emits N-1 pairs at hamming 0") {
    val out = Dedup.simhashPairs(identicalDocs, maxHamming = 3, maxBucket = 8)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect()
    assert(out.length === N - 1)
    assert(out.forall(p => p._1 === 0L && p._3 === 0))
  }

  test("stress: 20k-clone boilerplate cluster dedups in O(N), not O(N^2)") {
    // uncapped, this fixture would emit ~200M candidate pairs per band
    // (the 100 TB OOM scenario); bounded, it must finish promptly with
    // exactly N-1 star pairs per-band, deduped to N-1 overall.
    val n = 20000
    val clones = spark.range(n)
      .select(col("id").as("doc_id"),
        lit("lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod").as("text"))
    val t0 = System.nanoTime()
    val pairs = Dedup.minhashPairs(clones, minJaccardPct = 50, maxBucket = 64)
      .count()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(pairs === (n - 1).toLong, s"expected ${n - 1} pairs, got $pairs")
    assert(secs < 120, s"bounded dedup took $secs s on the adversarial fixture")
  }

  test("lshCandidates bounded path equals the self-join formulation") {
    val emb = graft.tables.Tables.embeddings(spark, sf0001)
    val bk = graft.sim.Similarity.buckets(emb).select("vec_id", "table", "bucket")
    val selfJoin = bk.as("a").join(bk.as("b"),
        col("a.table") === col("b.table") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
      .distinct().as[(Long, Long)].collect().sorted
    val bounded = graft.sim.Similarity.lshCandidates(emb)
      .as[(Long, Long)].collect().sorted
    assert(bounded === selfJoin)
  }
}
