package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import scala.util.Random

/** Document deduplication at corpus scale: exact (hash-groupBy),
  * MinHash+LSH (shingle → signature → banded bucket join), and
  * SimHash (bit-sum fingerprint + pigeonhole block join).
  *
  * Scale design: nothing here compares all-pairs. Exact dedup is one
  * shuffle on the content hash. MinHash candidates come from a
  * self-join on (band, band-hash) — each bucket holds only colliding
  * docs, so the join output is proportional to true near-duplicates,
  * not |docs|². SimHash pairs join on one of four 16-bit blocks
  * (pigeonhole: hamming ≤ 3 ⇒ at least one block identical).
  */
object Dedup {

  /** Exact dedup: group by content hash, keep the smallest doc_id.
    * One partial+final hash aggregate — the 100 TB-safe baseline. */
  def exact(docs: DataFrame, id: String = "doc_id", text: String = "text"): DataFrame =
    docs.groupBy(md5(col(text)).as("h"))
      .agg(min(col(id)).as("keeper_id"), count(lit(1)).as("n_dups"))

  // ---- MinHash ----

  val NumHashes = 64
  val Bands = 16          // 16 bands x 4 rows
  val RowsPerBand = 4
  // 31-bit Mersenne prime universe: a·h + b ≤ 2^62, safe under Spark's
  // default ANSI overflow checking (no try_multiply needed).
  private val MersennePrime = (1L << 31) - 1

  /** Fixed permutation parameters (seed 42, deterministic per run). */
  private val (permA, permB) = {
    val rnd = new Random(42)
    val a = Array.fill(NumHashes)(math.abs(rnd.nextLong()) % (MersennePrime - 1) + 1)
    val b = Array.fill(NumHashes)(math.abs(rnd.nextLong()) % MersennePrime)
    (a.toSeq, b.toSeq)
  }

  /** 64-wide MinHash signature over distinct word-3-gram shingles,
    * as one wide column per hash function (`m0`..`m63`).
    *
    * Shape matters for scale: `explode` + 64 `min` aggregates keeps
    * the whole computation inside whole-stage codegen with map-side
    * partial aggregation — the per-(doc, shingle) rows combine to one
    * row per doc *before* the shuffle. The nested
    * `transform(sequence…, array_min(transform…))` alternative is
    * interpreted (Catalyst HOFs don't codegen) and ~an order of
    * magnitude slower on the same data. */
  def minhashSignature(docs: DataFrame, id: String, shCol: String): DataFrame = {
    val exploded = docs.select(col(id), explode(col(shCol)).as("s"))
      .withColumn("h", pmod(xxhash64(col("s")), lit(MersennePrime)))
    val mins = (0 until NumHashes).map(k =>
      min(pmod(lit(permA(k)) * col("h") + lit(permB(k)), lit(MersennePrime)))
        .as(s"m$k"))
    exploded.groupBy(col(id)).agg(mins.head, mins.tail: _*)
  }

  /** (doc_id, band, band_hash) rows — Bands rows per doc. murmur3
    * `hash` over the band's signature columns (collisions are fine:
    * the exact-Jaccard verify step filters false positives). */
  def bandTable(sig: DataFrame, id: String): DataFrame =
    sig.select(col(id), posexplode(
        array((0 until Bands).map(b =>
          hash((0 until RowsPerBand).map(r => col(s"m${b * RowsPerBand + r}")) :+
            lit(b): _*)): _*)))
      .toDF(id, "band", "band_hash")

  /** Candidate pairs from LSH buckets, then exact shingle-Jaccard.
    * Returns (id_a, id_b, jaccard_pct) for pairs ≥ `minJaccardPct`.
    *
    * The shingle and band tables are persisted (memory, spill to
    * disk): each feeds BOTH sides of a self-join, and without
    * materialization Spark recomputes the tokenize→hash→aggregate
    * pipeline four times. At cluster scale this is the same pattern —
    * persist (or checkpoint) the signature table before the bucket
    * self-join. */
  def minhashPairs(docs: DataFrame, id: String = "doc_id", text: String = "text",
                   minJaccardPct: Int = 50): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val withSh = TextFunctions.shingleTable(docs, id, text, 3)
      .filter(size(col("sh")) > 0)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val bands = bandTable(minhashSignature(withSh, id, "sh"), id)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_hash") === col("b.band_hash") &&
          col(s"a.$id") < col(s"b.$id"))
      .select(col(s"a.$id").as("id_a"), col(s"b.$id").as("id_b"))
      .distinct()
    val sh = withSh.select(col(id), col("sh"))
    cand
      .join(sh.withColumnsRenamed(Map(id -> "id_a", "sh" -> "sh_a")), Seq("id_a"))
      .join(sh.withColumnsRenamed(Map(id -> "id_b", "sh" -> "sh_b")), Seq("id_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("uni", size(col("sh_a")) + size(col("sh_b")) - col("inter"))
      .withColumn("jaccard_pct", floor(col("inter") * 100.0 / col("uni") + 1e-6))
      .filter(col("jaccard_pct") >= minJaccardPct)
      .select("id_a", "id_b", "jaccard_pct")
  }

  // ---- SimHash ----

  /** 64-bit SimHash over tokens: bit i of the fingerprint is the sign
    * of Σ_tokens (±1 by bit i of the token hash). Computed as 64
    * aggregate expressions after an explode — one shuffle on doc_id,
    * partial aggregation map-side. */
  def simhash(docs: DataFrame, id: String = "doc_id", text: String = "text"): DataFrame = {
    val exploded = docs.select(col(id),
      explode(TextFunctions.tokens(col(text))).as("tok"))
      .withColumn("th", xxhash64(col("tok")))
    val bitSums = (0 until 64).map { i =>
      sum(when(pmod(shiftright(col("th"), i), lit(2)) === 1, 1).otherwise(-1)).as(s"b$i")
    }
    val sums = exploded.groupBy(col(id)).agg(bitSums.head, bitSums.tail: _*)
    val fp = (0 until 64).map { i =>
      when(col(s"b$i") > 0, lit(1L << i)).otherwise(0L)
    }.reduce(_ + _)  // disjoint bit positions: + == bitwise OR
    sums.select(col(id), fp.as("simhash"))
  }

  /** Near-dup pairs by hamming distance ≤ `maxHamming` (< 16), using
    * the pigeonhole block join over four 16-bit blocks. */
  def simhashPairs(docs: DataFrame, id: String = "doc_id", text: String = "text",
                   maxHamming: Int = 3): DataFrame = {
    val fp = simhash(docs, id, text)
    // persisted: the block table feeds both sides of the self-join
    // (same rationale as minhashPairs)
    val blocks = fp.select(col(id), col("simhash"), posexplode(
        array((0 until 4).map(b =>
          pmod(shiftright(col("simhash"), b * 16), lit(65536L))): _*)))
      .toDF(id, "simhash", "block", "block_val")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    blocks.as("a").join(blocks.as("b"),
        col("a.block") === col("b.block") &&
          col("a.block_val") === col("b.block_val") &&
          col(s"a.$id") < col(s"b.$id"))
      .select(col(s"a.$id").as("id_a"), col(s"b.$id").as("id_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
