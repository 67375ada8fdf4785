package graft.text

import graft.functions.{F, Poly}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import scala.util.Random

/** Document deduplication at corpus scale: exact (hash-groupBy),
  * MinHash+LSH (shingle → signature → banded bucket join), and
  * SimHash (single-pass fingerprint + pigeonhole block join).
  *
  * Scale design: nothing here compares all-pairs. Exact dedup is one
  * shuffle on the content hash. MinHash candidates come from a
  * self-join on (band, band-hash) — each bucket holds only colliding
  * docs, so the join output is proportional to true near-duplicates,
  * not |docs|². SimHash pairs join on one of four 16-bit blocks
  * (pigeonhole: hamming ≤ 3 ⇒ at least one block identical).
  *
  * Signatures are computed per document in ONE codegen'd pass
  * ([[graft.functions.MinHashSig]] / [[graft.functions.SimHash64]]):
  * no shingle explosion, no 64-wide aggregation buffers, no shuffle
  * before the bucket join. The hash family is exact integer
  * arithmetic (polynomial / Mersenne-prime permutations), so the
  * DuckDB oracle replicates every bit in SQL — near-dup output is
  * hash-verified cross-engine, not just rows-counted.
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
  val MersennePrime: Long = Poly.Mod

  /** Fixed permutation parameters (seed 42, deterministic per run).
    * Public: the DuckDB oracle embeds the same constants. */
  val (permA, permB): (Seq[Long], Seq[Long]) = {
    val rnd = new Random(42)
    val a = Array.fill(NumHashes)(math.abs(rnd.nextLong()) % (MersennePrime - 1) + 1)
    val b = Array.fill(NumHashes)(math.abs(rnd.nextLong()) % MersennePrime)
    (a.toSeq, b.toSeq)
  }

  /** 64-wide MinHash signature over distinct word-3-gram shingles as
    * one `array<long>` column — a single codegen'd projection per
    * document (see [[graft.functions.MinHashSig]]); zero shuffle. */
  def minhashSignature(docs: DataFrame, id: String, shCol: String): DataFrame =
    docs.select(col(id), F.minhashSig(col(shCol), permA, permB).as("sig"))

  /** Polynomial combine of one band's signature rows:
    * `acc = (acc*131 + sig[i]) mod M` — exact integer arithmetic,
    * replicated verbatim in the oracle SQL. */
  def bandHash(sig: Column, band: Int): Column =
    (0 until RowsPerBand).foldLeft(lit(0L): Column) { (acc, r) =>
      pmod(acc * 131 + element_at(sig, band * RowsPerBand + r + 1), lit(MersennePrime))
    }

  /** (doc_id, band, band_hash) rows — Bands rows per doc, derived from
    * the signature array with built-in (codegen'd) expressions. */
  def bandTable(sig: DataFrame, id: String): DataFrame =
    sig.select(col(id), posexplode(
        array((0 until Bands).map(b => bandHash(col("sig"), b)): _*)))
      .toDF(id, "band", "band_hash")

  /** Candidate pairs from LSH buckets, then exact shingle-Jaccard.
    * Returns (id_a, id_b, jaccard_pct) for pairs ≥ `minJaccardPct`.
    *
    * The shingle table is persisted (memory, spill to disk): it feeds
    * the signature pipeline AND both sides of the verify join. At
    * cluster scale the same pattern applies — persist (or checkpoint)
    * before a self-join, or the whole lineage recomputes per side. */
  def minhashPairs(docs: DataFrame, id: String = "doc_id", text: String = "text",
                   minJaccardPct: Int = 50): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val withSh = TextFunctions.shingleTable(docs, id, text, 3)
      .filter(size(col("sh")) > 0)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val bands = bandTable(minhashSignature(withSh, id, "sh"), id)
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

  /** 62-bit SimHash fingerprint over tokens, one codegen'd pass per
    * document (no explode, no aggregation — see
    * [[graft.functions.SimHash64]] for the bit layout). */
  def simhash(docs: DataFrame, id: String = "doc_id", text: String = "text"): DataFrame =
    docs.select(col(id), F.simhash64(TextFunctions.tokens(col(text))).as("simhash"))

  /** Near-dup pairs by hamming distance ≤ `maxHamming` (< 16), using
    * the pigeonhole block join over four 16-bit blocks. */
  def simhashPairs(docs: DataFrame, id: String = "doc_id", text: String = "text",
                   maxHamming: Int = 3): DataFrame = {
    val fp = simhash(docs, id, text)
    val blocks = fp.select(col(id), col("simhash"), posexplode(
        array((0 until 4).map(b =>
          pmod(shiftright(col("simhash"), b * 16), lit(65536L))): _*)))
      .toDF(id, "simhash", "block", "block_val")
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
