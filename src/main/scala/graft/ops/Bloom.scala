package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter JOIN PRUNING — the runtime row-level filter a big
  * shuffle join needs when the build side is too large to broadcast
  * WHOLE but its key-membership bitmap is not: probe rows that cannot
  * possibly match are dropped before the exchange, so the shuffle
  * moves (matches + ε·false-positives) instead of the full probe
  * table.
  *
  * The filter is a fixed-width bit array built as an ALGEBRAIC
  * aggregate (the `q_bitmap_distinct` pattern): each build key sets
  * k = 2 positions (independent affine hashes over the 2³¹−1 Mersenne
  * prime — the [[graft.functions.Poly]] constants, so the whole
  * construction is exact integer arithmetic), cell rows OR-merge
  * map-side, and the ≤ [[Cells]]-row result collects to the driver
  * (bounded by construction — 8 KB regardless of build-side row
  * count) and re-enters the probe scan as an array literal inside
  * whole-stage codegen.
  *
  * Correctness contract: false POSITIVES only — a probe row whose key
  * IS in the build set always passes (both its bits were set by that
  * very key), so `join(prune(probe), build) == join(probe, build)`
  * row-for-row. That equality is `q_bloom_prune`'s DuckDB oracle (the
  * plain join) and `BloomPruneSpec`'s no-false-negatives assertion. */
object Bloom {

  /** 64 Kibit filter ≈ 1041 longs ≈ 8 KB. At n build keys the
    * false-positive rate is (1 − e^(−2n/65536))²: ~0.1% at n = 1e3,
    * ~11% at n = 1.3e4 — size M with the build side, not the probe.
    * An UNDER-sized filter degrades gracefully, never incorrectly:
    * false positives only waste shuffle rows, the pruned join stays
    * row-for-row equal to the plain join at ANY load (BloomSpec's
    * hostile case pins this at n ≈ 1.3e4, the ~11% regime — the
    * safety invariant is load-independent; only the pruning RATIO
    * decays).
    * Cells pack 63 bits per long: bit 63 stays unused because DuckDB
    * range-checks `1 << 63` (the oracle replays the bit array
    * verbatim in `q_bloom_fpr`), while Spark silently wraps — the
    * one layout both engines agree on. */
  val Bits = 65536
  val Cells: Int = (Bits + 62) / 63
  private val Mod = 2147483647L
  val Hashes: Seq[(Long, Long)] = Seq((131L, 7L), (137L, 11L))

  private def posSql(key: String, a: Long, b: Long): String =
    s"pmod(pmod(CAST($key AS BIGINT) * $a + $b, $Mod), $Bits)"

  /** The (cell, bits) frame the filter aggregates to. Exposed because
    * `bit_or` is ALGEBRAIC: the same declarative aggregation maintains
    * these cells incrementally under Structured Streaming
    * ([[graft.streaming.EventStream.bloomCells]] — bits only ever turn
    * on, so the maintained state is bit-equal to a from-scratch batch
    * build over the same prefix, and ≤ [[Cells]] rows forever). */
  def cells(keys: DataFrame, key: String): DataFrame =
    cellsBy(keys, key, Nil)

  /** Per-GROUP filters in one distributed pass (≤ [[Cells]] rows per
    * group): `q_merge_bloom`'s per-file sidecar builds one filter per
    * manifest file this way — the Parquet bloom-filter shape. */
  def cellsBy(keys: DataFrame, key: String, by: Seq[String]): DataFrame =
    keys
      .select(by.map(col) :+ explode(array(Hashes.map { case (a, b) =>
        expr(posSql(key, a, b)) }: _*)).as("p"): _*)
      .select(by.map(col) :+ expr("CAST(p div 63 AS INT)").as("cell") :+
        expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 63 AS INT))").as("m"): _*)
      .groupBy((by :+ "cell").map(col): _*).agg(expr("bit_or(m)").as("bits"))

  /** Assemble the fixed-width lut from collected cell rows. */
  def lutOf(cellRows: Seq[(Int, Long)]): Seq[Long] = {
    val lut = Array.fill(Cells)(0L)
    cellRows.foreach { case (c, bits) => lut(c) = bits }
    lut.toSeq
  }

  /** Build the bit array from the build side's key column: one
    * map-side-collapsing shuffle of ≤ [[Cells]] rows, one bounded
    * collect. */
  def buildLut(keys: DataFrame, key: String): Seq[Long] =
    lutOf(cells(keys, key).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq)

  /** Keep only probe rows whose key MIGHT be in the filter (both bits
    * set) — a codegen'd scan-level predicate, zero shuffle. */
  def prune(probe: DataFrame, key: String, lut: Seq[Long]): DataFrame = {
    def hit(a: Long, b: Long): Column = expr(
      s"""(shiftright(element_at(bloom_lut, CAST(${posSql(key, a, b)} div 63 AS INT) + 1),
         |CAST(${posSql(key, a, b)} % 63 AS INT)) & 1) = 1"""
        .stripMargin.replace("\n", " "))
    probe.withColumn("bloom_lut", typedlit(lut))
      .filter(Hashes.map { case (a, b) => hit(a, b) }.reduce(_ && _))
      .drop("bloom_lut")
  }
}
