package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Bloom]] + `q_bloom_prune` — the oracle hash-verifies the join
  * result equals the plain join; these tests pin the filter's two
  * defining properties live: NO false negatives (ever), and real
  * pruning (survivors ≪ probe). */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  private lazy val build = graft.tables.Tables.orders(spark, sf0001)
    .filter(col("o_orderpriority") === "1-URGENT" &&
      col("o_totalprice") > 250000.0)
    .select("o_orderkey")
  private lazy val probe = graft.tables.Tables.lineitem(spark, sf0001)
    .select("l_orderkey")
  private lazy val lut = Bloom.buildLut(build, "o_orderkey")

  test("no false negatives: every probe row with a matching key survives the prune") {
    val buildKeys = build.as[Long].collect().toSet
    val trueMatches = probe.as[Long].collect().count(buildKeys)
    val survivingMatches = Bloom.prune(probe, "l_orderkey", lut)
      .as[Long].collect().count(buildKeys)
    assert(trueMatches > 0, "degenerate fixture: no matches at all")
    assert(survivingMatches == trueMatches)
  }

  test("the prune actually prunes: survivors are a small fraction of the probe") {
    val total = probe.count()
    val kept = Bloom.prune(probe, "l_orderkey", lut).count()
    // at n ≈ 133 build keys in a 64 Kibit filter the FP rate is ~1e-4;
    // survivors ≈ true matches (~9% of lineitem here)
    assert(kept < total / 5, s"kept $kept of $total")
    assert(kept >= build.count(), "fewer survivors than build keys — impossible")
  }

  test("false positives exist in principle but never change the join result") {
    val joinedPruned = Bloom.prune(probe, "l_orderkey", lut)
      .join(build, col("l_orderkey") === col("o_orderkey")).count()
    val joinedPlain = probe
      .join(build, col("l_orderkey") === col("o_orderkey")).count()
    assert(joinedPruned == joinedPlain)
  }

  test("lut is bounded by construction: ~1K longs regardless of build size") {
    assert(lut.length == Bloom.Cells)
    assert(lut.exists(_ != 0L), "filter came out empty")
  }

  test("hostile high-FPR regime (~11%): pruned join still equals the plain join") {
    // n = 13000 build keys in 64 Kibit: FPR = (1-e^(-2n/65536))^2 = ~11%
    // — the under-sized-filter regime. False positives must only waste
    // rows, never change the join; and no false negative may appear.
    val bigBuild = spark.range(0L, 13000L).toDF("k")
    val bigProbe = spark.range(10000L, 60000L).toDF("pk")
    val hotLut = Bloom.buildLut(bigBuild, "k")
    val pruned = Bloom.prune(bigProbe, "pk", hotLut)
    // the regime is genuinely hostile: measurable false positives.
    // (sequential keys under the affine hashes underfill vs the
    // random-key theory — measured ~3.8% here, still ~400x the
    // design-point 1e-4)
    val nonMembers = 60000L - 13000L
    val fpKept = pruned.filter(col("pk") >= 13000L).count()
    val fpr = fpKept.toDouble / nonMembers
    assert(fpr > 0.02, s"expected a high-FPR regime, measured $fpr")
    // no false negatives: every true member survives
    assert(pruned.filter(col("pk") < 13000L).count() === 3000L)
    // and the join result is bit-identical to the unpruned join
    val prunedJoin = pruned.join(bigBuild, col("pk") === col("k"))
      .select("pk").as[Long].collect().sorted
    val plainJoin = bigProbe.join(bigBuild, col("pk") === col("k"))
      .select("pk").as[Long].collect().sorted
    assert(prunedJoin.toSeq === plainJoin.toSeq)
  }

  test("q_bloom_fpr: empirical FP rate respects the (1-e^(-kn/m))^k theory bound") {
    val r = graft.SparkEntry.queries("q_bloom_fpr")(spark, sf0001).head()
    val (nBuild, nNeg, nFp) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nNeg > 0 && nBuild > 0)
    val theory = math.pow(1.0 - math.exp(-2.0 * nBuild / Bloom.Bits), 2)
    val fpr = nFp.toDouble / nNeg
    // 3x slack + one count of Poisson noise on a tiny expected count
    assert(fpr <= 3 * theory + 1.5 / nNeg,
      s"fpr $fpr ($nFp of $nNeg) vs theory $theory at n=$nBuild")
  }
}
