package graft.functions

import graft.SparkSpec
import graft.text.Dedup
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants for the native kernels, sampled with
  * fixed seeds (deterministic offline — same pattern as
  * TimeSeriesPropertySpec). Each property is a law the 100 TB
  * pipeline depends on, not just an example. */
class ExpressionPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  private val word: Gen[String] = for {
    len <- Gen.choose(1, 8)
    cs <- Gen.listOfN(len, Gen.alphaLowerChar)
  } yield cs.mkString

  private val doc: Gen[List[String]] = for {
    len <- Gen.choose(1, 40)
    ws <- Gen.listOfN(len, word)
  } yield ws

  test("PolyHash stays in [0, 2^31-1) and is injective-enough on distinct short words") {
    val words = samples(word, 200).distinct
    val hs = words.toDF("w").select(F.polyHash(col("w"))).as[Long].collect()
    assert(hs.forall(h => h >= 0 && h < Poly.Mod))
    // short lowercase words (<= 8 chars, base 131 >= alphabet size):
    // the polynomial is injective, so zero collisions expected
    assert(hs.distinct.length === words.length)
  }

  test("MinHashSig is monotone under set union: sig(A ++ B) = elementwise min") {
    val pairs = samples(Gen.zip(doc, doc), 10)
    pairs.foreach { case (a, b) =>
      val rows = Seq(a, b, a ++ b).toDF("sh")
        .select(F.minhashSig(col("sh"), Dedup.permA, Dedup.permB)).as[Seq[Long]].collect()
      val expect = rows(0).zip(rows(1)).map(p => math.min(p._1, p._2))
      assert(rows(2) === expect)
    }
  }

  test("MinHash signature agreement estimates Jaccard within a loose bound") {
    // two docs sharing exactly half their shingles -> expected agreement ~1/3
    val shared = (1 to 30).map(i => s"shared$i")
    val a = shared ++ (1 to 30).map(i => s"onlya$i")
    val b = shared ++ (1 to 30).map(i => s"onlyb$i")
    val rows = Seq(a, b).toDF("sh")
      .select(F.minhashSig(col("sh"), Dedup.permA, Dedup.permB)).as[Seq[Long]].collect()
    val agree = rows(0).zip(rows(1)).count(p => p._1 == p._2)
    // true J = 30/90 = 1/3; 64 trials, allow generous noise
    assert(agree >= 8 && agree <= 36, s"agreement $agree/64 implausible for J=1/3")
  }

  test("SimHash hamming distance is a pseudo-metric: d(a,a)=0, symmetric, small edit -> small distance") {
    val docs = samples(doc, 8)
    val fps = docs.map { d =>
      Seq(d).toDF("t").select(F.simhash64(col("t"))).as[Long].head()
    }
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    docs.indices.foreach { i =>
      assert(ham(fps(i), fps(i)) === 0)
      // one appended token moves few bits on a 20+-token doc
      val d = docs(i)
      if (d.length >= 20) {
        val fp2 = Seq(d :+ "extra").toDF("t")
          .select(F.simhash64(col("t"))).as[Long].head()
        assert(ham(fps(i), fp2) <= 20, s"edit moved ${ham(fps(i), fp2)} bits")
      }
    }
  }

  test("CappedMinIds: any partitioning yields total=n and the cap smallest ids") {
    val idsGen: Gen[List[Long]] = for {
      len <- Gen.choose(1, 300)
      vs <- Gen.listOfN(len, Gen.choose(-100000L, 100000L))
    } yield vs
    val capGen = Gen.choose(1, 40)
    val partsGen = Gen.choose(1, 16)
    samples(Gen.zip(idsGen, capGen, partsGen), 15).foreach { case (vs, cap, parts) =>
      val got = vs.toDF("v").repartition(parts)
        .agg(F.cappedMinIds(col("v"), cap).as("b"))
        .select(col("b.total"), col("b.ids")).as[(Long, Seq[Long])].head()
      assert(got._1 === vs.length.toLong)
      assert(got._2 === vs.sorted.take(cap), s"cap=$cap parts=$parts")
    }
  }

  test("VecDot/VecNorm: Cauchy-Schwarz holds, norm scales linearly") {
    val vec: Gen[List[Float]] = Gen.listOfN(16, Gen.choose(-100, 100).map(_ / 10.0f))
    samples(Gen.zip(vec, vec), 20).foreach { case (a, b) =>
      val (d, na, nb) = Seq((a, b)).toDF("a", "b")
        .select(F.vecDot(col("a"), col("b")), F.vecNorm(col("a")), F.vecNorm(col("b")))
        .as[(Double, Double, Double)].head()
      assert(math.abs(d) <= na * nb + 1e-9, s"|$d| > $na*$nb")
      val n2 = Seq(a.map(_ * 2)).toDF("a").select(F.vecNorm(col("a"))).as[Double].head()
      assert(math.abs(n2 - 2 * na) < 1e-9)
    }
  }
}
