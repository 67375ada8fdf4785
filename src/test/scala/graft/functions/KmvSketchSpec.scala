package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Buffer-level properties of the KMV sketch: distinctness, cap bound,
  * merge = union, arrival-order independence — sampled with fixed
  * seeds (deterministic offline, the ExpressionPropertySpec pattern).
  * The end-to-end estimator is pinned by `q_kmv_distinct`'s oracle
  * (CorpusQueriesSpec + DuckDB). */
class KmvSketchSpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  private def kept(buf: KmvBuffer): Seq[Long] = {
    val it = buf.set.iterator()
    val b = Seq.newBuilder[Long]
    while (it.hasNext) b += it.next().longValue()
    b.result()
  }

  test("buffer keeps the cap smallest DISTINCT values, in order") {
    val gen = for {
      xs <- Gen.listOf(Gen.chooseNum(0L, 1000L))
      cap <- Gen.chooseNum(2, 16)
    } yield (xs, cap)
    samples(gen, 200).foreach { case (xs, cap) =>
      val buf = new KmvBuffer(cap)
      xs.foreach(buf.add)
      assert(kept(buf) === xs.distinct.sorted.take(cap))
    }
  }

  test("merge equals the sketch of the concatenation, any split point") {
    val gen = for {
      a <- Gen.listOf(Gen.chooseNum(0L, 500L))
      b <- Gen.listOf(Gen.chooseNum(0L, 500L))
    } yield (a, b)
    samples(gen, 200).foreach { case (a, b) =>
      val cap = 8
      val one = new KmvBuffer(cap)
      (a ++ b).foreach(one.add)
      val left = new KmvBuffer(cap)
      a.foreach(left.add)
      val right = new KmvBuffer(cap)
      b.foreach(right.add)
      left.mergeIn(right)
      assert(kept(left) === kept(one))
    }
  }

  test("serialize/deserialize roundtrip preserves the kept set") {
    val agg = KmvSketch(
      org.apache.spark.sql.catalyst.expressions.Literal(1L), 8)
    val buf = new KmvBuffer(8)
    Seq(5L, 3L, 9L, 3L, 1L, 120L, 7L, 2L, 8L, 11L, 6L).foreach(buf.add)
    val back = agg.deserialize(agg.serialize(buf))
    assert(kept(back) === kept(buf))
  }
}
