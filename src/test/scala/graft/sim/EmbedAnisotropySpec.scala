package graft.sim

import graft.{SparkEntry, SparkSpec}
import graft.tables.Tables

/** q_embed_anisotropy: the sum-identity must equal the O(n²) brute
  * average pairwise dot of the quantized unit vectors exactly, and
  * the measure must actually move — a synthetically collapsed set
  * must read ~10⁶ ppm through the same arithmetic. */
class EmbedAnisotropySpec extends SparkSpec {
  import spark.implicits._

  private val Q = 1048576L

  private def quantized: Seq[Array[Long]] = {
    val vecs = Tables.embeddings(spark, sf0001)
      .select("embedding").as[Array[Float]].collect().toSeq
    vecs.map { v =>
      var ss = 0.0; var i = 0
      while (i < v.length) { ss += v(i).toDouble * v(i).toDouble; i += 1 }
      val nr = math.sqrt(ss)
      v.map(e => math.floor(e.toDouble / nr * Q).toLong)
    }
  }

  private def anisoPpm(xs: Seq[Array[Long]]): BigInt = {
    val n = xs.size
    val dim = xs.head.length
    val s = Array.fill(dim)(BigInt(0))
    var t = BigInt(0)
    xs.foreach { x =>
      var i = 0
      while (i < dim) { s(i) += x(i); t += BigInt(x(i)) * x(i); i += 1 }
    }
    val s2 = s.map(v => v * v).sum
    // truncation toward zero, matching Spark div / DuckDB HUGEINT //
    (BigInt(1000000) * (s2 - t)) / (BigInt(n) * (n - 1) * Q * Q)
  }

  test("sum identity equals the brute pairwise average; collapse reads ~1e6") {
    val row = SparkEntry.queries("q_embed_anisotropy")(spark, sf0001)
      .collect().head
    val xs = quantized
    assert(row.getLong(0) === xs.size.toLong)
    assert(BigInt(row.getLong(1)) === anisoPpm(xs),
      "query anisotropy != brute identity over quantized unit vectors")
    // and the identity really is the pairwise average: brute O(n²)
    // over a prefix (full corpus would be fine too, just slower)
    val sub = xs.take(60)
    var acc = BigInt(0)
    for (a <- sub.indices; b <- sub.indices if a != b) {
      var d = BigInt(0); var i = 0
      while (i < sub(a).length) { d += BigInt(sub(a)(i)) * sub(b)(i); i += 1 }
      acc += d
    }
    val brute = (BigInt(1000000) * acc) /
      (BigInt(sub.size) * (sub.size - 1) * Q * Q)
    assert(brute === anisoPpm(sub), "identity != brute pairwise average")
    // sensitivity: a collapsed space (every vector identical) reads
    // ~1e6 ppm through the SAME arithmetic
    val collapsed = Seq.fill(50)(xs.head)
    val c = anisoPpm(collapsed)
    assert(c > 990000, s"collapsed space should read ~1e6 ppm, got $c")
    // and the fixture corpus is far from collapsed
    assert(math.abs(row.getLong(1)) < 100000,
      s"fixture should read near-isotropic, got ${row.getLong(1)}")
  }
}
