package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CodegenExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def polyRef(s: String, base: Long): Long =
    s.getBytes("UTF-8").foldLeft(0L)((h, b) => (h * base + (b & 0xFFL)) % Poly.Mod)

  test("PolyHash matches the fold definition (codegen path)") {
    val rows = Seq("", "a", "abc", "the quick brown fox", "a b c d e")
      .toDF("s")
      .select(col("s"), F.polyHash(col("s")).as("h"))
      .as[(String, Long)].collect()
    rows.foreach { case (s, h) => assert(h === polyRef(s, 131L), s"for '$s'") }
  }

  test("PolyHash null propagates") {
    val out = Seq(Some("x"), None).toDF("s")
      .select(F.polyHash(col("s")).as("h"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(out(0).isDefined && out(1).isEmpty)
  }

  test("MinHashSig = per-permutation min over shingle hashes; empty array = sentinel") {
    val a = Seq(3L, 7L)
    val b = Seq(11L, 13L)
    val rows = Seq(Seq("ab", "cd", "ef"), Seq.empty[String])
      .toDF("sh")
      .select(F.minhashSig(col("sh"), a, b).as("sig"))
      .as[Seq[Long]].collect()
    val hs = Seq("ab", "cd", "ef").map(polyRef(_, 131L))
    val expect = (0 until 2).map(k => hs.map(h => (a(k) * h + b(k)) % Poly.Mod).min)
    assert(rows(0) === expect)
    assert(rows(1) === Seq(Poly.Mod, Poly.Mod))
  }

  test("SimHash64: single token's fingerprint reflects its hash bits; identical docs collide") {
    val rows = Seq(Seq("hello"), Seq("hello"), Seq("other"))
      .toDF("t")
      .select(F.simhash64(col("t")).as("fp"))
      .as[Long].collect()
    assert(rows(0) === rows(1))
    assert(rows(0) !== rows(2))
    // single token: bit k (k<31) set iff bit k of poly131 hash set
    val h1 = polyRef("hello", 131L)
    val h2 = polyRef("hello", 137L)
    val expected = (0 until 31).map(k => ((h1 >> k) & 1L) << k).sum |
      (0 until 31).map(k => (((h2 >> k) & 1L) << (31 + k))).sum
    assert(rows(0) === expected)
    // dead bits 62, 63 never set
    assert((rows(0) >> 62) === 0L)
  }

  test("ShingleHashes = distinct PolyHash of joined word-n-grams, sorted") {
    val texts = Seq(
      "the quick brown fox jumps",     // 3 distinct 3-gram shingles
      "a b a b a b",                   // repeated shingles collapse
      "one two",                       // shorter than n -> empty
      "x  y z",                        // double space: inner empty token kept
      "trailing space ")               // trailing empty token KEPT: Spark's
                                       // split(col," ") (limit -1) and DuckDB's
                                       // string_split both keep it, so the final
                                       // "ing space ''" shingle exists on every path
    val got = texts.toDF("t")
      .select(F.shingleHashes(col("t"), 3).as("hs"))
      .as[Seq[Long]].collect()
    val expect = texts.map { t =>
      t.split(" ", -1).sliding(3).filter(_.length == 3).map(_.mkString(" "))
        .map(polyRef(_, 131L)).toSeq.distinct.sorted
    }
    got.zip(expect).zip(texts).foreach { case ((g, e), t) =>
      assert(g === e, s"for '$t'")
    }
  }

  test("VecDot/VecNorm match sequential double reduction") {
    val v1 = Seq(1.0f, 2.0f, 3.0f)
    val v2 = Seq(0.5f, -1.0f, 2.0f)
    val out = Seq((v1, v2)).toDF("a", "b")
      .select(F.vecDot(col("a"), col("b")).as("d"),
        F.vecNorm(col("a")).as("n"))
      .as[(Double, Double)].head()
    val d = v1.zip(v2).foldLeft(0.0)((s, p) => s + p._1.toDouble * p._2.toDouble)
    val n = math.sqrt(v1.foldLeft(0.0)((s, x) => s + x.toDouble * x.toDouble))
    assert(out._1 === d)
    assert(out._2 === n)
  }

  test("PQ kernels match a plain-Scala reference, codegen and interpreted") {
    // tiny codebook: 2 subspaces × 3 codewords × 2 dims
    val cb: Seq[Seq[Seq[Double]]] = Seq(
      Seq(Seq(1.0, 0.0), Seq(0.0, 1.0), Seq(1.0, 1.0)),
      Seq(Seq(-1.0, 0.0), Seq(0.5, 0.5), Seq(0.0, 0.0)))
    def refCodes(v: Seq[Float]): Seq[Long] =
      cb.zipWithIndex.map { case (cws, m) =>
        val off = m * 2
        cws.zipWithIndex.map { case (cw, k) =>
          val d = (0 until 2).foldLeft(0.0) { (s, i) =>
            val diff = v(off + i).toDouble - cw(i); s + diff * diff
          }
          (d, k)
        }.minBy(_._1)._2.toLong // stable minBy = first minimum = smallest k
      }
    def refLut(v: Seq[Float]): Seq[Double] =
      cb.zipWithIndex.flatMap { case (cws, m) =>
        cws.map(cw => (0 until 2).foldLeft(0.0)((s, i) => s + v(m * 2 + i).toDouble * cw(i)))
      }
    val vecs = Seq(
      Seq(1.0f, 0.1f, -0.5f, 0.5f),
      Seq(0.0f, 0.0f, 0.0f, 0.0f),   // ties: dist to codeword equal -> smallest k
      Seq(-2.0f, 3.0f, 0.25f, 0.25f))
    val rows = vecs.toDF("v")
      .select(F.vecPqCodes(col("v"), cb).as("codes"),
        F.vecPqLut(col("v"), cb).as("lut"))
      .withColumn("adc", F.vecPqAdc(col("codes"), col("lut"), 3))
      .as[(Seq[Long], Seq[Double], Double)].collect()
    rows.zip(vecs).foreach { case ((codes, lut, adc), v) =>
      assert(codes === refCodes(v), s"codes for $v")
      assert(lut === refLut(v), s"lut for $v")
      val refAdc = codes.zipWithIndex.foldLeft(0.0) { case (s, (c, m)) =>
        s + refLut(v)(m * 3 + c.toInt)
      }
      assert(adc === refAdc, s"adc for $v")
    }
    // interpreted (eval) path agrees with the codegen results above
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    vecs.zip(rows).foreach { case (v, (codes, lut, adc)) =>
      val litV = Literal.create(ArrayData.toArrayData(v.toArray), ArrayType(FloatType))
      val evalCodes = VecPqCodes(litV, cb).eval(null)
        .asInstanceOf[ArrayData].toLongArray.toSeq
      val evalLut = VecPqLut(litV, cb).eval(null)
        .asInstanceOf[ArrayData].toDoubleArray.toSeq
      assert(evalCodes === codes && evalLut === lut)
      val evalAdc = VecPqAdc(
        Literal.create(ArrayData.toArrayData(codes.toArray),
          ArrayType(org.apache.spark.sql.types.LongType)),
        Literal.create(ArrayData.toArrayData(lut.toArray),
          ArrayType(org.apache.spark.sql.types.DoubleType)), 3).eval(null)
      assert(evalAdc === adc)
    }
  }

  test("NfcNormalize composes decomposed sequences, is identity on ASCII/composed, propagates null") {
    val decomposed = "Café DÜSSELDORF" // e+U+0301, U+U+0308
    val composed = "Café DÜSSELDORF"
    val rows = Seq(Some(decomposed), Some(composed), Some("plain ascii"), None)
      .toDF("s")
      .select(F.nfcNormalize(col("s")).as("n"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getString(0)))
    assert(rows(0) === Some(composed), "decomposed must compose")
    assert(rows(1) === Some(composed), "already-composed unchanged")
    assert(rows(2) === Some("plain ascii"), "ASCII fast path is identity")
    assert(rows(3).isEmpty, "null propagates")
    // agrees with java.text.Normalizer on a mixed torture string
    val torture = "à̖ x 😀 ñ Å"
    val got = Seq(torture).toDF("s")
      .select(F.nfcNormalize(col("s"))).as[String].head()
    assert(got === java.text.Normalizer.normalize(torture, java.text.Normalizer.Form.NFC))
  }

  test("expressions survive interpreted (eval) path too") {
    // force the interpreted path by evaluating through a filter on a
    // non-codegen context: collect via RDD map of the expression result
    import org.apache.spark.sql.classic.ExpressionUtils
    val e = PolyHash(org.apache.spark.sql.catalyst.expressions.Literal.create(
      org.apache.spark.unsafe.types.UTF8String.fromString("abc"),
      org.apache.spark.sql.types.StringType), 131L)
    assert(e.eval(null) === polyRef("abc", 131L))
    val sig = MinHashSig(org.apache.spark.sql.catalyst.expressions.Literal.create(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        Array(org.apache.spark.unsafe.types.UTF8String.fromString("abc"))),
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType)),
      Seq(3L), Seq(11L))
    val h = polyRef("abc", 131L)
    assert(sig.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray() === Array((3L * h + 11L) % Poly.Mod))
  }
}
