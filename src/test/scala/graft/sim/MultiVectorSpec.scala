package graft.sim

import graft.{SparkEntry, SparkSpec}
import graft.tables.Tables

/** q_multi_vector: the MaxSim fold must equal a brute driver-side
  * recompute (sequential-double sub-cosines, exact max, left-to-right
  * sum), and late interaction must genuinely differ from single-vector
  * cosine ranking somewhere — otherwise the 16-dot price buys
  * nothing on this corpus. */
class MultiVectorSpec extends SparkSpec {
  import spark.implicits._

  private lazy val rows = SparkEntry.queries("q_multi_vector")(spark, sf0001)
    .as[(Long, Long, Int, Long)].collect().toSeq

  private lazy val vecs = Tables.embeddings(spark, sf0001)
    .select("vec_id", "embedding")
    .as[(Long, Array[Float])].collect().toMap

  private def subs(v: Array[Float]): Seq[Array[Float]] =
    (0 until 4).map(m => v.slice(m * 16, m * 16 + 16))
  private def dot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }
  private def nrm(a: Array[Float]): Double = math.sqrt(dot(a, a))
  private def maxsim(q: Array[Float], d: Array[Float]): Double = {
    val qs = subs(q); val ds = subs(d)
    val qn = qs.map(nrm); val dn = ds.map(nrm)
    (0 until 4).map { i =>
      (0 until 4).map(j => dot(qs(i), ds(j)) / (qn(i) * dn(j))).max
    }.foldLeft(0.0)(_ + _)
  }

  test("brute MaxSim reproduces every served (qid, vec_id, rank, score)") {
    assert(rows.nonEmpty)
    val qids = vecs.keys.filter(_ % 50 == 0).toSeq
    val brute = qids.flatMap { q =>
      vecs.keys.filter(_ != q).toSeq
        .map(d => (d, maxsim(vecs(q), vecs(d))))
        .sortBy { case (d, s) => (-s, d) }
        .take(10).zipWithIndex
        .map { case ((d, s), ix) =>
          (q, d, ix + 1, math.floor(s * 10000 + 0.5).toLong)
        }
    }.sorted
    assert(rows.sorted === brute)
  }

  test("late interaction genuinely reorders vs single-vector cosine somewhere") {
    def cos(a: Array[Float], b: Array[Float]) = dot(a, b) / (nrm(a) * nrm(b))
    val qids = vecs.keys.filter(_ % 50 == 0).toSeq
    val differs = qids.exists { q =>
      val others = vecs.keys.filter(_ != q).toSeq
      val topMax = others.map(d => (d, maxsim(vecs(q), vecs(d))))
        .sortBy { case (d, s) => (-s, d) }.take(10).map(_._1)
      val topCos = others.map(d => (d, cos(vecs(q), vecs(d))))
        .sortBy { case (d, s) => (-s, d) }.take(10).map(_._1)
      topMax != topCos
    }
    assert(differs,
      "MaxSim top-10 identical to cosine for every query — vacuous facets")
  }
}
