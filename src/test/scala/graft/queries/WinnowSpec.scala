package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q_winnow_spans — the MOSS winnowing guarantees: every window of
  * WinW consecutive gram hashes yields at least one selected
  * fingerprint, any shared span of ≥ WinK+WinW−1 words is caught by a
  * shared fingerprint, selection is sublinear in positions, and the
  * per-source accounting composes from the fingerprint frame. */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private val K = 5
  private val W = 4

  private def fps(docs: Seq[(Long, String, String)]) =
    CorpusQueries.winnowFingerprints(
      docs.toDF("doc_id", "source", "text"))
      .select("doc_id", "p", "h").as[(Long, Long, Long)].collect().toSeq

  private def words(n: Int, seed: Int): String =
    (0 until n).map(i => s"w${(i * 131 + seed * 7919) % 97}").mkString(" ")

  test("every window of W consecutive grams holds a fingerprint") {
    val text = words(60, 1)
    val got = fps(Seq((1L, "s", text))).map(_._2).toSet
    val ng = 60 - K + 1
    for (j <- 1 to math.max(ng - W + 1, 1)) {
      assert((j until j + W).exists(p => got.contains(p.toLong)),
        s"window $j has no fingerprint")
    }
  }

  test("a shared span of K+W-1 words is caught by a shared fingerprint") {
    val span = words(K + W - 1, 42) // 8 words — the guarantee threshold
    val a = words(30, 2) + " " + span + " " + words(25, 3)
    val b = words(18, 4) + " " + span + " " + words(33, 5)
    val fa = fps(Seq((1L, "s", a), (2L, "s", b)))
    val shared = fa.filter(_._1 == 1L).map(_._3).toSet
      .intersect(fa.filter(_._1 == 2L).map(_._3).toSet)
    assert(shared.nonEmpty,
      "two documents sharing a K+W-1-word span have no shared fingerprint")
  }

  test("selection is sublinear: fingerprints ≪ gram positions") {
    val docs = graft.tables.Tables.documents(spark, sf0001)
    val nGrams = docs
      .select((size(split(col("text"), " ")) - lit(K - 1)).as("ng"))
      .filter(col("ng") >= 1).agg(sum("ng")).head().getLong(0)
    val nFp = CorpusQueries.winnowFingerprints(docs).count()
    assert(nFp < nGrams * 6 / 10,
      s"winnowing kept $nFp of $nGrams positions — not sublinear")
    assert(nFp > 0)
  }

  test("q_winnow_spans accounting composes from the fingerprint frame") {
    val rows = SparkEntry.queries("q_winnow_spans")(spark, sf0001)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val f = CorpusQueries.winnowFingerprints(
      graft.tables.Tables.documents(spark, sf0001))
      .select("doc_id", "source", "p", "h")
      .as[(Long, String, Long, Long)].collect().toSeq
    val byH = f.groupBy(_._4).view.mapValues(_.map(_._1).distinct.size)
    for ((src, (nDocs, nFp, nShared, shareBp)) <- rows) {
      val mine = f.filter(_._2 == src)
      assert(mine.map(_._1).distinct.size.toLong == nDocs, src)
      assert(mine.size.toLong == nFp, src)
      assert(mine.count(x => byH(x._4) >= 2).toLong == nShared, src)
      assert(shareBp == nShared * 10000 / nFp, src)
    }
  }
}
