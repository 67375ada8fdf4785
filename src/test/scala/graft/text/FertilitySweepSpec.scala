package graft.text

import graft.{SparkEntry, SparkSpec}
import graft.tables.Tables
import org.apache.spark.sql.functions._

/** q_fertility_sweep: the one-training-pass sweep is only sound if
  * BPE's greedy recurrence is prefix-monotone (the 8-round table IS
  * the first 8 rows of the 32-round one) — pinned here directly.
  * The curve must be monotone and must equal a brute driver-side
  * re-encode of the whole dict at every budget. */
class FertilitySweepSpec extends SparkSpec {
  import spark.implicits._

  private lazy val rows = SparkEntry.queries("q_fertility_sweep")(spark, sf0001)
    .collect().toSeq.sortBy(_.getLong(0))

  private lazy val words = Tables.documents(spark, sf0001)
    .select(explode(split(col("text"), " ")).as("word"))

  test("BPE training is prefix-monotone: train(8) == train(32).take(8)") {
    val t32 = Bpe.train(words, 32)
    val t8 = Bpe.train(words, 8)
    assert(t32.length === 32)
    assert(t8 === t32.take(8))
    graft.ops.SideCache.releaseAll()
  }

  test("fertility and OOV are monotone non-increasing in the merge budget") {
    assert(rows.map(_.getLong(0)) === Seq(8L, 16L, 32L))
    assert(rows.map(_.getLong(1)).distinct.size === 1, "n_words must not vary")
    val fert = rows.map(_.getLong(3))
    val oov = rows.map(_.getLong(5))
    assert(fert === fert.sorted.reverse, s"fertility not monotone: $fert")
    assert(oov === oov.sorted.reverse, s"oov not monotone: $oov")
    // non-degenerate: the sweep genuinely moves both curves
    assert(fert.distinct.size > 1 && oov.distinct.size > 1,
      "vacuous sweep: the budget changed nothing")
  }

  test("brute dict re-encode reproduces sum_tok and n_single at every K") {
    val merges = Bpe.train(words, 32)
    val dict = words.groupBy("word").agg(count(lit(1)).as("wn"))
      .as[(String, Long)].collect().toSeq
    graft.ops.SideCache.releaseAll()
    def spaced(w: String): String =
      w.map(c => s" $c ").mkString
    for (r <- rows) {
      val k = r.getLong(0).toInt
      var enc: Map[String, Int] = dict.map { case (w, _) =>
        var s = spaced(w)
        merges.take(k).foreach { case (pr, _) =>
          val Array(a, b) = pr.split(" ")
          s = s.replace(s" $a  $b ", s" $a$b ")
        }
        w -> s.trim.split("  ", -1).length
      }.toMap
      val sumTok = dict.map { case (w, wn) => wn * enc(w) }.sum
      val nSingle = dict.filter { case (w, _) => enc(w) == 1 }
        .map(_._2).sum
      assert(r.getLong(2) === sumTok, s"K=$k sum_tok diverged from brute")
      assert(r.getLong(4) === nSingle, s"K=$k n_single diverged from brute")
    }
  }
}
