package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q_bpe_train — the oracle hash-verifies the full K-round training
  * trajectory; these tests pin the ALGORITHM against an independent
  * list-based JVM reference and exhibit the one-shot/iterative
  * divergence that motivates the query. */
class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference: list-based sequential BPE (no regexes, no
    * Spark) — count symbol pairs, merge argmax, repeat. */
  private def trainRef(words: Seq[String], k: Int): Seq[(String, Long)] = {
    var toks: Seq[Vector[String]] = words.map(_.map(_.toString).toVector)
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    def ok(s: String) = s.forall(c => c.isDigit || (c >= 'a' && c <= 'z'))
    for (_ <- 1 to k if out.length < k) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      toks.foreach { w =>
        w.lazyZip(w.drop(1)).foreach { (a, b) =>
          if (ok(a) && ok(b)) counts((a, b)) = counts.getOrElse((a, b), 0L) + 1
        }
      }
      if (counts.nonEmpty) {
        val ((a, b), n) = counts.minBy { case ((x, y), c) => (-c, s"$x $y") }
        out += ((s"$a $b", n))
        toks = toks.map { w =>
          val nb = Vector.newBuilder[String]
          var i = 0
          while (i < w.length) {
            if (i + 1 < w.length && w(i) == a && w(i + 1) == b) { nb += a + b; i += 2 }
            else { nb += w(i); i += 1 }
          }
          nb.result()
        }
      }
    }
    out.toSeq
  }

  test("iterative trainer equals the list-based reference on sf0.001") {
    val words = graft.tables.Tables.documents(spark, sf0001)
      .select(explode(split(col("text"), " ")).as("word"))
    val got = Bpe.train(words, 8)
    val wordSeq = words.as[String].collect().toSeq
    assert(got == trainRef(wordSeq, 8))
  }

  test("iterative training diverges from one-shot ranking where merges create pairs") {
    // corpus of one word: only pairs t·h and h·e exist initially (tie
    // → 'h e' first by pair-asc). Round 2's top pair 't·he' ONLY
    // exists after round 1's merge — one-shot initial-count ranking
    // can never rank it.
    val words = Seq.fill(10)("the").toDF("word")
    val got = Bpe.train(words, 2)
    assert(got == Seq(("h e", 10L), ("t he", 10L)))
    val oneShotPairs = Seq("h e", "t h") // the only initial pairs
    assert(!oneShotPairs.contains(got(1)._1))
  }

  test("trainer stops early when the corpus runs dry") {
    val words = Seq("ab").toDF("word")
    val got = Bpe.train(words, 8)
    // 'a b' merges to one symbol 'ab'; no pairs remain
    assert(got == Seq(("a b", 1L)))
  }

  test("merge counts are non-increasing in round order on sf0.001") {
    // each merge consumes occurrences; a LATER round can never have
    // found a strictly more frequent pair than an earlier one chose
    // (the earlier argmax would have taken it)
    val words = graft.tables.Tables.documents(spark, sf0001)
      .select(explode(split(col("text"), " ")).as("word"))
    val ns = Bpe.train(words, 8).map(_._2)
    assert(ns.zip(ns.drop(1)).forall { case (a, b) => a >= b })
  }

  test("q_tokenizer_fertility: merges fired everywhere; ratios self-consistent") {
    val got = graft.SparkEntry.queries("q_tokenizer_fertility")(spark, sf0001)
      .select("lang", "n_words", "sum_chars", "sum_tok", "fert_milli",
        "chars_per_tok_milli")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq

    assert(got.map(_._1).sorted === Seq("de", "en", "es", "fr", "zh"))
    got.foreach { case (l, nw, sc, st, fert, cpt) =>
      // merges fired: better than one-token-per-char, worse than
      // one-token-per-word
      assert(cpt > 1000, s"$l: merges never fired (chars/tok <= 1)")
      assert(st > nw, s"$l: fewer tokens than words is impossible here")
      // the permille ratios are exactly the integer div of the sums
      assert(fert === st * 1000 / nw)
      assert(cpt === sc * 1000 / st)
    }
    // cross-check the corpus-wide token total against q_bpe_pipeline
    val totPipeline = graft.SparkEntry.queries("q_bpe_pipeline")(spark, sf0001)
      .agg(org.apache.spark.sql.functions.sum("n_tok_bpe"))
      .as[Long].head()
    assert(got.map(_._4).sum === totPipeline)
  }
}
