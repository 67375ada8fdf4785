package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** Unigram hard-EM: Viterbi optimality and determinism, coverage
  * under pruning (chars floored), the seed count arithmetic, and the
  * EM invariants the query hashes. */
class UnigramSpec extends AnyFunSuite {

  test("viterbi picks the max-score segmentation, ties to the later split") {
    // 'abc': pieces a/b/c (-10 each), ab (-12), bc (-12), abc absent
    val q = Map("a" -> -10L, "b" -> -10L, "c" -> -10L,
      "ab" -> -12L, "bc" -> -12L)
    // ab|c = -22, a|bc = -22, a|b|c = -30 → tie between -22s: the DP
    // prefers the LARGER final split point, i.e. the shorter last
    // piece... last piece 'c' (i=2) beats 'bc' (i=1)
    assert(Unigram.viterbi("abc", q) == Seq("ab", "c"))
  }

  test("viterbi is optimal vs brute-force enumeration") {
    val word = "abab"
    val q = Map("a" -> -7L, "b" -> -9L, "ab" -> -11L, "ba" -> -13L,
      "aba" -> -20L, "bab" -> -18L, "abab" -> -26L)
    def segs(w: String): Seq[Seq[String]] =
      if (w.isEmpty) Seq(Nil)
      else (1 to math.min(4, w.length)).flatMap { l =>
        val p = w.substring(0, l)
        if (q.contains(p)) segs(w.substring(l)).map(p +: _) else Nil
      }
    val best = segs(word).map(s => (s.map(q).sum, s)).maxBy(_._1)._1
    assert(Unigram.viterbi(word, q).map(q).sum == best)
  }

  test("seedsOf counts every substring window up to MaxPiece") {
    val s = Unigram.seedsOf("abca")
    assert(s.size == 4 + 3 + 2 + 1) // lens 1..4 of a 4-char word
    assert(s.count(_ == "a") == 2) // overlap-counted
  }

  test("train prunes losers but never chars; totals are consistent") {
    val dict = Seq(("aaab", 10L), ("aab", 5L), ("b", 2L))
    val (nSeed, alive, tok1, tok2) = Unigram.train(dict)
    assert(nSeed > 0 && alive.nonEmpty)
    // every single char of the dict survives (coverage)
    for (ch <- Seq("a", "b")) assert(alive.contains(ch), ch)
    // multi-char survivors all won at least one segmentation slot
    assert(alive.filter(_._1.length > 1).values.forall(_ > 0))
    // token totals are ≥ |words| (every word yields ≥1 piece)
    val words = dict.map(_._2).sum
    assert(tok1 >= words && tok2 >= words)
    // the re-estimated model never tokenizes WORSE than round 1
    assert(tok2 <= tok1)
  }

  test("the dict guard fails loudly past MaxDict") {
    val big = (0 to Unigram.MaxDict).map(i => (s"w$i", 1L))
    assertThrows[IllegalArgumentException](Unigram.train(big))
  }
}
