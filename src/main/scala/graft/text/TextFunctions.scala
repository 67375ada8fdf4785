package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-corpus pipelines: token
  * counting, word shingles, stopword/lexicon scoring, language-ID
  * heuristic, document fingerprinting. All are pure `Column`
  * expressions (codegen'd, no UDFs) so they stay inside whole-stage
  * codegen over a 100 TB `documents` scan.
  */
object TextFunctions {

  /** Whitespace tokenization (single-space corpus contract). */
  def tokens(text: Column): Column = split(text, " ")

  /** Word n-gram shingles, distinct not applied. Guarded so short
    * docs yield an empty array (Spark's `sequence(1, 0)` would count
    * DOWN, not produce empty). */
  def wordShingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j)): _*)))
      .otherwise(typedlit(Seq.empty[String]))

  /** Count of tokens present in a fixed lexicon (duplicates counted). */
  def lexiconCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => array_contains(typedlit(words), t)))

  /** Tiny function-word lexicons for the language-ID heuristic.
    * Deterministic scoring, not a trained model: argmax of per-language
    * function-word hits with a fixed tie-break order. */
  val Lexicons: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "it"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "une", "est"),
    "es" -> Seq("el", "los", "las", "y", "de", "un", "una", "es"),
    "de" -> Seq("der", "die", "das", "und", "ein", "ist", "zu", "den"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不"))

  /** Canonical-form fingerprint: md5 of the lower-cased text. A
    * rolling/content-defined hash would go here for fuzzy matching;
    * md5-of-normalized is the exact-match tier. */
  def fingerprint(text: Column): Column = md5(lower(text))
}
