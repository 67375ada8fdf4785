package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterative (true sequential) BPE tokenizer TRAINING.
  *
  * Byte-pair-encoding training is inherently sequential: each round
  * counts adjacent-SYMBOL pairs over the whole corpus, merges the
  * most frequent pair into one symbol, and ONLY THEN counts again —
  * because merges create pairs that did not exist before (learning
  * `he` makes `t·he` countable; a one-shot ranking of the initial
  * character pairs can never see it). The reference surface's
  * tokenizer step (il_analysis_git.py has none — this is the
  * LLM-pipeline extension tier) therefore gets BOTH: `q_bpe_encode`'s
  * one-shot table (documented approximation, applying side exact) and
  * this trainer (the real algorithm).
  *
  * Scale shape: each round is exactly the audited `q_bpe_pairs` plan
  * — one corpus scan, map-side-collapsing (pair, count) aggregate
  * (≤ |symbols|² partial rows per partition), one KB-sized shuffle,
  * top-1 via a 1-row collect (driver-held like the ANN codebooks).
  * K rounds = K scans; the symbol stream is re-derived per scan by
  * folding the ≤ K learned merges into the projection (regex passes
  * are corpus-scan-speed; no per-round materialized corpus copy, no
  * growing lineage — the learned table is literals).
  *
  * Symbols are space-wrapped in the stream (` a  b  c `), a pair is
  * the two symbols space-joined (`a b`), and a merge replaces
  * ` a  b ` → ` ab ` left-to-right non-overlapping — Java regex and
  * RE2/DuckDB share those semantics exactly, so the whole training
  * run is hash-verifiable cross-engine (the `q_bpe_encode`
  * convention). Pairs are restricted to `[a-z0-9]` symbols so no
  * learned symbol can be a regex metacharacter.
  */
object Bpe {

  /** Run `k` sequential merge rounds over `words` (one string column
    * named `word`). Returns (pair "a b", count-at-selection) in merge
    * order; stops early if the corpus runs out of alphanumeric
    * pairs.
    *
    * The corpus is first collapsed to the DISTINCT-WORD frequency
    * table — the classic BPE formulation: a word's pairs are weighted
    * by its occurrence count, which yields IDENTICAL pair totals
    * while every round scans |vocab| rows instead of |corpus| words
    * (the published reference implementations train on exactly this
    * dict). One groupBy shuffle up front, persisted; natural-language
    * vocabularies follow Zipf, so |vocab| ≪ corpus words by orders of
    * magnitude and the K per-round regex folds run over a frame that
    * no longer grows with the corpus at all. */
  def train(words: DataFrame, k: Int): Seq[(String, Long)] = {
    val wc = graft.ops.SideCache.persist(
      words.groupBy("word").agg(count(lit(1)).as("wn")))
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    var stream: Column = regexp_replace(col("word"), "(.)", " $1 ")
    var r = 0
    while (r < k) {
      val syms = split(trim(stream), "  ")
      // guard: sequence(1, 0) would step BACKWARDS ([1, 0]) on
      // single-symbol words — emit no pairs instead
      val pairs = when(size(syms) >= 2,
        transform(sequence(lit(1), size(syms) - 1),
          i => concat(element_at(syms, i), lit(" "), element_at(syms, i + 1))))
        .otherwise(array())
      val top = wc.select(explode(pairs).as("pr"), col("wn"))
        .filter(col("pr").rlike("^[a-z0-9]+ [a-z0-9]+$"))
        .groupBy("pr").agg(sum("wn").as("n"))
        .orderBy(col("n").desc, col("pr"))
        .limit(1).collect()
      if (top.isEmpty) return out.toSeq
      val pr = top(0).getString(0)
      out += ((pr, top(0).getLong(1)))
      val Array(a, b) = pr.split(" ")
      stream = regexp_replace(stream, s" $a  $b ", s" $a$b ")
      r += 1
    }
    out.toSeq
  }
}
