package graft.queries

import graft.SparkSpec

/** `q_corpus_pipeline` — the end-to-end curation flagship. The DuckDB
  * oracle hash-verifies the whole table; this spec pins the funnel's
  * SHAPE (stage chaining, attrition counts at sf0.001) and its
  * consistency with the standalone component queries it composes. */
class CorpusPipelineSpec extends SparkSpec {

  private lazy val rows = graft.SparkEntry.queries("q_corpus_pipeline")(spark, sf0001)
    .select("stage", "gate", "n_in", "n_kept", "n_drop", "chars_kept")
    .collect()
    .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)))
    .sortBy(_._1)

  test("stages chain: each gate's input is the previous gate's survivors") {
    assert(rows.map(_._2).toSeq === Seq("exact_dedup", "near_dedup", "lang",
      "media", "quality", "repetition", "decontaminate", "temperature_mix",
      "shard"))
    rows.sliding(2).foreach { case Array(prev, next) =>
      assert(next._3 === prev._4, s"stage ${next._1} n_in != stage ${prev._1} n_kept")
    }
    rows.foreach { r =>
      assert(r._5 === r._3 - r._4, s"stage ${r._1} n_drop mismatch")
      assert(r._4 >= 0 && r._4 <= r._3, s"stage ${r._1} kept out of range")
    }
    // byte mass can only shrink down the funnel
    rows.sliding(2).foreach { case Array(prev, next) =>
      assert(next._6 <= prev._6, s"stage ${next._1} chars grew")
    }
  }

  test("per-stage attrition at sf0.001 is pinned") {
    // deterministic end-to-end: exact dedup finds no byte-level dups
    // in this corpus, near-dedup drops 35, the lang gate 69, the
    // media gate 51 (decoded media below the size bounds), quality
    // 111, decontamination 5 (the eval slice itself), and the
    // temperature mix prunes to 127 (target 120) — regression-pins
    // every composed kernel at once
    assert(rows.map(_._4).toSeq ===
      Seq(500L, 465L, 396L, 345L, 234L, 234L, 229L, 127L, 127L))
  }

  test("stage 1 agrees with the standalone normalized-dedup query") {
    // number of survivors of normalize+exact-dedup == number of
    // distinct normalized-content groups
    val nGroups = graft.SparkEntry.queries("q_dedup_normalized")(spark, sf0001).count()
    assert(rows.head._4 === nGroups)
  }

  test("temperature mix lands within one lang-rounding step of target") {
    // each lang's kept count is within rate granularity of its quota:
    // total kept ∈ [target - |langs|·ε, input]; with 4 surviving langs
    // and basis-point rates the slack is tiny
    val mixed = rows(7)
    assert(mixed._4 <= mixed._3)
    assert(mixed._4 >= 100L && mixed._4 <= 140L,
      s"mix kept ${mixed._4}, expected ~120")
  }
}
