package graft.text

/** UNIGRAM-LM TOKENIZER (Kudo 2018; SentencePiece's default
  * algorithm), distilled to a deterministic, oracle-replayable
  * hard-EM over the collapsed distinct-word frequency dict (the
  * [[Bpe]] collapse — per-word work weighted by word frequency is
  * identical to per-occurrence work):
  *
  *  1. SEED: every substring of length 1..[[MaxPiece]] of every
  *     distinct word, counted with overlaps and weighted by word
  *     frequency.
  *  2. E-STEP (hard): Viterbi-best segmentation of each word under
  *     integer-quantized log-probabilities
  *     (`floor(ln(c/T)·10⁶ + ε)` — the `q_tfidf` quantization, so
  *     both engines' `ln` agree at the boundary), DP tie-break on
  *     (score DESC, split DESC) — every decision integer-decided.
  *  3. M-STEP + PRUNE: piece counts re-estimated from the chosen
  *     segmentations; multi-char pieces that won nothing DROP
  *     (SentencePiece's prune), single chars are FLOORED at count 1
  *     (coverage can never break).
  *  4. Re-segment under the re-estimated model (round 2) — the
  *     token totals before/after show the EM step genuinely moved
  *     the model.
  *
  * Scale shape: the distinct-word dict collapse is one map-side
  * aggregate (31 distinct words at the gate SFs; guarded ≤ 2¹⁶ — at
  * web scale the E-step distributes as a broadcast-vocab
  * `mapPartitions` over the dict shards and the M-step is one
  * piece-keyed aggregate; the algorithm is embarrassingly parallel
  * in words, unlike BPE's global argmax rounds). */
object Unigram {

  val MaxPiece = 4
  val LogScale = 1000000L
  val MaxDict = 65536
  /** The oracle's DP depth (and seed start positions) are unrolled to
    * this word length; [[train]] refuses longer words LOUDLY so a
    * corpus violating the fixture assumption fails as a clear error
    * on the Scala side instead of an inexplicable hash mismatch
    * (the engine would segment the word, the oracle would silently
    * drop it). */
  val MaxWord = 8

  /** Integer-quantized log-probability (the floorEps convention). */
  def qlog(c: Long, t: Long): Long =
    math.floor(math.log(c.toDouble / t.toDouble) * LogScale + 1e-6).toLong

  /** Overlap-counted substring seeds of one word. */
  def seedsOf(word: String): Seq[String] =
    for {
      i <- 0 until word.length
      l <- 1 to math.min(MaxPiece, word.length - i)
    } yield word.substring(i, i + l)

  /** Viterbi-best segmentation under `score` (missing pieces are
    * un-usable; single chars must be present). Tie-break: higher
    * total score, then LARGER split point (shorter last piece) —
    * mirrored by the oracle's ROW_NUMBER (sc DESC, i DESC). */
  def viterbi(word: String, score: Map[String, Long]): Seq[String] = {
    val n = word.length
    val best = Array.fill(n + 1)(Long.MinValue)
    val from = Array.fill(n + 1)(-1)
    best(0) = 0L
    for (j <- 1 to n) {
      for (i <- math.max(0, j - MaxPiece) until j if best(i) > Long.MinValue) {
        score.get(word.substring(i, j)).foreach { s =>
          val cand = best(i) + s
          if (cand > best(j) || (cand == best(j) && i > from(j))) {
            best(j) = cand; from(j) = i
          }
        }
      }
      require(from(j) >= 0, s"no segmentation reaches $word[0,$j)")
    }
    // backtrace
    var j = n
    val out = scala.collection.mutable.ListBuffer.empty[String]
    while (j > 0) { val i = from(j); word.substring(i, j) +=: out; j = i }
    out.toSeq
  }

  /** One hard-EM iteration over the (word, freq) dict. Returns
    * (seedCount, re-estimated piece counts, round-1 token total,
    * round-2 token total). */
  def train(dict: Seq[(String, Long)])
      : (Long, Map[String, Long], Long, Long) = {
    require(dict.size <= MaxDict,
      s"distinct-word dict ${dict.size} exceeds $MaxDict — distribute " +
        "the E-step before raising this")
    dict.find(_._1.length > MaxWord).foreach { case (w, _) =>
      throw new IllegalArgumentException(
        s"word '$w' exceeds MaxWord=$MaxWord — the oracle's DP unroll " +
          "cannot replay it; raise MaxWord in BOTH engines together")
    }
    val seeds = scala.collection.mutable.Map.empty[String, Long]
    for ((w, wn) <- dict; p <- seedsOf(w))
      seeds(p) = seeds.getOrElse(p, 0L) + wn
    val t0 = seeds.valuesIterator.sum
    val q0 = seeds.map { case (p, c) => p -> qlog(c, t0) }.toMap
    // E-step 1 + M-step
    val counts1 = scala.collection.mutable.Map.empty[String, Long]
    var tok1 = 0L
    for ((w, wn) <- dict; p <- viterbi(w, q0)) {
      counts1(p) = counts1.getOrElse(p, 0L) + wn
      tok1 += wn
    }
    // prune: zero-count multi-char pieces drop; chars floored at 1
    val alive: Map[String, Long] =
      counts1.toMap.filter { case (p, _) => p.length > 1 } ++
        seeds.keysIterator.filter(_.length == 1)
          .map(p => p -> math.max(counts1.getOrElse(p, 0L), 1L)).toMap
    val t1 = alive.valuesIterator.sum
    val q1 = alive.map { case (p, c) => p -> qlog(c, t1) }
    var tok2 = 0L
    for ((w, wn) <- dict; _ <- viterbi(w, q1)) tok2 += wn
    (seeds.size.toLong, alive, tok1, tok2)
  }
}
