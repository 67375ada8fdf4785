package graft.queries

import graft.SparkSpec
import graft.functions.Poly
import org.apache.spark.sql.functions._

/** Behavior specs for the corpus-preparation family ([[CorpusQueries]]).
  * The DuckDB oracle pins exact values; these pin the SEMANTICS against
  * independent driver-side formulations (brute-force neighborhood scan,
  * direct normalization grouping, k-th-smallest recompute). */
class CorpusQueriesSpec extends SparkSpec {
  import spark.implicits._

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, sf0001)

  private def docs: Seq[(Long, String)] =
    graft.tables.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq

  private def norm(s: String): String =
    s.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim

  /** Driver-side twin of the engine's token-bigram shingle hashes. */
  private def bigramHashes(t: String): Seq[Long] = {
    val toks = t.split(" ")
    if (toks.length < 2) Seq.empty
    else toks.sliding(2).map(w =>
      Poly.hashBytes(w.mkString(" ").getBytes("UTF-8"), Poly.Base)).toSeq
  }

  test("q_dedup_normalized groups case/punct/spacing variants together") {
    val got = run("q_dedup_normalized")
      .select("keeper_id", "n_dups").as[(Long, Long)].collect()
      .groupBy(identity).view.mapValues(_.length).toMap
    val brute = docs.groupBy { case (_, t) => norm(t) }.values
      .map(g => (g.map(_._1).min, g.size.toLong))
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(got === brute)
    assert(got.map { case ((_, n), c) => n * c }.sum === docs.size.toLong)
  }

  test("q_sorted_neighborhood equals the brute-force windowed scan") {
    val got = run("q_sorted_neighborhood")
      .select("id_a", "id_b", "jaccard_pct")
      .as[(Long, Long, Long)].collect().toSet
    val ranked = docs
      .map { case (id, t) => (norm(t).take(12), id, t) }
      .sortBy { case (k, id, _) => (k, id) }
    val tokSets = docs.map { case (id, t) =>
      // split with limit -1 KEEPS empty tokens — matching the
      // engine's 1-shingle keep-empty semantics (ShingleKernel), so
      // the reference agrees on docs with double/trailing spaces.
      id -> t.split(" ", -1)
        .map(tok => Poly.hashBytes(tok.getBytes("UTF-8"), Poly.Base)).toSet
    }.toMap
    val brute = (for {
      i <- ranked.indices
      j <- (i + 1) to math.min(i + 4, ranked.size - 1)
      a = ranked(i)._2; b = ranked(j)._2
      inter = (tokSets(a) & tokSets(b)).size
      uni = tokSets(a).size + tokSets(b).size - inter
      if inter * 100 >= 60 * uni
    } yield (a, b, math.floor(inter * 100.0 / uni + 1e-6).toLong)).toSet
    assert(got === brute)
    assert(got.nonEmpty)
    assert(got.forall(_._3 >= 60))
  }

  test("q_sorted_neighborhood is invariant to the shuffle partition count") {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    def rows() = run("q_sorted_neighborhood")
      .select("id_a", "id_b", "jaccard_pct")
      .as[(Long, Long, Long)].collect().toSet
    try {
      spark.conf.set(key, "3")
      val three = rows()
      spark.conf.set(key, "7")
      val seven = rows()
      assert(three === seven)
    } finally spark.conf.set(key, prev)
  }

  test("q_group_split partitions users disjointly and covers all events") {
    val got = run("q_group_split")
      .select("split", "n_users", "n_events")
      .as[(String, Long, Long)].collect()
      .map { case (k, u, e) => k -> ((u, e)) }.toMap
    val events = graft.tables.Tables.events(spark, sf0001)
      .select(col("user_id")).as[Long].collect()
    val bucket = (u: Long) =>
      ((u % 2147483648L + 2147483648L) % 2147483648L * 2654435761L
        % 4294967296L) % 10 match {
      case b if b < 8 => "train"
      case 8 => "val"
      case _ => "test"
    }
    val byacc = events.groupBy(bucket)
    assert(got.view.mapValues(_._2).toMap ===
      byacc.view.mapValues(_.length.toLong).toMap)
    assert(got.view.mapValues(_._1).toMap ===
      byacc.view.mapValues(_.distinct.length.toLong).toMap)
    // disjoint by construction: split is a function of user_id alone,
    // so per-split distinct users sum to the global distinct count
    assert(got.values.map(_._1).sum === events.distinct.length.toLong)
  }

  test("q_inverted_index postings agree with a direct recompute") {
    val got = run("q_inverted_index")
      .select("term", "df", "postings").as[(String, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val brute = docs
      .flatMap { case (id, t) =>
        t.toLowerCase.split(" ").filter(_.nonEmpty).distinct.map(_ -> id)
      }
      .groupBy(_._1).view
      .mapValues(g => (g.size.toLong, g.map(_._2).sorted.mkString(",")))
      .filter { case (_, (df, _)) => df >= 2 && df <= 4000 }
      .toMap
    assert(got === brute)
    assert(got.nonEmpty)
    assert(got.forall { case (_, (df, p)) => p.split(",").length.toLong == df })
  }

  test("q_kmv_distinct: estimator matches the k-th-smallest recompute") {
    val got = run("q_kmv_distinct")
      .select("source", "n_exact", "est", "err_pct")
      .as[(String, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    val bySource = graft.tables.Tables.documents(spark, sf0001)
      .select(col("source"), col("text")).as[(String, String)].collect()
      .groupBy(_._1).view
      .mapValues(_.flatMap(d => bigramHashes(d._2)).distinct.sorted)
      .toMap
    val k = CorpusQueries.KmvK
    // the sketch branch (not the small-set fallback) must actually fire
    assert(bySource.values.exists(_.length > k))
    got.foreach { case (src, nExact, est, errPct) =>
      val hs = bySource(src)
      assert(nExact === hs.length.toLong)
      val expectEst =
        if (hs.length < k) hs.length.toLong
        else graft.ops.Num.floorEpsLong(
          (k - 1).toDouble * Poly.Mod / math.max(hs(k - 1), 1L))
      assert(est === expectEst, s"source=$src")
      assert(errPct ===
        graft.ops.Num.floorEpsLong(math.abs(est - nExact) * 100.0 / nExact))
    }
  }

  test("q_kmv_overlap: pair estimates match the set-arithmetic recompute") {
    val got = run("q_kmv_overlap")
      .select("src_a", "src_b", "n_inter", "exact_jac_pct", "est_jac_pct")
      .as[(String, String, Long, Long, Long)].collect()
    val sets = graft.tables.Tables.documents(spark, sf0001)
      .select(col("source"), col("text")).as[(String, String)].collect()
      .groupBy(_._1).view
      .mapValues(_.flatMap(d => bigramHashes(d._2)).toSet)
      .toMap
    assert(got.length === sets.size * (sets.size - 1) / 2)
    val k = CorpusQueries.KmvK
    def est(hs: Seq[Long]): Long =
      if (hs.length < k) hs.length.toLong
      else graft.ops.Num.floorEpsLong(
        (k - 1).toDouble * Poly.Mod / math.max(hs(k - 1), 1L))
    got.foreach { case (a, b, nInter, exactPct, estPct) =>
      val (sa, sb) = (sets(a), sets(b))
      assert(nInter === (sa & sb).size.toLong)
      assert(exactPct === graft.ops.Num.floorEpsLong(
        nInter * 100.0 / (sa.size + sb.size - nInter)))
      // replay the sketch set arithmetic driver-side
      val ka = sa.toSeq.sorted.take(k)
      val kb = sb.toSeq.sorted.take(k)
      val m = (ka ++ kb).distinct.sorted
      val estU = if (m.length < k) m.length.toLong
        else graft.ops.Num.floorEpsLong(
          (k - 1).toDouble * Poly.Mod / math.max(m(k - 1), 1L))
      val estI = math.max(est(ka) + est(kb) - estU, 0L)
      assert(estPct === graft.ops.Num.floorEpsLong(estI * 100.0 / estU),
        s"pair=$a,$b")
    }
  }

  test("q_winsorize: clamp counts stay within the 1% tail bound") {
    val got = run("q_winsorize")
      .select("n", "sum_wins_v", "n_lo_clamped", "n_hi_clamped")
      .as[(Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (n, _, nLo, nHi) =>
      // exact-percentile fences clamp at most ~1% per tail (+1 for the
      // interpolated boundary row)
      assert(nLo <= n / 100 + 1)
      assert(nHi <= n / 100 + 1)
    }
    // winsorized total never exceeds the raw total's magnitude envelope
    val raw = graft.tables.Tables.events(spark, sf0001)
      .where(col("value").isNotNull)
      .select(graft.ops.Num.floorEps(col("value") * 1e6)).as[Long].collect()
    assert(got.map(_._1).sum === raw.length.toLong)
  }

  test("q_passage_dedup equals the brute-force global first-occurrence rewrite") {
    val got = run("q_passage_dedup")
      .select("doc_id", "n_passages", "n_kept", "n_dropped", "new_text")
      .as[(Long, Long, Long, Long, String)].collect().sortBy(_._1)

    // driver-side reimplementation: chunk every doc into disjoint
    // 8-word passages, keep the globally first (doc_id, idx) occurrence
    // of each distinct passage text, reassemble in order
    val chunked = docs.sortBy(_._1).map { case (id, t) =>
      id -> t.split(' ').grouped(8).map(_.mkString(" ")).toVector
    }
    val seen = scala.collection.mutable.Set.empty[String]
    val brute = chunked.map { case (id, ps) =>
      val kept = ps.filter(p => seen.add(p))
      (id, ps.size.toLong, kept.size.toLong, (ps.size - kept.size).toLong,
        kept.mkString(" "))
    }
    assert(got.toSeq === brute)
    // the rewrite must actually drop something on this corpus (repeated
    // passages exist by construction) and keep the majority
    val (tot, keptN) = (brute.map(_._2).sum, brute.map(_._3).sum)
    assert(keptN < tot)
    assert(keptN > 0)
  }
}
