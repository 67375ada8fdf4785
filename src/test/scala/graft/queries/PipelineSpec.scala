package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, sf0001)

  test("q_pii_scrub finds every planted email/phone and shortens nothing else") {
    val rows = run("q_pii_scrub")
      .select("doc_id", "n_emails", "n_phones", "scrubbed_len", "raw_len")
      .as[(Long, Int, Int, Int, Int)].collect()
    rows.foreach { case (id, ne, np, slen, rlen) =>
      assert(ne === (if (id % 10 == 0) 1 else 0), s"doc $id emails")
      assert(np === (if (id % 15 == 0) 1 else 0), s"doc $id phones")
      if (ne == 0 && np == 0) assert(slen === rlen, s"doc $id unchanged")
      else assert(slen < rlen, s"doc $id must shrink (redaction tokens are shorter)")
    }
  }

  test("q_repeated_passages reports only multi-document shingles, counted once per doc") {
    val rows = run("q_repeated_passages")
      .select("h", "n_docs").as[(Long, Long)].collect()
    assert(rows.nonEmpty, "the planted near-dup clones must share 6-gram passages")
    assert(rows.forall(_._2 >= 2))
    // n_docs counts DOCUMENTS (shingles are distinct within a doc), so
    // no count can exceed the corpus size
    val nDocs = graft.tables.Tables.documents(spark, sf0001).count()
    assert(rows.forall(_._2 <= nDocs))
  }

  test("q_heavy_hitters: the CMS estimate never under-counts, for every token") {
    // the defining count-min invariant, checked over the WHOLE vocab
    // (the registered query truncates to the top 15 for the oracle)
    val toks = graft.tables.Tables.documents(spark, sf0001)
      .select(explode(split(col("text"), " ")).as("tok"))
    val top = run("q_heavy_hitters")
      .select("tok", "exact_n", "est_n", "never_under")
      .as[(String, Long, Long, Boolean)].collect()
    assert(top.length === 15)
    assert(top.forall(_._4), s"CMS under-counted: ${top.filterNot(_._4).toSeq}")
    assert(top.forall(r => r._3 >= r._2))
    // the top token by exact count really is the corpus's hottest
    val hottest = toks.groupBy("tok").count()
      .orderBy(col("count").desc, col("tok")).limit(1)
      .as[(String, Long)].head()
    assert(top.head._1 === hottest._1 && top.head._2 === hottest._2)
  }

  test("q_weighted_sample is the exact brute-force smallest-k by (prio_q, doc_id)") {
    val got = run("q_weighted_sample")
      .select("doc_id", "prio_q").as[(Long, Long)].collect().toSeq
    assert(got.length === 100)
    // recompute every priority JVM-side with the same kernel and take
    // the same smallest-k — TakeOrderedAndProject must agree exactly
    val want = graft.tables.Tables.documents(spark, sf0001)
      .select("doc_id", "text", "n_chars").as[(Long, String, Long)].collect()
      .map { case (id, text, nc) =>
        val h = graft.functions.Poly.hashBytes(
          text.getBytes(java.nio.charset.StandardCharsets.UTF_8),
          graft.functions.Poly.Base)
        val u = (h + 1L).toDouble / 2147483648.0
        val prio = math.floor(u / math.max(nc, 1L).toDouble * 1e15).toLong
        (id, prio)
      }.sortBy(p => (p._2, p._1)).take(100).toSeq
    assert(got.sortBy(p => (p._2, p._1)) === want)
    // weighting works: sampled docs skew long vs the corpus average
    val sampleIds = got.map(_._1).toSet
    val lens = graft.tables.Tables.documents(spark, sf0001)
      .select("doc_id", "n_chars").as[(Long, Long)].collect()
    val corpusMean = lens.map(_._2).sum.toDouble / lens.length
    val sampleMean = lens.filter(r => sampleIds(r._1)).map(_._2).sum.toDouble / 100
    assert(sampleMean > corpusMean,
      f"length-weighted sample should skew long: $sampleMean%.0f vs $corpusMean%.0f")
  }

  test("q_group_weighted_sample: per-language brute-force smallest-k, heap-bounded plan") {
    val got = run("q_group_weighted_sample")
      .select("lang", "doc_id", "prio_q", "rk")
      .as[(String, Long, Long, Int)].collect().toSeq
    // exactly 20 per language, ranks 1..20
    got.groupBy(_._1).foreach { case (l, rs) =>
      assert(rs.map(_._4).sorted === (1 to 20), s"lang $l")
    }
    // per-group selection equals the brute-force recompute
    val all = graft.tables.Tables.documents(spark, sf0001)
      .select("doc_id", "lang", "text", "n_chars")
      .as[(Long, String, String, Long)].collect()
      .map { case (id, l, text, nc) =>
        val h = graft.functions.Poly.hashBytes(
          text.getBytes(java.nio.charset.StandardCharsets.UTF_8),
          graft.functions.Poly.Base)
        val u = (h + 1L).toDouble / 2147483648.0
        (l, id, math.floor(u / math.max(nc, 1L).toDouble * 1e15).toLong)
      }
    val want = all.groupBy(_._1).toSeq.flatMap { case (_, rs) =>
      rs.sortBy(r => (r._3, r._2)).take(20).toSeq
    }.toSet
    assert(got.map(r => (r._1, r._2, r._3)).toSet === want)
    // the rank filter must plan as WindowGroupLimit (per-group k-heap)
    val plan = run("q_group_weighted_sample").queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(400))
  }

  test("q_record_linkage: every planted twin classified right, no false matches") {
    val rows = run("q_record_linkage")
      .select("a_key", "b_key", "w_total", "verdict")
      .as[(Long, Long, Long, String)].collect().toSeq
    val byPair = rows.map(r => (r._1, r._2) -> r).toMap
    val nCust = graft.tables.Tables.table(spark, sf0001, "customer").count()
    (0L until nCust).foreach { k =>
      if (k % 3 == 0) {
        // benign drift: must be a full-score match (twin planted in
        // the disjoint negative namespace at -k-1)
        val r = byPair.get((k, -k - 1))
        assert(r.exists(x => x._4 == "match" && x._3 == 33L), s"twin of $k: $r")
      } else if (k % 3 == 1) {
        // corrupted twin: edit-distance-1 name only → gray zone
        val r = byPair.get((k, -k - 1))
        assert(r.exists(_._4 == "possible"), s"corrupt twin of $k: $r")
      } else assert(!byPair.contains((k, -k - 1)), s"$k has no twin in B")
    }
    // at THIS corpus scale the false-positive rate is exactly zero
    // (sf0.001 pinned; larger corpora legitimately produce rare FS
    // false positives — single-digit-apart names with coincidental
    // balance agreement — see the query's doc comment)
    rows.filter(_._4 == "match").foreach { case (a, b, w, _) =>
      assert(b === -a - 1 && a % 3 === 0L, s"false match ($a,$b,$w)")
    }
  }

  test("q_contamination only reports train-eval pairs, never eval-eval") {
    val rows = run("q_contamination")
      .select("train_id", "eval_id", "n_shared").as[(Long, Long, Long)].collect()
    rows.foreach { case (t, e, n) =>
      assert(t % 97 != 0 && e % 97 == 0)
      assert(n >= 1)
    }
  }

  test("q_repetition: duplicated text scores high, per-row bounds hold") {
    val rows = run("q_repetition")
      .select("n_3grams", "n_distinct", "rep_pct").as[(Int, Int, Long)].collect()
    rows.foreach { case (tot, dis, pct) =>
      assert(dis <= math.max(tot, 1))
      assert(pct >= 0 && pct <= 100)
    }
    // direct kernel check on a fully-repetitive doc
    val rep = Seq((1L, "a b c a b c a b c")).toDF("doc_id", "text")
    val r = graft.text.TextFunctions.shingleUdfCol(col("text"), 3)
    val out = rep.select(size(r).as("d")).as[Int].head()
    assert(out === 3) // "a b c", "b c a", "c a b"
  }

  test("q_shard_assign: exhaustive, disjoint, content-stable, roughly balanced") {
    val shards = run("q_shard_assign")
      .select("shard", "n_docs").as[(Long, Long)].collect()
    val nDocs = graft.tables.Tables.documents(spark, sf0001).count()
    // exhaustive: every document lands in exactly one shard
    assert(shards.map(_._2).sum === nDocs)
    assert(shards.map(_._1).distinct.length === shards.length)
    shards.foreach { case (s, _) => assert(s >= 0 && s < 64) }
    // multinomial balance: no shard grossly over-full (mean + 6σ,
    // σ ≈ √(n/K) — loose enough to never flake, tight enough to catch
    // a broken hash that funnels everything into one shard)
    val mean = nDocs.toDouble / 64
    val limit = mean + 6 * math.sqrt(mean) + 1
    shards.foreach { case (s, n) =>
      assert(n <= limit, s"shard $s over-full: $n vs mean $mean")
    }
    // content-stability: same corpus re-read -> identical manifest
    val again = run("q_shard_assign").select("shard", "n_docs")
      .as[(Long, Long)].collect()
    assert(again.sorted.toSeq === shards.sorted.toSeq)
  }

  test("q_source_cap: per-source ceiling holds and keeps the longest docs") {
    val rows = run("q_source_cap")
      .select("source", "doc_id", "n_chars", "rk")
      .as[(String, Long, Long, Int)].collect()
    val bySource = rows.groupBy(_._1)
    bySource.foreach { case (src, rs) =>
      assert(rs.length <= 10, s"source $src over cap")
      // ranks are exactly 1..k within each source
      assert(rs.map(_._4).sorted.toSeq === (1 to rs.length).toSeq, src)
    }
    // kept docs dominate dropped docs under the (n_chars desc, doc_id)
    // order: for any capped source, min kept length >= max dropped
    val all = graft.tables.Tables.documents(spark, sf0001)
      .select("source", "doc_id", "n_chars").as[(String, Long, Long)].collect()
    bySource.filter(_._2.length == 10).foreach { case (src, kept) =>
      val keptIds = kept.map(_._2).toSet
      val dropped = all.filter(r => r._1 == src && !keptIds(r._2))
      if (dropped.nonEmpty)
        assert(kept.map(_._3).min >= dropped.map(_._3).max,
          s"source $src kept a shorter doc than it dropped") // ties break by id
    }
    // the rank<=k filter must plan as WindowGroupLimit (bounded
    // per-group state), not a full window sort then filter
    val plan = run("q_source_cap").queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("q_filter_funnel: stages chain, counts monotone, survivors remain") {
    val rows = run("q_filter_funnel")
      .select("stage", "n_in", "n_kept", "n_drop")
      .as[(Int, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.length === 4)
    // stage 1 sees the whole corpus
    val total = graft.tables.Tables.documents(spark, sf0001).count()
    assert(rows.head._2 === total)
    rows.foreach { case (_, nIn, nKept, nDrop) =>
      assert(nKept <= nIn)
      assert(nDrop === nIn - nKept)
    }
    // each stage's intake is the prior stage's survivors
    rows.sliding(2).foreach { case Array(a, b) => assert(b._2 === a._3) }
    // the funnel must discriminate but not annihilate
    assert(rows.last._3 > 0)
    assert(rows.last._3 < total)
  }

  test("q_stratified_sample keeps only below-quota buckets, rates roughly honor quotas") {
    val rows = run("q_stratified_sample")
      .select("lang", "bucket", "keep_below").as[(String, Long, Int)].collect()
    rows.foreach { case (_, b, q) => assert(b < q) }
    // en quota (20) must admit fewer than zh quota (80) proportionally
    val total = graft.tables.Tables.documents(spark, sf0001)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val kept = rows.groupBy(_._1).view.mapValues(_.size).toMap
    val enRate = kept.getOrElse("en", 0).toDouble / total("en")
    val zhRate = kept.getOrElse("zh", 0).toDouble / total("zh")
    assert(enRate < zhRate, s"en=$enRate zh=$zhRate")
  }

  test("q_fim_split: spans reassemble to the original, md5 pins the transform") {
    val rows = run("q_fim_split")
      .select("doc_id", "fim_applied", "n_pre", "n_mid", "n_suf",
        "out_len", "out_md5")
      .as[(Long, Boolean, Long, Long, Long, Long, String)].collect().toSeq
    val docs = graft.tables.Tables.documents(spark, sf0001)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    rows.foreach { case (id, fim, np, nm, ns, outLen, outMd5) =>
      val text = docs(id)
      // span accounting always covers the doc exactly
      assert(np + nm + ns === text.length.toLong, s"doc $id spans")
      if (fim) {
        // PSM re-order with 5-char sentinels, byte-for-byte
        val (pre, rest) = text.splitAt(np.toInt)
        val (mid, suf) = rest.splitAt(nm.toInt)
        val want = s"<PRE>$pre<SUF>$suf<MID>$mid"
        assert(outLen === want.length.toLong, s"doc $id len")
        assert(outMd5 === md5hex(want), s"doc $id md5")
      } else {
        assert(nm === 0L && ns === 0L, s"doc $id AR spans")
        assert(outMd5 === md5hex(text), s"doc $id AR md5")
      }
    }
    // the hash-gated FIM rate concentrates near 50%
    val rate = rows.count(_._2).toDouble / rows.size
    assert(rate > 0.3 && rate < 0.7, s"FIM rate $rate")
  }

  test("q_epoch_mix: small sources upsample, large downsample, budget respected") {
    val rows = run("q_epoch_mix")
      .select("source", "sum_chars", "repeat_milli", "eff_chars")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    rows.foreach { case (src, chars, rep, eff) =>
      assert(rep >= 0 && rep <= 10000L, s"$src repeat out of cap")
      assert(eff === chars * rep / 1000, s"$src eff_chars arithmetic")
    }
    // sqrt-temperature: the repeat factor must be anti-monotone in
    // source size (a strictly smaller source never repeats less)
    val bySize = rows.sortBy(_._2)
    bySize.sliding(2).foreach {
      case Seq(small, large) =>
        assert(small._3 >= large._3,
          s"${small._1} (${small._2}ch, r=${small._3}) < ${large._1} " +
            s"(${large._2}ch, r=${large._3})")
      case _ => ()
    }
    // effective mass lands at ~2x the corpus (floor rounding + the
    // epoch cap only ever push it BELOW the budget)
    val totChars = rows.map(_._2).sum
    val totEff = rows.map(_._4).sum
    assert(totEff <= 2L * totChars, "over budget")
    assert(totEff >= (2L * totChars * 8) / 10, s"budget underfilled: $totEff vs ${2L * totChars}")
  }

  test("q_delete_propagate: the cascade is closed and consistent") {
    val got = run("q_delete_propagate")
      .select("tbl", "n_total", "n_deleted", "n_remaining", "del_key_xor")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.keySet === Set("customer", "orders", "lineitem"))
    // totals match the raw tables; remaining = total - deleted
    assert(got("customer")._2 ===
      graft.tables.Tables.customer(spark, sf0001).count())
    got.values.foreach { case (t, n, d, rem, _) =>
      assert(rem === n - d, s"$t accounting")
      assert(d > 0, s"$t cascade must actually delete rows")
      assert(rem > 0, s"$t must not be wiped out")
    }
    // brute cascade: every order of a deleted customer, every lineitem
    // of a deleted order — counts and xor checksums must agree
    val delC = graft.tables.Tables.customer(spark, sf0001)
      .select("c_custkey").as[Long].collect().filter(_ % 13 == 0).toSet
    val delO = graft.tables.Tables.orders(spark, sf0001)
      .select("o_orderkey", "o_custkey").as[(Long, Long)].collect()
      .filter(o => delC(o._2)).map(_._1).toSet
    val delL = graft.tables.Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_linenumber").as[(Long, Int)].collect()
      .filter(l => delO(l._1)).map(l => l._1 * 31 + l._2)
    assert(got("customer")._3 === delC.size.toLong)
    assert(got("orders")._3 === delO.size.toLong)
    assert(got("lineitem")._3 === delL.length.toLong)
    assert(got("customer")._5 === delC.foldLeft(0L)(_ ^ _))
    assert(got("orders")._5 === delO.foldLeft(0L)(_ ^ _))
    assert(got("lineitem")._5 === delL.foldLeft(0L)(_ ^ _))
    graft.ops.SideCache.releaseAll()
  }

  test("q_neyman_alloc: variance-optimal quotas, brute-recomputed and non-degenerate") {
    val got = run("q_neyman_alloc")
      .select("lang", "n_docs", "sd_milli", "w_milli", "alloc_pm")
      .as[(String, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    val docs = graft.tables.Tables.documents(spark, sf0001)
      .select("lang", "n_chars").as[(String, Long)].collect()
    val brute = docs.groupBy(_._1).toSeq.map { case (lang, rows) =>
      val n = rows.size.toLong
      val sum = rows.map(_._2).sum
      val ss = rows.map(r => r._2 * r._2).sum
      val sd = math.sqrt((n * ss - sum * sum).toDouble / (n * n))
      (lang, n, math.floor(sd * 1000 + 1e-6).toLong)
    }.sortBy(_._1)
    val tw = brute.map { case (_, n, sdm) => n * sdm }.sum
    got.zip(brute).foreach { case ((gl, gn, gsd, gw, ga), (bl, bn, bsd)) =>
      assert(gl === bl && gn === bn && gsd === bsd)
      assert(gw === bn * bsd)
      assert(ga === math.floor(gw.toDouble * 1000 / tw + 1e-6).toLong)
    }
    // design signal is real: every stratum funded, budget ~spent, and
    // the allocation genuinely differs across strata
    assert(got.forall(_._5 > 0))
    val total = got.map(_._5).sum
    assert(total <= 1000 && total > 1000 - got.size.toLong)
    assert(got.map(_._5).distinct.size > 1, "allocation must discriminate")
  }

  test("q_quantile_norm: distribution transplanted, ranks preserved, data changed") {
    val got = run("q_quantile_norm")
      .select("doc_id", "lang", "n_chars", "norm_chars")
      .as[(Long, String, Long, Long)].collect().toSeq
    val docs = graft.tables.Tables.documents(spark, sf0001)
      .select("doc_id", "lang", "n_chars").as[(Long, String, Long)].collect()
    val en = docs.filter(_._2 == "en").map(r => (r._3, r._1)).sorted.map(_._1)
    // per stratum: rank order preserved and every mapped value is an
    // exact en quantile at the right index
    got.groupBy(_._2).foreach { case (lang, rows) =>
      val ordered = rows.sortBy(r => (r._3, r._1))
      val nh = ordered.size
      ordered.zipWithIndex.foreach { case ((id, _, _, norm), rk) =>
        val ridx = if (nh == 1) 0
        else math.floor(rk.toDouble * (en.length - 1) / (nh - 1) + 1e-6).toInt
        assert(norm === en(ridx), s"$lang doc $id rank $rk")
      }
      // monotone: normalized values are non-decreasing in source rank
      assert(ordered.map(_._4) === ordered.map(_._4).sorted)
    }
    // the operator measurably changes the data (~97% probed)
    val changed = got.count(r => r._3 != r._4)
    assert(changed > got.size / 2, s"only $changed of ${got.size} changed")
    assert(!got.exists(_._2 == "en"), "the reference stratum is not remapped")
  }

  test("q_data_card: sections coherent, shares sum, entropy positive, PII planted rate") {
    val got = run("q_data_card")
      .select("section", "key", "metric", "value")
      .as[(String, String, String, Long)].collect().toSeq
    def metric(sec: String, key: String, m: String): Long =
      got.find(r => r._1 == sec && r._2 == key && r._3 == m).get._4
    val nDocs = metric("corpus", "all", "n_docs")
    assert(nDocs === graft.tables.Tables.documents(spark, sf0001).count())
    // lang shares sum to ~1000 per mille; doc counts sum exactly
    val langRows = got.filter(r => r._1 == "lang")
    val langs = langRows.map(_._2).distinct
    assert(langs.size >= 4)
    assert(langRows.filter(_._3 == "n_docs").map(_._4).sum === nDocs)
    val shareSum = langRows.filter(_._3 == "share_pm").map(_._4).sum
    assert(shareSum <= 1000 && shareSum > 1000 - langs.size.toLong)
    // entropy terms positive (multi-lang corpus), bounded by ln|L|
    val h = langRows.filter(_._3 == "entropy_term_micro").map(_._4).sum
    assert(h > 0 && h <= math.ceil(math.log(langs.size.toDouble) * 1e6).toLong)
    // length deciles are a non-decreasing ladder
    val dec = got.filter(_._1 == "length").sortBy(_._2).map(_._4)
    assert(dec.size === 9 && dec === dec.sorted)
    // planted PII reads exactly the plant rate (doc_id % 10 == 0)
    assert(metric("quality", "pii", "email_docs_pm") === 100L)
    // honest zero: this corpus has no exact dups
    assert(metric("quality", "dup", "exact_dup_pm") === 0L)
    graft.ops.SideCache.releaseAll()
  }

  test("q_class_weights equals the brute effective-number recompute; minority up-weighted") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("q_class_weights")(spark, sf0001)
      .as[(String, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    val counts = graft.tables.Tables.documents(spark, sf0001)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val brute = counts.toSeq.map { case (lang, n) =>
      val effn = (1.0 - math.exp(n.toDouble * math.log(0.999))) / 0.001
      (lang, n, math.floor(effn * 1000 + 1e-6).toLong,
        math.floor(1000000.0 / effn + 1e-6).toLong)
    }.sortBy(_._1)
    val totW = brute.map(_._4).sum
    val c = brute.size.toLong
    val expect = brute.map { case (lang, n, em, wm) =>
      (lang, n, em, wm, 1000L * wm * c / totW)
    }
    assert(got === expect)
    // the re-weighting genuinely corrects imbalance: the largest
    // class carries the smallest weight, and weights order inversely
    // to counts
    val byCount = got.sortBy(_._2)
    assert(byCount.map(_._5).sliding(2).forall(p => p.head >= p.last),
      "weights must be non-increasing in class size")
    assert(got.maxBy(_._2)._5 < got.minBy(_._2)._5)
  }
}
