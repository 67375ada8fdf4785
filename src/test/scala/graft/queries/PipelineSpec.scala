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
}
