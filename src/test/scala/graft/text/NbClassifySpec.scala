package graft.text

import graft.SparkSpec

/** q_nb_classify — the in-engine trained Naive Bayes classifier.
  * The oracle hash-verifies the full train→score recurrence; these
  * tests pin the CLASSIFIER properties the hash can't express. */
class NbClassifySpec extends SparkSpec {
  import spark.implicits._

  private lazy val rows =
    graft.SparkEntry.queries("q_nb_classify")(spark, sf0001)
      .select("doc_id", "lang", "predicted", "correct")
      .as[(Long, String, String, Boolean)].collect().toSeq

  test("scores exactly the odd-id holdout, one row per doc") {
    val ids = rows.map(_._1)
    assert(ids.forall(_ % 2 == 1), "train docs must never be scored")
    assert(ids.distinct.length === ids.length, "one verdict per doc")
    val expected = graft.tables.Tables.documents(spark, sf0001)
      .filter("doc_id % 2 = 1").count()
    assert(ids.length.toLong === expected)
  }

  test("predictions come from the label space and correct is consistent") {
    val langs = Set("en", "fr", "es", "de", "zh")
    rows.foreach { case (id, l, p, c) =>
      assert(langs(p), s"doc $id predicted unknown class $p")
      assert(c === (l == p), s"doc $id correct flag inconsistent")
    }
  }

  test("the learner recovers the planted signal: accuracy >= 0.9 overall and per class") {
    val acc = rows.count(_._4).toDouble / rows.length
    assert(acc >= 0.9, f"overall accuracy $acc%.3f")
    rows.groupBy(_._2).foreach { case (l, rs) =>
      val a = rs.count(_._4).toDouble / rs.length
      assert(a >= 0.8, f"class $l accuracy $a%.3f")
    }
  }
}
