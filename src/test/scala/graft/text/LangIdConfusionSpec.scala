package graft.text

import graft.{SparkEntry, SparkSpec}

/** q_langid_confusion: the marked cohort must land on the diagonal
  * for EVERY language (the markers dominate), the natural cohort must
  * exhibit the shared-vocab en-collapse, and the row shares must sum
  * to 1000-ish per language. */
class LangIdConfusionSpec extends SparkSpec {
  import spark.implicits._

  test("marked docs hit the diagonal; natural docs collapse to en; rows fold") {
    val cells = SparkEntry.queries("q_langid_confusion")(spark, sf0001)
      .as[(String, String, String, Long, Long)].collect().toSeq
    val langs = cells.map(_._1).distinct.sorted
    assert(langs.size === 5)
    langs.foreach { l =>
      val marked = cells.filter(c => c._1 == l && c._2 == "marked")
      assert(marked.map(_._3).distinct === Seq(l),
        s"marked $l docs not all predicted $l: $marked")
      assert(marked.map(_._4).sum > 0)
      val natural = cells.filter(c => c._1 == l && c._2 == "natural")
      assert(natural.map(_._3).distinct === Seq("en"),
        s"natural $l docs should all collapse to en (shared vocab): $natural")
      // row shares fold to ~1000 (integer div loses at most |cells|-1)
      val pmSum = cells.filter(_._1 == l).map(_._5).sum
      assert(pmSum >= 1000 - cells.count(_._1 == l) && pmSum <= 1000,
        s"$l row_pm folds to $pmSum")
    }
  }
}
