package graft.text

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q_html_strip: boilerplate elements must be genuinely removed with
  * their content, tag text content must survive, plain documents must
  * pass through untouched, and the planted wrappers must make every
  * case non-vacuous. */
class HtmlStripSpec extends SparkSpec {
  import spark.implicits._

  private lazy val rows = SparkEntry.queries("q_html_strip")(spark, sf0001)
    .as[(Long, Long, Long, Long, String)].collect().toSeq

  private lazy val texts = graft.tables.Tables.documents(spark, sf0001)
    .select(col("doc_id"), col("text")).as[(Long, String)].collect().toMap

  test("wrapped docs lose exactly the boilerplate; plain docs pass through") {
    assert(rows.nonEmpty)
    rows.foreach { case (id, rawLen, cleanLen, boilerPm, tail) =>
      val text = texts(id)
      id % 4 match {
        case 0 | 1 =>
          // markup + nav/script/footer content removed, body text kept
          assert(boilerPm > 0, s"doc $id: wrapper not stripped")
          assert(cleanLen < rawLen)
          if (text.length >= 24)
            assert(tail === text.takeRight(24),
              s"doc $id: content tail mangled")
          // boilerplate words must be gone from the tail region and
          // the clean length must cover the original text
          assert(cleanLen >= text.trim.length.toLong, s"doc $id: content lost")
        case 2 =>
          // fragment case: <br/> and the comment removed
          assert(boilerPm > 0 && cleanLen < rawLen, s"doc $id")
        case _ =>
          assert(rawLen === cleanLen && boilerPm === 0L,
            s"doc $id: plain text must pass through unchanged")
      }
    }
    // every planted class occurred
    for (m <- 0 to 3)
      assert(rows.exists(_._1 % 4 == m), s"mod class $m missing")
  }

  test("case 1 strips to exactly the original text (script+footer are pure boilerplate)") {
    rows.filter(_._1 % 4 == 1).take(20).foreach {
      case (id, _, cleanLen, _, _) =>
        assert(cleanLen ===
          texts(id).trim.replaceAll("[ \t\n\r]+", " ").length.toLong,
          s"doc $id: clean text is not exactly the body text")
    }
  }
}
