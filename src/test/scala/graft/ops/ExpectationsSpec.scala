package graft.ops

import graft.{SparkEntry, SparkSpec}
import graft.ops.Expectations.{Expectation, ExpectationViolated}
import org.apache.spark.sql.functions._

/** Expectations — write-path CHECK constraints: fail-mode aborts
  * before anything lands, drop quarantines, warn admits, NULL
  * predicates PASS (SQL CHECK semantics), multi-violation rows count
  * once per expectation but quarantine once, and the q_constraints
  * stored artifacts agree with the returned certificate. */
class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private def frame = Seq(
    (1L, 10.0, Some(5.0)),   // clean
    (2L, -1.0, Some(5.0)),   // violates lo
    (3L, 200.0, Some(5.0)),  // violates hi
    (4L, -5.0, None),        // violates lo; NULL on nn's predicate
    (5L, 50.0, None)         // NULL on nn's predicate only
  ).toDF("id", "v", "aux")

  private val lo = Expectation("lo", col("v") >= 0, "drop")
  private val hi = Expectation("hi", col("v") <= 100, "drop")
  private val nn = Expectation("nn", col("aux") > 0, "warn")

  test("report counts per-expectation; NULL predicates pass") {
    val rep = Expectations.report(frame, Seq(lo, hi, nn), col("id"))
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(rep("lo")._1 == 2 && rep("lo")._2 == (2L ^ 4L))
    assert(rep("hi")._1 == 1 && rep("hi")._2 == 3L)
    // aux NULL rows (4, 5) PASS nn — only explicit FALSE violates
    assert(rep("nn")._1 == 0 && rep("nn")._2 == 0L)
  }

  test("an EMPTY input reports zeros, never NULLs (the empty micro-batch path)") {
    val rep = Expectations.report(frame.filter(col("id") < 0),
        Seq(lo, hi, nn), col("id"))
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(rep == Map("lo" -> ((0L, 0L)), "hi" -> ((0L, 0L)),
      "nn" -> ((0L, 0L))))
    // ...and enforceFail over the zero report passes silently
    Expectations.enforceFail(
      Seq(("lo", "drop", 0L), ("hi", "drop", 0L), ("nn", "warn", 0L)))
  }

  test("admitted drops drop-mode violators once, keeps warn violators") {
    val adm = Expectations.admitted(frame, Seq(lo, hi, nn))
      .select("id").as[Long].collect().sorted.toSeq
    assert(adm == Seq(1L, 5L)) // 2,3,4 quarantined exactly once
  }

  test("fail mode throws and a staged write never happens") {
    val failing = Expectation("pos", col("v") > 0, "fail")
    val rep = Expectations.report(frame, Seq(failing), col("id"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val ex = intercept[ExpectationViolated] {
      Expectations.enforceFail(rep.toSeq)
    }
    assert(ex.name == "pos" && ex.n == 2)
    // satisfied fail-mode expectation passes silently
    Expectations.enforceFail(Seq(("ok", "fail", 0L)))
  }

  test("q_constraints stored artifacts agree with the certificate") {
    val rows = SparkEntry.queries("q_constraints")(spark, sf0001)
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows.keySet == Set("chk_price", "chk_qty", "chk_disc",
      "warn_tax", "zz_admitted"))
    // the satisfied fail-mode constraint really has zero violations
    assert(rows("chk_price") == (("fail", 0L, 0L)))
    // warn violates plenty yet the admitted count excludes ONLY drops
    val path = graft.queries.CoreQueries.expectRoot(sf0001)
    val adm = spark.read.parquet(s"$path/admitted")
    assert(adm.count() == rows("zz_admitted")._2)
    assert(adm.filter(col("tax_c") > 5).count() > 0,
      "warn-mode violations were filtered out of the admitted set")
    assert(adm.filter(col("qty") > 45 || col("disc_c") > 8).count() == 0,
      "a drop-mode violation reached the admitted table")
  }
}
