package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavior spec for q_ks_test: the oracle pins exact values; this
  * recomputes the KS statistic brute-force from the raw rows and
  * asserts the measurement is non-degenerate in BOTH directions —
  * the planted `en_x2` cohort fires the drift alarm, the natural
  * cohorts (one shared generator on this fixture) read `same`. */
class KsTestSpec extends SparkSpec {
  import spark.implicits._

  test("q_ks_test equals the brute-force KS recompute; alarm fires only on the planted cohort") {
    val got = graft.SparkEntry.queries("q_ks_test")(spark, sf0001)
      .select("cohort", "n_ref", "n_coh", "d_num", "ks_ppm", "crit_ppm", "verdict")
      .as[(String, Long, Long, Long, Long, Long, String)]
      .collect().map(r => r._1 -> r).toMap

    val docs = graft.tables.Tables.documents(spark, sf0001)
      .select(col("lang"), col("n_chars"))
      .as[(String, Long)].collect().toSeq
    val ref = docs.filter(_._1 == "en").map(_._2)
    val cohorts = docs.map(_._1).distinct.filter(_ != "en").map(l =>
      l -> docs.filter(_._1 == l).map(_._2)) :+ ("en_x2" -> ref.map(_ * 2))

    cohorts.foreach { case (name, coh) =>
      val (na, nb) = (ref.size.toLong, coh.size.toLong)
      val pooled = (ref ++ coh).distinct
      val dNum = pooled.map { v =>
        val ca = ref.count(_ <= v).toLong
        val cb = coh.count(_ <= v).toLong
        (BigInt(ca) * nb - BigInt(cb) * na).abs
      }.max
      val ksPpm = (BigInt(1000000) * dNum / (BigInt(na) * nb)).toLong
      val critPpm = graft.ops.Num.floorEpsLong(
        1.358 * math.sqrt((na + nb).toDouble / (na.toDouble * nb)) * 1e6)
      val row = got(name)
      assert((row._2, row._3, row._4, row._5, row._6) ===
        ((na, nb, dNum.toLong, ksPpm, critPpm)), s"cohort $name")
      assert(row._7 === (if (ksPpm > critPpm) "drift" else "same"))
    }
    // non-degenerate both ways: the planted shift is caught, the
    // shared-generator langs are not false-alarmed
    assert(got("en_x2")._7 === "drift")
    got.filterKeys(_ != "en_x2").values.foreach(r => assert(r._7 === "same"))
    assert(got.size === cohorts.size)
  }

  test("q_psi: control is exact zero, planted cohort alarms, naturals never do") {
    val got = graft.SparkEntry.queries("q_psi")(spark, sf0001)
      .select("cohort", "n", "psi_micro", "verdict")
      .as[(String, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    // self-comparison control: en vs en is an EXACT integer zero
    assert(got("en")._3 === 0L && got("en")._4 === "stable")
    // the planted doubled cohort must cross the canonical 0.25 bar
    assert(got("en_x2")._3 > 250000L && got("en_x2")._4 === "shifted")
    // natural langs share one generator: none may read 'shifted'
    got.filterKeys(k => k != "en_x2").values.foreach { case (c, _, p, v) =>
      assert(v != "shifted", s"$c psi=$p")
      assert(p >= 0L, "smoothed PSI terms are non-negative in aggregate")
    }
    // brute PSI for the planted cohort from raw lengths
    val en = graft.tables.Tables.documents(spark, sf0001)
      .filter(col("lang") === "en").select("n_chars")
      .as[Long].collect().sorted
    val edges = (1 to 9).map(k => en((math.ceil(k / 10.0 * en.length) - 1).toInt))
    def bins(vs: Seq[Long]) =
      (0 until 10).map(b => vs.count(v => edges.count(v > _) == b).toLong)
    val rb = bins(en.toSeq); val qb = bins(en.toSeq.map(_ * 2))
    val rn = en.length + 10; val qn = en.length + 10
    val brute = (0 until 10).map { i =>
      val p = (rb(i) + 1).toDouble / rn
      val q = (qb(i) + 1).toDouble / qn
      math.floor((q - p) * math.log(q / p) * 1e6 + 1e-6).toLong
    }.sum
    assert(got("en_x2")._3 === brute)
  }
}
