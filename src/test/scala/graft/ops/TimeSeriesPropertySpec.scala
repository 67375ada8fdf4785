package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY §5.3) over randomly generated
  * per-id daily series. Pure ScalaCheck generators sampled with fixed
  * seeds (the scalatest bridge artifact isn't on the offline
  * classpath) — deterministic across runs. Each property mirrors
  * something the reference implies but never tests. */
class TimeSeriesPropertySpec extends SparkSpec {
  import spark.implicits._
  import TimeSeriesOps._

  private val seriesGen: Gen[List[(Long, Int, Long)]] = for {
    nIds <- Gen.choose(1, 4)
    series <- Gen.sequence[List[List[(Long, Int, Long)]], List[(Long, Int, Long)]](
      (1 to nIds).toList.map { id =>
        for {
          len <- Gen.choose(1, 20)
          vals <- Gen.listOfN(len, Gen.choose(0L, 100L))
        } yield vals.zipWithIndex.map { case (v, day) => (id.toLong, day, v) }
      })
  } yield series.flatten

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  private def df(rows: List[(Long, Int, Long)]) =
    rows.toDF("id", "day", "v")
      .withColumn("date", date_add(lit("2021-01-01").cast("date"), col("day")))

  test("dailyDelta telescopes: per-id sum of deltas equals the last value") {
    samples(seriesGen, 8).foreach { rows =>
      val d = dailyDelta(df(rows), "id", "date", "v", "delta")
      val sums = d.groupBy("id").agg(sum("delta").as("s")).as[(Long, Long)]
        .collect().toMap
      val lasts = rows.groupBy(_._1).map { case (id, rs) =>
        id -> rs.maxBy(_._2)._3 }
      assert(sums == lasts, s"rows=$rows")
    }
  }

  test("rebaseToStart zeroes every group's first row and preserves diffs") {
    samples(seriesGen, 8).foreach { rows =>
      val r = rebaseToStart(df(rows), "id", "date", Seq("v"))
        .orderBy("id", "date").select("id", "v").as[(Long, Long)].collect()
      val byId = r.groupBy(_._1).view.mapValues(_.map(_._2).toList)
      byId.foreach { case (id, vs) =>
        assert(vs.head == 0L)
        val orig = rows.filter(_._1 == id).sortBy(_._2).map(_._3)
        assert(vs == orig.map(_ - orig.head))
      }
    }
  }

  test("strideSample always keeps each group's latest date") {
    samples(seriesGen.flatMap(r => Gen.choose(2, 9).map(r -> _)), 8)
      .foreach { case (rows, n) =>
        val s = strideSample(df(rows), "id", "date", n)
          .groupBy("id").agg(max("day").as("m"), count(lit(1)).as("c"))
          .as[(Long, Int, Long)].collect()
        val latest = rows.groupBy(_._1).view.mapValues(_.map(_._2).max)
        s.foreach { case (id, m, c) =>
          assert(m == latest(id))
          val len = rows.count(_._1 == id)
          assert(c == (len + n - 1) / n, s"stride=$n len=$len")
        }
      }
  }

  test("rebase15 is a no-op on series with a non-zero first cumulative value") {
    samples(seriesGen, 8).foreach { rows =>
      val shifted = rows.map { case (id, d, v) => (id, d, v + 1) } // no zeros
      val out = rebase15(df(shifted), "id", "date", "v", "v", "m")
      assert(out.filter(col("m_m") =!= 0L).count() == 0)
    }
  }

  test("exact percentile vector is monotone non-decreasing") {
    samples(Gen.nonEmptyListOf(Gen.choose(-1000.0, 1000.0)), 8).foreach { xs =>
      val qs = xs.toDF("x")
        .agg(percentile(col("x"), typedlit((1 to 19).map(_ / 20.0))))
        .collect()(0).getSeq[Double](0)
      assert(qs.sliding(2).forall(p => p.size < 2 || p.head <= p.last))
    }
  }
}
