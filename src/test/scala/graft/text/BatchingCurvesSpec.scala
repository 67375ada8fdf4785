package graft.text

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q_length_buckets and q_vocab_coverage: the two dataloader-tuning
  * tables must match brute recomputes, and each must demonstrate the
  * phenomenon it exists to measure (bucketing beats global padding;
  * coverage saturates at the true vocabulary). */
class BatchingCurvesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val lens = graft.tables.Tables.documents(spark, sf0001)
    .select(size(TextFunctions.tokens(col("text"))).cast("long"))
    .as[Long].collect().toSeq

  test("q_length_buckets equals the brute bucket accounting and beats global padding") {
    val got = SparkEntry.queries("q_length_buckets")(spark, sf0001)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    val brute = lens.groupBy(_ / 16).toSeq.map { case (b, ls) =>
      val n = ls.size.toLong; val s = ls.sum; val m = ls.max
      (b, n, s, m, 1000L * (m * n - s) / (m * n))
    }.sortBy(_._1)
    assert(got === brute)
    // the point of bucketing: total padded cells under per-bucket
    // padding strictly beat one global bucket padded to the corpus max
    val bucketedCells = got.map(r => r._4 * r._2).sum
    val globalCells = lens.max * lens.size
    assert(bucketedCells < globalCells,
      s"bucketing must reduce padded cells: $bucketedCells vs $globalCells")
    // and waste within each bucket is bounded by the bucket width
    got.foreach { case (b, n, s, m, w) =>
      assert(w <= 1000L * 15 / math.max(m, 1L) + 1,
        s"bucket $b waste $w exceeds the width bound")
    }
  }

  test("q_vocab_coverage: monotone, saturating exactly at the true vocabulary") {
    val got = SparkEntry.queries("q_vocab_coverage")(spark, sf0001)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got.map(_._1) === Seq(4L, 8L, 16L, 32L))
    // brute word frequencies
    val freq = graft.tables.Tables.documents(spark, sf0001)
      .select(explode(TextFunctions.tokens(col("text"))).as("w"))
      .as[String].collect().groupBy(identity).map { case (w, a) => (w, a.length.toLong) }
    val ranked = freq.toSeq.sortBy { case (w, c) => (-c, w) }
    val total = freq.values.sum
    got.foreach { case (n, nKept, nVocab, covered, tot, pm) =>
      assert(nVocab === freq.size.toLong)
      assert(tot === total)
      assert(nKept === math.min(n, freq.size.toLong))
      assert(covered === ranked.take(n.toInt).map(_._2).sum)
      assert(pm === 1000L * covered / total)
    }
    // monotone and saturating: the last swept point covers everything
    assert(got.map(_._6).sliding(2).forall(p => p.head <= p.last))
    assert(got.last._6 === 1000L && got.last._2 === got.last._3)
    assert(got.head._6 < 500L, "curve must start well below saturation")
  }
}
