package graft.text

import graft.{SparkEntry, SparkSpec}
import graft.tables.Tables

/** q_split_leakage: the naive split must genuinely leak (cross-pairs
  * at roughly the 2·p·(1−p) base rate), the grouped split must have
  * ZERO cross-pairs because every near-dup component lands wholly in
  * one side, and the accounting must equal a brute driver-side
  * recompute over the same pair graph. */
class SplitLeakageSpec extends SparkSpec {
  import spark.implicits._

  private lazy val rows = SparkEntry.queries("q_split_leakage")(spark, sf0001)
    .collect().toSeq.sortBy(_.getString(0))

  test("naive leaks, grouped is leak-free by construction; brute recompute agrees") {
    val Seq(grouped, naive) = rows
    assert(naive.getLong(1) > 0, "naive split shows no leakage — vacuous")
    assert(grouped.getLong(1) === 0L && grouped.getLong(5) === 0L)
    assert(naive.getLong(4) === grouped.getLong(4), "pair universe differs")
    // brute: same pair graph, same split hash, driver-side
    val prs = Dedup.simhashPairs(Tables.documents(spark, sf0001),
        maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    val labels = Dedup.wccStar(prs.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap
    graft.ops.SideCache.releaseAll()
    def sp(x: Long): Long =
      graft.functions.Poly.hashBytes(x.toString.getBytes("UTF-8"), 131L) % 10
    def acct(key: Long => Long) = {
      val sides = prs.map { case (a, b) => (sp(key(a)) < 8, sp(key(b)) < 8) }
      (sides.count(s => s._1 != s._2).toLong,
        sides.count(s => s._1 && s._2).toLong,
        sides.count(s => !s._1 && !s._2).toLong)
    }
    assert((naive.getLong(1), naive.getLong(2), naive.getLong(3)) ===
      acct(identity))
    assert((grouped.getLong(1), grouped.getLong(2), grouped.getLong(3)) ===
      acct(labels))
    // the zero is structural: every component's members share a side
    prs.foreach { case (a, b) =>
      assert(labels(a) === labels(b),
        s"pair ($a,$b) spans components — wcc labels broken")
    }
  }
}
