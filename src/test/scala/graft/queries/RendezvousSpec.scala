package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** `q_shard_rendezvous` — the oracle hash-verifies the assignment;
  * these tests pin the two properties that make rendezvous hashing
  * THE shard-growth operator: monotonicity (growing the shard set
  * never moves a doc between two OLD shards) and minimal movement
  * (~new/total moved, vs mod-hashing's near-total reshuffle). */
class RendezvousSpec extends SparkSpec {

  private lazy val rows =
    graft.SparkEntry.queries("q_shard_rendezvous")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  test("monotonicity: no document ever arrives at an OLD shard") {
    rows.filter(_._1 < 64).foreach { case (s, _, arrived) =>
      assert(arrived == 0L, s"old shard $s received $arrived moved docs")
    }
    // and the new shards actually received something
    assert(rows.filter(_._1 >= 64).map(_._3).sum > 0,
      "no doc moved to a new shard — degenerate")
  }

  test("minimal movement: ~16/80 of docs move; mod-hashing would move nearly all") {
    val total = rows.map(_._2).sum
    val moved = rows.map(_._3).sum
    val frac = moved.toDouble / total
    // expectation 0.20; binomial slack at 500 docs
    assert(frac > 0.10 && frac < 0.32, s"moved fraction $frac, expected ~0.20")
    // mod-hash control on the same key: residues mod 64 vs mod 80
    val modMoved = graft.tables.Tables.documents(spark, sf0001)
      .select((pmod(col("doc_id"), lit(64)) =!= pmod(col("doc_id"), lit(80)))
        .cast("long").as("m"))
      .agg(sum("m")).head().getLong(0)
    // sequential ids stay put only when doc_id % 320 < 64 ⇒ ~80% move
    // in the limit; 0.7 leaves room for the partial last period
    assert(modMoved.toDouble / total > 0.7,
      s"mod control moved only $modMoved of $total — not the contrast expected")
    assert(modMoved.toDouble / total > 2 * frac,
      "rendezvous did not clearly beat mod-hashing on movement")
  }

  test("balance: new-world shard sizes stay within a multinomial band") {
    val total = rows.map(_._2).sum
    val mean = total.toDouble / 80
    rows.foreach { case (s, n, _) =>
      assert(n < mean * 4 + 10, s"shard $s holds $n of $total — badly skewed")
    }
  }
}
