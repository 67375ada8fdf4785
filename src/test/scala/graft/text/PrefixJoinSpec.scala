package graft.text

import graft.SparkSpec
import graft.functions.F
import graft.tables.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** q_prefix_join contract: the prefix-filtered plan is LOSSLESS vs
  * the brute-force exact-Jaccard join (the claim the DuckDB oracle
  * hash-checks at sf0.01, pinned here in-engine at sf0.001), and the
  * rarest-first prefix index prunes the candidate space well below
  * all-pairs — the property that makes the plan viable at 100 TB. */
class PrefixJoinSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf0001)
  private lazy val arrs = docs.select(
    col("doc_id"), F.shingleHashes(col("text"), 3).as("ts"))

  test("q_prefix_join equals the brute-force exact-Jaccard join") {
    val got = graft.SparkEntry.queries("q_prefix_join")(spark, sf0001)
      .collect().map(_.toSeq).toSet
    val brute = arrs.as("a").crossJoin(arrs.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        size(array_intersect(col("a.ts"), col("b.ts"))).cast("long").as("inter"),
        size(col("a.ts")).cast("long").as("n_a"),
        size(col("b.ts")).cast("long").as("n_b"))
      .filter(col("inter") * 2 >= col("n_a") + col("n_b") - col("inter") &&
        col("n_a") + col("n_b") - col("inter") > 0)
      .withColumn("jaccard_pct",
        floor(col("inter") * 100.0 / (col("n_a") + col("n_b") - col("inter")) + lit(1e-6)))
      .collect().map(_.toSeq).toSet
    assert(got.nonEmpty)
    assert(got === brute)
  }

  test("prefix filter prunes candidates well below all-pairs") {
    val toks = arrs.select(col("doc_id"), size(col("ts")).cast("long").as("n"),
      explode(col("ts")).as("token"))
    val dfreq = toks.groupBy("token").agg(count(lit(1)).as("df"))
    val pref = toks.join(dfreq, "token")
      .withColumn("rk", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("df"), col("token"))))
      .filter(col("rk") <= expr("n div 2") + 1)
      .select(col("doc_id"), col("n"), col("token"))
    val nCand = pref.as("a").join(pref.as("b"),
        col("a.token") === col("b.token") &&
          col("a.doc_id") < col("b.doc_id") &&
          greatest(col("a.n"), col("b.n")) <= least(col("a.n"), col("b.n")) * 2)
      .select(col("a.doc_id"), col("b.doc_id")).distinct().count()
    val nDocs = docs.count()
    val allPairs = nDocs * (nDocs - 1) / 2
    assert(nCand < allPairs / 5, s"candidates $nCand vs all-pairs $allPairs")
  }
}
