package graft.pipeline

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q_data_card_diff: the skewed ingest must trip the drift verdict on
  * exactly the ingested language, every other language must read
  * stable, and the counts must reconcile with the raw cohorts. */
class DataCardDiffSpec extends SparkSpec {
  import spark.implicits._

  test("en drifts, the rest are stable; counts reconcile; deltas fold to ~0") {
    val rows = SparkEntry.queries("q_data_card_diff")(spark, sf0001)
      .as[(String, Long, Long, Long, Long, Long, String)].collect().toSeq
    assert(rows.size === 5)
    val byLang = rows.map(r => r._1 -> r).toMap
    assert(byLang("en")._7 === "drifted" && byLang("en")._6 > 0,
      s"the planted en-only ingest must read drifted: ${byLang("en")}")
    rows.filter(_._1 != "en").foreach { r =>
      assert(r._7 === "stable" && r._6 < 0,
        s"non-ingested lang must read stable (slightly diluted): $r")
    }
    // counts reconcile with the raw cohorts
    val docs = graft.tables.Tables.documents(spark, sf0001)
    val newEn = docs.filter(col("lang") === "en").count()
    val oldEn = docs
      .filter(col("lang") === "en" && col("doc_id") % 7 =!= 0).count()
    assert(byLang("en")._3 === newEn && byLang("en")._2 === oldEn)
    rows.filter(_._1 != "en").foreach(r => assert(r._2 === r._3,
      s"${r._1}: non-ingested cohorts must be identical"))
    // shares are a distribution on both sides: deltas fold to ~0
    val fold = rows.map(_._6).sum
    assert(math.abs(fold) <= rows.size.toLong, s"deltas fold to $fold")
  }
}
