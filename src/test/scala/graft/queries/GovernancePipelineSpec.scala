package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q_forget_pipeline: erasure must actually be absent from the live
  * artifacts on disk (and present in the untouched originals — the
  * rewrite-not-rewrite-history model), the cascade rows must be the
  * standalone query's, and the certification row must fold exactly. */
class GovernancePipelineSpec extends SparkSpec {
  import spark.implicits._

  private val root =
    s"${System.getProperty("java.io.tmpdir")}/graft_forget"

  private lazy val rows = SparkEntry.queries("q_forget_pipeline")(spark, sf0001)
    .collect().toSeq

  test("live artifacts retain zero tombstoned keys; originals still do") {
    rows // force the run
    val annRoot = graft.sim.Similarity.indexRoot(sf0001, split9 = false)
    val liveCodes = graft.sim.Similarity.liveSegments(
      spark, annRoot, Seq("codes")).head
    assert(liveCodes != "codes", "ann tier was never compacted")
    val liveVec = spark.read.parquet(s"$annRoot/$liveCodes")
      .select("vec_id").as[Long].collect()
    assert(liveVec.nonEmpty && liveVec.forall(_ % 13 != 0),
      "a tombstoned vector survived compaction")
    val origVec = spark.read.parquet(s"$annRoot/codes")
      .select("vec_id").as[Long].collect()
    assert(origVec.exists(_ % 13 == 0),
      "the original segment should be untouched until retirement")
    val liveEv = spark.read.parquet(s"$root/events_live")
      .select("user_id").as[Long].collect()
    assert(liveEv.nonEmpty && liveEv.forall(_ % 13 != 0),
      "a tombstoned user's events survived the fact rewrite")
    assert(spark.read.parquet(s"$root/events")
      .filter(pmod(col("user_id"), lit(13L)) === 0).count() > 0)
  }

  test("cascade rows equal the standalone q_delete_propagate") {
    val cascade = rows.filter(_.getString(0) == "2_cascade")
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).sortBy(_._1)
    val standalone = SparkEntry.queries("q_delete_propagate")(spark, sf0001)
      .as[(String, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(cascade === standalone)
    graft.ops.SideCache.releaseAll()
  }

  test("the certification row folds the cascade/index/fact tiers exactly; every tier erased something") {
    val tiers = rows.filter(_.getString(0) != "5_certify")
    // the fold excludes stage 1: the tombstone list duplicates the
    // cascade's customer row, and folding both would self-cancel the
    // identical key_xors (x^x=0) — the composite would then be blind
    // to customer-key drift
    val folded = tiers.filter(_.getString(0) != "1_tombstones")
    val cert = rows.find(_.getString(0) == "5_certify").get
    assert(cert.getLong(3) === folded.map(_.getLong(3)).sum)
    assert(cert.getLong(5) ===
      folded.map(_.getLong(5)).reduce(_ ^ _))
    // and the exclusion is what keeps the composite sensitive: the
    // all-tier fold would cancel the customer xor out entirely
    val customerXor = tiers.find(_.getString(0) == "1_tombstones")
      .get.getLong(5)
    assert(customerXor != 0L)
    tiers.foreach { t =>
      assert(t.getLong(3) > 0, s"vacuous erasure in ${t.getString(1)}")
      assert(t.getLong(2) - t.getLong(3) === t.getLong(4),
        s"${t.getString(1)}: before - erased != after")
    }
  }
}
