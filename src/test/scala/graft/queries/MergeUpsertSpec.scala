package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q_merge_upsert: the stored CDF must be a LOSSLESS description of
  * the commit — replaying it onto the stored base generation must
  * reproduce the stored result generation bit-for-bit; the base must
  * stay untouched; every change tier must be non-vacuous and the
  * delete-wins precedence must actually bite. */
class MergeUpsertSpec extends SparkSpec {
  import spark.implicits._

  private val root =
    s"${System.getProperty("java.io.tmpdir")}/graft_merge"

  private lazy val rows = SparkEntry.queries("q_merge_upsert")(spark, sf0001)
    .collect().toSeq

  private def snap(p: String): Set[(Long, Long, Long)] =
    spark.read.parquet(s"$root/$p")
      .select("custkey", "nation", "bal")
      .as[(Long, Long, Long)].collect().toSet

  test("replaying the stored CDF onto gen0 reproduces gen1 exactly") {
    rows // force the commit
    val g0 = snap("gen0")
    val g1 = snap("gen1")
    val cdf = spark.read.parquet(s"$root/cdf/v1")
      .select("change_type", "custkey", "nation", "bal")
      .as[(String, Long, Long, Long)].collect().toSeq
    val removedKeys = cdf.filter(_._1 == "remove").map(_._2).toSet
    val updatedKeys = cdf.filter(_._1 == "update_pre").map(_._2).toSet
    val posts = cdf.filter(_._1 == "update_post")
      .map(r => (r._2, r._3, r._4)).toSet
    val inserted = cdf.filter(_._1 == "insert")
      .map(r => (r._2, r._3, r._4)).toSet
    val replayed =
      g0.filterNot(r => removedKeys(r._1) || updatedKeys(r._1)) ++
        posts ++ inserted
    assert(replayed === g1,
      "CDF replay onto the base diverged from the stored result")
    graft.ops.SideCache.releaseAll()
  }

  test("the base generation is untouched; every tier non-vacuous; delete wins") {
    rows
    val g0 = snap("gen0")
    val g1 = snap("gen1")
    // the base still holds its deleted and pre-update rows
    assert(g0.exists(_._1 % 13 == 0))
    // every tier fired
    val byType = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    for (t <- Seq("remove", "update_pre", "update_post", "insert"))
      assert(byType(t) > 0, s"vacuous $t tier")
    assert(byType("update_pre") === byType("update_post"))
    // delete-wins precedence genuinely bit: at least one key matched
    // BOTH the update and the delete predicate, and is gone from gen1
    val contested = g0.map(_._1)
      .filter(k => k % 10 == 3 && k % 13 == 0)
    assert(contested.nonEmpty, "fixture has no contested merge keys")
    contested.foreach { k =>
      assert(!g1.exists(_._1 == k), s"contested key $k survived the MERGE")
    }
    // inserts landed under fresh keys; updates applied +500
    assert(g1.exists(_._1 > 1000000L))
    val upd = g0.find(r => r._1 % 10 == 3 && r._1 % 13 != 0).get
    assert(g1.contains((upd._1, upd._2, upd._3 + 500L)))
  }
}
