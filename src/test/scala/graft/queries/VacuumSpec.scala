package graft.queries

import graft.{SparkEntry, SparkSpec}

/** q_vacuum: the expired generation's files must actually be gone,
  * survivors must stay readable (with as-of resolution degrading
  * gracefully), the audit must describe the pre-sweep state, and a
  * re-run must be idempotent. */
class VacuumSpec extends SparkSpec {
  import spark.implicits._

  private val root =
    s"${System.getProperty("java.io.tmpdir")}/graft_vacuum"

  private lazy val rows = SparkEntry.queries("q_vacuum")(spark, sf0001)
    .collect().toSeq.sortBy(_.getLong(0))

  test("the expired generation is gone from disk; survivors readable") {
    rows // force the run
    assert(!new java.io.File(s"$root/v0").exists(),
      "vacuumed generation v0 still on disk")
    for (g <- Seq("v1", "v2"))
      assert(spark.read.parquet(s"$root/$g").count() > 0, s"$g unreadable")
  }

  test("audit rows describe the pre-sweep state and the policy") {
    val Seq(r0, r1, r2) = rows
    assert(r0.getString(3) === "vacuumed" &&
      r1.getString(3) === "live" && r2.getString(3) === "live")
    // v0's audit recorded its files and content BEFORE deletion
    assert(r0.getLong(4) > 0 && r0.getLong(5) === 0L)
    assert(r0.getLong(6) > 0)
    // v0 and v1 carry identical content (compaction preserved it) —
    // recorded even though v0's files are now gone
    assert(r0.getLong(6) === r1.getLong(6))
    assert(r0.getLong(7) === r1.getLong(7))
    // live generations keep their files
    assert(r1.getLong(4) === r1.getLong(5))
    assert(r2.getLong(4) === r2.getLong(5))
  }

  test("as-of resolution over the post-vacuum manifest: every v <= 1 lands on a LIVE generation") {
    rows
    val log = spark.read.parquet(s"$root/manifest")
      .select("version", "path", "status")
      .as[(Long, String, String)].collect().sortBy(_._1)
    def resolveLive(v: Long): String = {
      val live = log.filter(_._3 == "live")
      val le = live.filter(_._1 <= v)
      (if (le.nonEmpty) le.maxBy(_._1) else live.minBy(_._1))._2
    }
    assert(resolveLive(0) === "v1",
      "a v0 reader must degrade to the oldest live generation")
    assert(resolveLive(1) === "v1" && resolveLive(9) === "v2")
  }

  test("re-run is idempotent (recommit + re-vacuum, same audit)") {
    val first = rows.map(_.toSeq)
    val second = SparkEntry.queries("q_vacuum")(spark, sf0001)
      .collect().toSeq.sortBy(_.getLong(0)).map(_.toSeq)
    assert(first === second)
  }
}
