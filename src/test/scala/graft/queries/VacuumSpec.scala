package graft.queries

import graft.{SparkEntry, SparkSpec}
import graft.ops.VersionChain

/** q_vacuum: the expired generations' files must actually be gone,
  * survivors must stay readable (with as-of resolution degrading
  * gracefully), the audit must describe the pre-sweep state, a re-run
  * must be idempotent — and the sweep must never touch the SHARED
  * chain root the other maintenance queries resolve. */
class VacuumSpec extends SparkSpec {
  import spark.implicits._

  private val root =
    s"${System.getProperty("java.io.tmpdir")}/graft_vacuum"

  private lazy val rows = SparkEntry.queries("q_vacuum")(spark, sf0001)
    .collect().toSeq.sortBy(_.getLong(0))

  test("the expired generations are gone from disk; survivors readable") {
    rows // force the run
    for (g <- Seq("gen0", "gen1"))
      assert(!new java.io.File(s"$root/$g").exists(),
        s"vacuumed generation $g still on disk")
    for (g <- Seq("gen2", "gen3"))
      assert(spark.read.parquet(s"$root/$g").count() > 0, s"$g unreadable")
    // the SHARED chain is untouched: the sweep ran on a private copy
    val shared = VersionChain.rootFor(sf0001)
    for (g <- Seq("gen0", "gen1", "gen2", "gen3"))
      assert(new java.io.File(s"$shared/$g/_SUCCESS").exists(),
        s"vacuum mutated the shared chain ($g)")
  }

  test("audit rows describe the pre-sweep state and the policy") {
    val Seq(r0, r1, r2, r3) = rows
    assert(r0.getString(3) === "vacuumed" && r1.getString(3) === "vacuumed" &&
      r2.getString(3) === "live" && r3.getString(3) === "live")
    // expired generations' audits recorded files and content BEFORE
    // deletion
    for (r <- Seq(r0, r1)) {
      assert(r.getLong(4) > 0 && r.getLong(5) === 0L)
      assert(r.getLong(6) > 0)
    }
    // v0 and v1 carry identical content (compaction preserved it) —
    // recorded even though both generations' files are now gone
    assert(r0.getLong(6) === r1.getLong(6))
    assert(r0.getLong(7) === r1.getLong(7))
    // the update kept v2's row count but changed its checksum
    assert(r3.getLong(6) === r2.getLong(6))
    assert(r3.getLong(7) !== r2.getLong(7))
    // live generations keep their files
    assert(r2.getLong(4) === r2.getLong(5))
    assert(r3.getLong(4) === r3.getLong(5))
  }

  test("as-of resolution over the post-vacuum manifest: every v <= 2 lands on a LIVE generation") {
    rows
    val log = spark.read.parquet(s"$root/manifest")
      .select("version", "path", "status")
      .as[(Long, String, String)].collect().sortBy(_._1)
    def resolveLive(v: Long): String = {
      val live = log.filter(_._3 == "live")
      val le = live.filter(_._1 <= v)
      (if (le.nonEmpty) le.maxBy(_._1) else live.minBy(_._1))._2
    }
    assert(resolveLive(0) === "gen2",
      "a v0 reader must degrade to the oldest live generation")
    assert(resolveLive(2) === "gen2" && resolveLive(9) === "gen3")
  }

  test("re-run is idempotent (fresh copy + re-vacuum, same audit)") {
    val first = rows.map(_.toSeq)
    val second = SparkEntry.queries("q_vacuum")(spark, sf0001)
      .collect().toSeq.sortBy(_.getLong(0)).map(_.toSeq)
    assert(first === second)
  }
}
