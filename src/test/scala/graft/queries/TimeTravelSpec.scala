package graft.queries

import graft.{SparkEntry, SparkSpec}

/** q_time_travel: the versioned read must genuinely resolve THROUGH
  * the stored manifest to three immutable generations — all three
  * generation scans in the executed plan, v0 byte-untouched by the
  * later commits, and the checksum triples proving compaction
  * preserved content. */
class TimeTravelSpec extends SparkSpec {

  private val root =
    s"${System.getProperty("java.io.tmpdir")}/graft_timetravel"

  private lazy val df = SparkEntry.queries("q_time_travel")(spark, sf0001)
  private lazy val rows = df.collect().toSeq.sortBy(_.getLong(0))

  test("all three generation reads appear in the executed plan") {
    rows // force commits
    val plan = df.queryExecution.executedPlan.toString
    for (g <- Seq("v0", "v1", "v2"))
      assert(plan.contains(s"graft_timetravel/$g"),
        s"as-of read of generation $g missing from the executed plan")
  }

  test("v0 and v1 triples are identical content; v2 is the swept subset") {
    val Seq(r0, r1, r2) = rows
    // compaction preserves content: same rows, same xor, same sum
    assert(r0.getLong(3) === r1.getLong(3))
    assert(r0.getLong(4) === r1.getLong(4))
    assert(r0.getLong(5) === r1.getLong(5))
    // ...while the file count genuinely drops (the point of OPTIMIZE)
    assert(r1.getLong(2) < r0.getLong(2),
      s"compaction did not reduce files: ${r0.getLong(2)} -> ${r1.getLong(2)}")
    // the sweep removed something and kept something
    assert(r2.getLong(3) > 0 && r2.getLong(3) < r1.getLong(3))
  }

  test("older generations are immutable: committing v1/v2 leaves v0's files untouched") {
    rows // first full run
    def fileState(gen: String): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$root/$gen"))
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getPath -> f.length()).toMap
    }
    val v0Files = fileState("v0")
    assert(v0Files.nonEmpty)
    // a reader pinned to v0 after later commits sees the ingest layout
    // (day partitioning), not the compacted one
    assert(v0Files.keys.forall(_.contains("day=")))
    assert(fileState("v1").keys.forall(_.contains("bin=")))
  }

  test("q_time_travel_diff: row-level invariants from the STORED generations") {
    import org.apache.spark.sql.functions._
    val df = SparkEntry.queries("q_time_travel_diff")(spark, sf0001)
    val rows = df.collect().toSeq.sortBy(_.getLong(0))
    graft.ops.SideCache.releaseAll()
    val Seq(d01, d12) = rows
    // compaction invariant at row level: NOTHING added/removed/changed
    assert(d01.getLong(2) === 0L && d01.getLong(3) === 0L &&
      d01.getLong(4) === 0L && d01.getLong(5) > 0L)
    // the sweep removes exactly the day-of-month > 20 rows
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_ttdiff"
    val v1 = spark.read.parquet(s"$root/v1")
    val expectRemoved = v1.filter(dayofmonth(col("day")) > 20)
    assert(d12.getLong(3) === expectRemoved.count())
    assert(d12.getLong(2) === 0L && d12.getLong(4) === 0L)
    assert(d12.getLong(5) === v1.count() - d12.getLong(3))
    import spark.implicits._
    val xor = expectRemoved.select("event_id").as[Long].collect()
      .foldLeft(0L)(_ ^ _)
    assert(d12.getLong(6) === xor, "removed-key xor != tombstone manifest")
    // both diff sides are genuine stored-generation reads
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_ttdiff"))
  }

  test("manifest resolution: as-of between commits returns the newest generation <= v") {
    rows
    import spark.implicits._
    val log = spark.read.parquet(s"$root/manifest")
      .select("version", "op", "path")
      .as[(Long, String, String)].collect().sortBy(_._1)
    assert(log.map(t => (t._1, t._2, t._3)).toSeq ===
      Seq((0L, "ingest", "v0"), (1L, "compact", "v1"), (2L, "retain", "v2")))
    // the resolve rule itself (newest <= v), as the query computes it
    def resolve(v: Long) = log.filter(_._1 <= v).maxBy(_._1)._3
    assert(resolve(0) === "v0" && resolve(1) === "v1" && resolve(5) === "v2")
  }
}
