package graft.io

import graft.SparkSpec
import graft.ops.CommitLog
import graft.ops.CommitLog.Entry
import org.apache.spark.sql.functions._

/** Row-level `table_changes` ([[GraftLakeSource.tableChanges]]) and
  * the `readChangeFeed` streaming mode: stored `_cdc` sidecars,
  * layer-derived retract/assert pairs (range AND DV layers), the
  * loud refusal of an unrecorded rewrite, and exactly-once streaming
  * delivery across kill/restart. */
class CdcSpec extends SparkSpec {

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_cdc_spec").toString

  private def changes(root: String, from: Long, to: Long,
                      opts: (String, String)*) =
    GraftLakeSource.tableChanges(spark, root, from, to, opts.toMap)

  test("stored sidecars + synthesized first-version inserts compose into the windowed feed; a window excludes what it should") {
    val s = spark
    import s.implicits._
    val root = freshRoot()
    def put(mode: String, rows: (Long, Long, String)*): Unit =
      rows.toDF("k", "v", "pday").write.format("graftlake")
        .option("partitionColumn", "pday").option("changeFeed", "true")
        .mode(mode).save(root)
    put("overwrite", (1L, 10L, "a"), (2L, 20L, "b"))        // v1
    put("overwrite", (9L, 90L, "a"))                        // v2: rewrite a
    put("append", (7L, 70L, "b"))                           // v3
    val got = changes(root, 0L, 3L, "partitionColumn" -> "pday")
      .select("_commit_version", "_change_type", "k")
      .as[(Long, String, Long)].collect().sorted.toSeq
    assert(got === Seq(
      (1L, "insert", 1L), (1L, "insert", 2L),   // synthesized
      (2L, "insert", 9L), (2L, "remove", 1L),   // stored retract/assert
      (3L, "insert", 7L)),                      // stored append insert
      s"windowed feed diverged: $got")
    // a narrower window excludes v1 entirely
    assert(changes(root, 1L, 3L, "partitionColumn" -> "pday")
      .select("_commit_version").as[Long].collect().toSet === Set(2L, 3L))
    // a rewrite WITHOUT a sidecar refuses loudly — never fabricated
    val root2 = freshRoot()
    def putNoCdc(mode: String, rows: (Long, Long, String)*): Unit =
      rows.toDF("k", "v", "pday").write.format("graftlake")
        .option("partitionColumn", "pday").mode(mode).save(root2)
    putNoCdc("overwrite", (1L, 10L, "a"))
    putNoCdc("overwrite", (2L, 20L, "a"))
    val ex = intercept[IllegalArgumentException] {
      changes(root2, 0L, 2L, "partitionColumn" -> "pday").collect()
    }
    assert(ex.getMessage.contains("changeFeed"), ex.getMessage)
  }

  test("layer commits derive retract/assert pairs: range layers from domain pre-images, DV layers from mask semantics") {
    val s = spark
    import s.implicits._
    val root = freshRoot()
    (1L to 10L).map(k => (k, k * 10L)).toDF("k", "v")
      .repartition(1).write.parquet(s"$root/data/base")
    // v2: RANGE layer [2,4] — drops 3, updates 2 and 4
    Seq((2L, 200L), (4L, 400L)).toDF("k", "v")
      .repartition(1).write.parquet(s"$root/data/m1")
    // v3: DV layer — tombstones {5, 2}, rows = update 2→222, insert 11
    Seq(Tuple1(5L), Tuple1(2L)).toDF("k")
      .repartition(1).write.parquet(s"$root/data/dv/keys")
    Seq((2L, 222L), (11L, 110L)).toDF("k", "v")
      .repartition(1).write.parquet(s"$root/data/dv/rows")
    CommitLog.tryCommit(root, Entry("ingest", "ingest", "data/base",
      Seq("p1"), 0L))
    CommitLog.tryCommit(root, Entry("m1", "merge", "data/m1",
      Seq("p1"), 1L, keyDomains = Map("p1" -> Seq((2L, 4L)))))
    CommitLog.tryCommit(root, Entry("dv", "dv", "data/dv",
      Seq("p1"), 2L, keyDomains = Map("p1" -> Seq((2L, 11L)))))
    val got = changes(root, 1L, 3L, "keyColumn" -> "k")
      .select("_commit_version", "_change_type", "k", "v")
      .as[(Long, String, Long, Long)].collect().sorted.toSeq
    assert(got === Seq(
      // v2 range layer: pre {2,3,4} vs post {2,4}
      (2L, "remove", 3L, 30L),
      (2L, "update_post", 2L, 200L), (2L, "update_post", 4L, 400L),
      (2L, "update_pre", 2L, 20L), (2L, "update_pre", 4L, 40L),
      // v3 DV: tombstones {5,2} (pre-images at v2!), rows 2→222, 11 new
      (3L, "insert", 11L, 110L),
      (3L, "remove", 5L, 50L),
      (3L, "update_post", 2L, 222L),
      (3L, "update_pre", 2L, 200L)),  // pre-image is the V2 value
      s"layer-derived feed diverged: $got")
  }

  test("readChangeFeed STREAMING: paced delivery, kill/restart exactly-once") {
    val s = spark
    import s.implicits._
    val root = freshRoot()
    def put(mode: String, cdc: Boolean, rows: (Long, Long, String)*): Unit =
      rows.toDF("k", "v", "pday").write.format("graftlake")
        .option("partitionColumn", "pday")
        .option("changeFeed", cdc.toString).mode(mode).save(root)
    put("overwrite", cdc = false, (1L, 10L, "a"), (2L, 20L, "b")) // v1
    put("overwrite", cdc = true, (9L, 90L, "a"))                  // v2
    val ckpt = s"$root/_cdc_ckpt"
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[
      (Long, String, Long)]()
    def start() = s.readStream.format("graftlake")
      .option("root", root).option("partitionColumn", "pday")
      .option("readChangeFeed", "true")
      .option("maxVersionsPerTrigger", "1").load(root)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.select("_commit_version", "_change_type", "k")
          .as[(Long, String, Long)].collect().foreach(seen.add)
        ()
      }.start()
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    val drained = seen.toArray(Array.empty[(Long, String, Long)]).toSeq
    assert(drained.sorted === Seq(
      (1L, "insert", 1L), (1L, "insert", 2L),
      (2L, "insert", 9L), (2L, "remove", 1L)),
      s"the backlog must drain as change rows: $drained")
    // KILL; a change lands while down; RESTART delivers exactly it
    put("append", cdc = true, (7L, 70L, "b"))                     // v3
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val all = seen.toArray(Array.empty[(Long, String, Long)]).toSeq
    assert(all.size === 5 && all.count(_ == ((3L, "insert", 7L))) === 1,
      s"the restart must deliver v3's change exactly once: $all")
  }
}
