package graft.io

import graft.SparkSpec
import graft.ops.CommitLog
import graft.ops.CommitLog.Entry

/** The commit-feed source: batch reads serve the committed history
  * (aborted claims invisible), a streaming tail with checkpointed
  * offsets survives a kill/restart exactly-once, and latestOffset
  * never advances past an unresolved claim (the read-side
  * stable-version guarantee). */
class CommitFeedSpec extends SparkSpec {

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_feed_spec").toString

  test("batch read serves the committed feed; aborted claims never appear") {
    val s = spark
    import s.implicits._
    val root = freshRoot()
    CommitLog.tryCommit(root, Entry("w1", "ingest", "d/1",
      Seq("p1", "p2"), 0L))
    CommitLog.tryCommit(root, Entry("w2", "up", "d/2", Seq("p1"), 1L))
    intercept[CommitLog.CommitConflict] {
      CommitLog.tryCommit(root, Entry("late", "up", "d/3", Seq("p1"), 1L))
    }
    val rows = s.read.format("commitfeed").load(root)
      .select("version", "writer", "partition")
      .as[(Long, String, String)].collect().toSet
    assert(rows === Set((1L, "w1", "p1"), (1L, "w1", "p2"),
      (2L, "w2", "p1")))
    // the timestamp column carries the version-derived stamp
    val ts = s.read.format("commitfeed").load(root)
      .select("version", "ts").distinct()
      .as[(Long, Long)].collect().toMap
    assert(ts === Map(1L -> CommitLog.commitTimestamp(1L),
      2L -> CommitLog.commitTimestamp(2L)))
  }

  test("streaming tail with checkpointed offsets: kill/restart is exactly-once") {
    val s = spark
    val root = freshRoot()
    val ckpt = s"$root/engine_ckpt"
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, String)]()
    def start() = s.readStream.format("commitfeed").load(root)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.select("version", "writer", "partition").collect().foreach(r =>
          got.add((r.getLong(0), r.getString(1), r.getString(2))))
        ()
      }
      .start()
    CommitLog.tryCommit(root, Entry("w1", "ingest", "d/1", Seq("p1"), 0L))
    val q1 = start()
    try { q1.processAllAvailable() } finally q1.stop()
    assert(got.size === 1)
    // commits land while no stream is running; the restart resumes
    // from the checkpointed offset — nothing re-delivered, nothing lost
    CommitLog.tryCommit(root, Entry("w2", "up", "d/2", Seq("p2"), 1L))
    CommitLog.tryCommit(root, Entry("w3", "up", "d/3", Seq("p1"), 2L))
    val q2 = start()
    try { q2.processAllAvailable() } finally q2.stop()
    val all = got.toArray(Array.empty[(Long, String, String)]).toSeq
    assert(all.size === 3, s"exactly-once violated: $all")
    assert(all.toSet === Set((1L, "w1", "p1"), (2L, "w2", "p2"),
      (3L, "w3", "p1")))
  }

  test("maxVersionsPerTrigger paces the backlog: one version per micro-batch, nothing lost") {
    val s = spark
    val root = freshRoot()
    val ckpt = s"$root/engine_ckpt"
    // a three-commit BACKLOG exists before the stream ever starts
    CommitLog.tryCommit(root, Entry("w1", "ingest", "d/1", Seq("p1"), 0L))
    CommitLog.tryCommit(root, Entry("w2", "up", "d/2", Seq("p2"), 1L))
    CommitLog.tryCommit(root, Entry("w3", "up", "d/3", Seq("p3"), 2L))
    val batches =
      new java.util.concurrent.ConcurrentLinkedQueue[Seq[Long]]()
    val q = s.readStream.format("commitfeed")
      .option("maxVersionsPerTrigger", "1").load(root)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val vs = b.select("version").collect().map(_.getLong(0)).toSeq
        if (vs.nonEmpty) batches.add(vs)
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = batches.toArray(Array.empty[Seq[Long]]).toSeq
    assert(got === Seq(Seq(1L), Seq(2L), Seq(3L)),
      s"the backlog must drain one version per micro-batch, got $got")
  }

  test("latestOffset never advances past an unresolved claim — the read-side stable version") {
    val root = freshRoot()
    CommitLog.tryCommit(root, Entry("w1", "ingest", "d/1", Seq("p1"), 0L))
    // a stalled claim at slot 2 (entry written, never resolved)
    val w2 = new java.io.File(s"$root/commitlog/v2")
    assert(w2.mkdirs())
    java.nio.file.Files.writeString(
      new java.io.File(w2, "entry.tsv").toPath,
      "2\tstalled\top\td/stall\t1\tp9\n")
    // a disjoint writer lands at slot 3 — committed ABOVE the stall
    CommitLog.tryCommit(root, Entry("w3", "up", "d/3", Seq("p3"), 1L))
    val stream = new CommitFeedStream(root, 0L)
    assert(stream.latestOffset().asInstanceOf[CommitFeedOffset].v === 1L,
      "the offset must hold below the unresolved slot — advancing " +
        "past it would skip its later commit forever")
    assert(spark.read.format("commitfeed").load(root).count() === 1L)
    // the stall resolves (aborted): the feed releases v3, skipping
    // the aborted slot as a gap
    assert(CommitLog.abortOrphan(root, 2L))
    assert(stream.latestOffset().asInstanceOf[CommitFeedOffset].v === 3L)
    val vs = spark.read.format("commitfeed").load(root)
      .select("version").collect().map(_.getLong(0)).sorted.toSeq
    assert(vs === Seq(1L, 3L))
  }

  test("DATA-PLANE replica through the feed: foreachBatch joins data_path to storage and maintains a derived table bit-equal to the batch recompute after EVERY micro-batch and across a kill/restart") {
    val s = spark
    import s.implicits._
    val root = freshRoot()
    val ckpt = s"$root/_feed_ckpt"
    // the storage tier: pday-partitioned parquet generations the feed
    // rows' data_path points at (the same layout graftlake serves)
    def stage(path: String, rows: Seq[(Long, Long, String)]): Unit =
      rows.toDF("k", "v", "pday").repartition(1)
        .write.partitionBy("pday").mode("overwrite")
        .parquet(s"$root/$path")
    stage("data/ingest", for {
      p <- Seq("a", "b", "c"); k <- 1L to 4L
    } yield (k, k * 10L, p))
    stage("data/w2", Seq((1L, 111L, "a"), (3L, 333L, "a")))
    stage("data/w3", Seq((9L, 900L, "b")))
    stage("data/w4", Seq((7L, 700L, "c"), (8L, 800L, "c")))
    CommitLog.tryCommit(root, Entry("ingest", "ingest", "data/ingest",
      Seq("a", "b", "c"), 0L))
    // THE CONSUMER: an incremental replica table — per micro-batch,
    // only the partitions the feed names are re-read (newest version
    // wins within the batch) and rewritten into the replica; cold
    // partitions are never touched (the 100 TB shape: maintenance
    // cost is commit-proportional, not table-proportional)
    val replicaDir = s"$root/replica"
    val applied =
      new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    @volatile var maxApplied = 0L
    def startFeed() = s.readStream.format("commitfeed")
      .option("maxVersionsPerTrigger", "1").load(root)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = b.select("version", "data_path", "partition")
          .as[(Long, String, String)].collect()
        // newest owner per partition within the batch
        rows.groupBy(_._3).foreach { case (p, vs) =>
          val (v, dp, _) = vs.maxBy(_._1)
          s.read.parquet(s"$root/$dp/pday=$p")
            .write.mode("overwrite").parquet(s"$replicaDir/pday=$p")
          applied.add((v, p)); ()
        }
        if (rows.nonEmpty)
          maxApplied = math.max(maxApplied, rows.map(_._1).max)
        ()
      }.start()
    def replicaRows(): Set[(Long, Long, String)] =
      new java.io.File(replicaDir).listFiles().toSeq
        .filter(_.getName.startsWith("pday="))
        .flatMap { d =>
          val p = d.getName.drop("pday=".length)
          s.read.parquet(d.getPath).select("k", "v")
            .as[(Long, Long)].collect().map { case (k, v) => (k, v, p) }
        }.toSet
    // the batch recompute the replica must equal: the graftlake read
    // at the applied version
    def truth(v: Long): Set[(Long, Long, String)] =
      s.read.format("graftlake").option("partitionColumn", "pday")
        .option("versionAsOf", s"$v").load(root)
        .select("k", "v", "pday").as[(Long, Long, String)]
        .collect().toSet
    val q1 = startFeed()
    try {
      q1.processAllAvailable()
      assert(replicaRows() === truth(1L))
      // live commits while the stream runs — checked after EVERY batch
      CommitLog.tryCommit(root, Entry("w2", "rewrite", "data/w2",
        Seq("a"), 1L))
      q1.processAllAvailable()
      assert(maxApplied === 2L)
      assert(replicaRows() === truth(2L),
        "replica diverged from the batch recompute after v2")
    } finally q1.stop()
    // KILL/RESTART: two commits land while the consumer is down; the
    // checkpointed offset resumes exactly-once (no partition applied
    // twice for one version, nothing skipped)
    CommitLog.tryCommit(root, Entry("w3", "rewrite", "data/w3",
      Seq("b"), 2L))
    CommitLog.tryCommit(root, Entry("w4", "rewrite", "data/w4",
      Seq("c"), 3L))
    val q2 = startFeed()
    try {
      q2.processAllAvailable()
      assert(replicaRows() === truth(4L),
        "replica diverged after the kill/restart catch-up")
    } finally q2.stop()
    val applies = applied.toArray(Array.empty[(Long, String)]).toSeq
    assert(applies.sorted === applies.distinct.sorted,
      s"a (version, partition) was applied twice across the restart: " +
        s"${applies.diff(applies.distinct)}")
    assert(applies.map(_._1).max === 4L && maxApplied >= 2L)
    // and the replica's partition 'b' was rewritten exactly twice
    // (ingest + w3) — cold partitions never re-applied per commit
    assert(applies.count(_._2 == "b") === 2,
      s"partition b applied ${applies.count(_._2 == "b")} times — " +
        "maintenance must be commit-proportional")
  }

  test("an offset below the expiry horizon fails LOUDLY instead of replaying expired commits as nothing") {
    val root = freshRoot()
    CommitLog.tryCommit(root, Entry("w1", "ingest", "d/1", Seq("p1"), 0L))
    CommitLog.tryCommit(root, Entry("w2", "up", "d/2", Seq("p1"), 1L))
    CommitLog.checkpoint(root)
    CommitLog.expireBelow(root, 2L)
    CommitLog.tryCommit(root, Entry("w3", "up", "d/3", Seq("p1"), 2L))
    // default startingversion=0 reaches below the horizon: the slots
    // in (0, 2] are physically gone — silent empty replay would look
    // like "no commits happened"; it must throw instead (the
    // resolveAsOf below-horizon contract, applied to the feed)
    val ex = intercept[Exception] {
      spark.read.format("commitfeed").load(root).collect()
    }
    def horizonMsg(t: Throwable): Boolean =
      t != null && (Option(t.getMessage).exists(_.contains("horizon")) ||
        horizonMsg(t.getCause))
    assert(horizonMsg(ex), s"expected the horizon refusal, got $ex")
    // starting AT the horizon serves the live suffix
    val vs = spark.read.format("commitfeed")
      .option("startingversion", "2").load(root)
      .select("version").collect().map(_.getLong(0)).toSeq
    assert(vs === Seq(3L))
  }
}
