package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** The exactly-once micro-batch sink: re-deliveries are skipped
  * before staging, duplicate racers yield one application, and the
  * idempotence watermark survives checkpoint + physical history
  * expiry. Pure metadata — no Spark session needed. */
class StreamCommitSpec extends AnyFunSuite {

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_strc_spec").toString

  test("a re-delivered batch is skipped BEFORE staging; new batches apply in order") {
    val root = freshRoot()
    var staged = 0
    def deliver(bid: Long) =
      StreamCommit.commitBatch(root, "s1", bid,
        () => { staged += 1; (s"data/b$bid", Seq(s"p$bid")) })
    assert(deliver(0L) === Some(1L))
    assert(deliver(1L) === Some(2L))
    assert(deliver(2L) === Some(3L))
    assert(staged === 3)
    // the crash-window re-delivery: skipped, stage() NEVER called
    assert(deliver(1L) === None)
    assert(staged === 3, "a skipped re-delivery must not stage data")
    assert(StreamCommit.lastCommittedBatch(root, "s1") === Some(2L))
    // a different stream's identity space is independent
    assert(StreamCommit.lastCommittedBatch(root, "s2") === None)
    assert(StreamCommit.commitBatch(root, "s2", 1L,
      () => ("data/s2b1", Seq("q1"))) === Some(4L))
    assert(CommitLog.committedVersions(root) === Seq(1L, 2L, 3L, 4L))
  }

  test("duplicate racers on one batch: exactly one application, loser skips") {
    val root = freshRoot()
    val applied = new java.util.concurrent.atomic.AtomicInteger(0)
    val skipped = new java.util.concurrent.atomic.AtomicInteger(0)
    val ths = (1 to 2).map { i =>
      new Thread(() =>
        StreamCommit.commitBatch(root, "s1", 0L,
          () => (s"data/b0_attempt$i", Seq("p0"))) match {
          case Some(_) => applied.incrementAndGet(); ()
          case None => skipped.incrementAndGet(); ()
        })
    }
    ths.foreach(_.start()); ths.foreach(_.join())
    assert(applied.get === 1 && skipped.get === 1,
      "exactly one duplicate delivery must win")
    assert(CommitLog.committedVersions(root).size === 1)
    // the loser's orphaned staging path is named by an aborted entry
    // (if it raced far enough to claim) — sweepable, never live
    assert(StreamCommit.lastCommittedBatch(root, "s1") === Some(0L))
  }

  test("a losing duplicate's attempt-unique staging is reclaimed by the orphan sweep") {
    val root = freshRoot()
    def mk(rel: String): String = {
      val d = new java.io.File(root, rel)
      d.mkdirs()
      java.nio.file.Files.writeString(
        new java.io.File(d, "part-0").toPath, "x")
      rel
    }
    // two duplicate deliveries staged at attempt-unique paths race
    val applied = new java.util.concurrent.atomic.AtomicInteger(0)
    val ths = (1 to 2).map { i =>
      new Thread(() =>
        StreamCommit.commitBatch(root, "s1", 0L,
          () => (mk(s"staging/b0_attempt$i"), Seq("p0"))) match {
          case Some(_) => applied.incrementAndGet(); ()
          case None => ()
        })
    }
    ths.foreach(_.start()); ths.foreach(_.join())
    assert(applied.get === 1)
    // the loser that got far enough to CLAIM left an aborted entry
    // naming its staging; the sweep reclaims exactly that, keeping
    // the winner's files (a loser that skipped before claiming leaves
    // no entry — the documented age-based-retention case — in which
    // case the sweep legitimately returns empty)
    val winner = CommitLog.readLog(root).head._2.dataPath
    val swept = CommitLog.sweepOrphanStaging(root)
    assert(!swept.contains(winner), "the winner's staging was swept")
    assert(new java.io.File(root, winner).exists())
    swept.foreach(p =>
      assert(!new java.io.File(root, p).exists(), s"$p not deleted"))
  }

  test("the watermark survives checkpoint + expireBelow — re-delivery of an EXPIRED batch still skips") {
    val root = freshRoot()
    def deliver(bid: Long) =
      StreamCommit.commitBatch(root, "s1", bid,
        () => (s"data/b$bid", Seq(s"p$bid")))
    assert(deliver(0L) === Some(1L))
    assert(deliver(1L) === Some(2L))
    assert(CommitLog.checkpoint(root) === 2L)
    assert(CommitLog.expireBelow(root, 2L) === Seq(1L, 2L))
    // the slots that carried stream:0/stream:1 are physically gone,
    // yet the checkpoint's #txn fold still knows the high-water mark
    assert(StreamCommit.lastCommittedBatch(root, "s1") === Some(1L))
    assert(deliver(1L) === None)
    assert(deliver(0L) === None)
    // and a genuinely new batch still lands, numbering monotone
    assert(deliver(2L) === Some(3L))
    // a SECOND checkpoint cycle carries the fold forward
    assert(CommitLog.checkpoint(root) === 3L)
    assert(CommitLog.expireBelow(root, 3L) === Seq(3L))
    assert(StreamCommit.lastCommittedBatch(root, "s1") === Some(2L))
    assert(deliver(2L) === None)
  }

  test("composition: a micro-batch flips TWO tables atomically with exactly-once identity") {
    // StreamCommit × MultiTableCommit: the batch's entry names the
    // tier set as its partitions and a tier manifest as its dataPath,
    // so one commit carries the fact append, the derived aggregate,
    // AND the (streamId, batchId) identity — a re-delivered batch
    // skips BOTH tables; a crash between tier writes publishes
    // NEITHER (the spanning entry never committed).
    val root = freshRoot()
    def deliver(bid: Long): Option[Long] =
      StreamCommit.commitBatch(root, "s1", bid, () => {
        val mPath = s"manifests/b$bid.tsv"
        val f = new java.io.File(root, mPath)
        f.getParentFile.mkdirs()
        java.nio.file.Files.writeString(f.toPath,
          s"t.agg\tdata/agg_b$bid\nt.fact\tdata/fact_b$bid\n")
        (mPath, Seq("t.fact", "t.agg"))
      })
    assert(deliver(0L) === Some(1L))
    assert(deliver(1L) === Some(2L))
    // re-delivery: NEITHER tier re-flips
    assert(deliver(1L) === None)
    val tiers = MultiTableCommit.resolveTiers(root)
    assert(tiers("t.fact") === (2L, "data/fact_b1"))
    assert(tiers("t.agg") === (2L, "data/agg_b1"))
    // crash between tier writes: manifest staged, claim unresolved —
    // readers of BOTH tiers stay on batch 1
    java.nio.file.Files.writeString(
      new java.io.File(root, "manifests/b2.tsv").toPath,
      "t.agg\tdata/agg_b2\nt.fact\tdata/fact_b2\n")
    val claim = new java.io.File(s"$root/commitlog/v3")
    assert(claim.mkdirs())
    java.nio.file.Files.writeString(
      new java.io.File(claim, "entry.tsv").toPath,
      "3\ts1\tstream:2\tmanifests/b2.tsv\t2\tt.agg,t.fact\n")
    val after = MultiTableCommit.resolveTiers(root)
    assert(after("t.fact")._2 === "data/fact_b1" &&
      after("t.agg")._2 === "data/agg_b1",
      "a torn multi-table batch leaked to readers")
    // and the batch is NOT considered delivered (entry never
    // committed): after the janitor aborts the orphan, a retry lands
    assert(StreamCommit.lastCommittedBatch(root, "s1") === Some(1L))
    assert(CommitLog.abortOrphan(root, 3L))
    assert(deliver(2L) === Some(4L))
    assert(MultiTableCommit.resolveTiers(root)("t.agg")._2
      === "data/agg_b2")
  }

  test("a stage() returning NO partitions is refused — empty batches need a sentinel partition") {
    val root = freshRoot()
    // an empty partition set has no write-write conflict surface: two
    // racing duplicate deliveries of one batch could BOTH commit,
    // landing two stream: entries — the guard forces a sentinel
    intercept[IllegalArgumentException] {
      StreamCommit.commitBatch(root, "s1", 0L, () => ("data/b0", Nil))
    }
    assert(CommitLog.committedVersions(root).isEmpty,
      "the refused empty batch must not have committed")
    // the sentinel shape works and keeps the conflict surface
    assert(StreamCommit.commitBatch(root, "s1", 0L,
      () => ("data/b0", Seq("empty_s1"))) === Some(1L))
    assert(StreamCommit.commitBatch(root, "s1", 0L,
      () => ("data/b0", Seq("empty_s1"))) === None)
  }

  test("base-aware staging re-derives on rebase — a rival landing between staging and commit is never overwritten") {
    val root = freshRoot()
    CommitLog.tryCommit(root,
      CommitLog.Entry("ingest", "ingest", "data/v1", Seq("p0"), 0L))
    // a read-modify-write sink stages content derived FROM its base;
    // retrying a conflict with the same staged data would commit the
    // stale union and silently drop the rival's rows — stageAt must
    // be re-invoked at the new base
    val basesSeen = scala.collection.mutable.Buffer[Long]()
    var rivalDone = false
    val v = StreamCommit.commitBatchRebasing(root, "s1", 0L, base => {
      basesSeen += base
      if (!rivalDone) { // the rival lands AFTER our staging read
        CommitLog.tryCommit(root, CommitLog.Entry("rival", "append",
          "data/rival", Seq("p0"), base))
        rivalDone = true
      }
      (s"data/s1_b0_r$base", Seq("p0"))
    })
    assert(basesSeen.toSeq === Seq(1L, 2L),
      "the rebase must re-stage at the rival's committed base")
    assert(v === Some(4L)) // rival v2, our aborted claim v3, commit v4
    assert(CommitLog.resolvePartitions(root)("p0") ===
      (4L, "data/s1_b0_r2"),
      "the committed content must be the one derived at the new base")
  }

  test("a genuine partition conflict with an OUTSIDE writer rebases and lands") {
    val root = freshRoot()
    CommitLog.tryCommit(root,
      CommitLog.Entry("ingest", "ingest", "data/ing", Seq("p0"), 0L))
    // the sink's batch touches p0 — no conflict from a fresh base
    assert(StreamCommit.commitBatch(root, "s1", 0L,
      () => ("data/b0", Seq("p0"))) === Some(2L))
    // checkpoint readers see the stream entry like any commit
    assert(CommitLog.resolvePartitions(root)("p0") === (2L, "data/b0"))
  }
}
