package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.CommitLog.{CommitConflict, Entry}

/** The optimistic-concurrency commit protocol: two REAL threads racing
  * the same slot must both land when their partitions are disjoint
  * (the loser re-claims the next slot); an overlapping writer from a
  * stale snapshot must be rejected loudly; a crashed claim must be
  * invisible to readers and recoverable; resolution must hand each
  * partition to its newest committed owner. Pure metadata — no Spark
  * session needed. */
class CommitLogSpec extends AnyFunSuite {

  private def freshRoot(): String = {
    val r = java.nio.file.Files
      .createTempDirectory("graft_clog_spec").toString
    r
  }

  test("two racing writers with disjoint partitions BOTH land, at distinct versions") {
    val root = freshRoot()
    CommitLog.tryCommit(root,
      Entry("ingest", "ingest", "data/ingest", Seq("p1", "p2", "p3"), 0L))
    // both prepare from the SAME snapshot v1 and race the same slot;
    // the barrier maximizes the chance they hit mkdir together
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val results = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = Seq(
      ("a", Seq("p1")), ("b", Seq("p3"))).map { case (w, parts) =>
      new Thread(() => {
        try {
          barrier.await()
          results.put(w,
            CommitLog.tryCommit(root, Entry(w, "op", s"data/$w", parts, 1L)))
        } catch { case t: Throwable => errs.add(t) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"disjoint racer failed: ${errs.peek()}")
    val va = results.get("a"); val vb = results.get("b")
    assert(Set(va, vb) === Set(2L, 3L),
      s"racers landed at ($va,$vb) — expected exactly slots 2 and 3")
    assert(CommitLog.committedVersions(root) === Seq(1L, 2L, 3L))
  }

  test("an overlapping writer from a stale snapshot is rejected and leaves no commit") {
    val root = freshRoot()
    CommitLog.tryCommit(root,
      Entry("ingest", "ingest", "data/ingest", Seq("p1", "p2"), 0L))
    CommitLog.tryCommit(root,
      Entry("w1", "update", "data/w1", Seq("p1"), 1L))
    val e = intercept[CommitConflict] {
      CommitLog.tryCommit(root,
        Entry("w2", "update", "data/w2", Seq("p1", "p2"), 1L))
    }
    assert(e.getMessage.contains("w1") && e.getMessage.contains("rebase"))
    assert(CommitLog.committedVersions(root) === Seq(1L, 2L),
      "a rejected commit must leave the log unchanged")
    // the rejection is partition-precise: p2 alone (untouched by w1)
    // commits fine from the same stale snapshot
    val v = CommitLog.tryCommit(root,
      Entry("w3", "update", "data/w3", Seq("p2"), 1L))
    assert(v > 2L)
  }

  test("many concurrent disjoint writers all land exactly once") {
    val root = freshRoot()
    CommitLog.tryCommit(root, Entry("ingest", "ingest", "data/ingest",
      (1 to 8).map(i => s"p$i"), 0L))
    val barrier = new java.util.concurrent.CyclicBarrier(8)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 8).map { i =>
      new Thread(() => {
        try {
          barrier.await()
          results.add(CommitLog.tryCommit(root,
            Entry(s"w$i", "op", s"data/w$i", Seq(s"p$i"), 1L)))
        } catch { case t: Throwable => errs.add(t) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"a disjoint writer failed: ${errs.peek()}")
    import scala.jdk.CollectionConverters._
    val vs = results.asScala.toSeq.sorted
    assert(vs === (2L to 9L),
      s"8 disjoint writers must land at slots 2..9, got $vs")
  }

  test("a crashed claim is invisible to readers and recoverable") {
    val root = freshRoot()
    CommitLog.tryCommit(root,
      Entry("ingest", "ingest", "data/ingest", Seq("p1"), 0L))
    // simulate a crash mid-commit: a claim dir without _COMMIT
    val orphan = new java.io.File(s"$root/commitlog/v2")
    assert(orphan.mkdirs())
    java.nio.file.Files.writeString(
      new java.io.File(orphan, "entry.tsv").toPath,
      "2\tdead\top\tdata/dead\t1\tp1\n")
    assert(CommitLog.committedVersions(root) === Seq(1L),
      "readers must not see an uncommitted claim")
    assert(CommitLog.resolvePartitions(root)("p1")._1 === 1L)
    // a live writer touching the SAME partition conservatively
    // conflicts with the unresolved claim (it might still commit) ...
    intercept[CommitConflict] {
      CommitLog.tryCommit(root,
        Entry("w", "op", "data/w", Seq("p1"), 1L))
    }
    CommitLog.purgeAborted(root)
    // ... until the janitor marks the orphan aborted, which releases it
    assert(CommitLog.abortOrphan(root, 2L))
    val v = CommitLog.tryCommit(root,
      Entry("w", "op", "data/w", Seq("p1"), 1L))
    // v3 was the rejected writer's abort tombstone; the purge-guard
    // keeps it (it was the highest slot), so the retry lands at v4 —
    // aborted slot numbers are NEVER reused
    assert(v === 4L)
    assert(CommitLog.committedVersions(root) === Seq(1L, 4L),
      "history keeps the gaps — aborted slot numbers are never reused")
  }

  test("a janitor aborting a LIVE slow committer wins atomically — the writer throws, no slot is committed-to-readers yet invisible-to-validation") {
    val root = freshRoot()
    CommitLog.tryCommit(root,
      Entry("ingest", "ingest", "data/ingest", Seq("p1", "p2"), 0L))
    // an in-flight rival claim with NO entry yet (a writer between
    // mkdir and its entry write): the slow committer will poll it for
    // up to ~1 s — a deterministic window to race the janitor into
    val stall = new java.io.File(s"$root/commitlog/v2")
    assert(stall.mkdirs())
    val outcome = new java.util.concurrent.atomic.AtomicReference[String]()
    val t = new Thread(() => {
      try {
        val v = CommitLog.tryCommit(root,
          Entry("slow", "op", "data/slow", Seq("p2"), 1L))
        outcome.set(s"committed v$v")
      } catch {
        case e: CommitConflict => outcome.set(s"conflict: ${e.getMessage}")
      }
    })
    t.start()
    // wait until the slow writer has CLAIMED v3 (it then polls v2 for
    // ~1 s) — a fixed sleep loses to suite-level CPU contention
    var waits = 0
    while (!new java.io.File(s"$root/commitlog/v3").exists() &&
      waits < 1000) { Thread.sleep(5); waits += 1 }
    assert(new java.io.File(s"$root/commitlog/v3").exists(),
      "slow writer never claimed its slot")
    // janitor can't distinguish crashed from live-but-slow: it aborts
    // the LIVE claim v3 — the exact hole the atomic _RESOLVED closes
    assert(CommitLog.abortOrphan(root, 3L),
      "janitor must win the resolution while the writer is stalled")
    CommitLog.abortOrphan(root, 2L) // release the writer's poll
    t.join(15000)
    assert(outcome.get != null && outcome.get.startsWith("conflict"),
      s"the aborted writer must THROW, not report success: ${outcome.get}")
    // readers and validators agree: v3 is aborted everywhere
    assert(CommitLog.committedVersions(root) === Seq(1L))
    assert(CommitLog.resolvePartitions(root)("p2")._1 === 1L)
    // and the slot is released for rivals — p2 commits cleanly now
    val v = CommitLog.tryCommit(root,
      Entry("w", "op", "data/w", Seq("p2"), 1L))
    assert(v === 4L)
  }

  test("abortOrphan LOSES to a writer that already resolved — a committed slot can never be flipped") {
    val root = freshRoot()
    CommitLog.tryCommit(root,
      Entry("ingest", "ingest", "data/ingest", Seq("p1"), 0L))
    assert(!CommitLog.abortOrphan(root, 1L),
      "aborting a committed slot must be a no-op")
    assert(CommitLog.committedVersions(root) === Seq(1L))
  }

  test("purgeAborted keeps the highest slot and any abort with an unresolved later slot; purges only fully-shadowed aborts") {
    val root = freshRoot()
    CommitLog.tryCommit(root,
      Entry("ingest", "ingest", "data/ingest", Seq("p1"), 0L))
    // v2: aborted tombstone
    val v2 = new java.io.File(s"$root/commitlog/v2"); assert(v2.mkdirs())
    assert(CommitLog.abortOrphan(root, 2L))
    // v3: unresolved in-flight claim
    val v3 = new java.io.File(s"$root/commitlog/v3"); assert(v3.mkdirs())
    CommitLog.purgeAborted(root)
    assert(v2.exists(),
      "an abort with an UNRESOLVED later slot must not be purged — " +
        "its conflict window is still open")
    assert(CommitLog.abortOrphan(root, 3L))
    CommitLog.purgeAborted(root)
    assert(!v2.exists(), "fully-shadowed abort must be purged")
    assert(v3.exists(),
      "the HIGHEST slot is never purged — purging it would let " +
        "tryCommit's max+1 reuse the slot number")
    // and indeed the next commit lands at v4, not a reused v3
    val v = CommitLog.tryCommit(root,
      Entry("w", "op", "data/w", Seq("p1"), 1L))
    assert(v === 4L)
  }

  test("resolveAsOf(v) after later commits is bit-identical to the pre-commit read") {
    val root = freshRoot()
    CommitLog.tryCommit(root, Entry("ingest", "ingest", "data/ingest",
      Seq("p1", "p2", "p3"), 0L))
    val atV1 = CommitLog.resolvePartitions(root)
    CommitLog.tryCommit(root, Entry("w1", "op", "data/w1", Seq("p1"), 1L))
    CommitLog.tryCommit(root, Entry("w2", "op", "data/w2", Seq("p3"), 1L))
    assert(CommitLog.resolveAsOf(root, 1L) === atV1,
      "snapshot isolation: v1's view must not move when v2/v3 land")
    assert(CommitLog.resolveAsOf(root, 2L)("p1") === (2L, "data/w1"))
    assert(CommitLog.resolveAsOf(root, 2L)("p3") === (1L, "data/ingest"))
    assert(CommitLog.resolveAsOf(root, Long.MaxValue) ===
      CommitLog.resolvePartitions(root))
  }

  test("stress: 12 writers over 4 partitions + a janitor — every reported outcome matches reader visibility, one owner per partition") {
    val root = freshRoot()
    CommitLog.tryCommit(root, Entry("ingest", "ingest", "data/ingest",
      (1 to 4).map(i => s"p$i"), 0L))
    val barrier = new java.util.concurrent.CyclicBarrier(13)
    val committed =
      new java.util.concurrent.ConcurrentHashMap[String, Long]()
    val conflicted =
      new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    // 12 writers, 3 per partition — heavy deliberate overlap
    val writers = (1 to 12).map { i =>
      val w = s"w$i"
      new Thread(() => {
        try {
          barrier.await()
          committed.put(w, CommitLog.tryCommit(root,
            Entry(w, "op", s"data/$w", Seq(s"p${1 + (i % 4)}"), 1L)))
        } catch {
          case _: CommitConflict => conflicted.add(w)
          case t: Throwable => errs.add(t)
        }
      })
    }
    // a janitor sweeping every slot it can see, repeatedly — it may
    // abort LIVE slow writers; the protocol must stay consistent
    val janitor = new Thread(() => {
      try {
        barrier.await()
        for (_ <- 1 to 30) {
          (2L to 20L).foreach(v => CommitLog.abortOrphan(root, v))
          Thread.sleep(3)
        }
      } catch { case t: Throwable => errs.add(t) }
    })
    (writers :+ janitor).foreach(_.start())
    (writers :+ janitor).foreach(_.join())
    assert(errs.isEmpty, s"protocol error: ${errs.peek()}")
    assert(committed.size + conflicted.size === 12,
      "every writer must resolve to exactly one outcome")
    // INVARIANT 1: reported outcomes == reader visibility, exactly
    import scala.jdk.CollectionConverters._
    val visible = CommitLog.committedVersions(root).toSet
    for ((w, v) <- committed.asScala)
      assert(visible(v), s"$w reported v$v committed but readers skip it")
    assert(visible.size === committed.size + 1,
      "a slot is visible that no successful writer owns")
    // INVARIANT 2: one owner per partition, and it is a real winner
    val owners = CommitLog.resolvePartitions(root)
    assert(owners.keySet === (1 to 4).map(i => s"p$i").toSet)
    for ((_, (v, _)) <- owners) assert(visible(v))
    // INVARIANT 3: committed writers per partition never overlap —
    // each partition's committed history beyond the ingest is a chain
    // of non-concurrent versions (they all claimed base v1, so at
    // most ONE overlapping writer may have won per partition)
    val byPart = CommitLog.readLog(root).drop(1)
      .flatMap { case (v, e) => e.partitions.map(_ -> v) }
      .groupBy(_._1).view.mapValues(_.size)
    for ((p, n) <- byPart)
      assert(n <= 1, s"$p committed $n same-snapshot overlapping writers")
  }

  test("commitWithRebase: two overlapping writers BOTH land — the loser re-derives against the winner's commit") {
    val root = freshRoot()
    CommitLog.tryCommit(root,
      Entry("ingest", "ingest", "data/ingest", Seq("p1"), 0L))
    // each writer's prepare() records the base it derived against —
    // a REBASE must re-read, so the loser's final entry must name the
    // winner's version as its base, not the stale snapshot
    val basesSeen =
      new java.util.concurrent.ConcurrentHashMap[String, java.util.List[Long]]()
    def prepareFor(w: String)(base: Long): Entry = {
      basesSeen.computeIfAbsent(w,
        _ => new java.util.concurrent.CopyOnWriteArrayList[Long]()).add(base)
      Entry(w, "op", s"data/$w@v$base", Seq("p1"), base)
    }
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val landed = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = Seq("a", "b").map { w =>
      new Thread(() => {
        try {
          barrier.await()
          landed.put(w, CommitLog.commitWithRebase(root, prepareFor(w)))
        } catch { case t: Throwable => errs.add(t) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"rebase loop failed: ${errs.peek()}")
    assert(landed.size === 2, "both overlapping writers must land via rebase")
    val log = CommitLog.readLog(root)
    assert(log.size === 3)
    // the second landing's committed entry is based on the first's
    // version: the rebase genuinely re-derived
    val Seq(_, first, second) = log.map(_._2)
    assert(second.baseVersion === log(1)._1,
      s"rebased commit must base on the winner's version, " +
        s"got base v${second.baseVersion}")
    assert(second.dataPath.endsWith(s"@v${log(1)._1}"),
      "rebased commit must carry data STAGED against the new base")
    assert(first.baseVersion === 1L)
    // whether the loser hit a conflict (raced) or serialized behind
    // the winner, its FINAL derivation must be against the winner's
    // version — stale staged data can never land
    import scala.jdk.CollectionConverters._
    val loser = second.writer
    assert(basesSeen.get(loser).asScala.toSeq.last === log(1)._1,
      "the loser's final prepare must target the moved base")
    // resolution serves the rebased (newest) commit
    assert(CommitLog.resolvePartitions(root)("p1")._1 === log(2)._1)
  }

  test("checkpoint + expireBelow: resolution identical, numbering monotone, asOf below the horizon fails loudly") {
    val root = freshRoot()
    CommitLog.tryCommit(root, Entry("ingest", "ingest", "data/ingest",
      Seq("p1", "p2", "p3"), 0L))
    CommitLog.tryCommit(root, Entry("w1", "op", "data/w1", Seq("p1"), 1L))
    CommitLog.tryCommit(root, Entry("w2", "op", "data/w2", Seq("p2"), 2L))
    val before = CommitLog.resolvePartitions(root)
    // expiry without a covering checkpoint refuses
    intercept[IllegalArgumentException] { CommitLog.expireBelow(root, 3L) }
    assert(CommitLog.checkpoint(root) === 3L)
    // below-checkpoint asOf still works while the slots remain
    assert(CommitLog.resolveAsOf(root, 2L)("p1")._1 === 2L)
    assert(CommitLog.expireBelow(root, 3L) === Seq(1L, 2L, 3L))
    // the folded view is bit-identical though every slot is gone
    assert(CommitLog.resolvePartitions(root) === before)
    assert(CommitLog.readLog(root).isEmpty)
    assert(CommitLog.latestCommitted(root) === 3L)
    // history below the horizon fails LOUDLY, never silently partial
    intercept[IllegalStateException] { CommitLog.resolveAsOf(root, 2L) }
    // numbering is seeded past the checkpoint: no slot reuse
    val v = CommitLog.tryCommit(root,
      Entry("w3", "op", "data/w3", Seq("p3"), 3L))
    assert(v === 4L)
    val owners = CommitLog.resolvePartitions(root)
    assert(owners("p3") === (4L, "data/w3"),
      "post-expiry commits overlay the checkpoint")
    assert(owners("p1") === before("p1"),
      "untouched partitions resolve from the checkpoint")
    // a second checkpoint folds checkpoint + tail
    assert(CommitLog.checkpoint(root) === 4L)
    assert(CommitLog.resolveAsOf(root, 4L) === owners)
  }

  test("a torn checkpoint is ignored; checkpoint caps at the stable prefix; expiry refuses over an in-flight claim") {
    val root = freshRoot()
    CommitLog.tryCommit(root,
      Entry("ingest", "ingest", "data/ingest", Seq("p1"), 0L))
    // torn checkpoint: no #end trailer — must be unusable
    java.nio.file.Files.writeString(
      new java.io.File(s"$root/commitlog/ckpt_v1.tsv").toPath,
      "1\np1\t1\tdata/ing")
    intercept[IllegalArgumentException] { CommitLog.expireBelow(root, 1L) }
    assert(CommitLog.resolvePartitions(root)("p1")._1 === 1L,
      "resolution must fall back to the raw log past a torn checkpoint")
    // an unresolved in-flight claim WITH an entry (a stalled writer,
    // undecided): disjoint commits proceed past it, but checkpoint
    // must not fold over it — it may still commit at its lower slot
    val stall = new java.io.File(s"$root/commitlog/v2")
    assert(stall.mkdirs())
    java.nio.file.Files.writeString(
      new java.io.File(stall, "entry.tsv").toPath,
      "2\tstall\top\tdata/stall\t1\tpX\n")
    CommitLog.tryCommit(root, Entry("w", "op", "data/w", Seq("p9"), 1L))
    assert(CommitLog.latestCommitted(root) === 3L)
    assert(CommitLog.checkpoint(root) === 1L,
      "checkpoint must cap at the stable prefix, never fold past an " +
        "unresolved claim")
    // even a (hand-forged) covering checkpoint can't push expiry over
    // the unresolved claim — expireBelow has its own guard
    java.nio.file.Files.writeString(
      new java.io.File(s"$root/commitlog/ckpt_v3.tsv").toPath,
      "3\np1\t1\tdata/ingest\np9\t3\tdata/w\n#end\n")
    intercept[IllegalArgumentException] { CommitLog.expireBelow(root, 3L) }
    new java.io.File(s"$root/commitlog/ckpt_v3.tsv").delete()
    // once the janitor resolves the stall, checkpoint + expiry proceed
    assert(CommitLog.abortOrphan(root, 2L))
    assert(CommitLog.checkpoint(root) === 3L)
    assert(CommitLog.expireBelow(root, 3L) === Seq(1L, 2L, 3L))
    assert(CommitLog.resolvePartitions(root)("p9")._1 === 3L)
  }

  test("checkpoint never folds past an unresolved claim — a late-committing lower slot stays in the fold") {
    val root = freshRoot()
    CommitLog.tryCommit(root, Entry("ingest", "ingest", "data/ingest",
      Seq("p1", "p2"), 0L))
    // W1 claims slot 2 touching p1 and stalls undecided
    val w1 = new java.io.File(s"$root/commitlog/v2")
    assert(w1.mkdirs())
    java.nio.file.Files.writeString(
      new java.io.File(w1, "entry.tsv").toPath,
      "2\tw1\top\tdata/w1\t1\tp1\n")
    // a disjoint writer lands at v3
    CommitLog.tryCommit(root, Entry("w2", "op", "data/w2", Seq("p2"), 1L))
    // the old checkpoint(latestCommitted) would fold v3 here and lose
    // W1's commit forever once expiry swept slot 2
    assert(CommitLog.checkpoint(root) === 1L)
    // W1 now COMMITS (late, at its lower slot)
    java.nio.file.Files.writeString(
      new java.io.File(w1, "_RESOLVED").toPath, "commit late\n")
    assert(CommitLog.stableVersion(root) === 3L)
    assert(CommitLog.checkpoint(root) === 3L)
    assert(CommitLog.expireBelow(root, 3L) === Seq(1L, 2L, 3L))
    assert(CommitLog.resolvePartitions(root)("p1") === (2L, "data/w1"),
      "the late lower-slot commit must survive checkpoint + expiry")
    assert(CommitLog.resolvePartitions(root)("p2") === (3L, "data/w2"))
  }

  test("a stalled claim that commits INSIDE a rival's staging window still conflicts — stableVersion pins the base below it") {
    val root = freshRoot()
    CommitLog.tryCommit(root, Entry("ingest", "ingest", "data/ingest",
      Seq("p1", "p2", "p3"), 0L))
    // W1 claims slot 2 touching p1 and stalls mid-commit (its own
    // validation ran when slots 3-4 didn't exist yet)
    val w1 = new java.io.File(s"$root/commitlog/v2")
    assert(w1.mkdirs())
    java.nio.file.Files.writeString(
      new java.io.File(w1, "entry.tsv").toPath,
      "2\tw1\top\tdata/w1\t1\tp1\n")
    // disjoint writers land v3, v4 while W1 is stalled
    CommitLog.tryCommit(root, Entry("w2", "op", "data/w2", Seq("p2"), 1L))
    CommitLog.tryCommit(root, Entry("w3", "op", "data/w3", Seq("p3"), 1L))
    assert(CommitLog.latestCommitted(root) === 4L)
    // a rival touching p1 snapshots its base the only safe way: the
    // low-water mark stays BELOW the unresolved slot 2
    val base = CommitLog.stableVersion(root)
    assert(base === 1L,
      "stableVersion must not advance past an unresolved claim")
    // ... the rival stages (slow) — and W1 commits DURING that window
    java.nio.file.Files.writeString(
      new java.io.File(w1, "_RESOLVED").toPath, "commit late\n")
    // with base = latestCommitted (4) both rival-filter disjuncts
    // would be false for slot 2 (2 <= 4 and committed) — the lost
    // update; with the stable base, 2 > 1 keeps W1 in the window
    intercept[CommitConflict] {
      CommitLog.tryCommit(root,
        Entry("late", "op", "data/late", Seq("p1"), base))
    }
    // after a rebase from the NEW stable base the retry lands
    val nb = CommitLog.stableVersion(root)
    assert(nb === 4L, "all slots resolved: stable catches up to latest")
    val v = CommitLog.tryCommit(root,
      Entry("late", "op", "data/late2", Seq("p1"), nb))
    assert(v === 6L)
    assert(CommitLog.resolvePartitions(root)("p1") === (6L, "data/late2"))
  }

  test("an entry-less claim that outlives the poll is force-aborted, not skipped — its writer can never land afterward") {
    val root = freshRoot()
    CommitLog.tryCommit(root,
      Entry("ingest", "ingest", "data/ingest", Seq("p1"), 0L))
    // a claim with NO entry: a writer stalled between mkdir and its
    // entry write (or crashed there)
    val stall = new java.io.File(s"$root/commitlog/v2")
    assert(stall.mkdirs())
    // the rival's poll expires (~1 s), then force-aborts the claim
    // instead of silently skipping it
    val v = CommitLog.tryCommit(root,
      Entry("w", "op", "data/w", Seq("p1"), 1L))
    assert(v === 3L)
    assert(!CommitLog.abortOrphan(root, 2L),
      "the claim must already be RESOLVED by the rival's force-abort")
    val res = java.nio.file.Files.readString(
      new java.io.File(stall, "_RESOLVED").toPath)
    assert(res.startsWith("abort"),
      s"force-abort must have decided the slot, got: $res")
    assert(CommitLog.committedVersions(root) === Seq(1L, 3L),
      "the stalled writer lost the _RESOLVED race — it can never " +
        "commit v2 over the rival's p1")
  }

  test("a torn _EXPIRED_BELOW horizon fails loudly instead of silently resetting to 0") {
    val root = freshRoot()
    CommitLog.tryCommit(root,
      Entry("ingest", "ingest", "data/ingest", Seq("p1"), 0L))
    CommitLog.tryCommit(root, Entry("w1", "op", "data/w1", Seq("p1"), 1L))
    assert(CommitLog.checkpoint(root) === 2L)
    assert(CommitLog.expireBelow(root, 2L) === Seq(1L, 2L))
    // simulate a torn horizon rewrite
    java.nio.file.Files.writeString(
      new java.io.File(s"$root/commitlog/_EXPIRED_BELOW").toPath, "2.")
    intercept[IllegalStateException] { CommitLog.resolvePartitions(root) }
  }

  test("a stalled claim BELOW a rival's base version still conflicts — no lost update through the validation window") {
    val root = freshRoot()
    CommitLog.tryCommit(root, Entry("ingest", "ingest", "data/ingest",
      Seq("p1", "p2"), 0L))
    // W1 claimed slot 2 (base 1, touches p1) and STALLED mid-commit:
    // claim + entry exist, no resolution
    val w1 = new java.io.File(s"$root/commitlog/v2")
    assert(w1.mkdirs())
    java.nio.file.Files.writeString(
      new java.io.File(w1, "entry.tsv").toPath,
      "2\tw1\top\tdata/w1\t1\tp1\n")
    // a DISJOINT writer lands at v3, moving latestCommitted past W1
    CommitLog.tryCommit(root, Entry("w2", "op", "data/w2", Seq("p2"), 1L))
    assert(CommitLog.latestCommitted(root) === 3L)
    // W3 snapshots base 3 and touches p1: its base does NOT include
    // the stalled W1, which may still commit — W3 must conflict, not
    // silently win the partition (the lost-update window)
    intercept[CommitConflict] {
      CommitLog.tryCommit(root, Entry("w3", "op", "data/w3", Seq("p1"), 3L))
    }
    // once the janitor resolves the stall, the retry lands
    assert(CommitLog.abortOrphan(root, 2L))
    val v = CommitLog.tryCommit(root,
      Entry("w3", "op", "data/w3", Seq("p1"), 3L))
    assert(v === 5L)
    assert(CommitLog.resolvePartitions(root)("p1") === (5L, "data/w3"))
  }

  test("a hostile base over an unresolved lower claim is REFUSED — the stability contract is enforced, not trusted") {
    val root = freshRoot()
    CommitLog.tryCommit(root, Entry("ingest", "ingest", "data/ingest",
      Seq("p1", "p2"), 0L))
    // W1 claims slot 2 (touches p1) and stalls unresolved
    val w1 = new java.io.File(s"$root/commitlog/v2")
    assert(w1.mkdirs())
    java.nio.file.Files.writeString(
      new java.io.File(w1, "entry.tsv").toPath,
      "2\tw1\top\tdata/w1\t1\tp1\n")
    // a disjoint writer lands at v3 → latestCommitted = 3, but slot 2
    // is unresolved, so 3 was NEVER a stable snapshot
    CommitLog.tryCommit(root, Entry("w2", "op", "data/w2", Seq("p2"), 1L))
    assert(CommitLog.latestCommitted(root) === 3L)
    assert(CommitLog.stableVersion(root) === 1L)
    // a caller passing latestCommitted as base — DISJOINT partitions,
    // so the rival filter alone would admit it (the exact API-misuse
    // reopening of the r15 lost-update window) — is refused outright
    val ex = intercept[CommitConflict] {
      CommitLog.tryCommit(root, Entry("hostile", "op", "data/h",
        Seq("p9"), 3L))
    }
    assert(ex.getMessage.contains("not a stable"))
    assert(CommitLog.committedVersions(root) === Seq(1L, 3L),
      "the refused claim must not have committed")
    // once the stall resolves, the same base IS provably stable now —
    // resolutions are immutable — and the retry lands
    assert(CommitLog.abortOrphan(root, 2L))
    assert(CommitLog.tryCommit(root, Entry("hostile", "op", "data/h",
      Seq("p9"), 3L)) === 5L)
  }

  test("checkpoint is idempotent and never truncates a live checkpoint in place") {
    val root = freshRoot()
    CommitLog.tryCommit(root,
      Entry("ingest", "ingest", "data/ingest", Seq("p1"), 0L))
    assert(CommitLog.checkpoint(root) === 1L)
    val f = new java.io.File(s"$root/commitlog/ckpt_v1.tsv")
    val before = java.nio.file.Files.readString(f.toPath)
    // re-checkpointing with no new commits must not reopen the file
    val mtime = f.lastModified()
    Thread.sleep(20)
    assert(CommitLog.checkpoint(root) === 1L)
    assert(f.lastModified() === mtime,
      "an idempotent checkpoint must not rewrite the live file")
    assert(java.nio.file.Files.readString(f.toPath) === before)
    // a TORN checkpoint at the same version is atomically replaced
    java.nio.file.Files.writeString(f.toPath, "1\np1\t1\tdata/ing")
    assert(CommitLog.checkpoint(root) === 1L)
    assert(java.nio.file.Files.readString(f.toPath).contains("#end"),
      "a torn checkpoint must be replaced by a valid one")
    assert(CommitLog.resolvePartitions(root)("p1") === (1L, "data/ingest"))
  }

  test("timestamp time travel: asOfTimestamp floors to the newest commit at or before ts; version and timestamp reads agree") {
    val root = freshRoot()
    CommitLog.tryCommit(root, Entry("ingest", "ingest", "data/ingest",
      Seq("p1", "p2"), 0L))
    CommitLog.tryCommit(root, Entry("w1", "op", "data/w1", Seq("p1"), 1L))
    CommitLog.tryCommit(root, Entry("w2", "op", "data/w2", Seq("p2"), 2L))
    // every committed entry carries the version-derived logical stamp
    for ((v, e) <- CommitLog.readLog(root))
      assert(e.ts === CommitLog.commitTimestamp(v))
    // exact-instant and between-commits probes floor to the earlier
    // commit — the "as of yesterday 09:00" semantics
    for (v <- 1L to 3L) {
      assert(CommitLog.asOfTimestamp(root,
        CommitLog.commitTimestamp(v)) === Some(v))
      assert(CommitLog.asOfTimestamp(root,
        CommitLog.commitTimestamp(v) + 1799L) === Some(v))
    }
    // before the first commit there is no table to read
    val preHistory = CommitLog.commitTimestamp(1L) - 1L
    assert(CommitLog.asOfTimestamp(root, preHistory) === None)
    assert(CommitLog.resolveAsOfTimestamp(root, preHistory) === Map.empty)
    // timestamp-keyed resolution agrees with version-keyed at every v
    for (v <- 1L to 3L)
      assert(CommitLog.resolveAsOfTimestamp(root,
        CommitLog.commitTimestamp(v) + 1L) === CommitLog.resolveAsOf(root, v))
    // an aborted slot's timestamp never resolves: ts at the aborted
    // slot 4 floors to commit 3; the next commit lands at 5
    val a = new java.io.File(s"$root/commitlog/v4")
    assert(a.mkdirs())
    assert(CommitLog.abortOrphan(root, 4L))
    CommitLog.tryCommit(root, Entry("w3", "op", "data/w3", Seq("p1"), 3L))
    assert(CommitLog.asOfTimestamp(root,
      CommitLog.commitTimestamp(4L)) === Some(3L))
    assert(CommitLog.asOfTimestamp(root,
      CommitLog.commitTimestamp(5L)) === Some(5L))
    // after checkpoint + expiry, folded history resolves at the
    // checkpoint version; instants below it are gone (None), exactly
    // like resolveAsOf's loud below-horizon failure
    assert(CommitLog.checkpoint(root) === 5L)
    CommitLog.expireBelow(root, 5L)
    assert(CommitLog.asOfTimestamp(root,
      CommitLog.commitTimestamp(5L)) === Some(5L))
    assert(CommitLog.asOfTimestamp(root,
      CommitLog.commitTimestamp(4L)) === None)
  }

  private def stagedDir(root: String, p: String): java.io.File = {
    val d = new java.io.File(root, p); d.mkdirs()
    java.nio.file.Files.writeString(
      new java.io.File(d, "part-0.parquet").toPath, "x")
    d
  }

  test("orphan-staging sweep: a conflicted writer's files are reclaimed; committed and in-flight staging survive; idempotent") {
    val root = freshRoot()
    val live = stagedDir(root, "data/live")
    CommitLog.tryCommit(root, Entry("ingest", "ingest", "data/live",
      Seq("p1", "p2"), 0L))
    // conflicted writer: staged, then rejected from a stale snapshot —
    // its aborted slot names the staging
    val orph = stagedDir(root, "data/orphan")
    intercept[CommitConflict] {
      CommitLog.tryCommit(root, Entry("w", "op", "data/orphan",
        Seq("p1"), 0L))
    }
    // an in-flight claim (entry written, unresolved): its writer may
    // still commit — the sweep must never touch its staging
    val inflight = stagedDir(root, "data/inflight")
    val c = new java.io.File(s"$root/commitlog/v3")
    assert(c.mkdirs())
    java.nio.file.Files.writeString(
      new java.io.File(c, "entry.tsv").toPath,
      "3\tslow\top\tdata/inflight\t1\tp3\n")
    assert(CommitLog.sweepOrphanStaging(root) === Seq("data/orphan"))
    assert(!orph.exists(), "the conflicted staging must be reclaimed")
    assert(live.exists(), "committed data must survive the sweep")
    assert(inflight.exists(), "an unresolved claim's staging must survive")
    assert(CommitLog.sweepOrphanStaging(root) === Nil, "idempotent")
  }

  test("orphan sweep keeps shared, alsoLive, checkpoint-folded, and hostile paths") {
    val root = freshRoot()
    // a path referenced by BOTH an aborted and a committed entry (a
    // rebased retry that re-staged in place and won) survives
    val shared = stagedDir(root, "data/shared")
    CommitLog.tryCommit(root, Entry("ingest", "ingest", "data/shared",
      Seq("p1"), 0L))
    intercept[CommitConflict] {
      CommitLog.tryCommit(root, Entry("w", "op", "data/shared",
        Seq("p1"), 0L))
    }
    // a path held live only by the CALLER's manifest (outside the log)
    val held = stagedDir(root, "gens/g1")
    def abortedSlot(v: Long, dataPath: String): Unit = {
      val d = new java.io.File(s"$root/commitlog/v$v")
      assert(d.mkdirs())
      java.nio.file.Files.writeString(
        new java.io.File(d, "entry.tsv").toPath,
        s"$v\tx\top\t$dataPath\t1\tp9\n")
      assert(CommitLog.abortOrphan(root, v))
    }
    abortedSlot(3L, "gens/g1")
    // hostile paths are never touched, whatever an entry claims
    abortedSlot(4L, "../outside")
    abortedSlot(5L, "/etc")
    abortedSlot(6L, "commitlog")
    assert(CommitLog.sweepOrphanStaging(root,
      alsoLive = Set("gens/g1")) === Nil)
    assert(shared.exists() && held.exists())
    assert(new java.io.File(s"$root/commitlog").exists())
    // checkpoint-folded ownership keeps a path alive after its slot
    // is expired
    assert(CommitLog.checkpoint(root) === 1L)
    CommitLog.expireBelow(root, 1L)
    abortedSlot(7L, "data/shared")
    assert(CommitLog.sweepOrphanStaging(root,
      alsoLive = Set("gens/g1")) === Nil,
      "a checkpoint-folded owner must keep its dataPath alive")
    assert(shared.exists())
  }

  test("resolution hands each partition to its newest committed owner") {
    val root = freshRoot()
    CommitLog.tryCommit(root, Entry("ingest", "ingest", "data/ingest",
      Seq("p1", "p2", "p3"), 0L))
    CommitLog.tryCommit(root, Entry("w1", "op", "data/w1", Seq("p1"), 1L))
    CommitLog.tryCommit(root, Entry("w2", "op", "data/w2", Seq("p1", "p3"), 2L))
    val owners = CommitLog.resolvePartitions(root)
    assert(owners("p1") === (3L, "data/w2"))
    assert(owners("p2") === (1L, "data/ingest"))
    assert(owners("p3") === (3L, "data/w2"))
  }
}
