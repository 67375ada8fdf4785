package graft.ops

import graft.SparkSpec
import graft.ops.CommitLog.{CommitConflict, Entry}
import org.apache.spark.sql.functions._

/** Key-granular conflict sets (Entry.keyDomains): two MERGEs into
  * disjoint key ranges of ONE partition both land; overlapping or
  * one-sided ranges keep the partition-granular single winner;
  * layered reads materialize MERGE semantics from the log; a
  * checkpoint refuses to fold an uncompacted layer. */
class KeyDomainSpec extends SparkSpec {

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_kd_spec").toString

  test("disjoint-key writers into one partition BOTH land; overlap keeps one winner") {
    val root = freshRoot()
    CommitLog.tryCommit(root, Entry("ingest", "ingest", "data/full",
      Seq("p1"), 0L))
    // disjoint ranges from the same snapshot: both commit
    assert(CommitLog.tryCommit(root, Entry("m1", "merge", "data/m1",
      Seq("p1"), 1L, keyDomains = Map("p1" -> Seq((1L, 100L))))) === 2L)
    assert(CommitLog.tryCommit(root, Entry("m2", "merge", "data/m2",
      Seq("p1"), 1L, keyDomains = Map("p1" -> Seq((200L, 300L))))) === 3L)
    // overlapping ranges: one winner, the stale writer conflicts
    intercept[CommitConflict] {
      CommitLog.tryCommit(root, Entry("m3", "merge", "data/m3",
        Seq("p1"), 1L, keyDomains = Map("p1" -> Seq((50L, 250L)))))
    }
    // one-sided domains stay partition-granular (conservative): a
    // domain-free writer conflicts with ANY committed domain writer
    intercept[CommitConflict] {
      CommitLog.tryCommit(root, Entry("m4", "rewrite", "data/m4",
        Seq("p1"), 1L))
    }
    // boundary adjacency is NOT disjoint (inclusive ranges)
    intercept[CommitConflict] {
      CommitLog.tryCommit(root, Entry("m5", "merge", "data/m5",
        Seq("p1"), 1L, keyDomains = Map("p1" -> Seq((100L, 150L)))))
    }
    // a multi-partition entry: its p1 range is disjoint from every
    // rival, but p2 is contested by a domain-free writer — the
    // domain-free side stays partition-granular and the WHOLE entry
    // conflicts (slots 4-6 are the aborted claims above)
    assert(CommitLog.tryCommit(root, Entry("w2", "update", "data/w2",
      Seq("p2"), 1L)) === 7L)
    intercept[CommitConflict] {
      CommitLog.tryCommit(root, Entry("m6", "merge", "data/m6",
        Seq("p1", "p2"), 1L, keyDomains = Map("p1" -> Seq((400L, 500L)),
          "p2" -> Seq((1L, 10L)))))
    }
    assert(CommitLog.tryCommit(root, Entry("m7", "merge", "data/m7",
      Seq("p1"), 1L, keyDomains = Map("p1" -> Seq((400L, 500L))))) === 9L)
    // domains survive the entry roundtrip
    val log = CommitLog.readLog(root).toMap
    assert(log(2L).keyDomains === Map("p1" -> Seq((1L, 100L))))
    assert(log(1L).keyDomains.isEmpty)
  }

  test("RACING disjoint-domain writers both land — no spurious single winner") {
    val root = freshRoot()
    CommitLog.tryCommit(root, Entry("ingest", "ingest", "data/full",
      Seq("p1"), 0L))
    // two live threads, same partition, provably-disjoint ranges,
    // same snapshot: the in-flight winner rule must NOT serialize
    // them (write overlap is excused per range, even mid-flight)
    val outcomes =
      new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val ths = Seq(("m1", 1L, 100L), ("m2", 200L, 300L)).map {
      case (w, lo, hi) => new Thread(() =>
        try {
          CommitLog.tryCommit(root, Entry(w, "merge", s"data/$w",
            Seq("p1"), 1L, keyDomains = Map("p1" -> Seq((lo, hi)))))
          outcomes.add(s"$w:commit"); ()
        } catch {
          case _: CommitConflict => outcomes.add(s"$w:conflict"); ()
        })
    }
    ths.foreach(_.start()); ths.foreach(_.join())
    val res = outcomes.toArray(Array.empty[String]).sorted.toSeq
    assert(res === Seq("m1:commit", "m2:commit"),
      s"racing disjoint-domain writers must BOTH land, got $res")
    assert(CommitLog.committedVersions(root).size === 3)
  }

  test("layered reads materialize MERGE semantics; a full rewrite resets the layers") {
    val s = spark
    import s.implicits._
    val root = freshRoot()
    val data = s"$root/data"
    // base: keys 1..10, v = 10*key
    (1L to 10L).map(k => (k, k * 10L)).toDF("k", "v")
      .coalesce(1).write.parquet(s"$data/base")
    CommitLog.tryCommit(root, Entry("ingest", "ingest", s"$data/base",
      Seq("p1"), 0L))
    // layer A: keys 2..4 doubled; layer B: keys 8..9 zeroed — both
    // from snapshot v1, disjoint, both land
    (2L to 4L).map(k => (k, k * 20L)).toDF("k", "v")
      .coalesce(1).write.parquet(s"$data/mA")
    (8L to 9L).map(k => (k, 0L)).toDF("k", "v")
      .coalesce(1).write.parquet(s"$data/mB")
    assert(CommitLog.tryCommit(root, Entry("mA", "merge", s"$data/mA",
      Seq("p1"), 1L, keyDomains = Map("p1" -> Seq((2L, 4L))))) === 2L)
    assert(CommitLog.tryCommit(root, Entry("mB", "merge", s"$data/mB",
      Seq("p1"), 1L, keyDomains = Map("p1" -> Seq((8L, 9L))))) === 3L)
    val layers = CommitLog.resolveLayers(root, "p1")
    assert(layers.map(l => (l._1, l._3)) ===
      Seq((1L, None), (2L, Some(Seq((2L, 4L)))), (3L, Some(Seq((8L, 9L))))))
    // materialize: per layer replace the key range with the layer
    val live = graft.ops.LakeRead.layeredFrame(s, layers, "k")
    val got = live.as[(Long, Long)].collect().toMap
    val want = (1L to 10L).map(k => k -> (
      if (k >= 2 && k <= 4) k * 20L
      else if (k >= 8 && k <= 9) 0L
      else k * 10L)).toMap
    assert(got === want, "layered read diverged from MERGE semantics")
    // a FULL rewrite shadows every layer and resets the base
    (1L to 10L).map(k => (k, k)).toDF("k", "v")
      .coalesce(1).write.parquet(s"$data/rewrite")
    assert(CommitLog.tryCommit(root, Entry("cw", "compact",
      s"$data/rewrite", Seq("p1"), 3L)) === 4L)
    val after = CommitLog.resolveLayers(root, "p1")
    assert(after === Seq((4L, s"$data/rewrite", None)))
    // asOf time travel still sees the layered view
    assert(CommitLog.resolveLayers(root, "p1", asOf = 3L).size === 3)
  }

  test("checkpoint refuses to fold an uncompacted layer; compaction unblocks it") {
    val root = freshRoot()
    CommitLog.tryCommit(root, Entry("ingest", "ingest", "data/full",
      Seq("p1"), 0L))
    CommitLog.tryCommit(root, Entry("m1", "merge", "data/m1",
      Seq("p1"), 1L, keyDomains = Map("p1" -> Seq((1L, 10L)))))
    val ex = intercept[IllegalStateException] { CommitLog.checkpoint(root) }
    assert(ex.getMessage.contains("compact"))
    // compaction writes the full partition; the fold is safe again
    CommitLog.tryCommit(root, Entry("cw", "compact", "data/compacted",
      Seq("p1"), 2L))
    assert(CommitLog.checkpoint(root) === 3L)
    assert(CommitLog.resolvePartitions(root)("p1") ===
      (3L, "data/compacted"))
  }

  test("MULTI-RANGE domains: two interleaved mod-key MERGEs both land; overlapping sets keep one winner") {
    val root = freshRoot()
    CommitLog.tryCommit(root, Entry("ingest", "ingest", "data/full",
      Seq("p1"), 0L))
    // the realistic scattered-MERGE shape: writer A touches keys
    // ≡ 0 mod 4, writer B keys ≡ 1 mod 4 — as singleton-range lists.
    // A full-span declaration would have serialized them; the range
    // lists prove disjointness and both land from the SAME snapshot.
    def mods(r: Long) = (0L to 16L by 4L).map(k => (k + r, k + r))
    assert(CommitLog.tryCommit(root, Entry("mA", "merge", "data/mA",
      Seq("p1"), 1L, keyDomains = Map("p1" -> mods(0)))) === 2L)
    assert(CommitLog.tryCommit(root, Entry("mB", "merge", "data/mB",
      Seq("p1"), 1L, keyDomains = Map("p1" -> mods(1)))) === 3L)
    // an overlapping SET (one shared singleton) still conflicts
    intercept[CommitConflict] {
      CommitLog.tryCommit(root, Entry("mC", "merge", "data/mC",
        Seq("p1"), 1L,
        keyDomains = Map("p1" -> Seq((100L, 100L), (4L, 4L)))))
    }
    // multi-range lists survive the entry round-trip, order-normalized
    val log = CommitLog.readLog(root).toMap
    assert(log(2L).keyDomains === Map("p1" -> mods(0)))
    assert(log(3L).keyDomains === Map("p1" -> mods(1)))
    // entries stay bounded metadata: a pathological range list is
    // refused up front (declare coarser ranges or the hull instead)
    val tooMany = (0L until (CommitLog.MaxDomainRanges + 1L))
      .map(i => (i * 10, i * 10))
    intercept[IllegalArgumentException] {
      CommitLog.tryCommit(root, Entry("mHuge", "merge", "data/mH",
        Seq("p1"), 3L, keyDomains = Map("p1" -> tooMany)))
    }
  }

  test("resolveAsOf REFUSES a layered winner instead of serving a partial partition") {
    val root = freshRoot()
    CommitLog.tryCommit(root, Entry("ingest", "ingest", "data/full",
      Seq("p1", "p2"), 0L))
    CommitLog.tryCommit(root, Entry("m1", "merge", "data/m1",
      Seq("p1"), 1L, keyDomains = Map("p1" -> Seq((1L, 10L)))))
    // p1's newest owner is a LAYER: a plain resolve would silently
    // serve only keys 1-10 as the whole partition — it must throw,
    // directing to resolveLayers (the checkpoint guard's read twin)
    val ex = intercept[IllegalStateException] {
      CommitLog.resolvePartitions(root)
    }
    assert(ex.getMessage.contains("resolveLayers"))
    // asOf BELOW the layer still resolves fine
    assert(CommitLog.resolveAsOf(root, 1L)("p1") === (1L, "data/full"))
    // and a compaction re-admits the plain resolve
    CommitLog.tryCommit(root, Entry("cw", "compact", "data/c",
      Seq("p1"), 2L))
    assert(CommitLog.resolvePartitions(root)("p1") === (3L, "data/c"))
  }

  test("a layer committed ABOVE the newest checkpoint survives base-slot expiry (checkpoint-owner fallback)") {
    val root = freshRoot()
    CommitLog.tryCommit(root, Entry("ingest", "ingest", "data/full",
      Seq("p1"), 0L))
    assert(CommitLog.checkpoint(root) === 1L)
    // the layer lands AFTER the checkpoint; expiry then deletes the
    // base slot — the layer's base must fall back to the checkpoint
    // owner (guaranteed full by the checkpoint guard)
    CommitLog.tryCommit(root, Entry("m1", "merge", "data/m1",
      Seq("p1"), 1L, keyDomains = Map("p1" -> Seq((1L, 10L)))))
    CommitLog.expireBelow(root, 1L)
    val layers = CommitLog.resolveLayers(root, "p1")
    assert(layers === Seq((1L, "data/full", None),
      (2L, "data/m1", Some(Seq((1L, 10L))))),
      "layered read must recover its base from the checkpoint fold")
    // and compaction (which consumes resolveLayers) can proceed,
    // re-arming checkpoint + further expiry
    CommitLog.tryCommit(root, Entry("cw", "compact", "data/c",
      Seq("p1"), CommitLog.stableVersion(root)))
    assert(CommitLog.checkpoint(root) === 3L)
    assert(CommitLog.resolvePartitions(root)("p1") === (3L, "data/c"))
  }

  test("entry-hostile partition names are refused at write time ('#txn', comma, tab)") {
    val root = freshRoot()
    // '#'-prefixed names collide with checkpoint sentinel lines: a
    // partition literally named '#txn' would be silently dropped from
    // every checkpoint fold — irrecoverable after expiry
    for (bad <- Seq("#txn", "#x", "a,b", "a\tb", "")) {
      intercept[IllegalArgumentException] {
        CommitLog.tryCommit(root, Entry("w", "ingest", "data/x",
          Seq(bad), 0L))
      }
    }
    // read sets are comma-joined too
    intercept[IllegalArgumentException] {
      CommitLog.tryCommit(root, Entry("w", "ingest", "data/x",
        Seq("p1"), 0L, readSet = Seq("a,b")))
    }
    // the entry line is TSV: a tab in writer/op/dataPath would shift
    // every later field on read-back — refused up front
    for (bad <- Seq(Entry("w\tx", "ingest", "data/x", Seq("p1"), 0L),
      Entry("w", "in\tgest", "data/x", Seq("p1"), 0L),
      Entry("w", "ingest", "data/\nx", Seq("p1"), 0L))) {
      intercept[IllegalArgumentException] {
        CommitLog.tryCommit(root, bad)
      }
    }
    // validation fails BEFORE any slot is claimed: no orphan claims
    // for rivals to poll-and-abort, and the log is pristine
    assert(CommitLog.committedVersions(root).isEmpty)
    assert(CommitLog.tryCommit(root, Entry("w", "ingest", "data/x",
      Seq("p1"), 0L)) === 1L)
  }
}
