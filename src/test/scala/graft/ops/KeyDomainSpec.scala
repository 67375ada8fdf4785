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
      Seq("p1"), 1L, keyDomains = Map("p1" -> (1L, 100L)))) === 2L)
    assert(CommitLog.tryCommit(root, Entry("m2", "merge", "data/m2",
      Seq("p1"), 1L, keyDomains = Map("p1" -> (200L, 300L)))) === 3L)
    // overlapping ranges: one winner, the stale writer conflicts
    intercept[CommitConflict] {
      CommitLog.tryCommit(root, Entry("m3", "merge", "data/m3",
        Seq("p1"), 1L, keyDomains = Map("p1" -> (50L, 250L))))
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
        Seq("p1"), 1L, keyDomains = Map("p1" -> (100L, 150L))))
    }
    // a multi-partition entry: its p1 range is disjoint from every
    // rival, but p2 is contested by a domain-free writer — the
    // domain-free side stays partition-granular and the WHOLE entry
    // conflicts (slots 4-6 are the aborted claims above)
    assert(CommitLog.tryCommit(root, Entry("w2", "update", "data/w2",
      Seq("p2"), 1L)) === 7L)
    intercept[CommitConflict] {
      CommitLog.tryCommit(root, Entry("m6", "merge", "data/m6",
        Seq("p1", "p2"), 1L, keyDomains = Map("p1" -> (400L, 500L),
          "p2" -> (1L, 10L))))
    }
    assert(CommitLog.tryCommit(root, Entry("m7", "merge", "data/m7",
      Seq("p1"), 1L, keyDomains = Map("p1" -> (400L, 500L)))) === 9L)
    // domains survive the entry roundtrip
    val log = CommitLog.readLog(root).toMap
    assert(log(2L).keyDomains === Map("p1" -> ((1L, 100L))))
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
            Seq("p1"), 1L, keyDomains = Map("p1" -> (lo, hi))))
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
      Seq("p1"), 1L, keyDomains = Map("p1" -> (2L, 4L)))) === 2L)
    assert(CommitLog.tryCommit(root, Entry("mB", "merge", s"$data/mB",
      Seq("p1"), 1L, keyDomains = Map("p1" -> (8L, 9L)))) === 3L)
    val layers = CommitLog.resolveLayers(root, "p1")
    assert(layers.map(l => (l._1, l._3)) ===
      Seq((1L, None), (2L, Some((2L, 4L))), (3L, Some((8L, 9L)))))
    // materialize: per layer replace the key range with the layer
    val live = layers.tail.foldLeft(s.read.parquet(layers.head._2)) {
      case (acc, (_, path, Some((lo, hi)))) =>
        acc.filter(!col("k").between(lo, hi))
          .unionByName(s.read.parquet(path)
            .filter(col("k").between(lo, hi)))
      case (acc, _) => acc
    }
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
      Seq("p1"), 1L, keyDomains = Map("p1" -> (1L, 10L))))
    val ex = intercept[IllegalStateException] { CommitLog.checkpoint(root) }
    assert(ex.getMessage.contains("compact"))
    // compaction writes the full partition; the fold is safe again
    CommitLog.tryCommit(root, Entry("cw", "compact", "data/compacted",
      Seq("p1"), 2L))
    assert(CommitLog.checkpoint(root) === 3L)
    assert(CommitLog.resolvePartitions(root)("p1") ===
      (3L, "data/compacted"))
  }
}
