package graft.ops

import graft.SparkSpec
import graft.ops.CommitLog.{CommitConflict, Entry}

/** Schema changes as first-class COMMIT-LOG metadata actions
  * (CommitLog.commitSchema — Delta's metadata-changed conflict,
  * distilled): a schema entry conflicts with EVERY rival in its
  * validation window, both directions; sequential schema commits
  * replay through resolveAsOf; the active mapping survives
  * checkpoint + history expiry. */
class SchemaCommitSpec extends SparkSpec {

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_schema_spec").toString

  test("a data writer whose base predates a schema change conflicts — in BOTH directions") {
    val root = freshRoot()
    CommitLog.tryCommit(root, Entry("ingest", "ingest", "data/ing",
      Seq("p1"), 0L))
    // schema change lands at v2
    assert(CommitLog.commitSchema(root, "admin", "rename_vc",
      "schema/v2", 1L) === 2L)
    // direction 1: a data writer from the PRE-RENAME base conflicts
    // even on a partition the schema entry never names — its staged
    // files bind the old logical schema
    intercept[CommitConflict] {
      CommitLog.tryCommit(root, Entry("w_stale", "append", "data/w1",
        Seq("p2"), 1L))
    }
    // from a fresh base the same write lands
    assert(CommitLog.tryCommit(root, Entry("w_fresh", "append", "data/w1",
      Seq("p2"), 2L)) === 4L)
    // direction 2: a schema change whose base predates that data
    // commit conflicts too — it cannot prove the write didn't depend
    // on the old mapping
    intercept[CommitConflict] {
      CommitLog.commitSchema(root, "admin", "drop_type", "schema/v5", 2L)
    }
    assert(CommitLog.commitSchema(root, "admin", "drop_type",
      "schema/v5", CommitLog.stableVersion(root)) === 6L)
  }

  test("two RACING schema changes from one base: exactly one winner") {
    val root = freshRoot()
    CommitLog.tryCommit(root, Entry("ingest", "ingest", "data/ing",
      Seq("p1"), 0L))
    val outcomes =
      new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val ths = Seq("a", "b").map(w => new Thread(() =>
      try {
        CommitLog.commitSchema(root, w, s"rename_$w", s"schema/$w", 1L)
        outcomes.add(s"$w:commit"); ()
      } catch {
        case _: CommitConflict => outcomes.add(s"$w:conflict"); ()
      }))
    ths.foreach(_.start()); ths.foreach(_.join())
    val res = outcomes.toArray(Array.empty[String]).map(_.split(":")(1))
    assert(res.sorted.toSeq === Seq("commit", "conflict"),
      s"racing schema changes must yield one winner, got ${res.toSeq}")
  }

  test("sequential schema commits replay through resolveAsOf; history survives checkpoint + expiry") {
    val root = freshRoot()
    assert(CommitLog.commitSchema(root, "admin", "init",
      "schema/v1", 0L) === 1L)
    assert(CommitLog.commitSchema(root, "admin", "rename",
      "schema/v2", 1L) === 2L)
    assert(CommitLog.commitSchema(root, "admin", "drop",
      "schema/v3", 2L) === 3L)
    // the reserved partition resolves to the ACTIVE mapping per version
    (1L to 3L).foreach { v =>
      assert(CommitLog.resolveAsOf(root, v)(CommitLog.SchemaPartition) ===
        (v, s"schema/v$v"),
        s"asOf(v$v) must serve that version's mapping")
    }
    assert(CommitLog.schemaHistory(root) === Seq(
      (1L, "init", "schema/v1"), (2L, "rename", "schema/v2"),
      (3L, "drop", "schema/v3")))
    // the ACTIVE mapping rides the checkpoint fold across expiry
    val ck = CommitLog.checkpoint(root)
    CommitLog.expireBelow(root, ck)
    assert(CommitLog.resolvePartitions(root)(CommitLog.SchemaPartition) ===
      (3L, "schema/v3"),
      "the active mapping must survive history expiry via the fold")
    // and a post-expiry data write from the folded base lands
    assert(CommitLog.tryCommit(root, Entry("w", "append", "data/w",
      Seq("p1"), ck)) === 4L)
  }
}
