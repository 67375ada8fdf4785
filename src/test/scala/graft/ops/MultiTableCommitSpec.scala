package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.CommitLog.CommitConflict

/** Cross-table (spanning) transactions: two spanning writers over
  * INTERSECTING tier sets produce exactly one winner; disjoint sets
  * from one snapshot both land; a spanning transaction and a plain
  * single-table writer on one member tier conflict in BOTH
  * directions; per-tier and uniform resolution read through the tier
  * manifests. Pure metadata — no Spark session needed. */
class MultiTableCommitSpec extends AnyFunSuite {

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_mtc_spec").toString

  private def seed(root: String): Long =
    MultiTableCommit.commit(root, "ingest", "m0", "base",
      Map("t.a" -> "data/a0", "t.b" -> "data/b0", "t.c" -> "data/c0"), 0L)

  test("a spanning commit flips every tier at one slot; resolveUniform reads it") {
    val root = freshRoot()
    assert(seed(root) === 1L)
    val v = MultiTableCommit.commit(root, "tx1", "m1", "update",
      Map("t.a" -> "data/a1", "t.b" -> "data/b1", "t.c" -> "data/c1"), 1L)
    assert(v === 2L)
    val (rv, tiers) = MultiTableCommit.resolveUniform(root)
    assert(rv === 2L)
    assert(tiers === Map("t.a" -> "data/a1", "t.b" -> "data/b1",
      "t.c" -> "data/c1"))
  }

  test("two spanning transactions over INTERSECTING tier sets: exactly one winner") {
    val root = freshRoot(); seed(root)
    // sequential form: the second writer's snapshot is stale for t.b
    assert(MultiTableCommit.commit(root, "tx1", "m1", "update",
      Map("t.a" -> "data/a1", "t.b" -> "data/b1"), 1L) === 2L)
    val ex = intercept[CommitConflict] {
      MultiTableCommit.commit(root, "tx2", "m2", "update",
        Map("t.b" -> "data/b2", "t.c" -> "data/c2"), 1L)
    }
    assert(ex.getMessage.contains("tx1"))
    // RACING form: both in flight from the same (now-stable) base
    val base = CommitLog.stableVersion(root)
    val outcomes = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val ths = Seq("rx1" -> "t.a", "rx2" -> "t.c").map { case (w, extra) =>
      new Thread(() =>
        try {
          MultiTableCommit.commit(root, w, s"m_$w", "update",
            Map("t.b" -> s"data/b_$w", extra -> s"data/x_$w"), base)
          outcomes.add(s"$w:commit"); ()
        } catch {
          case _: CommitConflict => outcomes.add(s"$w:conflict"); ()
        })
    }
    ths.foreach(_.start()); ths.foreach(_.join())
    val (commits, conflicts) =
      outcomes.toArray(Array.empty[String]).partition(_.endsWith("commit"))
    assert(commits.length === 1 && conflicts.length === 1,
      s"expected exactly one winner over the shared tier, got $outcomes")
    // the winner owns t.b; the loser's tiers never became visible
    val owners = MultiTableCommit.resolveTiers(root)
    val winner = commits.head.split(":")(0)
    assert(owners("t.b")._2 === s"data/b_$winner")
  }

  test("disjoint tier sets from one snapshot BOTH land; tiers resolve per owner") {
    val root = freshRoot(); seed(root)
    assert(MultiTableCommit.commit(root, "tx1", "m1", "update",
      Map("t.a" -> "data/a1"), 1L) === 2L)
    assert(MultiTableCommit.commit(root, "tx2", "m2", "update",
      Map("t.b" -> "data/b1"), 1L) === 3L)
    val owners = MultiTableCommit.resolveTiers(root)
    assert(owners("t.a") === (2L, "data/a1"))
    assert(owners("t.b") === (3L, "data/b1"))
    assert(owners("t.c") === (1L, "data/c0"))
    // ...and uniform resolution REFUSES the mixed-version view
    intercept[IllegalArgumentException] {
      MultiTableCommit.resolveUniform(root)
    }
  }

  test("spanning vs single-table writer on one member tier: conflict BOTH directions") {
    val root = freshRoot(); seed(root)
    // direction 1: a plain single-table writer lands on t.b; a
    // spanning transaction from the stale snapshot must conflict
    assert(CommitLog.tryCommit(root, CommitLog.Entry("solo", "update",
      "data/b_solo", Seq("t.b"), 1L)) === 2L)
    intercept[CommitConflict] {
      MultiTableCommit.commit(root, "span", "m1", "update",
        Map("t.a" -> "data/a1", "t.b" -> "data/b1"), 1L)
    }
    // direction 2: a spanning transaction lands over t.a+t.b; a plain
    // writer on t.a from the stale snapshot must conflict
    val base = CommitLog.stableVersion(root)
    assert(MultiTableCommit.commit(root, "span", "m2", "update",
      Map("t.a" -> "data/a2", "t.b" -> "data/b2"), base) === 4L)
    intercept[CommitConflict] {
      CommitLog.tryCommit(root, CommitLog.Entry("solo2", "update",
        "data/a_solo", Seq("t.a"), base))
    }
    // the single-table winner resolves THROUGH resolveTiers too (its
    // dataPath is no manifest — it IS the tier's data)
    val owners = MultiTableCommit.resolveTiers(root)
    assert(owners("t.a") === (4L, "data/a2"))
    assert(owners("t.b") === (4L, "data/b2"))
  }

  test("a crash between tier writes is invisible: the spanning entry never committed") {
    val root = freshRoot(); seed(root)
    // simulate the crash: manifest staged, claim taken, no resolution
    val mPath = "manifests/m_crash.tsv"
    val f = new java.io.File(root, mPath)
    f.getParentFile.mkdirs()
    java.nio.file.Files.writeString(f.toPath,
      "t.a\tdata/a_crash\nt.b\tdata/b_crash\n")
    val claim = new java.io.File(s"$root/commitlog/v2")
    assert(claim.mkdirs())
    java.nio.file.Files.writeString(
      new java.io.File(claim, "entry.tsv").toPath,
      s"2\tcrashed\tupdate\t$mPath\t1\tt.a,t.b\n")
    // every reader still resolves the prior manifest, uniformly
    val (rv, tiers) = MultiTableCommit.resolveUniform(root)
    assert(rv === 1L)
    assert(tiers("t.a") === "data/a0" && tiers("t.b") === "data/b0")
  }
}
