package graft.ops

import graft.SparkSpec
import graft.ops.CommitLog.Entry
import org.apache.spark.sql.functions._

/** Randomized properties for the key-domain algebra (fixed seed —
  * reproducible): the range-list disjointness used by conflict
  * validation must agree with brute-force KEY-SET intersection over
  * the whole universe, and the layered-read fold must agree with the
  * per-key newest-layer-wins oracle for any random layer stack. */
class KeyDomainPropertySpec extends SparkSpec {

  private val rnd = new scala.util.Random(42)

  private def randRanges(): Seq[(Long, Long)] =
    (0 until (1 + rnd.nextInt(5))).map { _ =>
      val lo = rnd.nextInt(60).toLong
      (lo, lo + rnd.nextInt(6))
    }

  private def keysOf(ranges: Seq[(Long, Long)]): Set[Long] =
    ranges.flatMap { case (lo, hi) => lo to hi }.toSet

  test("range-list conflict = brute-force key-set intersection, across 200 random pairs") {
    for (i <- 1 to 200) {
      val (ra, rb) = (randRanges(), randRanges())
      val e = Entry("a", "merge", "d/a", Seq("p"), 1L,
        keyDomains = Map("p" -> ra))
      val other = Entry("b", "merge", "d/b", Seq("p"), 1L,
        keyDomains = Map("p" -> rb))
      // committed rival at a lower slot: conflict iff write sets meet
      val got = CommitLog.rivalConflicts(e, next = 3L, v = 2L, other,
        committed = true, aborted = false)
      val want = keysOf(ra).intersect(keysOf(rb)).nonEmpty
      assert(got === want,
        s"case $i: ranges $ra vs $rb — conflict=$got, keys meet=$want")
      // one-sided domains must stay conservative (always conflict)
      val bare = other.copy(keyDomains = Map.empty)
      assert(CommitLog.rivalConflicts(e, 3L, 2L, bare,
        committed = true, aborted = false),
        s"case $i: a domain-free rival must conflict")
    }
  }

  test("layered-read fold = per-key newest-layer-wins, across random layer stacks") {
    val s = spark
    import s.implicits._
    val universe = 0L until 40L
    for (i <- 1 to 5) {
      val root = java.nio.file.Files
        .createTempDirectory(s"graft_kdprop$i").toString
      // base: v(k) = k; each layer j rewrites its ranges to j*1000+k
      universe.map(k => (k, k)).toDF("k", "v")
        .coalesce(1).write.parquet(s"$root/base")
      CommitLog.tryCommit(root, Entry("ingest", "ingest", s"$root/base",
        Seq("p"), 0L))
      val nLayers = 1 + rnd.nextInt(3)
      val layers = (1 to nLayers).map { j =>
        val ranges = randRanges().map { case (lo, hi) =>
          (lo % 40, math.min(39L, lo % 40 + (hi - lo))) }
        universe.filter(k => ranges.exists { case (lo, hi) =>
            k >= lo && k <= hi })
          .map(k => (k, j * 1000L + k)).toDF("k", "v")
          .coalesce(1).write.parquet(s"$root/l$j")
        // layers stack SEQUENTIALLY (base = prior version): overlap
        // between layers is legal — newest wins inside it
        CommitLog.tryCommit(root, Entry(s"m$j", "merge", s"$root/l$j",
          Seq("p"), j.toLong, keyDomains = Map("p" -> ranges)))
        ranges
      }
      val got = LakeRead.layeredFrame(s,
        CommitLog.resolveLayers(root, "p"), "k")
        .as[(Long, Long)].collect().toMap
      val want = universe.map { k =>
        val owner = layers.zipWithIndex.reverse.collectFirst {
          case (rs, idx) if rs.exists { case (lo, hi) =>
            k >= lo && k <= hi } => idx + 1
        }
        k -> owner.map(j => j * 1000L + k).getOrElse(k)
      }.toMap
      assert(got === want, s"stack $i diverged (layers=$layers)")
      VersionChain.rmTree(new java.io.File(root))
    }
  }
}
