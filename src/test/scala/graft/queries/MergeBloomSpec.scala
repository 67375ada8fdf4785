package graft.queries

import graft.{SparkEntry, SparkSpec}

/** q_merge_bloom — per-file bloom skipping over the MERGE manifest:
  * the deleted probe must be range-admitted but bloom-rejected (the
  * false positive min/max stats cannot kill), live probes must never
  * be bloom-rejected anywhere they match (no false negatives), and
  * the doubly-admitted scan set must be a strict subset of the range
  * candidates. */
class MergeBloomSpec extends SparkSpec {

  private lazy val rows = SparkEntry.queries("q_merge_bloom")(spark, sf0001)
    .collect().toSeq
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5))) // bucket, rw, probe, range, bloom, n

  test("the deleted probe is range-admitted somewhere but bloom-rejected everywhere") {
    val deletedRows = rows.filter(_._3 % 13 == 0)
    assert(deletedRows.exists(r => r._4 == 1L),
      "fixture drift: the deleted probe should fall inside some " +
        "file's residual range — otherwise the bloom has nothing to kill")
    assert(deletedRows.forall(r => r._5 == 0L),
      "the per-file bloom admitted a key that is in no file")
    assert(deletedRows.forall(r => r._6 == 0L))
  }

  test("no false negatives: every matching (file, probe) pair is admitted by BOTH indexes") {
    for (r <- rows if r._6 > 0)
      assert(r._4 == 1L && r._5 == 1L,
        s"probe ${r._3} matches in bucket ${r._1} but an index " +
          "rejected it — unsafe skipping")
    assert(rows.map(_._6).sum == 2L,
      "exactly the cold probe and the insert probe should match")
  }

  test("attribution keys by the real source file: a two-file bucket never collapses counts") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    val root = java.nio.file.Files
      .createTempDirectory("graft_bloom_attr").toString
    // two manifest files in ONE bucket — the q_compact_manifest layout
    // the merge fixture's one-file-per-(bucket, rewritten) invariant
    // currently rules out; attribution must survive it anyway
    def writeOne(name: String, keys: Seq[Long]): String = {
      val stage = s"$root/stage_$name"
      keys.toDF("custkey").withColumn("bucket", lit(0L))
        .coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = new java.io.File(s"$root/gen0/pbucket=0/$name.parquet")
      dest.getParentFile.mkdirs()
      java.nio.file.Files.move(part.toPath, dest.toPath)
      s"gen0/pbucket=0/$name.parquet"
    }
    val fa = writeOne("fa", Seq(10L, 20L, 30L))
    val fb = writeOne("fb", Seq(40L, 50L, 20L))
    val counts = MaintenancePipelineQuery.probeMatchesByFile(
      spark, root, Seq(fa, fb), Seq(20L, 40L))
    assert(counts === Map((fa, 20L) -> 1L, (fb, 20L) -> 1L, (fb, 40L) -> 1L),
      "probe counts must be attributed to the file that holds them, " +
        "never merged across a bucket")
  }

  test("the scanned set (range AND bloom) is a strict subset of the range candidates") {
    val rangeAdmitted = rows.count(_._4 == 1L)
    val scanned = rows.count(r => r._4 == 1L && r._5 == 1L)
    assert(scanned < rangeAdmitted,
      s"bloom pruned nothing: $scanned scanned of $rangeAdmitted " +
        "range candidates")
    assert(scanned <= 3, s"3 probes should scan at most 3 pairs, got $scanned")
  }
}
