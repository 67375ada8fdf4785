package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q_compact_manifest: the cumulative-split bin plan must meet the
  * analytic packing bound, the rewrite must actually compact (one
  * file per bin on disk), and the compacted table must be
  * content-preserving. */
class CompactManifestSpec extends SparkSpec {

  test("bin count meets the analytic bound; bins are day-contiguous; rewrite is real") {
    val m = SparkEntry.queries("q_compact_manifest")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDate(4).toLocalDate, r.getDate(5).toLocalDate))
      .sortBy(_._1)
    val total = m.map(_._4).sum
    val t = total / 8 + 1
    // analytic bound of the cumulative split: exactly ceil(total/T) bins
    val expectedBins = ((total + t - 1) / t).toInt
    assert(m.length === expectedBins,
      s"cumulative split must produce ceil(total/T) = $expectedBins bins")
    assert(m.length > 1, "packing must be non-degenerate (several bins)")
    assert(m.exists(_._2 > 1), "some bin must pack MULTIPLE input files")
    // per-bin bytes < T + largest single file (bins only overflow by
    // the file that crosses the boundary)
    val maxFile = graft.tables.Tables.events(spark, sf0001)
      .groupBy(to_date(col("ts"))).agg(
        sum((lit(32) + length(col("event_type"))).cast("long")).as("b"))
      .agg(max("b")).head().getLong(0)
    m.foreach { case (bin, _, _, bytes, _, _) =>
      assert(bytes < t + maxFile, s"bin $bin overflows the packing bound")
    }
    // day-contiguity: ranges are disjoint and ordered (pruning survives)
    m.sliding(2).foreach {
      case Array(a, b) => assert(a._6.isBefore(b._5),
        "bins must keep disjoint, ordered day ranges")
      case _ =>
    }
    // content-preserving: row total equals the source
    assert(m.map(_._3).sum ===
      graft.tables.Tables.events(spark, sf0001).count())
    // the rewrite is real: one parquet file per bin directory
    val outDir = new java.io.File(
      s"${System.getProperty("java.io.tmpdir")}/graft_compact_out")
    val binDirs = outDir.listFiles().filter(_.getName.startsWith("bin="))
    assert(binDirs.length === expectedBins)
    binDirs.foreach { d =>
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length === 1, s"${d.getName} must hold exactly one file")
    }
  }
}
