package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[MortonInterleave]] + `q_zorder_layout` — the expression is pinned
  * to an independent bit-twiddling reference, and the layout's
  * pruning claim is demonstrated live against a single-column sort
  * layout of the same data into the same file count. */
class MortonSpec extends SparkSpec {
  import spark.implicits._

  private def mortonRef(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (z, b) =>
      z | (((x >> b) & 1L) << (2 * b)) | (((y >> b) & 1L) << (2 * b + 1))
    }

  test("interleave matches the reference on exhaustive small + random large inputs") {
    val small = for (x <- 0L to 31L; y <- 0L to 31L) yield (x, y)
    val rnd = new scala.util.Random(7)
    val big = Seq.fill(200)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val rows = (small ++ big).toDF("x", "y")
      .select(col("x"), col("y"), F.morton(col("x"), col("y")).as("z"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(2) == mortonRef(r.getLong(0), r.getLong(1), 16),
        s"(${r.getLong(0)}, ${r.getLong(1)})")
    }
    // order property: z is monotone when both coords move up a quadrant
    assert(mortonRef(0, 0, 16) < mortonRef(16384, 16384, 16))
  }

  test("z-order files bound BOTH dims to quadrants; x-sort files do not bound y") {
    val manifest = graft.SparkEntry.queries("q_zorder_layout")(spark, sf0001)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(manifest.length > 4, "layout degenerated to a handful of files")
    val li = graft.tables.Tables.lineitem(spark, sf0001)
      .select(col("l_partkey").cast("long").as("x"),
        col("l_suppkey").cast("long").as("y"))
    val (maxX, maxY) = {
      val r = li.agg(max("x"), max("y")).head()
      (r.getLong(0), r.getLong(1))
    }
    // top 4 z-bits = (y-quadrant, x-quadrant) interleaved: every file's
    // x-range AND y-range fit a quarter of the domain (+ grid rounding)
    manifest.foreach { case (f, _, minx, maxx, miny, maxy) =>
      assert(maxx - minx <= maxX / 4 + 2, s"file $f x-range too wide")
      assert(maxy - miny <= maxY / 4 + 2, s"file $f y-range too wide")
    }
    // the same data sorted by x alone into 16 equal-rank files: each
    // file's y-range stays ~the full domain — a y-predicate prunes
    // NOTHING, which is exactly what z-order fixes
    val n = li.count()
    val xsorted = li
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("x", "y")))
      .withColumn("file_id", (((col("rn") - 1) * 16) / n).cast("int"))
      .groupBy("file_id")
      .agg(min("y").as("min_y"), max("y").as("max_y"))
      .collect()
      .map(r => r.getLong(2) - r.getLong(1))
    val wideFiles = xsorted.count(_ > maxY / 2)
    assert(wideFiles >= xsorted.length / 2,
      "x-sorted layout unexpectedly bounded y — corpus not a valid control")
  }

  test("q_zorder_prune: skipping is safe (no match in a skipped file) and real (files skipped)") {
    val rows = graft.SparkEntry.queries("q_zorder_prune")(spark, sf0001)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getBoolean(2), r.getLong(3)))
    // SAFETY: a file the manifest test skips contains ZERO matching rows
    rows.filter(!_._3).foreach { case (f, _, _, m) =>
      assert(m == 0L, s"skipped file $f holds $m matching rows")
    }
    // PAYOFF: the 2-D box prunes files — and matches exist, so the
    // skip decision is not vacuous
    assert(rows.exists(!_._3), "no file skipped — probe box degenerate")
    assert(rows.map(_._4).sum > 0, "no matching rows — probe box empty")
    assert(rows.count(_._3) < rows.length,
      "every file is a candidate — pruning bought nothing")
  }
}
