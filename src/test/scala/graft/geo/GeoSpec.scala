package graft.geo

import graft.SparkSpec
import graft.io.GeoJsonIO
import org.apache.spark.sql.functions._
import java.nio.file.Files

class GeoSpec extends SparkSpec {
  import spark.implicits._

  private def wkb(wkt: String) = GeoFunctions.writeWkb(GeoFunctions.readWkt(wkt))
  private val sq00 = "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"
  private val sq10 = "POLYGON ((1 0, 2 0, 2 1, 1 1, 1 0))"
  private val sqFar = "POLYGON ((10 10, 11 10, 11 11, 10 11, 10 10))"

  test("union of adjacent squares dissolves to a single polygon of area 2") {
    GeoFunctions.register(spark)
    val df = Seq((1, wkb(sq00)), (1, wkb(sq10))).toDF("city", "geometry")
    val out = df.groupBy($"city")
      .agg(GeoFunctions.cols.stUnionAgg($"geometry").as("g"))
      .select(GeoFunctions.cols.stGeometryType($"g"),
        GeoFunctions.cols.stArea($"g")).as[(String, Double)].head()
    assert(out._1 === "Polygon")
    assert(math.abs(out._2 - 2.0) < 1e-9)
  }

  test("union of disjoint squares is a MultiPolygon; convex hull collapses it") {
    GeoFunctions.register(spark)
    val df = Seq((1, wkb(sq00)), (1, wkb(sqFar))).toDF("city", "geometry")
    val out = df.groupBy($"city")
      .agg(GeoFunctions.cols.stUnionAgg($"geometry").as("g"))
      .select(
        GeoFunctions.cols.stGeometryType($"g"),
        GeoFunctions.cols.stGeometryType(GeoFunctions.cols.stConvexHull($"g")))
      .as[(String, String)].head()
    assert(out === ("MultiPolygon", "Polygon"))
  }

  test("boundary of a polygon is its ring") {
    GeoFunctions.register(spark)
    val df = Seq(Tuple1(wkb(sq00))).toDF("geometry")
    val out = df.select(GeoFunctions.cols.stGeometryType(
      GeoFunctions.cols.stBoundary($"geometry"))).as[String].head()
    assert(out === "LineString")
  }

  test("GeoJSON codec roundtrips polygon and multipolygon") {
    for (w <- Seq(sq00, s"MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((10 10, 11 10, 11 11, 10 11, 10 10)))")) {
      val g = GeoFunctions.readWkt(w)
      val back = GeoJsonCodec.parse(GeoJsonCodec.write(g))
      assert(back.equalsTopo(g), s"roundtrip failed for $w")
    }
  }

  test("NDJSON feature lines write distributed and parse per line") {
    GeoFunctions.register(spark)
    val dir = Files.createTempDirectory("ndjson").toString + "/features"
    val df = Seq((1L, wkb(sq00)), (2L, wkb(sqFar))).toDF("id", "geometry")
    GeoJsonIO.writeFeatureLines(df, dir)
    val lines = spark.read.textFile(dir).collect()
    assert(lines.length === 2)
    lines.foreach { l =>
      assert(l.startsWith("""{"type":"Feature""""))
      val geom = GeoJsonCodec.parse(
        l.substring(l.indexOf("\"geometry\":") + 11, l.length - 1))
      assert(geom.getGeometryType === "Polygon")
    }
  }

  test("q_spatial_knn: halo argmin is the true nearest square (brute force)") {
    val sf0001 = "/root/testdata/sf0.001"
    val got = graft.SparkEntry.queries("q_spatial_knn")(spark, sf0001)
      .select("o_orderkey", "c_custkey", "d2x4")
      .as[(Long, Long, Long)].collect()
    assert(got.nonEmpty)
    // brute force over ALL squares (no halo): clamped axis distance ×2
    val squares = graft.tables.Tables.customer(spark, sf0001)
      .select("c_custkey").as[Long].collect()
      .map(c => (c, (c * 2) % 40, (c / 20) * 2))
    def d2x4(ix: Long, iy: Long, sx: Long, sy: Long): Long = {
      val ddx = math.max(math.max(2 * sx - 2 * ix - 1, 2 * ix - 2 * sx - 1), 0L)
      val ddy = math.max(math.max(2 * sy - 2 * iy - 1, 2 * iy - 2 * sy - 1), 0L)
      ddx * ddx + ddy * ddy
    }
    got.foreach { case (k, c, d) =>
      val ix = (k * 7) % 39
      val iy = ((k * 13) % 75) * 2
      val (bc, bd) = squares.map { case (sc, sx, sy) => (sc, d2x4(ix, iy, sx, sy)) }
        .minBy { case (sc, sd) => (sd, sc) }
      // the halo answer must be the global nearest whenever the global
      // nearest itself is inside the halo radius (d ≤ cell diagonal);
      // beyond it the bounded-radius contract allows a miss
      if (bd <= 8) assert((c, d) === ((bc, bd)), s"order $k")
      assert(d >= bd)
    }
  }

  test("GeoJSON FeatureCollection write/read roundtrip") {
    GeoFunctions.register(spark)
    val dir = Files.createTempDirectory("geojson").toString
    val path = s"$dir/areas.geojson"
    val df = Seq(
      (1L, "north", 100.0, wkb(sq00)),
      (2L, "south", 250.5, wkb(sqFar))
    ).toDF("id", "name", "pop", "geometry")
    GeoJsonIO.writeFeatureCollection(df, path)
    val back = GeoJsonIO.read(spark, path)
    assert(back.count() === 2)
    assert(back.columns.sorted === Array("geometry", "id", "name", "pop"))
    val area = back.select(sum(GeoFunctions.cols.stArea($"geometry")))
      .as[Double].head()
    assert(math.abs(area - 2.0) < 1e-9)
    val ids = back.select($"id").as[Long].collect().sorted
    assert(ids === Array(1L, 2L))
  }
}
