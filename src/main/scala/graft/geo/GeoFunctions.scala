package graft.geo

import org.apache.spark.sql.{Column, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.locationtech.jts.geom.{Geometry, GeometryFactory}
import org.locationtech.jts.io.{WKBReader, WKBWriter, WKTReader, WKTWriter}
import org.locationtech.jts.operation.union.UnaryUnionOp
import scala.jdk.CollectionConverters._

/** Geometry operators (SURVEY.md §2.10) over WKB `BinaryType`
  * columns, backed by JTS (jts-core 1.20, shipped in /opt/spark/jars).
  *
  * Plain `udf`/`udaf` registration, no Catalyst Expression subclassing:
  * the polygon dimension is O(10³) rows (il_analysis_git.py:76), so
  * geometry cost is negligible next to the fact-table scan. WKB keeps
  * geometries opaque binary through shuffles/parquet.
  */
object GeoFunctions extends Serializable {

  @transient private lazy val factory = new GeometryFactory()

  def readWkb(b: Array[Byte]): Geometry = new WKBReader(factory).read(b)
  def writeWkb(g: Geometry): Array[Byte] = new WKBWriter().write(g)
  def readWkt(s: String): Geometry = new WKTReader(factory).read(s)
  def writeWkt(g: Geometry): String = new WKTWriter().write(g)

  /** Dissolve: union all geometries of a group into one
    * (il_analysis_git.py:97,:101 `unary_union`). Buffer accumulates
    * and unions in batches via JTS's cascaded union (log-depth, far
    * cheaper than pairwise left-fold for many polygons). */
  class UnionAgg extends Aggregator[Array[Byte], List[Geometry], Array[Byte]] {
    override def zero: List[Geometry] = Nil
    override def reduce(buf: List[Geometry], wkb: Array[Byte]): List[Geometry] =
      if (wkb == null) buf else compact(readWkb(wkb) :: buf)
    override def merge(a: List[Geometry], b: List[Geometry]): List[Geometry] =
      compact(a ++ b)
    override def finish(buf: List[Geometry]): Array[Byte] = buf match {
      case Nil => null
      case gs  => writeWkb(UnaryUnionOp.union(gs.asJava))
    }
    private def compact(gs: List[Geometry]): List[Geometry] =
      if (gs.length >= 64) List(UnaryUnionOp.union(gs.asJava)) else gs
    override def bufferEncoder: Encoder[List[Geometry]] = Encoders.kryo[List[Geometry]]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Register all geometry functions on a session; returns the names.
    * Safe to call repeatedly. */
  def register(spark: SparkSession): Unit = {
    import org.apache.spark.sql.functions.udf
    spark.udf.register("st_union_agg", udaf(new UnionAgg))
    spark.udf.register("st_geomfromtext",
      udf((s: String) => if (s == null) null else writeWkb(readWkt(s))))
    spark.udf.register("st_astext",
      udf((b: Array[Byte]) => if (b == null) null else writeWkt(readWkb(b))))
    spark.udf.register("st_geometrytype",
      udf((b: Array[Byte]) => if (b == null) null else readWkb(b).getGeometryType))
    spark.udf.register("st_convexhull",
      udf((b: Array[Byte]) => if (b == null) null else writeWkb(readWkb(b).convexHull())))
    spark.udf.register("st_boundary",
      udf((b: Array[Byte]) => if (b == null) null else writeWkb(readWkb(b).getBoundary)))
    spark.udf.register("st_area",
      udf((b: Array[Byte]) => if (b == null) null else Double.box(readWkb(b).getArea)))
    spark.udf.register("st_npoints",
      udf((b: Array[Byte]) => if (b == null) null else Int.box(readWkb(b).getNumPoints)))
    spark.udf.register("st_geomfromgeojson",
      udf((s: String) => if (s == null) null else writeWkb(GeoJsonCodec.parse(s))))
    spark.udf.register("st_asgeojson",
      udf((b: Array[Byte]) => if (b == null) null else GeoJsonCodec.write(readWkb(b))))
    spark.udf.register("st_point",
      udf((x: Double, y: Double) =>
        writeWkb(factory.createPoint(new org.locationtech.jts.geom.Coordinate(x, y)))))
    spark.udf.register("st_contains",
      udf((a: Array[Byte], b: Array[Byte]) =>
        if (a == null || b == null) null
        else Boolean.box(readWkb(a).contains(readWkb(b)))))
    spark.udf.register("st_distance",
      udf((a: Array[Byte], b: Array[Byte]) =>
        if (a == null || b == null) null
        else Double.box(readWkb(a).distance(readWkb(b)))))
  }

  /** Column helpers (call [[register]] first is NOT required — these
    * build expressions via callUDF only after registration; prefer
    * these in Scala code). */
  object cols {
    import org.apache.spark.sql.functions.call_udf
    def stUnionAgg(c: Column): Column = call_udf("st_union_agg", c)
    def stGeomFromText(c: Column): Column = call_udf("st_geomfromtext", c)
    def stAsText(c: Column): Column = call_udf("st_astext", c)
    def stGeometryType(c: Column): Column = call_udf("st_geometrytype", c)
    def stConvexHull(c: Column): Column = call_udf("st_convexhull", c)
    def stBoundary(c: Column): Column = call_udf("st_boundary", c)
    def stArea(c: Column): Column = call_udf("st_area", c)
    def stNPoints(c: Column): Column = call_udf("st_npoints", c)
    def stGeomFromGeoJson(c: Column): Column = call_udf("st_geomfromgeojson", c)
    def stAsGeoJson(c: Column): Column = call_udf("st_asgeojson", c)
    def stPoint(x: Column, y: Column): Column = call_udf("st_point", x, y)
    def stContains(a: Column, b: Column): Column = call_udf("st_contains", a, b)
    def stDistance(a: Column, b: Column): Column = call_udf("st_distance", a, b)
  }
}
