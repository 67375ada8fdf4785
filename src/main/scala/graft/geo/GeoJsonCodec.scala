package graft.geo

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.locationtech.jts.geom._

/** Hand-rolled GeoJSON geometry codec over json4s (shipped with
  * Spark) + jts-core — the environment has no jts-io-common jar.
  * Supports the geometry types the reference touches
  * (il_analysis_git.py:76,:98-101,:170-175): Point, LineString,
  * Polygon, MultiPolygon, MultiLineString, plus GeometryCollection
  * for boundary outputs.
  */
object GeoJsonCodec {

  private val factory = new GeometryFactory()

  def parse(json: String): Geometry = fromJValue(JsonMethods.parse(json))

  private def coords1(v: JValue): Coordinate = v match {
    case JArray(xs) =>
      val d = xs.map(num)
      new Coordinate(d(0), d(1))
    case other => throw new IllegalArgumentException(s"bad coordinate: $other")
  }

  private def num(v: JValue): Double = v match {
    case JDouble(d) => d
    case JInt(i) => i.toDouble
    case JDecimal(d) => d.toDouble
    case JLong(l) => l.toDouble
    case other => throw new IllegalArgumentException(s"bad number: $other")
  }

  private def ring(v: JValue): LinearRing = v match {
    case JArray(pts) => factory.createLinearRing(pts.map(coords1).toArray)
    case other => throw new IllegalArgumentException(s"bad ring: $other")
  }

  private def polygon(v: JValue): Polygon = v match {
    case JArray(rings) if rings.nonEmpty =>
      factory.createPolygon(ring(rings.head), rings.tail.map(ring).toArray)
    case _ => factory.createPolygon()
  }

  /** Parse an already-materialized geometry JSON subtree (used by the
    * DSv2 reader, which holds the parsed feature and must not
    * re-render + re-parse through a string). */
  def fromJValue(j: JValue): Geometry = {
    val JString(tpe) = (j \ "type"): @unchecked
    val cs = j \ "coordinates"
    tpe match {
      case "Point" => factory.createPoint(coords1(cs))
      case "LineString" =>
        val JArray(pts) = cs: @unchecked
        factory.createLineString(pts.map(coords1).toArray)
      case "MultiLineString" =>
        val JArray(lines) = cs: @unchecked
        factory.createMultiLineString(lines.map { l =>
          val JArray(pts) = l: @unchecked
          factory.createLineString(pts.map(coords1).toArray)
        }.toArray)
      case "Polygon" => polygon(cs)
      case "MultiPolygon" =>
        val JArray(polys) = cs: @unchecked
        factory.createMultiPolygon(polys.map(polygon).toArray)
      case "GeometryCollection" =>
        val JArray(geoms) = (j \ "geometries"): @unchecked
        factory.createGeometryCollection(geoms.map(fromJValue).toArray)
      case other => throw new IllegalArgumentException(s"unsupported geometry: $other")
    }
  }

  def write(g: Geometry): String = {
    def pt(c: Coordinate) = s"[${c.x},${c.y}]"
    def line(cs: Array[Coordinate]) = cs.map(pt).mkString("[", ",", "]")
    def poly(p: Polygon): String = {
      val rings = (Seq(p.getExteriorRing) ++
        (0 until p.getNumInteriorRing).map(p.getInteriorRingN))
        .map(r => line(r.getCoordinates))
      rings.mkString("[", ",", "]")
    }
    g match {
      case p: Point =>
        s"""{"type":"Point","coordinates":${pt(p.getCoordinate)}}"""
      case l: LineString =>
        s"""{"type":"LineString","coordinates":${line(l.getCoordinates)}}"""
      case m: MultiLineString =>
        val parts = (0 until m.getNumGeometries)
          .map(i => line(m.getGeometryN(i).getCoordinates))
        s"""{"type":"MultiLineString","coordinates":${parts.mkString("[", ",", "]")}}"""
      case p: Polygon =>
        s"""{"type":"Polygon","coordinates":${poly(p)}}"""
      case m: MultiPolygon =>
        val parts = (0 until m.getNumGeometries)
          .map(i => poly(m.getGeometryN(i).asInstanceOf[Polygon]))
        s"""{"type":"MultiPolygon","coordinates":${parts.mkString("[", ",", "]")}}"""
      case gc: GeometryCollection =>
        val parts = (0 until gc.getNumGeometries).map(i => write(gc.getGeometryN(i)))
        s"""{"type":"GeometryCollection","geometries":${parts.mkString("[", ",", "]")}}"""
      case other =>
        throw new IllegalArgumentException(s"unsupported geometry: ${other.getGeometryType}")
    }
  }
}
