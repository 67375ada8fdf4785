package graft.io

import graft.geo.GeoFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** GeoJSON FeatureCollection source/sink (SURVEY.md §2.1/§2.11).
  *
  * Reader: Spark's multiLine JSON reader → `explode(features)` →
  * properties flattened + geometry re-serialized to WKB. The file is
  * a small static dimension (il_analysis_git.py:76), so single-task
  * parse cost is irrelevant; the output is broadcastable.
  *
  * Writer: two tiers —
  *  - [[writeFeatureCollection]]: reference-faithful single
  *    FeatureCollection document (map payload, il_analysis_git.py:173);
  *    collects (bounded: export frames are sampled/windowed map data).
  *  - [[writeFeatureLines]]: scale path — newline-delimited GeoJSON
  *    features written distributed (RFC 8142 style), one file per
  *    partition, no driver materialization.
  */
object GeoJsonIO {

  /** Read a FeatureCollection; returns properties.* + `geometry` WKB. */
  def read(spark: SparkSession, path: String): DataFrame = {
    GeoFunctions.register(spark)
    val raw = spark.read.option("multiLine", true).json(path)
    val features = raw.select(explode(col("features")).as("f"))
    val propCols = features.select(col("f.properties.*")).columns
    features.select(
      propCols.map(c => col(s"f.properties.`$c`").as(c)) :+
        GeoFunctions.cols.stGeomFromGeoJson(to_json(col("f.geometry"))).as("geometry"): _*)
  }

  /** Build one GeoJSON Feature string per row: all non-geometry
    * columns become properties. */
  def featureJson(df: DataFrame, geomCol: String = "geometry"): DataFrame = {
    val props = df.columns.filter(_ != geomCol).map(col)
    df.select(concat(
      lit("""{"type":"Feature","properties":"""),
      to_json(struct(props: _*)),
      lit(""","geometry":"""),
      GeoFunctions.cols.stAsGeoJson(col(geomCol)),
      lit("}")).as("feature"))
  }

  /** Reference-faithful FeatureCollection document (driver-assembled;
    * export frames are map-payload-sized). */
  def writeFeatureCollection(df: DataFrame, path: String,
                             geomCol: String = "geometry"): Unit = {
    GeoFunctions.register(df.sparkSession)
    val features = featureJson(df, geomCol).collect().map(_.getString(0))
    val doc = features.mkString(
      """{"type":"FeatureCollection","features":[""", ",", "]}")
    Files.write(Paths.get(path), doc.getBytes(StandardCharsets.UTF_8))
  }

  /** Newline-delimited features, written distributed. */
  def writeFeatureLines(df: DataFrame, path: String,
                        geomCol: String = "geometry"): Unit = {
    GeoFunctions.register(df.sparkSession)
    featureJson(df, geomCol).write.mode("overwrite").text(path)
  }

  /** Read newline-delimited GeoJSON features (the
    * [[writeFeatureLines]] scale path back in): fully distributed —
    * Spark's line-oriented JSON reader splits the input like any text
    * source, properties flatten to columns, geometry re-parses to
    * WKB. Unlike the FeatureCollection form, NDJSON scans in parallel
    * at any size, which is why it is the 100 TB interchange layout. */
  def readFeatureLines(spark: SparkSession, path: String): DataFrame = {
    GeoFunctions.register(spark)
    val raw = spark.read.json(path)
    val propCols = raw.select(col("properties.*")).columns
    // a MIXED-geometry layer (Points next to Polygons) has conflicting
    // coordinate nesting, so JSON inference collapses the conflicting
    // subtree to its raw text — either the whole `geometry`, or
    // `coordinates` at whatever array depth the nesting first
    // disagrees (Point×Polygon → array<string>). The raw text is
    // already exactly what the GeoJSON parser wants; to_json would
    // re-QUOTE it, so splice it back literally instead.
    import org.apache.spark.sql.types.{ArrayType, DataType, StringType, StructType}
    def rawJson(dt: DataType, c: Column): Column = dt match {
      case StringType => c // raw subtree text, splice as-is
      case ArrayType(et, _) =>
        concat(lit("["), array_join(transform(c, x => rawJson(et, x)), ","), lit("]"))
      case _: StructType => to_json(c)
      case _ => c.cast(StringType) // numeric leaf of a mixed-depth array
    }
    def hasRawText(dt: DataType): Boolean = dt match {
      case StringType => true
      case ArrayType(et, _) => hasRawText(et)
      case _ => false
    }
    val geomJson = raw.schema("geometry").dataType match {
      case StringType => col("geometry")
      case st: StructType if st.fieldNames.contains("coordinates") &&
          hasRawText(st("coordinates").dataType) =>
        concat(lit("{\"type\":\""), col("geometry.type"),
          lit("\",\"coordinates\":"),
          rawJson(st("coordinates").dataType, col("geometry.coordinates")),
          lit("}"))
      case _ => to_json(col("geometry"))
    }
    raw.select(
      propCols.map(c => col(s"properties.`$c`").as(c)) :+
        GeoFunctions.cols.stGeomFromGeoJson(geomJson).as("geometry"): _*)
  }
}
