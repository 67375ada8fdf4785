package graft.queries

import graft.geo.GeoFunctions
import graft.io.GeoJsonIO
import graft.ops.Num
import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Geometry operator surface (SURVEY.md §2.10) parameterized onto the
  * driver tables: deterministic unit-square polygons are synthesized
  * from `customer` keys (the driver dataset has no geometry column),
  * then dissolved/hulled/boundaried exactly as the reference does to
  * its areas layer. Rows-only driver checks (geometry is not DuckDB-
  * expressible); semantics are unit-tested in GeoSpec.
  */
object GeoQueries {

  /** One unit square per customer on a sparse grid — `2·custkey`
    * spacing guarantees squares of one nation are mostly disjoint, so
    * dissolve produces MultiPolygons and exercises the reference's
    * convex-hull fallback branch (il_analysis_git.py:98-101). */
  def squares(spark: SparkSession, dir: String): DataFrame = {
    GeoFunctions.register(spark)
    val x = (col("c_custkey") * 2) % 40
    val y = floor(col("c_custkey") / 20) * 2
    val wkt = concat(
      lit("POLYGON(("),
      x, lit(" "), y, lit(", "),
      x + 1, lit(" "), y, lit(", "),
      x + 1, lit(" "), y + 1, lit(", "),
      x, lit(" "), y + 1, lit(", "),
      x, lit(" "), y, lit("))"))
    Tables.customer(spark, dir).select(
      col("c_custkey"), col("c_nationkey"),
      GeoFunctions.cols.stGeomFromText(wkt).as("geometry"))
  }

  /** Dissolve per nation + MultiPolygon→convex-hull fallback
    * (il_analysis_git.py:97-101). */
  private def dissolve(spark: SparkSession, dir: String): DataFrame = {
    val sq = squares(spark, dir)
    val unioned = sq.groupBy(col("c_nationkey"))
      .agg(GeoFunctions.cols.stUnionAgg(col("geometry")).as("geometry"),
        count(lit(1)).as("n_areas"))
      .withColumn("geom_type", GeoFunctions.cols.stGeometryType(col("geometry")))
      .withColumn("geometry",
        when(col("geom_type") === "MultiPolygon",
          GeoFunctions.cols.stConvexHull(col("geometry")))
          .otherwise(col("geometry")))
    unioned.select(
      col("c_nationkey"), col("n_areas"), col("geom_type"),
      floor(GeoFunctions.cols.stArea(col("geometry")) * 100 + lit(1e-6)).as("area_x100"),
      GeoFunctions.cols.stNPoints(col("geometry")).as("n_points"))
      .orderBy("c_nationkey")
  }

  /** Polygon → boundary lines layer (il_analysis_git.py:174). */
  private def boundary(spark: SparkSession, dir: String): DataFrame =
    squares(spark, dir).select(
      col("c_custkey"),
      GeoFunctions.cols.stGeometryType(
        GeoFunctions.cols.stBoundary(col("geometry"))).as("boundary_type"),
      GeoFunctions.cols.stNPoints(col("geometry")).as("n_points"),
      GeoFunctions.cols.stAsText(
        GeoFunctions.cols.stBoundary(col("geometry"))).as("boundary_wkt"))
      .orderBy("c_custkey")

  /** Exact oracle for [[boundary]]: the fixture squares are pure
    * integer arithmetic, so the JTS parse → getBoundary → WKB
    * roundtrip (which demotes LinearRing to LineString — WKB has no
    * ring type) → WKT-write path (integers rendered bare by JTS's
    * OrdinateFormat) is reproducible as string concatenation.
    * This hash-verifies the geometry UDF pipeline end to end. */
  private val boundarySql =
    """SELECT c_custkey, 'LineString' AS boundary_type, 5 AS n_points,
      |  'LINESTRING (' || x || ' ' || y || ', ' || (x+1) || ' ' || y || ', '
      |    || (x+1) || ' ' || (y+1) || ', ' || x || ' ' || (y+1) || ', '
      |    || x || ' ' || y || ')' AS boundary_wkt
      |FROM (SELECT c_custkey, (c_custkey*2)%40 AS x,
      |        CAST(floor(c_custkey/20.0) AS BIGINT)*2 AS y FROM customer) t
      |ORDER BY c_custkey""".stripMargin

  /** Dissolve facts BEFORE the hull fallback: the grid spacing (2
    * units, 1-unit squares) makes squares pairwise disjoint, so the
    * per-nation JTS union has area = 100·distinct-cells and
    * 5·distinct-cells points, and is a MultiPolygon unless the nation
    * collapsed to one cell. All arithmetic — so unlike [[dissolve]]
    * (whose convex-hull branch is genuinely geometric and stays
    * rows-checked + spec-tested), the union path itself is
    * hash-verified against a relational oracle. */
  private def dissolveStats(spark: SparkSession, dir: String): DataFrame = {
    val sq = squares(spark, dir)
    sq.groupBy(col("c_nationkey"))
      .agg(
        count(lit(1)).as("n_areas"),
        countDistinct((col("c_custkey") * 2) % 40 * 1000 +
          floor(col("c_custkey") / 20) * 2).as("n_cells"),
        GeoFunctions.cols.stUnionAgg(col("geometry")).as("geometry"))
      .select(
        col("c_nationkey"), col("n_areas"), col("n_cells"),
        GeoFunctions.cols.stGeometryType(col("geometry")).as("geom_type"),
        floor(GeoFunctions.cols.stArea(col("geometry")) * 100 + lit(1e-6)).as("area_x100"),
        GeoFunctions.cols.stNPoints(col("geometry")).cast("long").as("n_points"))
      .orderBy("c_nationkey")
  }

  private val dissolveStatsSql =
    """SELECT c_nationkey, COUNT(*) AS n_areas, n_cells,
      |  CASE WHEN n_cells = 1 THEN 'Polygon' ELSE 'MultiPolygon' END AS geom_type,
      |  n_cells * 100 AS area_x100, n_cells * 5 AS n_points
      |FROM customer JOIN (
      |  SELECT c_nationkey AS nk,
      |    COUNT(DISTINCT (c_custkey*2)%40 * 1000 + CAST(floor(c_custkey/20.0) AS BIGINT)*2) AS n_cells
      |  FROM customer GROUP BY c_nationkey) cells ON c_nationkey = nk
      |GROUP BY c_nationkey, n_cells
      |ORDER BY c_nationkey""".stripMargin

  /** EXACT WKT oracle for the dissolve's geometric branch — the
    * union → MultiPolygon → convex-hull path (il_analysis_git.py:
    * 97-101) that [[dissolve]] itself can only rows-check.
    *
    * Fixture: a unit square at `(2i, 2i)` per customer, `i = custkey
    * mod (3 + nationkey)` — a STAIRCASE along the diagonal whose
    * per-nation union is a MultiPolygon of disjoint squares and whose
    * convex hull is an arithmetically-predictable hexagon: with
    * `a = 2·min(i)`, `b = 2·max(i)`, JTS renders (empirically pinned,
    * clockwise from the min vertex, collinear staircase corners
    * eliminated by the hull):
    * `POLYGON ((a a, a a+1, b b+1, b+1 b+1, b+1 b, a+1 a, a a))`.
    * The oracle rebuilds that string with SQL min/max aggregates, so
    * the whole parse → union-aggregate → type-dispatch → convex-hull →
    * WKB → WKT chain is hash-verified, not just rows-counted.
    *
    * PINNED to the JTS in /opt/spark/jars: the hull's vertex COUNT and
    * shape are geometry (stable), but the ring's start vertex and
    * orientation are `ConvexHull` implementation choices — a JTS
    * version bump that reorders the ring would hash-fail this oracle
    * on identical geometry. That is a deliberate exactness/stability
    * trade (FIXTURES.md §A2 note): loosen by normalizing both sides
    * (e.g. ST_Normalize or lexicographic ring rotation) if it ever
    * trips. */
  private def dissolveWkt(spark: SparkSession, dir: String): DataFrame = {
    GeoFunctions.register(spark)
    val x = (col("c_custkey") % (lit(3) + col("c_nationkey"))) * 2
    val wkt = concat(
      lit("POLYGON(("),
      x, lit(" "), x, lit(", "),
      x + 1, lit(" "), x, lit(", "),
      x + 1, lit(" "), x + 1, lit(", "),
      x, lit(" "), x + 1, lit(", "),
      x, lit(" "), x, lit("))"))
    val stairs = Tables.customer(spark, dir).select(
      col("c_nationkey"),
      GeoFunctions.cols.stGeomFromText(wkt).as("geometry"))
    stairs.groupBy(col("c_nationkey"))
      .agg(GeoFunctions.cols.stUnionAgg(col("geometry")).as("geometry"),
        count(lit(1)).as("n_areas"))
      .withColumn("geom_type", GeoFunctions.cols.stGeometryType(col("geometry")))
      .withColumn("geometry",
        when(col("geom_type") === "MultiPolygon",
          GeoFunctions.cols.stConvexHull(col("geometry")))
          .otherwise(col("geometry")))
      .select(
        col("c_nationkey"), col("n_areas"), col("geom_type"),
        GeoFunctions.cols.stNPoints(col("geometry")).cast("long").as("n_points"),
        GeoFunctions.cols.stAsText(col("geometry")).as("hull_wkt"))
      .orderBy("c_nationkey")
  }

  /** The nc = 1 branch (all of a nation's squares on ONE cell — union
    * dedups to a Polygon, which JTS rebuilds starting at (a+1, a)
    * clockwise) is unreachable on the driver data (hundreds of
    * customers per nation mod >= 3) but kept exact for completeness. */
  private val dissolveWktSql =
    """WITH cells AS (
      |  SELECT c_nationkey, COUNT(*) AS n_areas,
      |    MIN(c_custkey % (3 + c_nationkey)) * 2 AS a,
      |    MAX(c_custkey % (3 + c_nationkey)) * 2 AS b,
      |    COUNT(DISTINCT c_custkey % (3 + c_nationkey)) AS nc
      |  FROM customer GROUP BY c_nationkey)
      |SELECT c_nationkey, n_areas,
      |  CASE WHEN nc = 1 THEN 'Polygon' ELSE 'MultiPolygon' END AS geom_type,
      |  CAST(CASE WHEN nc = 1 THEN 5 ELSE 7 END AS BIGINT) AS n_points,
      |  CASE WHEN nc = 1 THEN
      |    'POLYGON ((' || (a+1) || ' ' || a || ', ' || a || ' ' || a || ', '
      |      || a || ' ' || (a+1) || ', ' || (a+1) || ' ' || (a+1) || ', '
      |      || (a+1) || ' ' || a || '))'
      |  ELSE
      |    'POLYGON ((' || a || ' ' || a || ', ' || a || ' ' || (a+1) || ', '
      |      || b || ' ' || (b+1) || ', ' || (b+1) || ' ' || (b+1) || ', '
      |      || (b+1) || ' ' || b || ', ' || (a+1) || ' ' || a || ', '
      |      || a || ' ' || a || '))'
      |  END AS hull_wkt
      |FROM cells ORDER BY c_nationkey""".stripMargin

  /** GeoJSON source roundtrip (SURVEY §2.1): write the squares layer
    * as a FeatureCollection, read it back through the multiLine-JSON →
    * explode → WKB path, and surface the properties + re-parsed
    * geometry facts. The oracle checks the property values survive the
    * full serialize/parse cycle (geometry facts are constants of the
    * fixture: every feature is a 5-point Polygon ring). */
  private def scanGeojson(spark: SparkSession, dir: String): DataFrame = {
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_scan_geojson.json"
    GeoJsonIO.writeFeatureCollection(
      squares(spark, dir).select(col("c_custkey"), col("c_nationkey"), col("geometry")),
      path)
    GeoJsonIO.read(spark, path).select(
      col("c_custkey").cast("long").as("c_custkey"),
      col("c_nationkey").cast("int").as("c_nationkey"),
      GeoFunctions.cols.stGeometryType(col("geometry")).as("gtype"),
      GeoFunctions.cols.stNPoints(col("geometry")).cast("int").as("npts"))
      .orderBy("c_custkey")
  }

  private val scanGeojsonSql =
    """SELECT c_custkey, CAST(c_nationkey AS INT) AS c_nationkey,
      |  'Polygon' AS gtype, 5 AS npts
      |FROM customer ORDER BY c_custkey""".stripMargin

  /** Same roundtrip through the native DataSource V2 connector
    * ([[graft.io.GeoJsonDataSource]], `format("geojson")`): the
    * FeatureCollection is planned one-partition-per-file with column
    * pruning pushed into the parser (unselected geometry is never
    * parsed — on polygon layers the coordinates are the payload).
    * Same oracle as q_scan_geojson: the two readers must agree. */
  private def scanGeojsonV2(spark: SparkSession, dir: String): DataFrame = {
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_scan_geojson_v2.json"
    GeoJsonIO.writeFeatureCollection(
      squares(spark, dir).select(col("c_custkey"), col("c_nationkey"), col("geometry")),
      path)
    GeoFunctions.register(spark)
    spark.read.format("geojson").load(path).select(
      col("c_custkey").cast("long").as("c_custkey"),
      col("c_nationkey").cast("int").as("c_nationkey"),
      GeoFunctions.cols.stGeometryType(col("geometry")).as("gtype"),
      GeoFunctions.cols.stNPoints(col("geometry")).cast("int").as("npts"))
      .orderBy("c_custkey")
  }

  /** GeoJSON WRITER oracle (il_analysis_git.py:170-175 — the layer
    * export): write the squares layer as a FeatureCollection via
    * [[GeoJsonIO.writeFeatureCollection]], read it back through the
    * DSv2 connector, and surface the FULL WKT of every geometry. The
    * fixture is pure integer arithmetic, so the writer's JTS→GeoJSON
    * coordinate rendering, the reader's GeoJSON→JTS→WKB parse and the
    * final WKT print are all reproducible as string concatenation in
    * the oracle — unlike q_scan_geojson (properties + shape constants
    * only), this hash-verifies the writer's geometry serialization
    * byte for byte. */
  private def writeGeojson(spark: SparkSession, dir: String): DataFrame = {
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_write_geojson.json"
    GeoJsonIO.writeFeatureCollection(
      squares(spark, dir).select(col("c_custkey"), col("c_nationkey"), col("geometry")),
      path)
    GeoFunctions.register(spark)
    spark.read.format("geojson").load(path).select(
      col("c_custkey").cast("long").as("c_custkey"),
      col("c_nationkey").cast("int").as("c_nationkey"),
      GeoFunctions.cols.stAsText(col("geometry")).as("wkt"))
      .orderBy("c_custkey")
  }

  /** Same contract through the DISTRIBUTED writer/reader pair
    * ([[GeoJsonIO.writeFeatureLines]]/`readFeatureLines`, RFC 8142
    * style NDJSON): no driver materialization on either side — the
    * layout both legs would use at 100 TB. Same oracle: the two
    * writer tiers must serialize identically. */
  private def writeGeojsonLines(spark: SparkSession, dir: String): DataFrame = {
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_write_geojson_lines"
    GeoJsonIO.writeFeatureLines(
      squares(spark, dir).select(col("c_custkey"), col("c_nationkey"), col("geometry")),
      path)
    GeoJsonIO.readFeatureLines(spark, path).select(
      col("c_custkey").cast("long").as("c_custkey"),
      col("c_nationkey").cast("int").as("c_nationkey"),
      GeoFunctions.cols.stAsText(col("geometry")).as("wkt"))
      .orderBy("c_custkey")
  }

  /** Same contract through the CONNECTOR's own write path
    * (`df.write.format("geojson")` — the DSv2 `BatchWrite` added in
    * round 8): a distributed, one-FeatureCollection-per-partition
    * write with no driver materialization at all, read back through
    * the same connector. Same oracle again: all three writer paths
    * must serialize identically. */
  private def writeGeojsonV2(spark: SparkSession, dir: String): DataFrame = {
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_write_geojson_v2_dir"
    GeoFunctions.register(spark)
    squares(spark, dir).select(col("c_custkey"), col("c_nationkey"), col("geometry"))
      .repartition(4)
      .write.format("geojson").mode("overwrite").save(path)
    spark.read.format("geojson").load(path).select(
      col("c_custkey").cast("long").as("c_custkey"),
      col("c_nationkey").cast("int").as("c_nationkey"),
      GeoFunctions.cols.stAsText(col("geometry")).as("wkt"))
      .orderBy("c_custkey")
  }

  /** JTS WKT of the fixture square, reproduced arithmetically (same
    * pin as boundarySql: integers render bare, `POLYGON ((` with the
    * double space, ring order preserved from the source text). */
  private val writeGeojsonSql =
    """SELECT c_custkey, CAST(c_nationkey AS INT) AS c_nationkey,
      |  'POLYGON ((' || x || ' ' || y || ', ' || (x+1) || ' ' || y || ', '
      |    || (x+1) || ' ' || (y+1) || ', ' || x || ' ' || (y+1) || ', '
      |    || x || ' ' || y || '))' AS wkt
      |FROM (SELECT c_custkey, c_nationkey, (c_custkey*2)%40 AS x,
      |        CAST(floor(c_custkey/20.0) AS BIGINT)*2 AS y FROM customer) t
      |ORDER BY c_custkey""".stripMargin

  /** Grid-bucketed spatial join: point-in-polygon via an integer
    * grid-cell equi-join, then exact JTS containment. This is the
    * 100 TB spatial-join shape — geometries are bucketed by covering
    * grid cell so the candidate join is a plain hash join on two
    * ints (no O(n·m) nested loop, no R-tree broadcast needed);
    * the exact `st_contains` check runs only on cell-colocated
    * candidates. Points are synthesized from `orders` keys, squares
    * from `customer` keys; because both derive from pure integer
    * arithmetic, the oracle replicates the whole join relationally
    * (containment in an axis-aligned unit square IS arithmetic),
    * hash-verifying the geometry path end to end. */
  private def spatialJoin(spark: SparkSession, dir: String): DataFrame = {
    GeoFunctions.register(spark)
    val sq = squares(spark, dir)
      .withColumn("cell_x", ((col("c_custkey") * 2) % 40).cast("long"))
      .withColumn("cell_y", (floor(col("c_custkey") / 20) * 2).cast("long"))
    val pts = Tables.orders(spark, dir).select(
        col("o_orderkey"),
        (((col("o_orderkey") * 7) % 39).cast("double") + 0.5).as("px"),
        ((((col("o_orderkey") * 13) % 75) * 2).cast("double") + 0.5).as("py"))
      .withColumn("cell_x", floor(col("px")).cast("long"))
      .withColumn("cell_y", floor(col("py")).cast("long"))
    pts.join(sq, Seq("cell_x", "cell_y"))
      .filter(GeoFunctions.cols.stContains(col("geometry"),
        GeoFunctions.cols.stPoint(col("px"), col("py"))))
      .select(col("o_orderkey"), col("c_custkey"), col("c_nationkey"))
      .orderBy("o_orderkey", "c_custkey")
  }

  private val spatialJoinSql =
    """SELECT o.o_orderkey, c.c_custkey, c.c_nationkey
      |FROM orders o JOIN customer c
      |  ON (o.o_orderkey * 7) % 39 = (c.c_custkey * 2) % 40
      | AND ((o.o_orderkey * 13) % 75) * 2 = CAST(floor(c.c_custkey / 20.0) AS BIGINT) * 2
      |ORDER BY o_orderkey, c_custkey""".stripMargin

  /** Bounded-radius KNN spatial join (k = 1 within a one-cell halo):
    * each point finds its nearest square among the 3×3 grid cells
    * around it — the distributed spatial-KNN shape (halo/border
    * replication keeps the candidate join a plain equi-join on cell
    * ints; candidates per point are O(9 × cell occupancy), never a
    * nested loop over all geometries). The exact leg is JTS
    * `distance` (0 inside), argmin per point via a rank-1 window
    * (WindowGroupLimit). Distances quantize exactly: with half-
    * integer point coords and integer squares, 4·d² is an integer,
    * so `roundEps(4·d²)` is bit-stable and the oracle reproduces the
    * whole join arithmetically (clamped axis distances), hash-
    * verifying the JTS path. Points with an empty halo drop — the
    * documented bounded-radius semantic. */
  private def spatialKnn(spark: SparkSession, dir: String): DataFrame = {
    GeoFunctions.register(spark)
    val sq = squares(spark, dir)
      .withColumn("cell_x", ((col("c_custkey") * 2) % 40).cast("long"))
      .withColumn("cell_y", (floor(col("c_custkey") / 20) * 2).cast("long"))
    val offsets = for { dx <- -1 to 1; dy <- -1 to 1 } yield (dx, dy)
    val pts = Tables.orders(spark, dir).select(
        col("o_orderkey"),
        (((col("o_orderkey") * 7) % 39).cast("double") + 0.5).as("px"),
        ((((col("o_orderkey") * 13) % 75) * 2).cast("double") + 0.5).as("py"))
      .withColumn("off", explode(typedLit(offsets)))
      .select(col("o_orderkey"), col("px"), col("py"),
        (floor(col("px")) + col("off._1")).cast("long").as("cell_x"),
        (floor(col("py")) + col("off._2")).cast("long").as("cell_y"))
    val d = GeoFunctions.cols.stDistance(col("geometry"),
      GeoFunctions.cols.stPoint(col("px"), col("py")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_orderkey").orderBy(col("d2x4"), col("c_custkey"))
    pts.join(sq, Seq("cell_x", "cell_y"))
      .withColumn("d2x4", Num.roundEps(d * d * 4))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") === 1)
      .select(col("o_orderkey"), col("c_custkey"), col("c_nationkey"),
        col("d2x4"))
      .orderBy("o_orderkey")
  }

  /** Clamped axis distance ×2 (integers): point px = ix + 0.5 vs
    * square [sx, sx+1]. */
  private val spatialKnnSql =
    """WITH sq AS (
      |  SELECT c_custkey, c_nationkey,
      |    (c_custkey * 2) % 40 AS sx,
      |    CAST(floor(c_custkey / 20.0) AS BIGINT) * 2 AS sy
      |  FROM customer),
      |pts AS (
      |  SELECT o_orderkey,
      |    (o_orderkey * 7) % 39 AS ix,
      |    ((o_orderkey * 13) % 75) * 2 AS iy
      |  FROM orders),
      |cand AS (
      |  SELECT p.o_orderkey, s.c_custkey, s.c_nationkey,
      |    GREATEST(2*s.sx - 2*p.ix - 1, 2*p.ix - 2*s.sx - 1, 0) AS ddx2,
      |    GREATEST(2*s.sy - 2*p.iy - 1, 2*p.iy - 2*s.sy - 1, 0) AS ddy2
      |  FROM pts p JOIN sq s
      |    ON s.sx BETWEEN p.ix - 1 AND p.ix + 1
      |   AND s.sy BETWEEN p.iy - 1 AND p.iy + 1),
      |ranked AS (
      |  SELECT o_orderkey, c_custkey, c_nationkey,
      |    CAST(ddx2*ddx2 + ddy2*ddy2 AS BIGINT) AS d2x4,
      |    ROW_NUMBER() OVER (PARTITION BY o_orderkey
      |      ORDER BY ddx2*ddx2 + ddy2*ddy2, c_custkey) AS rk
      |  FROM cand)
      |SELECT o_orderkey, c_custkey, c_nationkey, d2x4
      |FROM ranked WHERE rk = 1
      |ORDER BY o_orderkey""".stripMargin

  /** Aggregate pushdown through the DSv2 connector (round 10): write
    * the squares layer, then run ungrouped COUNT(*)/MIN/MAX through
    * `spark.read.format("geojson")` — the ScanBuilder's
    * `SupportsPushDownAggregates` folds each FILE to one partial row
    * inside the parser (no per-feature rows cross the source
    * boundary, no coordinate is ever decoded), and Spark's final
    * aggregate merges |files| rows. GeoJsonSourceV2Spec pins the plan
    * shape (`PushedAggregates` present; grouped/filtered aggregates
    * decline); this query pins the VALUES against DuckDB. */
  private def geojsonAggPush(spark: SparkSession, dir: String): DataFrame = {
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_geojson_agg_push.json"
    graft.io.GeoJsonIO.writeFeatureCollection(
      squares(spark, dir).select(col("c_custkey"), col("c_nationkey"), col("geometry")),
      path)
    spark.read.format("geojson").load(path).agg(
      count(lit(1)).as("n_features"),
      min(col("c_custkey")).cast("long").as("min_key"),
      max(col("c_custkey")).cast("long").as("max_key"),
      min(col("c_nationkey")).cast("long").as("min_nat"),
      max(col("c_nationkey")).cast("long").as("max_nat"))
  }

  private val geojsonAggPushSql =
    """SELECT COUNT(*) AS n_features,
      |  CAST(MIN(c_custkey) AS BIGINT) AS min_key,
      |  CAST(MAX(c_custkey) AS BIGINT) AS max_key,
      |  CAST(MIN(c_nationkey) AS BIGINT) AS min_nat,
      |  CAST(MAX(c_nationkey) AS BIGINT) AS max_nat
      |FROM customer""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q_spatial_knn", spatialKnn, Some(spatialKnnSql)),
    Q("q_dissolve", dissolve, None),
    Q("q_dissolve_wkt", dissolveWkt, Some(dissolveWktSql)),
    Q("q_dissolve_stats", dissolveStats, Some(dissolveStatsSql)),
    Q("q_boundary", boundary, Some(boundarySql)),
    Q("q_scan_geojson", scanGeojson, Some(scanGeojsonSql)),
    Q("q_scan_geojson_v2", scanGeojsonV2, Some(scanGeojsonSql)),
    Q("q_write_geojson", writeGeojson, Some(writeGeojsonSql)),
    Q("q_write_geojson_lines", writeGeojsonLines, Some(writeGeojsonSql)),
    Q("q_write_geojson_v2", writeGeojsonV2, Some(writeGeojsonSql)),
    Q("q_spatial_join", spatialJoin, Some(spatialJoinSql)),
    Q("q_geojson_agg_push", geojsonAggPush, Some(geojsonAggPushSql)),
  )
}
