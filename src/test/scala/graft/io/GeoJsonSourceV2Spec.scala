package graft.io

import graft.SparkSpec
import graft.geo.GeoFunctions
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

class GeoJsonSourceV2Spec extends SparkSpec {
  import spark.implicits._

  private def write(path: String, doc: String): Unit =
    Files.write(Paths.get(path), doc.getBytes(StandardCharsets.UTF_8))

  private val fixture =
    """{"type":"FeatureCollection","features":[
      |{"type":"Feature","properties":{"id":1,"name":"a","score":1},
      | "geometry":{"type":"Polygon","coordinates":[[[0,0],[0,1],[1,1],[1,0],[0,0]]]}},
      |{"type":"Feature","properties":{"id":2,"name":"b","score":2.5},
      | "geometry":{"type":"Point","coordinates":[3,4]}},
      |{"type":"Feature","properties":{"id":3,"name":null,"score":3},
      | "geometry":null}
      |]}""".stripMargin

  private val tmp = System.getProperty("java.io.tmpdir")

  test("schema inference: first-seen property order, long->double widening, WKB geometry") {
    val p = s"$tmp/geojson_v2_infer.json"
    write(p, fixture)
    val df = spark.read.format("geojson").load(p)
    assert(df.schema.map(f => (f.name, f.dataType.simpleString)) === Seq(
      ("id", "bigint"), ("name", "string"),
      ("score", "double"), // feature 1 has long 1, feature 2 has 2.5
      ("geometry", "binary")))
  }

  test("reads features: values, nulls, geometry round-trips through WKB") {
    GeoFunctions.register(spark)
    val p = s"$tmp/geojson_v2_read.json"
    write(p, fixture)
    val out = spark.read.format("geojson").load(p)
      .select(col("id"), col("name"), col("score"),
        GeoFunctions.cols.stAsText(col("geometry")).as("wkt"))
      .as[(Long, Option[String], Double, Option[String])]
      .collect().sortBy(_._1)
    assert(out === Seq(
      (1L, Some("a"), 1.0, Some("POLYGON ((0 0, 0 1, 1 1, 1 0, 0 0))")),
      (2L, Some("b"), 2.5, Some("POINT (3 4)")),
      (3L, None, 3.0, None)))
  }

  test("agrees with the multiLine-JSON fallback reader on an engine-written layer") {
    GeoFunctions.register(spark)
    val p = s"$tmp/geojson_v2_roundtrip.json"
    val layer = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v")
      .select(col("k"), col("v"),
        GeoFunctions.cols.stGeomFromText(
          concat(lit("POLYGON (("), col("k"), lit(" 0, "), col("k"),
            lit(" 1, "), col("k") + 1, lit(" 1, "), col("k"),
            lit(" 0))"))).as("geometry"))
    GeoJsonIO.writeFeatureCollection(layer, p)
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(col("k").cast("long"), col("v").cast("long"),
        GeoFunctions.cols.stAsText(col("geometry")).as("wkt"))
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    val v2 = canon(spark.read.format("geojson").load(p))
    val fallback = canon(GeoJsonIO.read(spark, p))
    assert(v2 === fallback)
    assert(v2.length === 3)
  }

  test("column pruning reaches the scan: geometry never parsed when not selected") {
    val p = s"$tmp/geojson_v2_prune.json"
    write(p, fixture)
    val narrow = spark.read.format("geojson").load(p).select("id")
    val scan = narrow.queryExecution.executedPlan.toString
    // the v2 scan's description carries its pruned ReadSchema
    assert(scan.contains("GeoJsonScan"), scan)
    assert(scan.contains("ReadSchema: struct<id:bigint>"), scan)
    assert(!scan.contains("geometry"), scan)
    assert(narrow.as[Long].collect().sorted === Seq(1L, 2L, 3L))
    // corrupt-geometry file: pruned reads never touch the geometry
    // subtree, so they succeed where a full read must fail
    val bad = s"$tmp/geojson_v2_badgeom.json"
    write(bad,
      """{"type":"FeatureCollection","features":[
        |{"type":"Feature","properties":{"id":9},
        | "geometry":{"type":"Nonsense","coordinates":[]}}]}""".stripMargin)
    assert(spark.read.format("geojson").load(bad).select("id").as[Long].head() === 9L)
    intercept[Exception] {
      spark.read.format("geojson").load(bad).select("geometry").collect()
    }
  }

  test("filter pushdown reaches the parser: rejected features never decode geometry") {
    val p = s"$tmp/geojson_v2_filterpush.json"
    // feature id=9 has a CORRUPT geometry: only parser-level predicate
    // skipping can make a geometry-selecting read succeed
    write(p,
      """{"type":"FeatureCollection","features":[
        |{"type":"Feature","properties":{"id":1,"name":"good"},
        | "geometry":{"type":"Point","coordinates":[1,2]}},
        |{"type":"Feature","properties":{"id":9,"name":"bad"},
        | "geometry":{"type":"Nonsense","coordinates":[]}}]}""".stripMargin)
    GeoFunctions.register(spark)
    val narrow = spark.read.format("geojson").load(p)
      .filter(col("id") < 5)
      .select(col("id"), GeoFunctions.cols.stAsText(col("geometry")).as("wkt"))
    // the scan advertises the pushed predicate
    val plan = narrow.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") && plan.contains("LessThan(id,5"), plan)
    // and the corrupt feature is skipped BEFORE its geometry parse
    assert(narrow.as[(Long, String)].collect().toSeq === Seq((1L, "POINT (1 2)")))
    // without the predicate the same read must fail on the bad geometry
    intercept[Exception] {
      spark.read.format("geojson").load(p).select("geometry").collect()
    }
    // residual re-evaluation keeps answers exact on ordinary predicates
    val full = spark.read.format("geojson").load(p).select("id", "name")
    assert(full.filter(col("name") === "bad").as[(Long, String)].collect().toSeq
      === Seq((9L, "bad")))
  }

  test("pushed string ordering uses Spark's binary order (supplementary chars)") {
    // U+1F600 (a supplementary char, surrogate pair D83D DE00) vs
    // U+FFFD: UTF-16 code-unit order says 1F600 < FFFD (D83D < FFFD),
    // but Spark's UTF8String binary order says 1F600 > FFFD. A pushed
    // `name > U+FFFD` evaluated in the wrong order would skip the
    // U+1F600 row at the parser — unrestorable by the residual filter.
    val p = s"$tmp/geojson_v2_utf.json"
    val emoji = "😀" // U+1F600
    val fffd = "�"
    write(p,
      s"""{"type":"FeatureCollection","features":[
         |{"type":"Feature","properties":{"id":1,"name":"$emoji"},"geometry":null},
         |{"type":"Feature","properties":{"id":2,"name":"$fffd"},"geometry":null}]}""".stripMargin)
    // sanity: the two orders really disagree on this pair
    assert(emoji.compareTo(fffd) < 0)
    assert(org.apache.spark.unsafe.types.UTF8String.fromString(emoji)
      .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(fffd)) > 0)
    val filtered = spark.read.format("geojson").load(p).filter(col("name") > fffd)
    // the predicate must actually be pushed for this test to mean anything
    assert(filtered.queryExecution.executedPlan.toString
      .contains("GreaterThan(name"), filtered.queryExecution.executedPlan)
    assert(filtered.select("id").as[Long].collect().toSeq === Seq(1L))
  }

  test("schema inference widens across ALL files in a directory") {
    val dir = s"$tmp/geojson_v2_widen"
    new java.io.File(dir).mkdirs()
    // first file says long; a later file holds a fractional double —
    // first-file-only inference would silently truncate 2.5 to 2
    write(s"$dir/a.geojson",
      """{"type":"FeatureCollection","features":[
        |{"type":"Feature","properties":{"v":1},"geometry":null}]}""".stripMargin)
    write(s"$dir/b.geojson",
      """{"type":"FeatureCollection","features":[
        |{"type":"Feature","properties":{"v":2.5},"geometry":null}]}""".stripMargin)
    val df = spark.read.format("geojson").load(dir)
    assert(df.schema("v").dataType.simpleString === "double")
    assert(df.select("v").as[Double].collect().sorted === Seq(1.0, 2.5))
  }

  test("lossy coercion under an explicit schema fails loudly, not silently") {
    val p = s"$tmp/geojson_v2_lossy.json"
    write(p,
      """{"type":"FeatureCollection","features":[
        |{"type":"Feature","properties":{"score":2.5},"geometry":null}]}""".stripMargin)
    val narrow = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("score",
        org.apache.spark.sql.types.LongType)))
    val e = intercept[Exception] {
      spark.read.format("geojson").schema(narrow).load(p).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("does not fit declared type")), e)
    // integral doubles still coerce fine (2.0 under LongType is lossless)
    val p2 = s"$tmp/geojson_v2_integral.json"
    write(p2,
      """{"type":"FeatureCollection","features":[
        |{"type":"Feature","properties":{"score":2.0},"geometry":null}]}""".stripMargin)
    assert(spark.read.format("geojson").schema(narrow).load(p2)
      .select("score").as[Long].head() === 2L)
  }

  test("reported file-size statistics let a geojson dim auto-broadcast") {
    val p = s"$tmp/geojson_v2_stats.json"
    write(p, fixture)
    val dim = spark.read.format("geojson").load(p).select("id", "name")
    // the connector must report its on-disk size, not defaultSizeInBytes
    val stats = dim.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(stats < (1L << 20), s"stats not reported: $stats")
    // and a plain join (NO broadcast hint) against a big side must pick
    // a broadcast hash join on its own
    val facts = spark.range(0, 100000).toDF("id")
    val plan = facts.join(dim, "id").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("DSv2 write: distributed roundtrip, overwrite truncates, append adds") {
    GeoFunctions.register(spark)
    val dir = s"$tmp/geojson_v2_write"
    val layer = spark.range(1, 21).toDF("k")
      .select(col("k"), (col("k") * 10).as("v"),
        GeoFunctions.cols.stGeomFromText(
          concat(lit("POINT ("), col("k"), lit(" 1)"))).as("geometry"))
    layer.repartition(3).write.format("geojson").mode("overwrite").save(dir)
    // distributed: more than one FeatureCollection file, each valid
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".geojson"))
    assert(files.length > 1 && files.length <= 3, files.map(_.getName).toSeq)
    files.foreach(f => assert(
      new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8)
        .startsWith("""{"type":"FeatureCollection","features":[""")))
    def readBack = spark.read.format("geojson").load(dir)
    assert(readBack.count() === 20)
    assert(readBack.select(GeoFunctions.cols.stAsText(col("geometry"))).as[String]
      .collect().toSet === (1 to 20).map(k => s"POINT ($k 1)").toSet)
    // overwrite truncates the previous contents
    layer.filter(col("k") <= 5).write.format("geojson").mode("overwrite").save(dir)
    assert(readBack.count() === 5)
    // append adds to them
    layer.filter(col("k") === 6).write.format("geojson").mode("append").save(dir)
    assert(readBack.count() === 6)
    assert(readBack.select("k").as[Long].collect().sorted === (1L to 6L))
  }

  test("DSv2 write: append jobs never collide on part-file names") {
    GeoFunctions.register(spark)
    val dir = s"$tmp/geojson_v2_append_jobs"
    def one(k: Int) = Seq((k.toLong, s"d$k")).toDF("k", "tag")
      .withColumn("geometry", GeoFunctions.cols.stGeomFromText(lit("POINT (0 0)")))
      .coalesce(1)
    one(1).write.format("geojson").mode("overwrite").save(dir)
    one(2).write.format("geojson").mode("append").save(dir)
    one(3).write.format("geojson").mode("append").save(dir)
    // three jobs, identical partition ids — the per-job queryId in the
    // file name must keep them from clobbering each other
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".geojson")).map(_.getName)
    assert(files.length === 3, files.toSeq)
    assert(files.distinct.length === 3)
    assert(spark.read.format("geojson").load(dir)
      .select("k").as[Long].collect().sorted === Seq(1L, 2L, 3L))
  }

  test("declared Int/Float schema reads back the writer's own output") {
    GeoFunctions.register(spark)
    val dir = s"$tmp/geojson_v2_intfloat"
    val df = Seq((1, 0.5f), (2, 1.25f)).toDF("i", "f")
      .withColumn("geometry", GeoFunctions.cols.stGeomFromText(lit("POINT (2 3)")))
    df.write.format("geojson").mode("overwrite").save(dir)
    // read back under the writer's OWN schema (IntegerType/FloatType)
    val back = spark.read.schema(df.schema).format("geojson").load(dir)
      .select("i", "f").as[(Int, Float)].collect().sortBy(_._1)
    assert(back === Seq((1, 0.5f), (2, 1.25f)))
  }

  test("DSv2 write: NaN/Infinity doubles downgrade to null, floats render shortest") {
    GeoFunctions.register(spark)
    val dir = s"$tmp/geojson_v2_write_nan"
    Seq((1L, Double.NaN, 0.1f), (2L, 2.5, Float.PositiveInfinity))
      .toDF("k", "d", "f")
      .withColumn("geometry", GeoFunctions.cols.stGeomFromText(lit("POINT (0 0)")))
      .write.format("geojson").mode("overwrite").save(dir)
    // the document must stay valid JSON: NaN/Inf have no JSON tokens
    val out = spark.read.format("geojson").load(dir)
      .select("k", "d", "f").as[(Long, Option[Double], Option[Double])]
      .collect().sortBy(_._1)
    assert(out === Seq((1L, None, Some(0.1)), (2L, Some(2.5), None)))
  }

  test("NDJSON feature-lines roundtrip survives MIXED geometry types") {
    GeoFunctions.register(spark)
    val dir = s"$tmp/geojson_lines_mixed"
    // Point + Polygon coordinates have different nesting depths, so
    // spark.read.json infers `geometry` as a raw STRING — the reader
    // must feed that straight to the parser instead of to_json-ing it
    val layer = Seq(
      (1L, "POINT (1 2)"),
      (2L, "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"))
      .toDF("k", "wkt")
      .select(col("k"), GeoFunctions.cols.stGeomFromText(col("wkt")).as("geometry"))
    GeoJsonIO.writeFeatureLines(layer, dir)
    val back = GeoJsonIO.readFeatureLines(spark, dir)
      .select(col("k"), GeoFunctions.cols.stAsText(col("geometry")).as("wkt"))
      .as[(Long, String)].collect().sortBy(_._1)
    assert(back === Seq(
      (1L, "POINT (1 2)"),
      (2L, "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")))
  }

  test("DSv2 write: empty dataset still leaves one valid readable file") {
    GeoFunctions.register(spark)
    val dir = s"$tmp/geojson_v2_write_empty"
    val layer = spark.range(0, 0).toDF("k")
      .select(col("k"), GeoFunctions.cols.stGeomFromText(
        concat(lit("POINT ("), col("k"), lit(" 1)"))).as("geometry"))
    layer.write.format("geojson").mode("overwrite").save(dir)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("geometry",
        org.apache.spark.sql.types.BinaryType)))
    assert(spark.read.format("geojson").schema(schema).load(dir).count() === 0)
  }

  test("directory of files: one partition per file, deterministic order") {
    val dir = s"$tmp/geojson_v2_dir"
    new java.io.File(dir).mkdirs()
    write(s"$dir/part_a.geojson",
      """{"type":"FeatureCollection","features":[
        |{"type":"Feature","properties":{"id":1},"geometry":null}]}""".stripMargin)
    write(s"$dir/part_b.geojson",
      """{"type":"FeatureCollection","features":[
        |{"type":"Feature","properties":{"id":2},"geometry":null},
        |{"type":"Feature","properties":{"id":3},"geometry":null}]}""".stripMargin)
    val df = spark.read.format("geojson").load(dir)
    assert(df.rdd.getNumPartitions === 2)
    assert(df.select("id").as[Long].collect().sorted === Seq(1L, 2L, 3L))
  }

  test("aggregate pushdown: COUNT/MIN/MAX fold per file inside the parser") {
    val dir = s"$tmp/geojson_v2_aggpush"
    new java.io.File(dir).mkdirs()
    write(s"$dir/a.json", fixture)
    write(s"$dir/b.json",
      """{"type":"FeatureCollection","features":[
        |{"type":"Feature","properties":{"id":7,"name":"z","score":0.5},
        | "geometry":{"type":"Point","coordinates":[9,9]}}
        |]}""".stripMargin)
    val df = spark.read.format("geojson").load(dir)
    val agg = df.agg(count(lit(1)).as("n"), min("id").as("mn"),
      max("id").as("mx"), max("name").as("mxn"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates"), plan)
    val row = agg.collect().head
    assert(row.getLong(0) === 4L)
    assert(row.getLong(1) === 1L && row.getLong(2) === 7L)
    assert(row.getString(3) === "z")
    // empty file contributes (0, null, null) partial state harmlessly
    write(s"$dir/c.json", """{"type":"FeatureCollection","features":[]}""")
    val agg2 = spark.read.format("geojson").load(dir)
      .agg(count(lit(1)), min("score"), max("score"))
    val r2 = agg2.collect().head
    assert(r2.getLong(0) === 4L && r2.getDouble(1) === 0.5 && r2.getDouble(2) === 3.0)
    // grouped aggregates DECLINE pushdown and stay correct
    val grouped = spark.read.format("geojson").load(dir)
      .groupBy("name").agg(count(lit(1)).as("n"))
    val gplan = grouped.queryExecution.executedPlan.toString
    assert(!gplan.contains("PushedAggregates"), gplan)
    assert(grouped.where(col("name") === "z").select("n").as[Long].head() === 1L)
    // a filtered aggregate also declines (filters are residual here)
    val filtered = spark.read.format("geojson").load(dir)
      .where(col("id") > 1).agg(count(lit(1)))
    assert(!filtered.queryExecution.executedPlan.toString
      .contains("PushedAggregates"))
    assert(filtered.collect().head.getLong(0) === 3L)
  }

  test("limit pushdown: parsing stops at the per-file quota") {
    val p = s"$tmp/geojson_v2_limit.json"
    write(p, fixture)
    val limited = spark.read.format("geojson").load(p).select("id").limit(2)
    val plan = limited.queryExecution.executedPlan.toString
    assert(plan.contains("PushedLimit: 2"), plan)
    assert(limited.count() === 2L)
    // correctness under the pushdown: a limit larger than the file
    // yields everything, and the 3rd feature's bad geometry is never
    // parsed when limit 2 stops before it
    val bad = s"$tmp/geojson_v2_limit_bad.json"
    write(bad,
      """{"type":"FeatureCollection","features":[
        |{"type":"Feature","properties":{"id":1},
        | "geometry":{"type":"Point","coordinates":[1,1]}},
        |{"type":"Feature","properties":{"id":2},
        | "geometry":{"type":"Point","coordinates":[2,2]}},
        |{"type":"Feature","properties":{"id":3},
        | "geometry":{"type":"Nonsense","coordinates":[]}}
        |]}""".stripMargin)
    val two = spark.read.format("geojson").load(bad)
      .select("id", "geometry").limit(2)
    assert(two.collect().length === 2) // bad geometry past the quota: unparsed
    intercept[Exception] {
      spark.read.format("geojson").load(bad).select("id", "geometry").collect()
    }
  }
}
