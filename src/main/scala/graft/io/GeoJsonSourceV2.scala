package graft.io

import graft.geo.{GeoFunctions, GeoJsonCodec}
import org.apache.hadoop.fs.Path
import org.apache.spark.util.SerializableConfiguration
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.json4s._
import org.json4s.jackson.JsonMethods

import java.nio.charset.StandardCharsets
import scala.jdk.CollectionConverters._

/** GeoJSON FeatureCollection as a first-class DataSource V2 —
  * `spark.read.format("geojson").load(path)` (SURVEY §2.1, reference
  * `il_analysis_git.py:76` `gp.read_file`).
  *
  * Why a connector and not the multiLine-JSON + explode recipe
  * ([[GeoJsonIO.read]], kept as the portable fallback):
  *  - **Column pruning reaches the parser.** The ScanBuilder implements
  *    `SupportsPushDownRequiredColumns`, so `select(props…)` without
  *    `geometry` never parses or WKB-encodes a single coordinate —
  *    on a polygon layer the coordinates ARE the bytes, so pruning at
  *    the source is the difference between reading 1% and 100% of the
  *    payload. The generic JSON reader must materialize the whole
  *    `features` array struct before Catalyst prunes.
  *  - **Filter pushdown reaches the parser.** Property predicates
  *    (`SupportsPushDownFilters`) evaluate on the parsed properties
  *    BEFORE geometry decode, under conservative 3-valued logic; every
  *    filter is also returned as a residual, so Spark keeps final say
  *    (the parquet row-group-stats contract). A feature rejected by a
  *    pushed predicate never pays its coordinate parse.
  *  - **One partition per file, planned not inferred.** A
  *    FeatureCollection is a single JSON document (unsplittable); a
  *    directory of them scans as one task per file with no sampling
  *    pass over the data (the JSON reader runs a whole extra schema-
  *    inference job first).
  *  - Schema inference parses ONE file driver-side (dimension layers
  *    are map-payload-sized by design; `:76` reads a single static
  *    file). Property types widen Long → Double → String across
  *    features; geometry is carried as WKB `BinaryType`, the engine's
  *    geometry convention (SURVEY §1.1).
  */
class GeoJsonDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "geojson"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GeoJsonSourceV2.inferSchema(GeoJsonSourceV2.resolvePaths(options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new GeoJsonTable(
      GeoJsonSourceV2.rawPaths(new CaseInsensitiveStringMap(properties)),
      schema)
}

/** Raw (unresolved) paths: a WRITE target need not exist yet, so file
  * expansion is deferred to scan-build time (reads) and skipped
  * entirely for writes. */
class GeoJsonTable(rawPaths: Seq[String], tableSchema: StructType)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"geojson(${rawPaths.mkString(",")})"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE).asJava
  // one listing per table instance, not per scan: a self-joined or
  // AQE-re-planned geojson relation would otherwise re-list the
  // directory on every newScanBuilder — a network round-trip per file
  // on remote filesystems (the built-in sources' file-index snapshot
  // semantics)
  private lazy val resolvedPaths: Seq[String] =
    GeoJsonSourceV2.expandPaths(rawPaths)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GeoJsonScanBuilder(resolvedPaths, tableSchema)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GeoJsonWriteBuilder(rawPaths, info)
}

class GeoJsonScanBuilder(paths: Seq[String], full: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownAggregates
    with SupportsPushDownLimit {
  import org.apache.spark.sql.connector.expressions.NamedReference
  import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max, Min}

  private var required: StructType = full
  private var pushed: Array[sources.Filter] = Array.empty
  private var pushedAgg: Option[Aggregation] = None
  private var limit: Int = Int.MaxValue

  /** PARTIAL limit pushdown (`isPartiallyPushed` stays true): each
    * file stops PARSING after `limit` surviving features — a
    * `df.limit(5)` over a million-feature layer parses five
    * geometries per file, not a million — and Spark's own Limit
    * still runs on top (per-file limit × files rows reach it).
    * Spark only offers the pushdown when no residual Filter sits
    * between Limit and the scan, so pushed-filter interaction cannot
    * arise (this source keeps every filter as a residual). */
  override def pushLimit(l: Int): Boolean = { limit = l; true }
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** PARTIAL aggregate pushdown (`supportCompletePushDown` stays
    * false — the default): ungrouped COUNT(*)/MIN/MAX fold to ONE row
    * per FILE inside the parser, so the exchange feeding the final
    * aggregate carries |files| rows instead of |features| — and a
    * COUNT(*) or property-only MIN/MAX never decodes a single
    * coordinate. Declined whenever grouping columns exist, any filter
    * was pushed (this source returns every filter as a residual, so
    * Spark's rule already bails — the guard here is belt and braces),
    * or an aggregate targets the geometry / a non-atomic column:
    * declining is always safe, Spark falls back to the row scan. */
  override def pushAggregation(aggregation: Aggregation): Boolean = {
    if (aggregation.groupByExpressions.nonEmpty || pushed.nonEmpty ||
      aggregation.aggregateExpressions.isEmpty) return false
    val ok = aggregation.aggregateExpressions.forall {
      case _: CountStar => true
      case m: Min => aggField(m.column).isDefined
      case m: Max => aggField(m.column).isDefined
      case _ => false
    }
    if (ok) pushedAgg = Some(aggregation)
    ok
  }

  private def aggField(e: org.apache.spark.sql.connector.expressions.Expression)
      : Option[StructField] = e match {
    case ref: NamedReference if ref.fieldNames.length == 1 =>
      full.fields.find(f => f.name == ref.fieldNames.head &&
        f.name != GeoJsonSourceV2.GeometryField &&
        (f.dataType match {
          case LongType | IntegerType | DoubleType | StringType => true
          case _ => false
        }))
    case _ => None
  }
  /** Property predicates push into the parser. The reader's evaluation
    * is CONSERVATIVE (a row is skipped only when the predicate is
    * definitely false under 3-valued logic), so every filter is also
    * returned as a residual for Spark to re-evaluate — same contract
    * as parquet row-group stats: pushdown prunes work, the engine
    * keeps final say. */
  override def pushFilters(filters: Array[sources.Filter]): Array[sources.Filter] = {
    pushed = filters.filter(GeoJsonSourceV2.isPushable(full, _))
    filters // all residual
  }
  override def pushedFilters(): Array[sources.Filter] = pushed
  override def build(): Scan = {
    // capture the DRIVER's session Hadoop conf here (build() runs on the
    // driver): executors must see session-level spark.hadoop.* settings
    // (s3a credentials, endpoints) that a bare `new Configuration()`
    // would silently drop — same mechanism as the built-in file sources
    val conf = new SerializableConfiguration(
      SparkSession.active.sessionState.newHadoopConf())
    pushedAgg match {
      case Some(agg) => new GeoJsonAggScan(paths, full, agg, conf)
      case None => new GeoJsonScan(paths, full, required, pushed, conf, limit)
    }
  }
}

/** Scan for a pushed ungrouped aggregate: one output row per file,
  * schema = the aggregate buffer columns in expression order (Spark's
  * partial-pushdown contract is positional). */
class GeoJsonAggScan(paths: Seq[String], full: StructType,
                     agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation,
                     conf: SerializableConfiguration)
    extends Scan with Batch {
  import org.apache.spark.sql.connector.expressions.aggregate.{CountStar, Max, Min}
  import org.apache.spark.sql.connector.expressions.NamedReference

  private def refName(e: org.apache.spark.sql.connector.expressions.Expression): String =
    e.asInstanceOf[NamedReference].fieldNames.head
  private def fieldOf(name: String): StructField =
    full.fields.find(_.name == name).get

  val aggSchema: StructType = StructType(agg.aggregateExpressions.map {
    case _: CountStar => StructField("count(*)", LongType, nullable = false)
    case m: Min =>
      val f = fieldOf(refName(m.column)); StructField(s"min(${f.name})", f.dataType)
    case m: Max =>
      val f = fieldOf(refName(m.column)); StructField(s"max(${f.name})", f.dataType)
    case other => throw new IllegalStateException(s"unpushable aggregate $other")
  })

  override def readSchema(): StructType = aggSchema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    paths.map(p => GeoJsonInputPartition(p): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new GeoJsonAggReaderFactory(full, agg, conf)
  override def description(): String =
    s"GeoJsonScan files=${paths.length} " +
      s"PushedAggregates: [${agg.aggregateExpressions.mkString(", ")}]"
}

class GeoJsonAggReaderFactory(full: StructType,
                              agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation,
                              conf: SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GeoJsonAggPartitionReader(
      partition.asInstanceOf[GeoJsonInputPartition].path, full, agg, conf)
}

/** Folds one file to one aggregate row by driving the ordinary row
  * reader over ONLY the referenced property columns (geometry is
  * never in that set, so no coordinate is ever decoded) and
  * min/max/count-folding in place. Empty file → count 0, min/max
  * NULL — exactly the per-partition partial state Spark's final
  * aggregate expects. */
class GeoJsonAggPartitionReader(path: String, full: StructType,
                                agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation,
                                conf: SerializableConfiguration)
    extends PartitionReader[InternalRow] {
  import org.apache.spark.sql.connector.expressions.aggregate.{CountStar, Max, Min}
  import org.apache.spark.sql.connector.expressions.NamedReference

  private def refName(e: org.apache.spark.sql.connector.expressions.Expression): String =
    e.asInstanceOf[NamedReference].fieldNames.head

  private val needed: Seq[String] = agg.aggregateExpressions.toSeq.collect {
    case m: Min => refName(m.column)
    case m: Max => refName(m.column)
  }.distinct
  private val neededSchema =
    StructType(needed.map(n => full.fields.find(_.name == n).get))

  private def cmp(dt: DataType, a: Any, b: Any): Int = dt match {
    case LongType => java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long])
    case IntegerType => java.lang.Integer.compare(a.asInstanceOf[Int], b.asInstanceOf[Int])
    case DoubleType => java.lang.Double.compare(a.asInstanceOf[Double], b.asInstanceOf[Double])
    case StringType => a.asInstanceOf[UTF8String].compareTo(b.asInstanceOf[UTF8String])
    case other => throw new IllegalStateException(s"unorderable pushed-agg type $other")
  }

  private var done = false
  private var result: InternalRow = _

  override def next(): Boolean = {
    if (done) return false
    val rows = new GeoJsonPartitionReader(path, full, neededSchema,
      Array.empty, conf)
    var count = 0L
    val mins = scala.collection.mutable.Map.empty[String, Any]
    val maxs = scala.collection.mutable.Map.empty[String, Any]
    try {
      while (rows.next()) {
        val row = rows.get()
        count += 1
        var i = 0
        while (i < needed.length) {
          val dt = neededSchema.fields(i).dataType
          val v = row.get(i, dt)
          if (v != null) {
            val n = needed(i)
            if (!mins.contains(n) || cmp(dt, v, mins(n)) < 0) mins(n) = v
            if (!maxs.contains(n) || cmp(dt, v, maxs(n)) > 0) maxs(n) = v
          }
          i += 1
        }
      }
    } finally rows.close()
    val out = new GenericInternalRow(agg.aggregateExpressions.length)
    agg.aggregateExpressions.zipWithIndex.foreach {
      case (_: CountStar, i) => out.update(i, count)
      case (m: Min, i) => out.update(i, mins.getOrElse(refName(m.column), null))
      case (m: Max, i) => out.update(i, maxs.getOrElse(refName(m.column), null))
      case (other, _) => throw new IllegalStateException(s"unpushable $other")
    }
    result = out
    done = true
    true
  }

  override def get(): InternalRow = result
  override def close(): Unit = ()
}

class GeoJsonScan(paths: Seq[String], full: StructType,
                  required: StructType, pushed: Array[sources.Filter],
                  conf: SerializableConfiguration,
                  limit: Int = Int.MaxValue)
    extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    paths.map(p => GeoJsonInputPartition(p): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new GeoJsonReaderFactory(full, required, pushed, conf, limit)
  override def description(): String =
    s"GeoJsonScan files=${paths.length} ReadSchema: ${required.simpleString}" +
      s" PushedFilters: [${pushed.mkString(", ")}]" +
      (if (limit != Int.MaxValue) s" PushedLimit: $limit" else "")

  /** On-disk byte size of the matched files (driver-side listing, no
    * data read). Without this a DSv2 relation falls back to
    * `spark.sql.defaultSizeInBytes` (≈ Long.Max), so a map-payload
    * dimension layer would NEVER auto-broadcast and every fact⋈shape
    * join would plan as a shuffle — at 100 TB the single worst default
    * a connector can inherit. Raw size is conservative (a pruned
    * geometry-less projection reads far less), so it can only
    * under-broadcast, never OOM the driver. */
  // one stat pass per scan instance, shared across repeated
  // estimateStatistics calls (plan re-optimization, AQE)
  private lazy val totalBytes: Long = paths.map { p =>
    val hp = new Path(p)
    hp.getFileSystem(conf.value).getFileStatus(hp).getLen
  }.sum
  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(totalBytes)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.empty()
  }
}

case class GeoJsonInputPartition(path: String) extends InputPartition

class GeoJsonReaderFactory(full: StructType, required: StructType,
                           pushed: Array[sources.Filter],
                           conf: SerializableConfiguration,
                           limit: Int = Int.MaxValue)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GeoJsonPartitionReader(
      partition.asInstanceOf[GeoJsonInputPartition].path, full, required,
      pushed, conf, limit)
}

/** One task = one FeatureCollection file. The document is parsed once;
  * only the REQUIRED fields are materialized into rows — in
  * particular, `geometry` (the bulk of the bytes) is parsed to JTS +
  * WKB only when the query asked for it, and only for features that
  * survive the pushed property predicates. */
class GeoJsonPartitionReader(path: String, full: StructType,
                             required: StructType,
                             pushed: Array[sources.Filter],
                             conf: SerializableConfiguration,
                             limit: Int = Int.MaxValue)
    extends PartitionReader[InternalRow] {
  private var emitted = 0

  // executor-side: the serialized DRIVER conf, so session-level
  // spark.hadoop.* settings apply here exactly as they did during
  // driver-side path resolution
  private lazy val features: Iterator[JValue] = {
    val hp = new Path(path)
    val fs = hp.getFileSystem(conf.value)
    val in = fs.open(hp)
    val text = try new String(in.readAllBytes(), StandardCharsets.UTF_8)
    finally in.close()
    JsonMethods.parse(text) \ "features" match {
      case JArray(fs0) => fs0.iterator
      case JNothing | JNull => Iterator.empty
      case other =>
        throw new IllegalArgumentException(s"$path: 'features' is not an array: $other")
    }
  }

  private var current: InternalRow = _

  // property lookup typed by the FULL schema (a filter may reference a
  // column the projection pruned away)
  private def prop(f: JValue, name: String): Any =
    full.fields.find(_.name == name) match {
      case Some(fd) => GeoJsonSourceV2.convert(f \ "properties" \ name, fd.dataType)
      case None => null
    }

  override def next(): Boolean = {
    // pushed limit: stop PARSING once this file has yielded its quota
    // (Spark's own Limit still runs on top — partial-push contract)
    if (emitted >= limit) return false
    while (features.hasNext) {
      val f = features.next()
      // pushed predicates run BEFORE geometry decode: a skipped feature
      // never pays the coordinate parse
      if (pushed.forall(flt =>
          GeoJsonSourceV2.eval3(flt, prop(f, _)) != Some(false))) {
        val row = new GenericInternalRow(required.length)
        var i = 0
        while (i < required.length) {
          val field = required.fields(i)
          val v: Any =
            if (field.name == GeoJsonSourceV2.GeometryField)
              f \ "geometry" match {
                case JNothing | JNull => null
                case g => GeoFunctions.writeWkb(GeoJsonCodec.fromJValue(g))
              }
            else GeoJsonSourceV2.convert(f \ "properties" \ field.name, field.dataType)
          row.update(i, v)
          i += 1
        }
        current = row
        emitted += 1
        return true
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}

object GeoJsonSourceV2 {

  val GeometryField = "geometry"

  /** path/paths option strings, unresolved (a write target need not
    * exist). */
  def rawPaths(options: CaseInsensitiveStringMap): Seq[String] =
    Option(options.get("paths")) match {
      case Some(arr) => JsonMethods.parse(arr) match {
        case JArray(xs) => xs.collect { case JString(s) => s }
        case _ => throw new IllegalArgumentException(s"bad paths option: $arr")
      }
      case None => Option(options.get("path")).map(Seq(_)).getOrElse(
        throw new IllegalArgumentException("geojson source requires a path"))
    }

  /** Raw paths → concrete file list (globs + directories expanded
    * through the Hadoop FileSystem API, so the same code lists
    * file://, hdfs:// or s3a://). Sorted for deterministic partition
    * order. */
  def expandPaths(raw: Seq[String]): Seq[String] = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    raw.flatMap { p =>
      val hp = new Path(p)
      val fs = hp.getFileSystem(conf)
      val matched = Option(fs.globStatus(hp)).map(_.toSeq)
        .getOrElse(Seq.empty) match {
        case Seq() => Seq(fs.getFileStatus(hp))
        case m => m
      }
      matched.flatMap { st =>
        if (st.isDirectory)
          fs.listStatus(st.getPath).toSeq.filter(_.isFile)
            .map(_.getPath.toString)
            .filterNot(_.endsWith("_SUCCESS"))
        else Seq(st.getPath.toString)
      }
    }.sorted
  }

  def resolvePaths(options: CaseInsensitiveStringMap): Seq[String] =
    expandPaths(rawPaths(options))

  /** Driver-side inference across ALL matched files: property keys in
    * first-seen order, types widened Long → Double → String across
    * features AND across files (a directory whose later files carry a
    * wider type than the first must not get silently-truncating reads);
    * `geometry` appended as WKB binary. FeatureCollections are
    * map-payload-sized by design (`:76` reads one static file), so one
    * driver-side parse per file is the cost of one executor task's work
    * — not a data scan. */
  def inferSchema(paths: Seq[String]): StructType = {
    require(paths.nonEmpty, "geojson source matched no files")
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val props = scala.collection.mutable.LinkedHashMap[String, DataType]()
    paths.foreach { p =>
      val hp = new Path(p)
      val fs = hp.getFileSystem(conf)
      val in = fs.open(hp)
      val text = try new String(in.readAllBytes(), StandardCharsets.UTF_8)
      finally in.close()
      JsonMethods.parse(text) \ "features" match {
        case JArray(fs0) => fs0.foreach { f =>
          f \ "properties" match {
            case JObject(fields) => fields.foreach { case (k, v) =>
              val t = typeOf(v)
              props(k) = props.get(k).map(merge(_, t)).getOrElse(t)
            }
            case _ => ()
          }
        }
        case _ => ()
      }
    }
    StructType(
      props.map { case (k, t) =>
        StructField(k, if (t == NullType) StringType else t, nullable = true)
      }.toSeq :+ StructField(GeometryField, BinaryType, nullable = true))
  }

  /** A filter pushes when every attribute it references is a flat
    * property column (never the geometry blob) and its shape is one we
    * can evaluate. */
  def isPushable(schema: StructType, f: sources.Filter): Boolean = {
    val propNames = schema.fields.map(_.name).toSet - GeometryField
    def ok(f: sources.Filter): Boolean = f match {
      case sources.EqualTo(a, _) => propNames(a)
      case sources.GreaterThan(a, _) => propNames(a)
      case sources.GreaterThanOrEqual(a, _) => propNames(a)
      case sources.LessThan(a, _) => propNames(a)
      case sources.LessThanOrEqual(a, _) => propNames(a)
      case sources.In(a, _) => propNames(a)
      case sources.IsNull(a) => propNames(a)
      case sources.IsNotNull(a) => propNames(a)
      case sources.And(l, r) => ok(l) && ok(r)
      case sources.Or(l, r) => ok(l) && ok(r)
      case sources.Not(c) => ok(c)
      case _ => false
    }
    ok(f)
  }

  /** Three-valued predicate evaluation over CONVERTED property values:
    * Some(true)/Some(false) when decidable, None when null is
    * involved. Callers skip a row only on Some(false) — conservative,
    * because Spark re-evaluates every filter post-scan. */
  def eval3(f: sources.Filter, get: String => Any): Option[Boolean] = {
    def cmp(a: String, lit: Any): Option[Int] = (get(a), lit) match {
      case (null, _) | (_, null) => None
      case (x: java.lang.Long, v: Number) => Some(java.lang.Long.compare(x, v.longValue()))
      case (x: java.lang.Double, v: Number) => Some(java.lang.Double.compare(x, v.doubleValue()))
      case (x: java.lang.Boolean, v: java.lang.Boolean) => Some(x.compareTo(v))
      // Strings MUST compare in Spark's order (UTF8String is byte-wise =
      // code-point order), not java.lang.String's UTF-16 code-unit order:
      // the two disagree for supplementary characters, and a pushed
      // `<`/`>` evaluated in the wrong order would skip rows the residual
      // filter can never restore.
      case (x: UTF8String, v: String) => Some(x.compareTo(UTF8String.fromString(v)))
      case (x: UTF8String, v: UTF8String) => Some(x.compareTo(v))
      case _ => None
    }
    f match {
      case sources.EqualTo(a, v) => cmp(a, v).map(_ == 0)
      case sources.GreaterThan(a, v) => cmp(a, v).map(_ > 0)
      case sources.GreaterThanOrEqual(a, v) => cmp(a, v).map(_ >= 0)
      case sources.LessThan(a, v) => cmp(a, v).map(_ < 0)
      case sources.LessThanOrEqual(a, v) => cmp(a, v).map(_ <= 0)
      case sources.In(a, vs) =>
        val hits = vs.map(v => cmp(a, v))
        if (hits.exists(_.contains(0))) Some(true)
        else if (hits.forall(h => h.isDefined && !h.contains(0))) Some(false)
        else None
      case sources.IsNull(a) => Some(get(a) == null)
      case sources.IsNotNull(a) => Some(get(a) != null)
      case sources.And(l, r) => (eval3(l, get), eval3(r, get)) match {
        case (Some(false), _) | (_, Some(false)) => Some(false)
        case (Some(true), Some(true)) => Some(true)
        case _ => None
      }
      case sources.Or(l, r) => (eval3(l, get), eval3(r, get)) match {
        case (Some(true), _) | (_, Some(true)) => Some(true)
        case (Some(false), Some(false)) => Some(false)
        case _ => None
      }
      case sources.Not(c) => eval3(c, get).map(!_)
      case _ => None // unknown filter: never skip
    }
  }

  private def typeOf(v: JValue): DataType = v match {
    case _: JInt | _: JLong => LongType
    case _: JDouble | _: JDecimal => DoubleType
    case _: JBool => BooleanType
    case JNull | JNothing => NullType
    case _ => StringType
  }

  private def merge(a: DataType, b: DataType): DataType = (a, b) match {
    case (x, y) if x == y => x
    case (NullType, x) => x
    case (x, NullType) => x
    case (LongType, DoubleType) | (DoubleType, LongType) => DoubleType
    case _ => StringType
  }

  /** Coerce a property JValue to the declared field type (external
    * schemas may be narrower or wider than the file). Lossy coercions
    * FAIL LOUDLY with the offending value and declared type instead of
    * silently truncating (a fractional double under LongType) or
    * surfacing a bare NumberFormatException mid-scan (a non-numeric
    * string under a numeric type) — inference widens across all files,
    * so these can only arise from a user-supplied external schema. */
  def convert(v: JValue, dt: DataType): Any = v match {
    case JNothing | JNull => null
    case _ => dt match {
      case LongType => v match {
        case JInt(i) if i.isValidLong => i.toLong
        case JLong(l) => l
        // range guard: toLong would silently saturate (double) or wrap
        // (BigDecimal/BigInt) for whole values beyond 2^63
        case JDouble(d) if d == math.rint(d) &&
          d >= Long.MinValue.toDouble && d < Long.MaxValue.toDouble => d.toLong
        case JDecimal(d) if d.isWhole && d.isValidLong => d.toLong
        case JBool(b) => if (b) 1L else 0L
        case JString(s) =>
          try s.toLong catch { case _: NumberFormatException => mismatch(v, dt) }
        case _ => mismatch(v, dt)
      }
      // the connector's own writer emits IntegerType/FloatType columns
      // (featureJson), so the reader must accept them under a declared
      // schema or its own output cannot round-trip
      case IntegerType => v match {
        case JInt(i) if i.isValidInt => i.toInt
        case JLong(l) if l >= Int.MinValue && l <= Int.MaxValue => l.toInt
        case JDouble(d) if d == math.rint(d) &&
          d >= Int.MinValue.toDouble && d <= Int.MaxValue.toDouble => d.toInt
        case JDecimal(d) if d.isWhole && d.isValidInt => d.toInt
        case JBool(b) => if (b) 1 else 0
        case JString(s) =>
          try s.toInt catch { case _: NumberFormatException => mismatch(v, dt) }
        case _ => mismatch(v, dt)
      }
      case FloatType => v match {
        case JInt(i) => i.toFloat
        case JLong(l) => l.toFloat
        case JDouble(d) => d.toFloat
        case JDecimal(d) => d.toFloat
        case JString(s) =>
          try s.toFloat catch { case _: NumberFormatException => mismatch(v, dt) }
        case _ => mismatch(v, dt)
      }
      case DoubleType => v match {
        case JInt(i) => i.toDouble
        case JLong(l) => l.toDouble
        case JDouble(d) => d
        case JDecimal(d) => d.toDouble
        case JString(s) =>
          try s.toDouble catch { case _: NumberFormatException => mismatch(v, dt) }
        case _ => mismatch(v, dt)
      }
      case BooleanType => v match {
        case JBool(b) => b
        case _ => mismatch(v, dt)
      }
      case StringType => UTF8String.fromString(v match {
        case JString(s) => s
        case other => JsonMethods.compact(JsonMethods.render(other))
      })
      case _ => mismatch(v, dt)
    }
  }

  private def mismatch(v: JValue, dt: DataType): Nothing =
    throw new IllegalArgumentException(
      s"geojson: property value ${JsonMethods.compact(JsonMethods.render(v))} " +
        s"does not fit declared type ${dt.simpleString}; drop the explicit " +
        "schema to re-infer, or widen the declared type")

  private def jsonEscape(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 8)
    s.foreach {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** One GeoJSON Feature string from an InternalRow under `schema`:
    * non-geometry fields become properties (typed JSON scalars),
    * `geometry` decodes WKB → JTS → GeoJSON. Executor-side, no
    * Row conversion. */
  def featureJson(row: InternalRow, schema: StructType): String = {
    val sb = new java.lang.StringBuilder(256)
    sb.append("{\"type\":\"Feature\",\"properties\":{")
    var first = true
    var geom = "null"
    var i = 0
    while (i < schema.length) {
      val f = schema.fields(i)
      if (f.name == GeometryField) {
        if (!row.isNullAt(i))
          geom = GeoJsonCodec.write(GeoFunctions.readWkb(row.getBinary(i)))
      } else {
        if (!first) sb.append(',')
        first = false
        sb.append('"').append(jsonEscape(f.name)).append("\":")
        if (row.isNullAt(i)) sb.append("null")
        else f.dataType match {
          case LongType => sb.append(row.getLong(i))
          case IntegerType => sb.append(row.getInt(i))
          case DoubleType =>
            // JSON has no NaN/Infinity tokens — a bare `NaN` would make
            // the whole document unparseable; null is the standard
            // downgrade (and what the JSON-based writer tiers emit)
            val d = row.getDouble(i)
            if (java.lang.Double.isFinite(d)) sb.append(d) else sb.append("null")
          case FloatType =>
            // shortest-roundtrip FLOAT rendering — widening to double
            // would print 0.1f as 0.10000000149011612 and diverge from
            // the other writer tiers
            val fl = row.getFloat(i)
            if (java.lang.Float.isFinite(fl))
              sb.append(java.lang.Float.toString(fl))
            else sb.append("null")
          case BooleanType => sb.append(row.getBoolean(i))
          case StringType =>
            sb.append('"').append(jsonEscape(row.getUTF8String(i).toString)).append('"')
          case other => throw new IllegalArgumentException(
            s"geojson write: unsupported property type ${other.simpleString} " +
              s"for column ${f.name}")
        }
      }
      i += 1
    }
    sb.append("},\"geometry\":").append(geom).append('}')
    sb.toString
  }
}

/** DSv2 WRITE path: distributed, one valid FeatureCollection document
  * per non-empty partition (so the output directory reads straight
  * back through [[GeoJsonScan]]'s one-task-per-file planning — the
  * connector round-trips itself). Each writer STREAMS features to its
  * file (header → comma-joined features → footer at commit), so
  * executor memory is O(1 row) regardless of partition size; file
  * names carry (partitionId, taskId) so speculative duplicates never
  * collide, and an aborted task deletes its own file. `truncate`
  * (mode=overwrite) clears the directory driver-side before any task
  * launches. */
class GeoJsonWriteBuilder(rawPaths: Seq[String], info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = {
    require(rawPaths.length == 1,
      s"geojson write requires exactly one output path, got $rawPaths")
    new GeoJsonWrite(rawPaths.head, info.schema(), doTruncate,
      info.queryId(),
      new SerializableConfiguration(
        SparkSession.active.sessionState.newHadoopConf()))
  }
}

class GeoJsonWrite(path: String, schema: StructType, truncate: Boolean,
                   queryId: String, conf: SerializableConfiguration)
    extends Write with BatchWrite {
  override def toBatch: BatchWrite = this
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf.value)
    if (truncate && fs.exists(p)) fs.delete(p, true)
    fs.mkdirs(p)
    new GeoJsonWriterFactory(path, schema, queryId, conf)
  }
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case GeoJsonCommit(Some(f)) =>
        val p = new Path(f)
        try p.getFileSystem(conf.value).delete(p, false)
        catch { case _: java.io.IOException => () }
      case _ => ()
    }
}

case class GeoJsonCommit(file: Option[String]) extends WriterCommitMessage

class GeoJsonWriterFactory(dir: String, schema: StructType, queryId: String,
                           conf: SerializableConfiguration)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GeoJsonDataWriter(dir, partitionId, taskId, schema, queryId, conf)
}

class GeoJsonDataWriter(dir: String, partitionId: Int, taskId: Long,
                        schema: StructType, queryId: String,
                        conf: SerializableConfiguration)
    extends DataWriter[InternalRow] {
  // the per-job queryId keeps append-mode writes from DIFFERENT jobs
  // (whose partition/task ids restart at 0) from colliding on a name
  // and silently clobbering each other — the same reason built-in
  // file sources embed a job UUID in part-file names
  private val file = f"$dir/part-$partitionId%05d-$taskId-$queryId.geojson"
  private var out: org.apache.hadoop.fs.FSDataOutputStream = _
  private var n = 0L

  private def ensureOpen(): Unit = if (out == null) {
    val p = new Path(file)
    out = p.getFileSystem(conf.value).create(p, true)
    out.write("""{"type":"FeatureCollection","features":["""
      .getBytes(StandardCharsets.UTF_8))
  }

  override def write(row: InternalRow): Unit = {
    ensureOpen()
    if (n > 0) out.write(','.toInt)
    out.write(GeoJsonSourceV2.featureJson(row, schema)
      .getBytes(StandardCharsets.UTF_8))
    n += 1
  }

  override def commit(): WriterCommitMessage = {
    // partition 0 always writes a (possibly empty) document so even an
    // empty dataset leaves one valid readable file behind
    if (out == null && partitionId == 0) ensureOpen()
    if (out != null) {
      out.write("]}".getBytes(StandardCharsets.UTF_8))
      out.close()
      GeoJsonCommit(Some(file))
    } else GeoJsonCommit(None)
  }

  override def abort(): Unit = if (out != null) {
    try out.close() catch { case _: java.io.IOException => () }
    val p = new Path(file)
    try p.getFileSystem(conf.value).delete(p, false)
    catch { case _: java.io.IOException => () }
  }

  override def close(): Unit = ()
}
