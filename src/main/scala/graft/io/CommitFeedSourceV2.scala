package graft.io

import graft.ops.CommitLog
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** THE COMMIT LOG AS A STREAM — a DataSource V2 micro-batch source
  * over [[graft.ops.CommitLog]] (Delta's streaming source distilled
  * to its metadata half): `spark.readStream.format("commitfeed")
  * .load(root)` tails the table's committed history incrementally,
  * one row per (committed entry, touched partition). Paired with
  * [[graft.ops.StreamCommit]] (the exactly-once WRITE seam), this
  * closes the READ seam: downstream consumers — cache invalidation,
  * incremental view maintenance, replication — react to commits
  * without polling full snapshots.
  *
  * EXACTLY-ONCE is inherited from offset semantics, and the offsets
  * are commit VERSIONS:
  *
  *   - `latestOffset` advances to [[CommitLog.stableVersion]], NEVER
  *     `latestCommitted`: with an in-flight claim at slot 4 and a
  *     commit at slot 5, an offset of 5 would skip slot 4's later
  *     commit FOREVER (the offset only moves forward) — the same
  *     lost-update shape `tryCommit`'s base contract guards, here on
  *     the read side. Below the stable version every resolution is
  *     immutable, so a (start, end] range is DETERMINISTICALLY
  *     replayable — exactly what crash-recovery re-planning of a
  *     checkpointed-but-uncommitted batch requires.
  *   - Aborted slots in range yield no rows (readers never see them);
  *     gaps replay as gaps, bit-stable.
  *
  * Scale shape: the feed is METADATA — kilobytes per micro-batch
  * regardless of table size; entry rows are materialized driver-side
  * at plan time (the same |slots| small-file reads a single
  * `resolvePartitions` costs) and shipped inside the partition, so
  * executors touch no filesystem. Data-plane consumers join
  * `data_path` to the storage tier themselves, scan-pruned by the
  * feed's partition column. */
object CommitFeedSourceV2 {

  val schema: StructType = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("writer", StringType, nullable = true),
    StructField("op", StringType, nullable = true),
    StructField("data_path", StringType, nullable = true),
    StructField("partition", StringType, nullable = true),
    StructField("ts", LongType, nullable = false)))

  /** One row per (committed entry, partition) with version in
    * (afterV, uptoV] — ascending, deterministic below the stable
    * version (resolutions are immutable).
    *
    * FAILS LOUDLY when `afterV` reaches below the expired-history
    * horizon: the slots in (afterV, horizon] were physically deleted
    * by [[CommitLog.expireBelow]], so a consumer whose start offset
    * predates the horizon (a default startingversion=0, or a
    * long-stopped stream's checkpoint) would otherwise silently
    * replay expired commits as NOTHING — the same contract as
    * [[CommitLog.resolveAsOf]]'s below-horizon refusal. */
  def rowsBetween(root: String, afterV: Long,
                  uptoV: Long): Seq[(Long, String, String, String, String, Long)] = {
    val horizon = CommitLog.expiredBelow(root)
    if (afterV < horizon && uptoV > afterV)
      throw new IllegalStateException(
        s"commitfeed offset v$afterV reaches below the expired-history " +
          s"horizon v$horizon — the commits in (v$afterV, v$horizon] " +
          "are physically gone; restart the feed from a fresh " +
          s"startingversion >= $horizon")
    CommitLog.readLog(root)
      .filter { case (v, _) => v > afterV && v <= uptoV }
      .flatMap { case (v, e) =>
        val parts: Seq[String] =
          if (e.partitions.isEmpty) Seq(null) else e.partitions
        parts.map(p => (v, e.writer, e.op, e.dataPath, p, e.ts))
      }
  }

  def resolveRoot(options: CaseInsensitiveStringMap): String = {
    val p = Option(options.get("path")).orElse(Option(options.get("root")))
    require(p.isDefined && p.get.nonEmpty,
      "commitfeed needs a commit-log root: .load(<root>) or option('root', …)")
    p.get
  }
}

class CommitFeedDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "commitfeed"
  override def supportsExternalMetadata(): Boolean = false
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CommitFeedSourceV2.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new CommitFeedTable(CommitFeedSourceV2.resolveRoot(
      new CaseInsensitiveStringMap(properties)))
}

class CommitFeedTable(root: String) extends Table with SupportsRead {
  override def name(): String = s"commitfeed($root)"
  override def schema(): StructType = CommitFeedSourceV2.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val startV = Option(options.get("startingversion")).map(_.toLong)
      .getOrElse(0L)
    val maxPerTrigger =
      Option(options.get("maxversionspertrigger")).map(_.toLong)
    () => new CommitFeedScan(root, startV, maxPerTrigger)
  }
}

class CommitFeedScan(root: String, startV: Long,
                     maxPerTrigger: Option[Long] = None) extends Scan {
  override def readSchema(): StructType = CommitFeedSourceV2.schema
  override def description(): String = s"commitfeed root=$root from=v$startV"
  override def toBatch: Batch = new Batch {
    // a batch read is the feed up to the CURRENT stable version —
    // the same replayable prefix a stream would have consumed
    override def planInputPartitions(): Array[InputPartition] =
      Array(CommitFeedPartition(CommitFeedSourceV2.rowsBetween(
        root, startV, CommitLog.stableVersion(root))))
    override def createReaderFactory(): PartitionReaderFactory =
      new CommitFeedReaderFactory
  }
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new CommitFeedStream(root, startV, maxPerTrigger)
}

/** Offset = commit version (a monotone long). */
case class CommitFeedOffset(v: Long) extends Offset {
  override def json: String = v.toString
}

class CommitFeedStream(root: String, startV: Long,
                       maxPerTrigger: Option[Long] = None)
    extends MicroBatchStream with SupportsAdmissionControl {
  override def initialOffset(): Offset = CommitFeedOffset(startV)
  // stable, never latestCommitted — see the class doc: an offset past
  // an unresolved lower claim would skip its later commit forever
  override def latestOffset(): Offset =
    CommitFeedOffset(math.max(startV, CommitLog.stableVersion(root)))
  // ADMISSION CONTROL (Delta's maxFilesPerTrigger shape): a restart
  // after downtime must not fold the whole backlog into one
  // micro-batch — `maxVersionsPerTrigger` caps each batch's version
  // range; the stable-version ceiling still applies
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[CommitFeedOffset].v
    val stable = math.max(startV, CommitLog.stableVersion(root))
    CommitFeedOffset(maxPerTrigger match {
      case Some(m) => math.min(stable, s + m)
      case None => stable
    })
  }
  override def deserializeOffset(json: String): Offset =
    CommitFeedOffset(json.trim.toLong)
  override def planInputPartitions(start: Offset,
                                   end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[CommitFeedOffset].v
    val e = end.asInstanceOf[CommitFeedOffset].v
    if (e <= s) Array.empty
    else Array(CommitFeedPartition(
      CommitFeedSourceV2.rowsBetween(root, s, e)))
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new CommitFeedReaderFactory
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

case class CommitFeedPartition(
    rows: Seq[(Long, String, String, String, String, Long)])
  extends InputPartition

class CommitFeedReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = new PartitionReader[InternalRow] {
    private val it =
      partition.asInstanceOf[CommitFeedPartition].rows.iterator
    private var cur: (Long, String, String, String, String, Long) = _
    override def next(): Boolean =
      if (it.hasNext) { cur = it.next(); true } else false
    override def get(): InternalRow = {
      def s(x: String) =
        if (x == null) null else UTF8String.fromString(x)
      new GenericInternalRow(Array[Any](
        cur._1, s(cur._2), s(cur._3), s(cur._4), s(cur._5), cur._6))
    }
    override def close(): Unit = ()
  }
}
