package graft.io

import graft.ops.{CommitLog, LakeRead, StreamCommit}
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{SQLContext, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, BoundReference, Expression, Predicate}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.streaming.{Offset => SourceOffset, Sink, Source}
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister, RelationProvider, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** THE VERSIONED TABLE AS A `spark.read` SOURCE — the read-side twin
  * of the `commitfeed` stream: `spark.read.format("graftlake")
  * .load(root)` (or `CREATE TABLE … USING graftlake OPTIONS(…)` for
  * plain SQL users) serves the [[graft.ops.CommitLog]] table at any
  * version, resolving ownership through the log instead of a
  * directory walk. Until now the entire lakehouse tier — time travel,
  * layered merge-on-read, snapshot isolation — was Scala-API-only
  * (`resolveAsOf`/`resolveLayers`); this makes it consumable from
  * DataFrames and SQL.
  *
  * Architecture is Delta's read path distilled (DeltaLog.
  * createRelation → HadoopFsRelation over TahoeLogFileIndex): a
  * [[RelationProvider]] returning a [[HadoopFsRelation]] whose
  * [[FileIndex]] is driven by the COMMIT LOG, not the filesystem.
  * That one choice buys the whole native scan stack for free —
  * partition pruning (the index receives the query's partition
  * filters and drops pruned partitions before any file is listed into
  * the scan), parquet predicate pushdown, column pruning, the
  * vectorized reader, and whole-stage codegen — because the planner
  * sees an ordinary `FileSourceScanExec`. A from-scratch DSv2
  * `PartitionReader` would have re-implemented (slower) parquet
  * decoding instead.
  *
  * Options:
  *   - `versionAsOf` — serve the table as of this commit version;
  *   - `timestampAsOf` — epoch-seconds twin ([[CommitLog.asOfTimestamp]]
  *     floors to the newest commit at or before it);
  *   - default (neither) — the STABLE head ([[CommitLog.stableVersion]]),
  *     never `latestCommitted`: serving past an unresolved lower claim
  *     would read a state no snapshot can ever have (the same
  *     contract as the feed's `latestOffset`);
  *   - `partitionColumn` — the hive-style directory column (e.g.
  *     `pday`): partition `p` of owner `dp` lives at `dp/<col>=p` and
  *     the column is exposed, string-typed, for pruning. Absent, each
  *     owner path holds the whole partition and the commit-log
  *     partition NAME is exposed as `_partition` (still prunable);
  *   - `keyColumn` — the MERGE key, required only when a partition
  *     resolves to key-domain LAYERS ([[CommitLog.resolveLayers]]).
  *
  * LAYERED partitions (merge-on-read): a partition whose newest owner
  * declares a key domain has no single directory to list. The
  * connector materializes the layered view ONCE into a content-keyed
  * cache (`<root>/_lake_cache/<partition>__v<stack>`, immutable
  * versions ⇒ valid forever, `_SUCCESS`-guarded against torn writes)
  * and serves files from there — the same economics as compacting
  * before read, paid once per layer stack and amortized across every
  * subsequent read at any filter. The steady-state answer remains a
  * real compaction commit (which shadows the layers and re-arms
  * checkpointing); the cache keeps reads correct in the window
  * between merge and compaction.
  *
  * Scale shape: resolution is the log's metadata fold (|slots| small
  * reads + |partitions| driver entries); file listing is one
  * `listStatus` per SURVIVING partition — pruning happens before
  * listing, so a `WHERE pday = X` query lists one directory no matter
  * how many partitions the table has. A production variant would
  * carry file manifests inside the entries themselves (the
  * `q_compact_manifest` convention) and skip listStatus entirely;
  * the resolution and pruning seams here are exactly where that
  * plugs in. */
object GraftLakeSource {

  val VirtualPartitionCol = "_partition"

  /** FILE MANIFESTS — the listing-free read path (Delta's add-file
    * actions distilled to a staged sidecar): the write path emits
    * `_MANIFEST.tsv` (`relpath \t partition \t bytes`) next to the
    * staged data, and the FileIndex serves a manifest-carrying owner
    * WITHOUT any listStatus — at 100k partitions the read plans from
    * |manifests| small file reads instead of |partitions| directory
    * RPCs. The manifest is AUTHORITATIVE: a file in the directory but
    * not in the manifest does not exist to readers (exactly the
    * log-over-filesystem contract — torn writes and alien files are
    * invisible). Directories without a manifest (foreign fixtures,
    * layered-read caches) fall back to listing. */
  val ManifestName = "_MANIFEST.tsv"

  /** Write the staged directory's manifest by walking it ONCE at
    * write time (the writer just produced these files — a production
    * variant collects the list from the write tasks' commit messages
    * and never lists at all). `partitionOf` maps a staged-dir-relative
    * path to its partition name. Returns partition → total bytes —
    * the commit's TOUCHED-PARTITION SET and its file statistics, both
    * derived from the staged files themselves, so the writer never
    * re-scans its input to learn what it wrote. */
  def writeManifest(stagedDir: String,
                    partitionOf: String => Option[String])
      : Map[String, Long] = {
    val base = new java.io.File(stagedDir)
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    val entries = walk(base)
      .filter(f => f.isFile && f.length() > 0)
      .flatMap { f =>
        val rel = base.toPath.relativize(f.toPath).toString
          .replace(java.io.File.separatorChar, '/')
        // any _-/.- prefixed SEGMENT is metadata (the Spark
        // convention): _SUCCESS, .crc files, and whole sidecar dirs
        // like _cdc/ (the change-feed artifact) are never data
        if (rel.split("/").exists(s =>
            s.startsWith("_") || s.startsWith(".")))
          None
        else partitionOf(rel).map(p => (rel, p, f.length()))
      }
    java.nio.file.Files.writeString(
      new java.io.File(base, ManifestName).toPath,
      entries.map { case (rel, p, len) => s"$rel\t$p\t$len" }
        .sorted.mkString("", "\n", "\n"))
    entries.groupMapReduce(_._2)(_._3)(_ + _)
  }

  /** The content key of a layered partition's merge-on-read cache —
    * derived from the exact layer stack (immutable versions ⇒ a key
    * is valid forever; a new layer or a compaction changes it).
    * Shared by the reader and [[vacuum]] so staleness detection can
    * never drift from the materialization.
    *
    * The sanitized partition name is LOSSY (`a/b` and `a_b` both
    * sanitize to `a_b`), so a short hash of the RAW name is appended —
    * without it, two distinct partitions layered with identical
    * version stacks would alias to one cache key and one partition's
    * materialized rows would silently be served as the other's. */
  def cacheName(partition: String,
                stack: Seq[(Long, String, Option[Seq[(Long, Long)]])])
      : String = {
    val key = stack.map { case (v, _, dom) =>
      s"v$v" + dom.map(_.map { case (lo, hi) => s"$lo-$hi" }
        .mkString("d", "_", "")).getOrElse("")
    }.mkString("_")
    val safeP = partition.replaceAll("[^A-Za-z0-9.=-]", "_")
    val tag = java.lang.Integer.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(partition))
    s"${safeP}_h${tag}__$key"
  }

  /** Publish an attempt-unique materialization dir atomically to its
    * content-keyed cache name — FIRST RENAME WINS; the loser deletes
    * its attempt and reads the winner's published cache. Two
    * concurrent readers materializing one stack can therefore never
    * interleave delete+write inside the shared final path (the
    * doubled-rows corruption a check-then-`mode("overwrite")` into
    * the final name allows: both jobs share `<cache>/_temporary` and
    * the survivor can carry BOTH jobs' part files under a valid
    * `_SUCCESS`). A torn pre-publish squatter (a crash of the old
    * direct-write scheme, or a copied tree without `_SUCCESS`) is
    * cleared once and the publish retried; only a cache reached via
    * this atomic rename — proven by its `_SUCCESS` — is ever
    * trusted. */
  private[io] def publishCache(attempt: java.io.File,
                               cache: java.io.File): Unit = {
    def published = new java.io.File(cache, "_SUCCESS").exists()
    if (!attempt.renameTo(cache)) {
      if (!published) {
        // the name is squatted by a torn dir, not a winner: clear it
        // and retry once (a rival doing the same is harmless — one
        // rename wins, the final check below guards the rest)
        rmTreeLocal(cache)
        if (!attempt.renameTo(cache)) rmTreeLocal(attempt)
      } else rmTreeLocal(attempt)
    }
    require(published,
      s"layered-cache publish failed: ${cache.getPath} has no _SUCCESS " +
        "after the atomic rename — torn materialization")
  }

  /** CONNECTOR-LEVEL VACUUM — the three places long-lived tables leak
    * bytes, reclaimed conservatively (returns root-relative swept
    * paths):
    *
    *   1. ABORTED-WRITER STAGING: precise, via the log
    *      ([[CommitLog.sweepOrphanStaging]] — every aborted entry
    *      names exactly what its writer staged);
    *   2. STALE LAYERED CACHES: `_lake_cache` entries whose name no
    *      longer matches ANY partition's CURRENT stack key (a new
    *      layer or a compaction re-keys the cache; old stacks are
    *      unreachable forever because versions are immutable);
    *   3. ZOMBIE SINK STAGING: dirs under the sink's own
    *      `data/stream_*` namespace referenced by NO entry (a
    *      duplicate that skipped mid-flight, or an abandoned rebase
    *      attempt of a crashed sink) and older than `retainMillis`
    *      (Delta's VACUUM retention answer — a LIVE sink's in-flight
    *      staging is younger than any sane retention).
    *
    * Metadata-proportional: one log read + bounded directory walks of
    * connector-owned namespaces; table data is never touched. */
  def vacuum(root: String,
             retainMillis: Long = 7L * 24 * 3600 * 1000): Seq[String] = {
    val swept = scala.collection.mutable.Buffer.empty[String]
    val cutoff = System.currentTimeMillis() - retainMillis
    swept ++= CommitLog.sweepOrphanStaging(root)
    // 2: live cache names from the CURRENT resolution. Staleness
    // alone is not enough to sweep — a long-running reader that
    // resolved BEFORE the re-keying compaction may still be mid-scan
    // on the old cache (Delta's vacuum-vs-reader race), so stale
    // caches also age through the retention window first. Cache HITS
    // touch the dir mtime (the read heartbeat in createRelation), so
    // a time-travel cache in active periodic use never ages out while
    // it is being read; abandoned `_attempt_*` dirs from crashed
    // materializations age out the same way (never live-named).
    val liveCaches = CommitLog.resolveForRead(root).collect {
      case (p, Right(stack)) => cacheName(p, stack)
    }.toSet
    val cacheRoot = new java.io.File(root, "_lake_cache")
    Option(cacheRoot.listFiles()).map(_.toSeq).getOrElse(Nil)
      .filter(d => d.isDirectory && !liveCaches(d.getName) &&
        d.lastModified() < cutoff)
      .foreach { d =>
        rmTreeLocal(d); swept += s"_lake_cache/${d.getName}"
      }
    // 3: unreferenced, old-enough staging under data/. The reference
    // set is the CONSERVATIVE one: committed, aborted, AND in-flight
    // entries (a stalled claim can still commit — sweeping its staging
    // would be a lost update at commit time) plus checkpoint-folded
    // owners (an expired slot's data can be the live owner the fold
    // serves). Two namespaces:
    //   - sink batch dirs (`data/stream_*/b*`) — zombie duplicates
    //     and abandoned rebase attempts of crashed sinks;
    //   - TOP-LEVEL writer staging (`data/<writer>_<uuid>`) — a batch
    //     writer that crashed BEFORE claiming a slot left staging no
    //     entry ever names (invisible to the precise aborted-entry
    //     sweep); age + non-reference make it reclaimable. Nesting is
    //     respected both ways, so a referenced child keeps its parent.
    val referenced = CommitLog.referencedPaths(root)
    def nests(a: String, b: String) =
      a == b || a.startsWith(b + "/") || b.startsWith(a + "/")
    def unreferenced(rel: String) = !referenced.exists(nests(rel, _))
    val dataRoot = new java.io.File(root, "data")
    val topDirs = Option(dataRoot.listFiles()).map(_.toSeq).getOrElse(Nil)
      .filter(_.isDirectory)
    topDirs.filter(_.getName.startsWith("stream_"))
      .flatMap(sd => Option(sd.listFiles()).map(_.toSeq).getOrElse(Nil)
        .map(b => (sd.getName, b)))
      .filter { case (sn, b) =>
        b.isDirectory && b.lastModified() < cutoff &&
          unreferenced(s"data/$sn/${b.getName}")
      }
      .foreach { case (sn, b) =>
        rmTreeLocal(b); swept += s"data/$sn/${b.getName}"
      }
    topDirs.filterNot(_.getName.startsWith("stream_"))
      .filter(d => d.lastModified() < cutoff &&
        unreferenced(s"data/${d.getName}"))
      .foreach { d =>
        rmTreeLocal(d); swept += s"data/${d.getName}"
      }
    swept.toSeq.sorted
  }

  private def rmTreeLocal(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).foreach(_.foreach(rmTreeLocal))
    f.delete(); ()
  }

  /** Parse an owner directory's manifest: partition → file statuses,
    * or None when the owner carries no manifest (fallback = listing).
    * Statuses are built from the manifest alone — no filesystem
    * call. */
  def readManifest(ownerDir: String)
      : Option[Map[String, Seq[FileStatus]]] = {
    val f = new java.io.File(ownerDir, ManifestName)
    if (!f.exists()) None
    else Some(
      java.nio.file.Files.readString(f.toPath)
        .split("\n").toSeq.filter(_.nonEmpty)
        .map { l =>
          val q = l.split("\t", -1)
          (q(1), new FileStatus(q(2).toLong, false, 1, 128L * 1024 * 1024,
            0L, new Path(s"$ownerDir/${q(0)}")))
        }
        .groupMap(_._1)(_._2))
  }

  def resolveRoot(parameters: Map[String, String]): String =
    parameters.get("path").orElse(parameters.get("root"))
      .filter(_.nonEmpty)
      .getOrElse(throw new IllegalArgumentException(
        "graftlake needs a commit-log root: .load(<root>) or option('root', …)"))

  /** The pinned read version from the options (version wins over
    * timestamp; both absent = stable head). */
  def resolveVersion(root: String, parameters: Map[String, String]): Long =
    parameters.get("versionasof").map(_.trim.toLong)
      .orElse(parameters.get("timestampasof").map { ts =>
        CommitLog.asOfTimestamp(root, ts.trim.toLong).getOrElse(
          throw new IllegalArgumentException(
            s"timestampAsOf $ts predates the first commit — no table " +
              "state exists at that time"))
      })
      .getOrElse(CommitLog.stableVersion(root))

  /** SCHEMA-AWARE read — the connector's physical table projected
    * through the ACTIVE column mapping at the SAME version
    * ([[CommitLog.schemaHistory]]): logical names resolve to immutable
    * physical ids, a mapped-but-absent physical id (a re-added column)
    * reads as typed NULL, and schema TIME TRAVEL falls out — asOf a
    * version before a rename serves the old logical names over the
    * same bytes. A log with no schema commits passes the physical
    * table through untouched. Partition/virtual columns ride along.
    *
    * This is where commit-protocol schema changes
    * ([[CommitLog.commitSchema]]) meet the read connector: both the
    * data resolution and the mapping come from one `asOf`, so a read
    * can never pair v5 data with a v7 rename. */
  def logicalRead(spark: SparkSession, root: String,
                  versionAsOf: Option[Long] = None,
                  options: Map[String, String] = Map.empty)
      : org.apache.spark.sql.DataFrame = {
    val asOf = versionAsOf.getOrElse(CommitLog.stableVersion(root))
    val physical = options.foldLeft(
      spark.read.format("graftlake")
        .option("versionAsOf", asOf.toString)) {
      case (r, (k, v)) => r.option(k, v)
    }.load(root)
    CommitLog.schemaHistory(root, asOf).lastOption match {
      case None => physical
      case Some((_, _, mp)) =>
        val loc = if (new Path(mp).isAbsolute) mp else s"$root/$mp"
        val mapping = spark.read.parquet(loc)
          .select("logical", "physical", "dtype").collect()
          .map(r => (r.getString(0), r.getString(1), r.getString(2)))
          .sortBy(_._1).toSeq // bounded: |cols|
        val present = physical.columns.toSet
        val partCol = options.collectFirst {
          case (k, v) if k.equalsIgnoreCase("partitionColumn") => v
        }.getOrElse(VirtualPartitionCol)
        val carried =
          if (present(partCol)) Seq(org.apache.spark.sql.functions.col(partCol))
          else Nil
        physical.select(mapping.map { case (lg, ph, dt) =>
          (if (present(ph)) org.apache.spark.sql.functions.col(ph)
           else org.apache.spark.sql.functions.lit(null).cast(dt)).as(lg)
        } ++ carried: _*)
    }
  }

  /** ROW-LEVEL CHANGE FEED — `table_changes(fromV, toV]` (Delta's CDF
    * read distilled onto the commit log): every committed data version
    * in the window contributes its row-level delta tagged
    * `_change_type` ∈ {insert, remove, update_pre, update_post} and
    * `_commit_version`, composed from three stored planes:
    *
    *   1. `_cdc/` SIDECARS — commits written with
    *      `option("changeFeed", "true")` carry their own delta
    *      (appends: inserts; overwrites: retract old ∪ assert new) —
    *      read verbatim, change-proportional;
    *   2. KEY-DOMAIN LAYERS (MERGE / DV commits) — the delta is
    *      DERIVED from the layer artifact against the pre-image
    *      (the layered view at v−1 restricted to the declared domain;
    *      domain-pruned scans + broadcast key joins, so the cost is
    *      proportional to the merge's delta, never the table):
    *      retract/assert pairs for matched keys, removes for
    *      tombstoned keys, inserts for fresh keys;
    *   3. FIRST-OWNERSHIP commits with no sidecar — an insert-only
    *      commit's feed is its own data files with a synthesized
    *      `insert` (never double-written). A REWRITE of an
    *      already-owned partition without a sidecar fails LOUDLY
    *      (Delta's "change data not recorded" contract) — a silent
    *      guess would fabricate history.
    *
    * Deterministically replayable below the stable version; refuses a
    * window reaching below the expired-history horizon. Options:
    * `partitionColumn` (hive layout), `keyColumn` (required when the
    * window crosses layer commits). */
  def tableChanges(spark: SparkSession, root: String,
                   fromV: Long, toV: Long,
                   options: Map[String, String] = Map.empty)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, lit}
    val lower = options.map { case (k, v) => k.toLowerCase -> v }
    val partCol = lower.get("partitioncolumn")
    val pName = partCol.getOrElse(VirtualPartitionCol)
    val keyCol = lower.get("keycolumn")
    val ct = "_change_type"
    def located(dp: String): String =
      if (new Path(dp).isAbsolute) dp else s"$root/$dp"
    def partDir(dp: String, p: String): String = partCol match {
      case Some(c) => s"${located(dp)}/$c=$p"
      case None => located(dp)
    }
    val horizon = CommitLog.expiredBelow(root)
    require(fromV >= horizon,
      s"table_changes($fromV, $toV) reaches below the expired-history " +
        s"horizon v$horizon — those commits' deltas are physically gone")
    val window = CommitLog.readLog(root).filter { case (v, e) =>
      v > fromV && v <= toV && !e.op.startsWith(CommitLog.SchemaOpPrefix) }
    require(window.nonEmpty,
      s"table_changes($fromV, $toV): no data commits in the window")
    val frames = window.flatMap { case (v, e) =>
      val dp = located(e.dataPath)
      val legs: Seq[org.apache.spark.sql.DataFrame] =
        if (new java.io.File(s"$dp/_cdc", "_SUCCESS").exists())
          Seq(spark.read.parquet(s"$dp/_cdc"))
        else if (e.keyDomains.nonEmpty) {
          val kc = keyCol.getOrElse(throw new IllegalArgumentException(
            s"table_changes: commit v$v is a key-domain layer — " +
              "option('keyColumn', <mergeKey>) is required to derive " +
              "its retract/assert pairs"))
          e.keyDomains.toSeq.flatMap { case (p, ranges) =>
            val pre = LakeRead.layeredFrame(spark,
              CommitLog.resolveLayers(root, p, v - 1), kc,
              d => partDir(d, p))
            val loc = partDir(e.dataPath, p)
            val pairs =
              if (LakeRead.isDvLayer(loc)) {
                val keys = spark.read.parquet(s"$loc/keys").select(kc)
                val rows = spark.read.parquet(s"$loc/rows")
                val rowKeys = rows.select(kc)
                val preT = pre.join(broadcast(keys), Seq(kc), "left_semi")
                Seq(
                  preT.join(broadcast(rowKeys), Seq(kc), "left_anti")
                    .withColumn(ct, lit("remove")),
                  preT.join(broadcast(rowKeys), Seq(kc), "left_semi")
                    .withColumn(ct, lit("update_pre")),
                  rows.join(broadcast(keys), Seq(kc), "left_semi")
                    .withColumn(ct, lit("update_post")),
                  rows.join(broadcast(keys), Seq(kc), "left_anti")
                    .withColumn(ct, lit("insert")))
              } else {
                val preD = pre.filter(LakeRead.inDomain(col(kc), ranges))
                val post = spark.read.parquet(loc)
                  .filter(LakeRead.inDomain(col(kc), ranges))
                val preKeys = preD.select(kc)
                val postKeys = post.select(kc)
                Seq(
                  preD.join(broadcast(postKeys), Seq(kc), "left_anti")
                    .withColumn(ct, lit("remove")),
                  preD.join(broadcast(postKeys), Seq(kc), "left_semi")
                    .withColumn(ct, lit("update_pre")),
                  post.join(broadcast(preKeys), Seq(kc), "left_semi")
                    .withColumn(ct, lit("update_post")),
                  post.join(broadcast(preKeys), Seq(kc), "left_anti")
                    .withColumn(ct, lit("insert")))
              }
            pairs.map(_.withColumn(pName, lit(p)))
          }
        } else {
          val prior = CommitLog.resolveForRead(root, v - 1).keySet
          val dataParts = e.partitions.filterNot(_.startsWith("empty_"))
          val rewritten = dataParts.filter(prior)
          require(rewritten.isEmpty,
            s"table_changes: commit v$v rewrote partition(s) " +
              s"${rewritten.take(5).mkString(", ")} without a stored " +
              "change feed — write with option('changeFeed', 'true')")
          val dirs = dataParts.map(p => (p, partDir(e.dataPath, p)))
            .filter { case (_, loc) => new java.io.File(loc).exists() }
          (dirs, partCol) match {
            case (Nil, _) => Nil
            case (ds, Some(c)) =>
              // ONE partitioned read over every first-ownership dir —
              // a frame per partition would put |partitions| scan legs
              // into the union plan for what is a single commit's data
              val dataSch = spark.read.parquet(ds.head._2).schema
              val full = StructType(dataSch.fields :+
                StructField(c, StringType, nullable = true))
              Seq(spark.read.schema(full)
                .option("basePath", located(e.dataPath))
                .parquet(ds.map(_._2): _*)
                .withColumn(ct, lit("insert")))
            case (ds, None) =>
              ds.map { case (p, loc) => spark.read.parquet(loc)
                .withColumn(pName, lit(p))
                .withColumn(ct, lit("insert")) }
          }
        }
      legs.map(_.withColumn("_commit_version", lit(v)))
    }
    require(frames.nonEmpty,
      s"table_changes($fromV, $toV): the window holds only empty commits")
    frames.reduce(_ unionByName _)
  }
}

class GraftLakeDataSource extends RelationProvider
    with CreatableRelationProvider with StreamSinkProvider
    with StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "graftlake"

  /** STREAMING SOURCE — `spark.readStream.format("graftlake")` tails
    * the table's DATA rows (the feed's data-plane twin; Delta's
    * original DSv1 streaming source shape): offsets are commit
    * versions capped at [[CommitLog.stableVersion]], and each
    * micro-batch carries the rows each commit in (start, end] STAGED
    * for its touched partitions, tagged `_commit_version` — an
    * insert-only CHANGE stream (a rewrite re-emits its partition's
    * new content; downstream applies by version, the replica
    * discipline). Deterministically replayable below the stable
    * version; a checkpointed offset below the expiry horizon fails
    * loudly. `startingVersion` skips history;
    * `maxVersionsPerTrigger` paces a backlog. */
  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) = {
    val lower = parameters.map { case (k, v) => k.toLowerCase -> v }
    val root = GraftLakeSource.resolveRoot(lower)
    (shortName(), GraftLakeStreamSource.streamSchema(
      sqlContext.sparkSession, root, lower))
  }

  override def createSource(sqlContext: SQLContext,
                            metadataPath: String,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): Source = {
    val lower = parameters.map { case (k, v) => k.toLowerCase -> v }
    val root = GraftLakeSource.resolveRoot(lower)
    new GraftLakeStreamSource(sqlContext.sparkSession, root, lower)
  }

  /** STREAMING SINK — `df.writeStream.format("graftlake")` lands
    * micro-batches through [[graft.ops.StreamCommit]], so the sink is
    * EXACTLY-ONCE end-to-end: each batch's data and its (streamId,
    * batchId) identity flip in one atomic commit entry, and a
    * re-delivered batch (the crash window between sink write and
    * engine checkpoint) is skipped BEFORE a byte is staged. Append
    * mode accumulates (read-modify-write of the touched partitions,
    * the batch write path's semantics); Complete mode replaces the
    * named flat partition with each batch's full result (the
    * aggregate-MV shape). Requires `option("streamId", …)` — the
    * durable identity the dedup keys on (Delta's txnAppId). */
  override def createSink(sqlContext: SQLContext,
                          parameters: Map[String, String],
                          partitionColumns: Seq[String],
                          outputMode: OutputMode): Sink = {
    val lower = parameters.map { case (k, v) => k.toLowerCase -> v }
    val root = GraftLakeSource.resolveRoot(lower)
    val streamId = lower.getOrElse("streamid",
      throw new IllegalArgumentException(
        "graftlake sink needs option('streamId', …) — the durable " +
          "stream identity exactly-once dedup keys on"))
    val partCol = lower.get("partitioncolumn")
    val flatPart = lower.get("partition")
    require(partCol.isDefined ^ flatPart.isDefined,
      "graftlake sink needs exactly one of option('partitionColumn', " +
        "<hiveCol>) or option('partition', <name>)")
    require(outputMode == OutputMode.Append() ||
        (outputMode == OutputMode.Complete() && flatPart.isDefined),
      s"graftlake sink supports Append (hive or flat) and Complete " +
        s"(flat only — each batch replaces the partition); got " +
        s"$outputMode with partitionColumn=$partCol")
    new GraftLakeSink(sqlContext, root, streamId, partCol, flatPart,
      outputMode, parameters)
  }

  /** WRITE PATH — `df.write.format("graftlake").mode(…).save(root)`
    * commits through the log (stage privately, then `tryCommit`):
    *
    *   - `Overwrite` is the model's native semantics — the staged
    *     data becomes the new OWNER of exactly the partitions it
    *     carries (dynamic partition overwrite: untouched partitions
    *     ride along by reference, never rewritten);
    *   - `Append` is read-modify-write at partition granularity: the
    *     touched partitions' current content (resolved through the
    *     READ path, so layered partitions and time travel compose)
    *     unions the new rows and commits as the new owner — re-derived
    *     per rebase, because an append's content depends on its base
    *     (at 100 TB a production variant appends FILES to the owner's
    *     manifest instead; the commit seam is identical);
    *   - `ErrorIfExists` / `Ignore` follow SaveMode contract against
    *     "any committed version exists".
    *
    * A concurrent writer overlapping the touched partitions loses the
    * optimistic race and rebases ([[graft.ops.CommitLog.commitWithRebase]]);
    * disjoint writers from one snapshot both land. A schema commit in
    * the window conflicts via the metadata-clash rule. Options:
    * `partitionColumn` (hive layout; touched = the distinct values in
    * the data) or `partition` (single named partition for flat
    * layout); `writer` / `op` label the entry. */
  override def createRelation(sqlContext: SQLContext,
                              mode: SaveMode,
                              parameters: Map[String, String],
                              data: org.apache.spark.sql.DataFrame): BaseRelation = {
    val spark = sqlContext.sparkSession
    val lower = parameters.map { case (k, v) => k.toLowerCase -> v }
    val root = GraftLakeSource.resolveRoot(lower)
    val partCol = lower.get("partitioncolumn")
    val flatPart = lower.get("partition")
    val writer = lower.getOrElse("writer", "graftlake")
    require(partCol.isDefined ^ flatPart.isDefined,
      "graftlake write needs exactly one of option('partitionColumn', " +
        "<hiveCol>) or option('partition', <name>)")
    val exists = CommitLog.committedVersions(root).nonEmpty
    if (exists && mode == SaveMode.ErrorIfExists)
      throw new IllegalStateException(
        s"graftlake table at $root already has committed versions " +
          "(SaveMode.ErrorIfExists)")
    if (exists && mode == SaveMode.Ignore)
      return createRelation(sqlContext, parameters)
    val op = lower.getOrElse("op",
      if (mode == SaveMode.Append && exists) "append" else "overwrite")
    // ONE SCAN of the input, total: stage it immediately, then derive
    // BOTH the touched-partition set and the per-partition byte stats
    // from the manifest the staging just wrote — never a
    // `distinct().collect()` second pass over the caller's frame
    // (which at 100 TB re-executed the input's whole lineage purely
    // to learn the partition names the write itself was about to
    // materialize anyway).
    def uuid8 = java.util.UUID.randomUUID().toString.take(8)
    def stageTo(df: org.apache.spark.sql.DataFrame,
                path: String): Map[String, Long] = partCol match {
      case Some(c) =>
        df.write.partitionBy(c).parquet(s"$root/$path")
        GraftLakeSource.writeManifest(s"$root/$path",
          rel => rel.split("/").find(_.startsWith(s"$c="))
            .map(_.drop(c.length + 1)))
      case None =>
        df.write.parquet(s"$root/$path")
        GraftLakeSource.writeManifest(s"$root/$path", _ => flatPart)
    }
    var stage0 = s"data/${writer}_$uuid8"
    var bytes0 = stageTo(data, stage0)
    val touched: Seq[String] = partCol match {
      case Some(c) =>
        require(!bytes0.keySet.contains("__HIVE_DEFAULT_PARTITION__"),
          s"graftlake write: NULL values in partition column '$c' — " +
            "partition keys must be non-null")
        bytes0.keys.toSeq.sorted
      case None => Seq(flatPart.get)
    }
    require(touched.nonEmpty,
      "graftlake write: no partitions to commit (empty input)")
    // the read params for the append's read-modify-write leg: same
    // options, pinned to the rebase base (strip any caller asOf). The
    // writer's own schema rides along as the inference fallback, so an
    // append over a base whose partitions are all empty (sentinel-only
    // history) still resolves instead of wedging.
    val dataSchema = StructType(
      data.schema.filterNot(f => partCol.contains(f.name)))
    def readAt(base: Long): org.apache.spark.sql.DataFrame =
      spark.baseRelationToDataFrame(createRelation(sqlContext,
        parameters.filterNot { case (k, _) =>
          val lk = k.toLowerCase
          lk == "versionasof" || lk == "timestampasof"
        } + ("versionAsOf" -> s"$base")
          + ("dataSchemaJson" -> dataSchema.json))
        .asInstanceOf[HadoopFsRelation])
    // the staged input read back — what an append attempt unions with
    // the base instead of re-scanning the caller's frame. The explicit
    // schema pins the hive partition column's type (directory-name
    // inference would re-type numeric-looking values).
    def staged0: org.apache.spark.sql.DataFrame =
      spark.read.schema(data.schema).parquet(s"$root/$stage0")
    // CHANGE FEED (opt-in, Delta's CDF economics): the commit stores
    // its own row-level delta in a `_cdc/` sidecar under the committed
    // dataPath — appends store their inserts (the staged input read
    // back, delta-proportional), overwrites store remove(old touched
    // content at the attempt's base) + insert(new) — the honest
    // partition-proportional price of CDC over a rewrite, paid only
    // when the option is on. First-version commits store nothing
    // (insert-only commits synthesize from their own data files at
    // read time, never double-written). `tableChanges` composes these
    // with layer-derived deltas into the row-level feed.
    val changeFeed = lower.get("changefeed").exists(_.toBoolean)
    val ct = "_change_type"
    def writeCdc(dataPath: String,
                 frame: org.apache.spark.sql.DataFrame): Unit =
      frame.write.mode("overwrite").parquet(s"$root/$dataPath/_cdc")
    var lastAttempt: Option[String] = None
    try CommitLog.commitWithRebase(root, { base =>
      if (mode == SaveMode.Append && base > 0L) {
        // an append's content depends on the base it rebased to:
        // stage each attempt into a fresh dir (the loser's staging
        // stays invisible, reclaimable via sweepOrphanStaging; the
        // previous attempt is reclaimed eagerly)
        lastAttempt.foreach(p => graft.ops.VersionChain
          .rmTree(new java.io.File(s"$root/$p")))
        val attempt = s"data/${writer}_$uuid8"
        lastAttempt = Some(attempt)
        val full = partCol match {
          case Some(c) => readAt(base)
            .filter(col(c).isin(touched.map(x => x: Any): _*))
            .unionByName(staged0)
          case None =>
            if (CommitLog.resolveForRead(root, base).contains(flatPart.get))
              readAt(base)
                .filter(col(GraftLakeSource.VirtualPartitionCol) ===
                  flatPart.get)
                .drop(GraftLakeSource.VirtualPartitionCol)
                .unionByName(staged0)
            else staged0
        }
        val bytesA = stageTo(full, attempt)
        if (changeFeed) {
          // an append's delta IS its staged input — every new row is
          // an insert (the flat leg carries its partition explicitly)
          val ins = staged0.withColumn(ct, lit("insert"))
          writeCdc(attempt, partCol match {
            case Some(_) => ins
            case None => ins.withColumn(GraftLakeSource.VirtualPartitionCol,
              lit(flatPart.get))
          })
        }
        CommitLog.Entry(writer, op, attempt, touched, base,
          partBytes = bytesA)
      } else {
        if (changeFeed && base > 0L) {
          // overwrite delta: the touched partitions' OLD content (at
          // this attempt's base) retracts, the staged input asserts —
          // re-derived per rebase, because the removes depend on the
          // base
          val prior = CommitLog.resolveForRead(root, base).keySet
          val removes = partCol match {
            case Some(c) =>
              val rewritten = touched.filter(prior)
              readAt(base).filter(col(c).isin(rewritten.map(x => x: Any): _*))
            case None =>
              val cur = readAt(base)
              if (prior(flatPart.get))
                cur.filter(col(GraftLakeSource.VirtualPartitionCol) ===
                  flatPart.get)
              else cur.limit(0)
          }
          val inserts = partCol match {
            case Some(_) => staged0
            case None => staged0.withColumn(
              GraftLakeSource.VirtualPartitionCol, lit(flatPart.get))
          }
          writeCdc(stage0, removes.withColumn(ct, lit("remove"))
            .unionByName(inserts.withColumn(ct, lit("insert"))))
        }
        // overwrite (and an append with no base): the staged input IS
        // the commit's content — rebases re-validate the same staging
        // instead of rewriting identical bytes per attempt. DEFENSE:
        // a conflict-aborted earlier attempt's entry names this same
        // path, so a concurrent orphan sweep between attempts can
        // reclaim it (the sweep is precise against CRASHED writers,
        // not clairvoyant about live retries) — if the staging
        // vanished, re-stage under a FRESH name before re-validating,
        // or the commit would reference deleted files (found by
        // LakeSoakPropertySpec's vacuum-vs-retry interleaving).
        if (!new java.io.File(
            s"$root/$stage0/${GraftLakeSource.ManifestName}").exists()) {
          stage0 = s"data/${writer}_$uuid8"
          bytes0 = stageTo(data, stage0)
        }
        CommitLog.Entry(writer, op, stage0, touched, base,
          partBytes = bytes0)
      }
    })
    catch { case t: Throwable =>
      // on ultimate failure an APPEND's stage0 is referenced by no
      // entry (only the attempt dirs are, via their aborted claims —
      // sweepOrphanStaging's territory) — reclaim it here or it leaks
      // invisibly forever
      if (lastAttempt.isDefined)
        graft.ops.VersionChain.rmTree(new java.io.File(s"$root/$stage0"))
      throw t
    }
    // an append's winning entry references its attempt dir; the staged
    // input was private scratch — reclaim it eagerly
    if (lastAttempt.isDefined)
      graft.ops.VersionChain.rmTree(new java.io.File(s"$root/$stage0"))
    createRelation(sqlContext, parameters)
  }

  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String]): BaseRelation = {
    val spark = sqlContext.sparkSession
    val lower = parameters.map { case (k, v) => k.toLowerCase -> v }
    val root = GraftLakeSource.resolveRoot(lower)
    val asOf = GraftLakeSource.resolveVersion(root, lower)
    val partCol = lower.get("partitioncolumn")
    val keyCol = lower.get("keycolumn")

    def located(dp: String): String =
      if (new Path(dp).isAbsolute) dp else s"$root/$dp"
    // partition p of an owner path, under either layout
    def partDir(dp: String, p: String): String = partCol match {
      case Some(c) => s"${located(dp)}/$c=$p"
      case None => located(dp)
    }

    // the reserved schema partition is METADATA — its owner is a
    // column-mapping artifact, never table data (logicalRead consumes
    // it; serving it as a data partition would corrupt the scan)
    val plan = CommitLog.resolveForRead(root, asOf) -
      CommitLog.SchemaPartition
    require(plan.nonEmpty,
      s"graftlake: no committed partitions at or below v$asOf in $root")
    // COMMIT-ENTRY FILE STATISTICS: per-partition bytes recorded by
    // the write path ride the owning entries, so the planner's
    // sizeInBytes (the broadcast decision) is served from metadata
    // alone — no listing, no manifest read, on ANY plan. Checkpoint-
    // folded owners and layered stacks have no live entry stats and
    // fall back to the sampled estimate.
    val entryByV = CommitLog.entriesByVersion(root)
    val statBytes: Map[String, Long] = plan.toSeq.collect {
      case (p, Left((v, _))) =>
        entryByV.get(v).flatMap(_.partBytes.get(p)).map(p -> _)
    }.flatten.toMap
    // per-partition OWNER directory — where a write-path manifest
    // would live (layered caches are connector-internal: no manifest,
    // listing fallback)
    val owners: Map[String, String] = plan.collect {
      case (p, Left((_, dp))) => p -> located(dp)
    }

    // LAYERED partitions: materialize once into an ATTEMPT-UNIQUE dir
    // and atomically rename it to the content-keyed cache name (first
    // rename wins — see [[GraftLakeSource.publishCache]]); `_SUCCESS`
    // is the torn-write guard (Spark writes it last). A cache HIT
    // touches the dir's mtime as a read heartbeat, so an actively-read
    // time-travel cache whose stack is no longer the head keeps aging
    // OUT of vacuum's retention window instead of being reclaimed
    // mid-scan and re-materialized every cycle.
    val locations: Map[String, String] = plan.map {
      case (p, Left((_, dp))) => p -> partDir(dp, p)
      case (p, Right(stack)) =>
        val cache = new java.io.File(
          s"$root/_lake_cache/${GraftLakeSource.cacheName(p, stack)}")
        if (!new java.io.File(cache, "_SUCCESS").exists()) {
          val kc = keyCol.getOrElse(throw new IllegalArgumentException(
            s"graftlake: partition '$p' resolves to key-domain layers " +
              "— option('keyColumn', <mergeKey>) is required to " +
              "materialize the layered view"))
          val attempt = new java.io.File(s"$root/_lake_cache",
            s"_attempt_${java.util.UUID.randomUUID().toString.take(12)}")
          LakeRead.layeredFrame(spark, stack, kc,
            dp => partDir(dp, p))
            .write.mode("overwrite").parquet(attempt.getPath)
          GraftLakeSource.publishCache(attempt, cache)
        }
        cache.setLastModified(System.currentTimeMillis()) // read heartbeat
        p -> cache.getPath
    }

    val fs = new Path(root).getFileSystem(
      spark.sessionState.newHadoopConf())
    // manifest-aware per-partition lister: a manifest-carrying owner
    // serves its file set WITHOUT any listStatus (and the manifest is
    // authoritative — alien files in the directory are invisible);
    // owners without one fall back to listing, where a missing
    // directory lists as EMPTY (the streaming sink's empty-batch
    // sentinel partitions own a staged path with no hive subdir, and
    // a SQL DELETE's empty owner has a zero-entry manifest — a
    // zero-file partition is a legitimate table state)
    val manifests =
      scala.collection.concurrent.TrieMap
        .empty[String, Option[Map[String, Seq[FileStatus]]]]
    def filesFor(p: String): Seq[FileStatus] = {
      val fromManifest = owners.get(p).flatMap { od =>
        manifests.getOrElseUpdate(od, GraftLakeSource.readManifest(od))
          .map(_.getOrElse(p, Nil))
      }
      fromManifest.getOrElse(
        scala.util.Try(fs.listStatus(new Path(locations(p))).toSeq)
          .getOrElse(Nil).filter(f =>
          f.isFile && f.getLen > 0 && {
            val n = f.getPath.getName
            !n.startsWith("_") && !n.startsWith(".")
          }))
    }
    // infer from the first partition that actually HAS data files
    // (checked through the manifest/listing, so empty owners —
    // sentinels, SQL deletes — are skipped without probing missing
    // directories). When NO partition has readable files (a table
    // whose only commit so far is an empty first micro-batch's
    // sentinel), fall back to the writer-provided `dataSchemaJson` —
    // without it, a hive-layout Append sink whose batch 0 was empty
    // would WEDGE permanently: the next batch's accumulate read at
    // base=1 throws here, addBatch fails, and every restart
    // re-delivers it (a crash loop with no operator remedy).
    val dataSchema = locations.keys.toSeq.sorted.view
      .filter(p => filesFor(p).nonEmpty)
      .flatMap { p =>
        scala.util.Try(
          spark.read.parquet(filesFor(p).head.getPath.toString).schema)
          .toOption.filter(_.nonEmpty)
      }.headOption
      .orElse(lower.get("dataschemajson").map(j =>
        org.apache.spark.sql.types.DataType.fromJson(j)
          .asInstanceOf[StructType]))
      .getOrElse(throw new IllegalArgumentException(
        s"graftlake: no readable data files at v$asOf in $root " +
          "(pass option('dataSchemaJson', …) to read a table whose " +
          "committed partitions are all empty)"))
    val pName = partCol.getOrElse(GraftLakeSource.VirtualPartitionCol)
    require(!dataSchema.fieldNames.contains(pName),
      s"graftlake: partition column '$pName' collides with a data column")
    val partitionSchema = StructType(Seq(
      StructField(pName, StringType, nullable = false)))
    HadoopFsRelation(
      location = new GraftLakeFileIndex(root, locations, partitionSchema,
        filesFor, statBytes),
      partitionSchema = partitionSchema,
      dataSchema = dataSchema,
      bucketSpec = None,
      fileFormat = new ParquetFileFormat,
      options = Map.empty)(spark)
  }
}

/** Commit-log-driven [[FileIndex]]: partitions come from the log's
  * resolution (never a directory walk), partition FILTERS are
  * evaluated driver-side against the partition values BEFORE any
  * directory is listed — pruning cuts both the scan and the listing —
  * and each surviving partition contributes its files tagged with its
  * partition value, so the scan's `PartitionFilters`/`numFiles`
  * metrics reflect the pruning (assertable from the executed plan). */
class GraftLakeFileIndex(root: String,
                         locations: Map[String, String],
                         override val partitionSchema: StructType,
                         list: String => Seq[FileStatus],
                         statBytes: Map[String, Long] = Map.empty)
    extends FileIndex {

  override def rootPaths: Seq[Path] = Seq(new Path(root))

  private def partRow(p: String): InternalRow =
    InternalRow(UTF8String.fromString(p))

  // listed lazily per PARTITION and memoized: a pruned read never
  // pays listing (or a manifest read) for partitions it dropped —
  // `list` receives the partition name and resolves manifest-vs-
  // listing itself
  private val listed =
    scala.collection.concurrent.TrieMap.empty[String, Seq[FileStatus]]
  private def filesOf(p: String): Seq[FileStatus] =
    listed.getOrElseUpdate(p, list(p))

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val survivors =
      if (partitionFilters.isEmpty) locations.keys.toSeq.sorted
      else {
        // the standard bound-predicate fold (PartitioningAwareFileIndex
        // / Delta's TahoeFileIndex do exactly this): rebind the
        // filters' attributes to the 1-column partition row, evaluate
        // per partition value driver-side
        val bound = Predicate.createInterpreted(
          partitionFilters.reduce(
            org.apache.spark.sql.catalyst.expressions.And).transform {
            case a: AttributeReference =>
              val i = partitionSchema.fieldIndex(a.name)
              BoundReference(i, partitionSchema(i).dataType,
                nullable = true)
          })
        locations.keys.toSeq.sorted.filter(p => bound.eval(partRow(p)))
      }
    survivors.map(p => PartitionDirectory(partRow(p), filesOf(p).toArray))
  }

  override def inputFiles: Array[String] =
    locations.keys.toSeq.sorted
      .flatMap(p => filesOf(p).map(_.getPath.toString)).toArray

  override def refresh(): Unit = listed.clear()

  /** Planner size estimate (drives broadcast decisions). The planner
    * calls this on EVERY query, so it must not force a full listing —
    * that would defeat pruned-listing at 100k partitions.
    *
    * Served from COMMIT-ENTRY STATISTICS first ([[graft.ops.CommitLog
    * .Entry.partBytes]], recorded by the write path from the manifest
    * it emitted): when every partition's owning entry carries stats,
    * the estimate is exact table bytes with ZERO filesystem calls —
    * the planner never lists at all, so a small lake dimension
    * auto-broadcasts in a join purely from metadata. Partitions
    * without stats (checkpoint-folded owners, layered-cache
    * materializations, pre-stats history) fall back to one sampled
    * partition's bytes × |unknown| (whatever is already memoized is
    * used exactly). Skewed tables then overestimate or underestimate
    * only the BROADCAST choice, never correctness. */
  override def sizeInBytes: Long =
    if (locations.isEmpty) 0L
    else if (statBytes.size == locations.size) statBytes.values.sum
    else {
      val known = listed.readOnlySnapshot()
      val exact = locations.keysIterator
        .map(p => statBytes.get(p).orElse(known.get(p).map(_.map(_.getLen).sum)))
      if (exact.forall(_.isDefined))
        locations.keysIterator.map(p => statBytes.getOrElse(p,
          known(p).map(_.getLen).sum)).sum
      else {
        val stated = statBytes.values.sum
        val sample = known.headOption.map(_._2)
          .getOrElse(filesOf(
            locations.keys.filterNot(statBytes.contains).min))
        stated + sample.map(_.getLen).sum *
          (locations.size - statBytes.size)
      }
    }
}

/** The exactly-once micro-batch sink behind
  * `writeStream.format("graftlake")` — a thin [[Sink]] over
  * [[graft.ops.StreamCommit.commitBatch]]:
  *
  *   - staging is BATCH-DETERMINISTIC
  *     (`data/stream_<streamId>/b<batchId>`), so a zombie duplicate's
  *     staging coincides with the winner's files and nothing orphans
  *     (the StreamCommit staging discipline);
  *   - the duplicate check runs BEFORE staging: a re-delivered 100 TB
  *     batch costs |slots| small metadata reads, never a write;
  *   - Append accumulates per partition (read-modify-write through
  *     the connector's own read path, re-derived per rebase — the
  *     no-lost-update discipline of the batch Append); Complete
  *     replaces the flat partition with each batch's full result;
  *   - an empty micro-batch commits a sentinel partition
  *     (`empty_<streamId>`) to keep the duplicate-race conflict
  *     surface non-empty (the StreamCommit guard). */
class GraftLakeSink(sqlContext: SQLContext, root: String,
                    streamId: String, partCol: Option[String],
                    flatPart: Option[String], outputMode: OutputMode,
                    parameters: Map[String, String]) extends Sink {

  private def safe(s: String) = s.replaceAll("[^A-Za-z0-9._-]", "_")

  override def addBatch(batchId: Long,
                        data: org.apache.spark.sql.DataFrame): Unit = {
    val spark = data.sparkSession
    // re-plan the incremental Dataset as a plain batch frame: the
    // micro-batch frame's logical plan is still flagged streaming, so
    // plain actions refuse it — take the EXECUTED plan's rows
    // (queryExecution.toRdd, the DSv1-sink materialization pattern)
    // and rewrap them batch-side. The accumulator counts rows ON the
    // one staging scan (flat-layout emptiness needs a row count and a
    // separate isEmpty probe would re-execute the batch's lineage).
    val schema = data.schema
    val nAcc = spark.sparkContext.longAccumulator(
      s"graftlake_sink_rows_${safe(streamId)}_b$batchId")
    val rowRdd = data.queryExecution.toRdd.mapPartitions { it =>
      val conv = org.apache.spark.sql.catalyst.CatalystTypeConverters
        .createToScalaConverter(schema)
      it.map { ir => nAcc.add(1L)
        conv(ir).asInstanceOf[org.apache.spark.sql.Row] }
    }
    val batch = spark.createDataFrame(rowRdd, schema)
    def uuid8 = java.util.UUID.randomUUID().toString.take(8)
    def rm(p: String): Unit =
      graft.ops.VersionChain.rmTree(new java.io.File(s"$root/$p"))
    // ONE SCAN of the micro-batch, total: the input is staged ONCE
    // (lazily, inside the first stageAt call — a detected re-delivery
    // must still never write a byte), and the touched-partition set,
    // the per-partition stats, and the row count all come from that
    // one staging (manifest + accumulator) — never a
    // distinct().collect() second execution of the batch's lineage.
    var inputStaged: Option[(String, Map[String, Long], Long)] = None
    def stageInput(): (String, Map[String, Long], Long) =
      inputStaged
        // DEFENSE against the sweep-vs-retry interleave: an aborted
        // earlier attempt's entry names this path, and a concurrent
        // orphan sweep between attempts may have reclaimed it —
        // re-stage under a fresh name rather than commit deleted files
        .filter { case (p, _, _) => new java.io.File(
          s"$root/$p/${GraftLakeSource.ManifestName}").exists() }
        .getOrElse {
        val path =
          s"data/stream_${safe(streamId)}/b${batchId}_in_$uuid8"
        val bytes = partCol match {
          case Some(c) =>
            batch.write.mode("overwrite").partitionBy(c)
              .parquet(s"$root/$path")
            GraftLakeSource.writeManifest(s"$root/$path",
              rel => rel.split("/").find(_.startsWith(s"$c="))
                .map(_.drop(c.length + 1)))
          case None =>
            batch.write.mode("overwrite").parquet(s"$root/$path")
            GraftLakeSource.writeManifest(s"$root/$path", _ => flatPart)
        }
        val staged = (path, bytes, nAcc.value.longValue())
        inputStaged = Some(staged)
        staged
      }
    // abandoned-attempt hygiene: each rebase stages a fresh dir; the
    // sink deletes its own previous attempt before re-staging (the
    // final committed dir is never revisited). A zombie duplicate
    // that skips after staging leaves one dir for age-based retention
    // — the documented attempt-unique tradeoff.
    var lastAttempt: Option[String] = None
    var finalPath: Option[String] = None
    // BASE-AWARE staging (commitBatchRebasingStats): the accumulate
    // union reads the touched partitions AT the attempt's base plus
    // the staged input read back, and is re-derived per rebase — a
    // rival appending to the same partition between staging and
    // commit is re-read, never silently overwritten. The staged path
    // is ATTEMPT-UNIQUE: two zombie duplicates racing one (streamId,
    // batchId) then stage disjoint dirs, so a concurrent delete+write
    // interleave can never leave BOTH jobs' part files under the
    // committed path (doubled rows) — the winner's dir is pristine
    // and its manifest lists exactly its own files.
    val committed = StreamCommit.commitBatchRebasingStats(root, streamId,
      batchId, base => {
      val (inPath, inBytes, nRows) = stageInput()
      val touched: Seq[String] = partCol match {
        case Some(c) =>
          require(!inBytes.keySet.contains("__HIVE_DEFAULT_PARTITION__"),
            s"graftlake sink: NULL values in partition column '$c' — " +
              "partition keys must be non-null")
          inBytes.keys.toSeq.sorted
        case None => if (nRows == 0L) Nil else Seq(flatPart.get)
      }
      val out =
        if (touched.isEmpty)
          // empty micro-batch: the staged (zero-data-file) input dir
          // owns the sentinel partition — conflict surface kept
          (inPath, Seq(s"empty_${safe(streamId)}"), Map.empty[String, Long])
        else {
          val accumulate = outputMode == OutputMode.Append() && base > 0L
          if (!accumulate) (inPath, touched, inBytes)
          else {
            lastAttempt.foreach(rm)
            val staged = s"data/stream_${safe(streamId)}/" +
              s"b${batchId}_r${base}_$uuid8"
            lastAttempt = Some(staged)
            // the batch's own schema is the inference fallback: a
            // base whose only commit is the empty-batch sentinel has
            // zero readable files, and without the fallback this
            // accumulate read would throw — permanently wedging the
            // stream (every restart re-delivers the failing batch)
            val current = parameters.foldLeft(
              spark.read.format("graftlake")
                .option("versionAsOf", base.toString)
                .option("dataSchemaJson", StructType(schema
                  .filterNot(f => partCol.contains(f.name))).json)) {
              case (r, (k, v)) => r.option(k, v)
            }.load(root)
            val stagedIn =
              spark.read.schema(schema).parquet(s"$root/$inPath")
            val full = partCol match {
              case Some(c) => current
                .filter(col(c).isin(touched.map(x => x: Any): _*))
                .unionByName(stagedIn)
              case None =>
                if (CommitLog.resolveForRead(root, base)
                    .contains(flatPart.get))
                  current.filter(
                    col(GraftLakeSource.VirtualPartitionCol) ===
                      flatPart.get)
                    .drop(GraftLakeSource.VirtualPartitionCol)
                    .unionByName(stagedIn)
                else stagedIn
            }
            val bytesA = partCol match {
              case Some(c) =>
                full.write.mode("overwrite").partitionBy(c)
                  .parquet(s"$root/$staged")
                GraftLakeSource.writeManifest(s"$root/$staged",
                  rel => rel.split("/").find(_.startsWith(s"$c="))
                    .map(_.drop(c.length + 1)))
              case None =>
                full.write.mode("overwrite").parquet(s"$root/$staged")
                GraftLakeSource.writeManifest(s"$root/$staged",
                  _ => flatPart)
            }
            (staged, touched, bytesA)
          }
        }
      finalPath = Some(out._1)
      out
    })
    // staging hygiene after the outcome is known: a skipped duplicate
    // reclaims everything it staged; a committed accumulate reclaims
    // the private input staging its attempt folded in
    (committed, inputStaged, finalPath) match {
      case (None, Some((inPath, _, _)), _) =>
        lastAttempt.foreach(rm); rm(inPath)
      case (Some(_), Some((inPath, _, _)), Some(fp)) if fp != inPath =>
        rm(inPath)
      case _ => ()
    }
  }
}

/** Offset for the graftlake streaming source: a commit version. */
case class GraftLakeOffset(v: Long) extends SourceOffset {
  override def json: String = v.toString
}

object GraftLakeStreamSource {
  /** The stream's schema: the table's data columns + the partition
    * column (hive name or `_partition`) + `_commit_version` — plus
    * `_change_type` under `readChangeFeed`. Inferred from the newest
    * committed data entry's staged files — the table must have at
    * least one committed data version when the stream starts (the
    * Delta contract). */
  def streamSchema(spark: SparkSession, root: String,
                   lower: Map[String, String]): StructType = {
    val pName = lower.getOrElse("partitioncolumn",
      GraftLakeSource.VirtualPartitionCol)
    val cdc = lower.get("readchangefeed").exists(_.toBoolean)
    val dataEntries = CommitLog.readLog(root).filter { case (_, e) =>
      !e.op.startsWith(CommitLog.SchemaOpPrefix) }
    require(dataEntries.nonEmpty,
      s"graftlake stream: no committed data versions in $root yet — " +
        "commit an initial version before starting the stream")
    val (_, e) = dataEntries.last
    val dp = if (new Path(e.dataPath).isAbsolute) e.dataPath
      else s"$root/${e.dataPath}"
    // a DV layer's staged dir holds keys/ + rows/ — the ROW schema is
    // the table's (keys are metadata); probing the dir itself would
    // mix both
    val probe = if (LakeRead.isDvLayer(dp)) s"$dp/rows" else dp
    val dataSchema = StructType(
      spark.read.parquet(probe).schema.filterNot(_.name == pName))
    StructType(dataSchema.fields.toSeq ++
      Seq(StructField(pName, StringType, nullable = false)) ++
      (if (cdc) Seq(StructField("_change_type", StringType,
        nullable = false)) else Nil) :+
      StructField("_commit_version", org.apache.spark.sql.types.LongType,
        nullable = false))
  }
}

/** DSv1 [[Source]] over the commit log's DATA rows — see
  * [[GraftLakeDataSource.sourceSchema]]. getBatch builds each range
  * from ordinary pruned batch reads of the staged paths (the native
  * parquet stack), so replay below the stable version is bit-stable
  * and costs only the changed partitions. */
class GraftLakeStreamSource(spark: SparkSession, root: String,
                            lower: Map[String, String]) extends Source {

  private val partCol = lower.get("partitioncolumn")
  private val pName =
    partCol.getOrElse(GraftLakeSource.VirtualPartitionCol)
  private val startV = lower.get("startingversion").map(_.trim.toLong)
    .getOrElse(0L)
  private val maxPerTrigger =
    lower.get("maxversionspertrigger").map(_.trim.toLong)
  private val readCdc = lower.get("readchangefeed").exists(_.toBoolean)
  override val schema: StructType =
    GraftLakeStreamSource.streamSchema(spark, root, lower)
  private val dataSchema =
    StructType(schema.filterNot(f =>
      f.name == pName || f.name == "_commit_version" ||
        f.name == "_change_type"))

  // pacing state: the highest offset the engine has seen from us —
  // advanced by getBatch AND by the engine's commit() callback. The
  // callback matters on a CLEAN restart: the engine re-plans no batch
  // (nothing uncommitted) and only calls commit(checkpointedEnd); a
  // paced getOffset that forgot that position would return
  // min(stable, startV + m) — BELOW the engine's current offset —
  // and the stream would livelock, never seeing new data.
  private var lastEnd: Option[Long] = None
  private def advance(v: Long): Unit =
    lastEnd = Some(math.max(v, lastEnd.getOrElse(v)))

  override def getOffset: Option[SourceOffset] = {
    val stable = CommitLog.stableVersion(root)
    val ceiling = maxPerTrigger match {
      case Some(m) => math.min(stable, lastEnd.getOrElse(startV) + m)
      case None => stable
    }
    if (ceiling <= startV) None else Some(GraftLakeOffset(ceiling))
  }

  override def getBatch(start: Option[SourceOffset],
                        end: SourceOffset): org.apache.spark.sql.DataFrame = {
    val s = math.max(startV,
      start.map(_.json.trim.toLong).getOrElse(startV))
    val e = end.json.trim.toLong
    advance(e)
    val horizon = CommitLog.expiredBelow(root)
    if (s < horizon && e > s)
      throw new IllegalStateException(
        s"graftlake stream offset v$s reaches below the expired-history " +
          s"horizon v$horizon — the commits in (v$s, v$horizon] are " +
          "physically gone; restart from a fresh startingVersion")
    val dataWindow = CommitLog.readLog(root)
      .filter { case (v, en) => v > s && v <= e &&
        !en.op.startsWith(CommitLog.SchemaOpPrefix) }
    // CHANGE-FEED mode: each batch carries the window's row-level
    // deltas from tableChanges (same offsets, same pacing, same
    // replayability — the consumer applies by version)
    val frames =
      if (readCdc) {
        if (dataWindow.isEmpty) Nil
        else Seq(GraftLakeSource.tableChanges(spark, root, s, e, lower)
          .select(schema.fieldNames.map(
            org.apache.spark.sql.functions.col).toSeq: _*))
      } else dataWindow.flatMap { case (v, en) =>
        val dp = if (new Path(en.dataPath).isAbsolute) en.dataPath
          else s"$root/${en.dataPath}"
        en.partitions.flatMap { p =>
          val base = partCol match {
            case Some(c) => s"$dp/$c=$p"
            case None => dp
          }
          // a DV layer's STAGED ROWS are its post-images + inserts
          // (`rows/`); the tombstone keys are metadata, not rows —
          // the insert-only change stream re-emits staged content,
          // and for a DV commit that content is rows/
          val loc =
            if (LakeRead.isDvLayer(base)) s"$base/rows" else base
          if (!new java.io.File(loc).exists()) None // sentinel/empty
          else Some(spark.read.schema(dataSchema).parquet(loc)
            .withColumn(pName, org.apache.spark.sql.functions.lit(p))
            .withColumn("_commit_version",
              org.apache.spark.sql.functions.lit(v)))
        }
      }
    val batch =
      if (frames.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else frames.reduce(_ unionByName _)
    // MicroBatchExecution asserts the returned frame's plan carries
    // isStreaming=true — rewrap the executed rows through the one
    // private[sql] seam every DSv1 source needs (GraftSqlShims)
    org.apache.spark.sql.graft.GraftSqlShims
      .internalCreateStreamingDataFrame(spark,
        batch.queryExecution.toRdd, schema)
  }

  override def commit(end: SourceOffset): Unit =
    advance(end.json.trim.toLong)
  override def stop(): Unit = ()
}
