package graft.io

import graft.SparkSpec
import graft.ops.CommitLog
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** The SQL catalog surface ([[GraftLakeCatalog]] + the V2→V1 read
  * conversion): `SELECT … FROM lake.t`, `VERSION AS OF`, `TIMESTAMP
  * AS OF`, `INSERT INTO`, `INSERT OVERWRITE` — all over the commit
  * log, planning IDENTICALLY to the DataFrame connector (same
  * FileIndex, same pruning, same stats). */
class GraftLakeSqlSpec extends SparkSpec {

  private def freshCatalogRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_lake_sql").toString

  private def install(root: String): Unit = {
    spark.conf.set("spark.sql.catalog.lakespec",
      "graft.io.GraftLakeCatalog")
    spark.conf.set("spark.sql.catalog.lakespec.root", root)
  }

  /** A 3-partition, 2-version table `t` under the catalog root. */
  private def buildTable(root: String): String = {
    val s = spark
    import s.implicits._
    val t = s"$root/t"
    def put(mode: String, rows: (Long, Long, String)*): Unit =
      rows.toDF("k", "v", "pday").write.format("graftlake")
        .option("partitionColumn", "pday").mode(mode).save(t)
    put("overwrite", (1L, 10L, "a"), (2L, 20L, "b"), (3L, 30L, "c"))
    put("overwrite", (9L, 90L, "a")) // v2: dynamic overwrite of a
    java.nio.file.Files.writeString(
      new java.io.File(t, "_lake_table.tsv").toPath,
      "partitionColumn\tpday\n")
    t
  }

  private def rows(df: DataFrame): Seq[(Long, Long, String)] = {
    val s = spark
    import s.implicits._
    df.select("k", "v", "pday").as[(Long, Long, String)]
      .collect().sorted.toSeq
  }

  test("SELECT head, VERSION AS OF, and TIMESTAMP AS OF through pure SQL match the DataFrame connector bit-for-bit") {
    val root = freshCatalogRoot()
    val t = buildTable(root)
    install(root)
    val dfHead = spark.read.format("graftlake")
      .option("partitionColumn", "pday").load(t)
    assert(rows(spark.sql("SELECT * FROM lakespec.t")) === rows(dfHead),
      "SQL head read diverged from the DataFrame connector")
    assert(rows(spark.sql("SELECT * FROM lakespec.t VERSION AS OF 1")) ===
      rows(spark.read.format("graftlake")
        .option("partitionColumn", "pday")
        .option("versionAsOf", "1").load(t)),
      "SQL VERSION AS OF diverged from versionAsOf option")
    // TIMESTAMP AS OF v1's commit stamp (epoch + 1h, session TZ UTC)
    val ts1 = java.time.Instant
      .ofEpochSecond(CommitLog.commitTimestamp(1L)).toString
      .replace("T", " ").replace("Z", "")
    assert(rows(spark.sql(
      s"SELECT * FROM lakespec.t TIMESTAMP AS OF '$ts1'")) ===
      rows(spark.read.format("graftlake")
        .option("partitionColumn", "pday")
        .option("versionAsOf", "1").load(t)),
      "SQL TIMESTAMP AS OF must floor to the newest commit at or before")
    // aggregates + filters work as plain SQL
    assert(spark.sql(
      "SELECT sum(v) s FROM lakespec.t WHERE pday = 'a'")
      .head().getLong(0) === 90L)
  }

  test("SQL reads plan IDENTICALLY to the DataFrame relation: same FileSourceScan, same pruning, same entry-stats sizeInBytes") {
    val root = freshCatalogRoot()
    val t = buildTable(root)
    install(root)
    def scanOf(df: DataFrame): FileSourceScanExec =
      df.queryExecution.executedPlan.collectLeaves()
        .collectFirst { case f: FileSourceScanExec => f }.get
    val sql = spark.sql("SELECT * FROM lakespec.t WHERE pday = 'b'")
    val dfr = spark.read.format("graftlake")
      .option("partitionColumn", "pday").load(t)
      .filter(col("pday") === "b")
    sql.collect(); dfr.collect()
    // identical pruning: one partition's file each, filters at the scan
    assert(scanOf(sql).metrics("numFiles").value ===
      scanOf(dfr).metrics("numFiles").value,
      "SQL and DataFrame reads must prune identically")
    assert(scanOf(sql).metrics("numFiles").value === 1L)
    assert(scanOf(sql).partitionFilters.nonEmpty,
      "the partition filter must reach the SQL scan node")
    // same FileIndex type + same planner statistics (entry stats)
    assert(scanOf(sql).relation.location.isInstanceOf[GraftLakeFileIndex],
      "the SQL read must plan over the commit-log FileIndex")
    assert(scanOf(sql).relation.location.sizeInBytes ===
      scanOf(dfr).relation.location.sizeInBytes)
    // parquet pushdown flows through the SQL path too
    val pushed = spark.sql("SELECT * FROM lakespec.t WHERE k = 3")
    pushed.collect()
    assert(scanOf(pushed).metadata("PushedFilters").contains("EqualTo(k,3"),
      scanOf(pushed).metadata("PushedFilters"))
  }

  test("INSERT INTO appends through the commit log; INSERT OVERWRITE is the connector's dynamic partition overwrite") {
    val root = freshCatalogRoot()
    val t = buildTable(root)
    install(root)
    spark.sql("INSERT INTO lakespec.t VALUES (7, 70, 'b')")
    assert(CommitLog.committedVersions(t) === Seq(1L, 2L, 3L),
      "INSERT INTO must land exactly one commit")
    val (_, e3) = CommitLog.readLog(t).last
    assert(e3.op === "append" && e3.partitions === Seq("b"),
      s"the insert's entry must be a partition-scoped append, got $e3")
    assert(rows(spark.sql("SELECT * FROM lakespec.t")) ===
      Seq((2L, 20L, "b"), (3L, 30L, "c"), (7L, 70L, "b"), (9L, 90L, "a")))
    // the pre-insert snapshot is still SQL-readable (time travel)
    assert(rows(spark.sql("SELECT * FROM lakespec.t VERSION AS OF 2")) ===
      Seq((2L, 20L, "b"), (3L, 30L, "c"), (9L, 90L, "a")))
    // INSERT OVERWRITE: dynamic partition semantics — only partition
    // 'c' changes owner, a and b ride along by reference
    spark.sql("INSERT OVERWRITE lakespec.t VALUES (5, 50, 'c')")
    assert(rows(spark.sql("SELECT * FROM lakespec.t")) ===
      Seq((2L, 20L, "b"), (5L, 50L, "c"), (7L, 70L, "b"), (9L, 90L, "a")))
    assert(CommitLog.resolvePartitions(t)("b")._1 === 3L,
      "INSERT OVERWRITE must not rewrite untouched partitions")
    // INSERT INTO ... SELECT (a real query as the source)
    spark.sql(
      "INSERT INTO lakespec.t SELECT k + 100, v, pday FROM lakespec.t " +
        "WHERE pday = 'a'")
    assert(rows(spark.sql("SELECT * FROM lakespec.t WHERE pday = 'a'")) ===
      Seq((9L, 90L, "a"), (109L, 90L, "a")))
    // a time-travel-pinned table refuses writes
    val ex = intercept[Exception] {
      spark.sql("INSERT INTO lakespec.t VERSION AS OF 1 VALUES (0,0,'a')")
    }
    assert(ex.getMessage.toLowerCase.contains("time travel") ||
      ex.getMessage.contains("immutable") ||
      ex.getMessage.contains("VERSION"), ex.getMessage)
  }

  test("catalog DDL: CREATE TABLE ... USING graftlake PARTITIONED BY, listTables, tableExists, DROP TABLE") {
    val root = freshCatalogRoot()
    install(root)
    spark.sql(
      "CREATE TABLE lakespec.fresh (k BIGINT, v BIGINT, pday STRING) " +
        "USING graftlake PARTITIONED BY (pday)")
    assert(spark.sql("SHOW TABLES IN lakespec").collect()
      .map(_.getString(1)).contains("fresh"))
    spark.sql("INSERT INTO lakespec.fresh VALUES (1, 10, 'x')")
    assert(rows(spark.sql("SELECT * FROM lakespec.fresh")) ===
      Seq((1L, 10L, "x")))
    assert(CommitLog.committedVersions(s"$root/fresh") === Seq(1L))
    spark.sql("DROP TABLE lakespec.fresh")
    assert(!new java.io.File(s"$root/fresh").exists(),
      "DROP TABLE must remove the table directory")
  }

  test("DELETE FROM is partition-granular and metadata-only; finer predicates are refused; CTAS builds a committed table") {
    val s = spark
    import s.implicits._
    val root = freshCatalogRoot()
    val t = buildTable(root)
    install(root)
    // DELETE a whole partition: one metadata commit, zero data moved
    val slotsBefore = CommitLog.committedVersions(t).size
    spark.sql("DELETE FROM lakespec.t WHERE pday = 'c'")
    assert(CommitLog.committedVersions(t).size === slotsBefore + 1,
      "DELETE must land exactly one commit")
    val (_, del) = CommitLog.readLog(t).last
    assert(del.op === "delete" && del.partitions === Seq("c") &&
      del.partBytes === Map("c" -> 0L),
      s"the delete entry must own exactly the named partition: $del")
    assert(rows(spark.sql("SELECT * FROM lakespec.t")) ===
      Seq((2L, 20L, "b"), (9L, 90L, "a")))
    // old versions stay time-travelable past the delete
    assert(rows(spark.sql("SELECT * FROM lakespec.t VERSION AS OF 2"))
      .exists(_._3 == "c"),
      "the pre-delete snapshot must still serve the partition")
    // IN-list deletes work; deleting nothing-owned is a no-op
    spark.sql("DELETE FROM lakespec.t WHERE pday IN ('a', 'zz')")
    assert(rows(spark.sql("SELECT * FROM lakespec.t")) ===
      Seq((2L, 20L, "b")))
    val n = CommitLog.committedVersions(t).size
    spark.sql("DELETE FROM lakespec.t WHERE pday = 'nope'")
    assert(CommitLog.committedVersions(t).size === n,
      "deleting an unowned partition must not commit")
    // a ROW-LEVEL predicate is refused loudly (DV merges own that)
    val ex = intercept[Exception] {
      spark.sql("DELETE FROM lakespec.t WHERE k = 2")
    }
    assert(ex.getMessage.contains("DELETE") ||
      ex.getMessage.contains("delete"), ex.getMessage)
    assert(rows(spark.sql("SELECT * FROM lakespec.t")) ===
      Seq((2L, 20L, "b")), "a refused delete must change nothing")
    // CTAS: create + populate in one statement, committed through the
    // log, partitioned, immediately readable
    spark.sql(
      "CREATE TABLE lakespec.ctas USING graftlake PARTITIONED BY (pday) " +
        "AS SELECT k * 10 AS k, v, pday FROM lakespec.t VERSION AS OF 1")
    assert(rows(spark.sql("SELECT * FROM lakespec.ctas")) ===
      Seq((10L, 10L, "a"), (20L, 20L, "b"), (30L, 30L, "c")))
    assert(CommitLog.committedVersions(s"$root/ctas") === Seq(1L),
      "CTAS must land as a committed first version")
    val (_, ctasEntry) = CommitLog.readLog(s"$root/ctas").last
    assert(ctasEntry.partitions === Seq("a", "b", "c") &&
      ctasEntry.partBytes.keySet === Set("a", "b", "c"),
      "the CTAS commit must carry hive partitions + stats")
  }

  test("ALTER TABLE RENAME COLUMN is a schema commit: logical reads, schema time travel, mapped INSERT, filters pushed through the mapping") {
    val s = spark
    import s.implicits._
    val root = freshCatalogRoot()
    val t = buildTable(root)
    install(root)
    val before = CommitLog.committedVersions(t).size
    spark.sql("ALTER TABLE lakespec.t RENAME COLUMN v TO amount")
    assert(CommitLog.committedVersions(t).size === before + 1,
      "the rename must land exactly one schema commit")
    assert(CommitLog.schemaHistory(t).last._2 === "rename:v->amount")
    // logical read: new name, same bytes; old name is gone
    assert(spark.table("lakespec.t").columns.toSeq ===
      Seq("amount", "k", "pday"),
      spark.table("lakespec.t").columns.toSeq.toString)
    assert(spark.sql(
      "SELECT sum(amount) s FROM lakespec.t WHERE pday = 'a'")
      .head().getLong(0) === 90L)
    // schema TIME TRAVEL: before the rename the old name serves
    assert(spark.sql("SELECT * FROM lakespec.t VERSION AS OF 2")
      .columns.contains("v"),
      "the pre-rename snapshot must serve the old logical name")
    // a second rename layers on the first
    spark.sql("ALTER TABLE lakespec.t RENAME COLUMN k TO id")
    assert(spark.sql(
      "SELECT id, amount FROM lakespec.t WHERE pday = 'b'")
      .as[(Long, Long)].collect().toSeq === Seq((2L, 20L)))
    // INSERT through the mapping: logical columns in, physical ids on
    // disk, read back logically
    spark.sql("INSERT INTO lakespec.t VALUES (70, 7, 'b')")
    assert(spark.sql(
      "SELECT id, amount FROM lakespec.t WHERE pday = 'b' ORDER BY id")
      .as[(Long, Long)].collect().toSeq === Seq((2L, 20L), (7L, 70L)))
    // renaming a missing / colliding column refuses loudly (the
    // missing case is caught by the analyzer's own resolution)
    assert(intercept[Exception] {
      spark.sql("ALTER TABLE lakespec.t RENAME COLUMN nope TO x")
    }.getMessage.contains("nope"))
    assert(intercept[Exception] {
      spark.sql("ALTER TABLE lakespec.t RENAME COLUMN id TO amount")
    }.getMessage.contains("already exists"))
    // partition-granular DELETE still works on the mapped table
    spark.sql("DELETE FROM lakespec.t WHERE pday = 'a'")
    assert(spark.sql("SELECT count(*) c FROM lakespec.t")
      .head().getLong(0) === 3L)
  }

  test("a layered key-domain table reads through SQL (keyColumn from table properties)") {
    val s = spark
    import s.implicits._
    val root = freshCatalogRoot()
    val t = s"$root/layered"
    (1L to 10L).map(k => (k, k * 10L)).toDF("k", "v")
      .repartition(1).write.parquet(s"$t/data/base")
    (2L to 4L).map(k => (k, k * 20L)).toDF("k", "v")
      .repartition(1).write.parquet(s"$t/data/mA")
    CommitLog.tryCommit(t, CommitLog.Entry("ingest", "ingest",
      "data/base", Seq("p1"), 0L))
    CommitLog.tryCommit(t, CommitLog.Entry("mA", "merge", "data/mA",
      Seq("p1"), 1L, keyDomains = Map("p1" -> Seq((2L, 4L)))))
    java.nio.file.Files.writeString(
      new java.io.File(t, "_lake_table.tsv").toPath, "keyColumn\tk\n")
    install(root)
    assert(spark.sql("SELECT sum(v) s FROM lakespec.layered")
      .head().getLong(0) ===
      (1L to 10L).map(k =>
        if (k >= 2 && k <= 4) k * 20L else k * 10L).sum,
      "SQL over a layered table must serve merge-on-read semantics")
  }
}
