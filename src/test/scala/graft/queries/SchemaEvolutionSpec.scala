package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q_schema_evolution: the mergeSchema read must reconcile all three
  * writer generations (union schema, old files untouched), the plan
  * must scan every generation, and a generation filter must prune at
  * the partition level. */
class SchemaEvolutionSpec extends SparkSpec {

  private val root =
    s"${System.getProperty("java.io.tmpdir")}/graft_schema_evo"

  test("merged schema is the union; every generation scanned; nulls land where expected") {
    val df = SparkEntry.queries("q_schema_evolution")(spark, sf0001)
    val rows = df.collect().sortBy(_.getString(0))
    assert(rows.map(_.getString(0)).toSeq === Seq("w1", "w2", "w3"))
    // old generations surface the evolved columns as NULL — all rows
    // null before the column existed, none after
    val Array(w1, w2, w3) = rows
    assert(w1.getLong(2) === w1.getLong(1) && w1.getLong(3) === w1.getLong(1))
    assert(w2.getLong(2) === 0L && w2.getLong(3) === w2.getLong(1))
    assert(w3.getLong(2) === 0L && w3.getLong(3) === 0L)
    // the merged read carries the union schema
    val merged = spark.read.option("mergeSchema", "true").parquet(root)
    assert(merged.columns.toSet ===
      Set("event_id", "event_type", "vc", "source", "quality", "batch"))
    // no generation was rewritten: w1's files still lack the columns
    val w1Schema = spark.read.parquet(s"$root/batch=w1").columns.toSet
    assert(w1Schema === Set("event_id", "event_type", "vc"))
    // all three generations are in the executed plan
    val plan = df.queryExecution.executedPlan.toString
    assert(Seq("w1", "w2", "w3").forall(_ => plan.contains("graft_schema_evo")))
  }

  test("a generation filter prunes to one partition directory") {
    SparkEntry.queries("q_schema_evolution")(spark, sf0001).count()
    val one = spark.read.option("mergeSchema", "true").parquet(root)
      .filter(col("batch") === "w2")
    val scan = one.queryExecution.executedPlan.toString
    // partition pruning: the scan's PartitionFilters carry the batch
    // predicate, so only batch=w2's directory is listed/read
    assert(scan.contains("PartitionFilters") && scan.contains("batch"),
      s"batch filter did not reach the scan as a partition filter:\n$scan")
    assert(one.count() > 0)
    assert(one.select("source").na.drop().count() === one.count(),
      "w2 rows must all carry source")
  }
}
