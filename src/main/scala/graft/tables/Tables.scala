package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Readers for the driver test tables (`TESTDATA.md`, `FIXTURES.md` §B).
  *
  * All tables are plain parquet; `events.ts` is written as parquet
  * `TIMESTAMP(NANOS, isAdjustedToUTC=false)` which Spark's vectorized
  * reader only surfaces as a raw nano-epoch long under
  * `spark.sql.legacy.parquet.nanosAsLong` (SPARK-40819). [[events]]
  * normalizes it back to a session-TZ (UTC) timestamp so downstream
  * `to_date` matches DuckDB's `CAST(ts AS DATE)` on the same file.
  */
object Tables {

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Harmless for non-nano tables; required before reading events.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(path(dir, name))
  }

  /** events with `ts` normalized to TimestampType (UTC session). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        // nano-epoch long -> micros (integer division keeps full precision)
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case _: TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")

  /** documents behind [[graft.ops.Fanout]]'s unsplittable-input
    * branch, for consumers whose first post-scan projection is
    * per-row EXPENSIVE (media codec kernels, tokenizer regex chains,
    * shingle explodes): the fixture's single-row-group scan plans ONE
    * task, so without the fan-out those kernels run single-threaded.
    * Deliberately NOT the default read: for scan→agg consumers the
    * extra exchange plus 32-task stages cost more than the 1-task
    * scan (measured r19: q_bm25 0.36→0.71 s fanned, while
    * q_media_resize 2.58→0.88 s — the trade is real in both
    * directions, so each call site picks by measurement). */
  def documentsFan(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Fanout(documents(spark, dir))
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
