package graft.ops

import org.apache.spark.sql.DataFrame

/** Unsplittable-input fan-out (optimization guide §2.5, "input skew:
  * one huge unsplittable file ... repartition immediately after the
  * read").
  *
  * The driver's test tables are single-row-group parquet files, so a
  * scan plans exactly ONE task regardless of core count, and every
  * per-row-expensive projection downstream of the scan (shingle
  * explodes, regex chains, PNG/WAV codec kernels) runs single-threaded
  * while the other 31 cores idle. This helper round-robin
  * repartitions to the session's default parallelism — but ONLY when
  * the planned scan parallelism is actually below it, so the branch
  * is input-adaptive, not a local-mode constant:
  *
  *  - at production scale any healthy table plans >= cores splits and
  *    the branch never fires — no exchange is added where the scan
  *    already parallelizes;
  *  - a genuinely unsplittable production input (one giant gzip, a
  *    single-row-group parquet) hits the same single-task wall this
  *    fixes, and the one cheap exchange is exactly the published
  *    remedy.
  *
  * Correctness: results cannot depend on the fan-out — every oracle-
  * checked query is partition-layout-independent by construction (the
  * DuckDB twin computes the same rows with a completely different
  * execution), and round-robin repartition is retry-deterministic
  * (sort-before-repartition, SPARK-23207). Callers place it between
  * the scan and the expensive projection, never after an aggregation.
  */
object Fanout {
  def apply(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
