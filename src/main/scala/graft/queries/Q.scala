package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named engine query: the Spark implementation plus (where SQL-
  * expressible) its DuckDB oracle twin for the driver's hash compare.
  * Column names/aliases MUST match between the two (the driver sorts
  * columns by name before hashing).
  *
  * Cache lifecycle: some query closures persist bounded side tables
  * (shingle/band/bucket/vocab) that mark reuse boundaries in their
  * plans. After materializing the returned DataFrame, callers in
  * long-lived sessions should call [[graft.ops.SideCache.releaseAll]]
  * (as `Verify` and `Bench` do between queries) to drop those blocks;
  * otherwise they stay pinned until session end. */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])
