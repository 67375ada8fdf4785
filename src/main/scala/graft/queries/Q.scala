package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named engine query: the Spark implementation plus (where SQL-
  * expressible) its DuckDB oracle twin for the driver's hash compare.
  * Column names/aliases MUST match between the two (the driver sorts
  * columns by name before hashing). */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])
