package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** The one `private[sql]` seam a DSv1 streaming [[org.apache.spark.sql.execution.streaming.Source]]
  * cannot avoid: `getBatch` must return a frame whose logical plan
  * carries `isStreaming = true` (MicroBatchExecution asserts it), and
  * the only constructor for such a frame is
  * `SparkSession.internalCreateDataFrame(…, isStreaming = true)`.
  * This package-located shim is the standard third-party-connector
  * answer (spark-redshift, early Delta builds, et al.) — one method,
  * no other internals touched. */
object GraftSqlShims {
  def internalCreateStreamingDataFrame(spark: SparkSession,
                                       rdd: RDD[InternalRow],
                                       schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = true)
}
