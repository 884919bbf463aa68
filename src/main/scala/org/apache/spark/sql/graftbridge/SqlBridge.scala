package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.LogicalRDD

/** The ONE place the engine touches `private[sql]` Spark API, from a
  * package nested under `org.apache.spark.sql` — the standard
  * external-connector seam (delta-spark compiles inside
  * `org.apache.spark.sql.delta` for exactly this access). Everything
  * here is COMPILE-CHECKED against the Spark version on the classpath:
  * an API change surfaces as a build error, never a runtime reflection
  * failure.
  */
object SqlBridge {

  /** Re-wrap a micro-batch DataFrame handed to a DSv1 `Sink.addBatch`
    * as a BATCH DataFrame over the already-planned batch RDD — the
    * identical move `ForeachBatchSink` makes: the incoming Dataset's
    * logical plan still contains the streaming scan relations, so any
    * re-planning (a `.write`, an aggregate) would trip the
    * streaming-execution guard; `queryExecution.toRdd` pins THIS
    * batch's physical plan and `LogicalRDD` presents it as batch
    * input. */
  def asBatch(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val data = df.asInstanceOf[classic.DataFrame]
    val node = LogicalRDD.fromDataset(
      data.queryExecution.toRdd, data, isStreaming = false)
    classic.Dataset.ofRows(data.sparkSession, node)
  }

  /** Catalyst predicate → DSv2 [[org.apache.spark.sql.sources.Filter]],
    * Spark's own translation (`protected[sql]`) — how the graft-txlog
    * source turns its `filterExpr` option into the same filter objects
    * the batch pushdown path receives. */
  def translateFilter(predicate: org.apache.spark.sql.catalyst.expressions.Expression)
      : Option[org.apache.spark.sql.sources.Filter] =
    org.apache.spark.sql.execution.datasources.DataSourceStrategy
      .translateFilter(predicate, supportNestedPredicatePushdown = true)
}
