package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The TWO Spark-internal seams graft needs, isolated in one object.
  * It lives in a subpackage of `org.apache.spark.sql` purely to cross
  * the `private[sql]` access boundary — the same pattern every
  * out-of-tree engine (Delta included) uses. Keep every internal reach
  * HERE; nothing else in the repo touches Spark internals.
  *
  *  1. streaming retag: a v1 `Source.getBatch` must return a DataFrame
  *     whose plan is marked `isStreaming = true` (`MicroBatchExecution`
  *     asserts it) — only `internalCreateDataFrame` can build one;
  *  2. plan→frame ([[frameOf]]): SQL DML on graft tables (DELETE /
  *     UPDATE / MERGE, `plans/GraftSqlRule`) receives the MERGE source
  *     as a resolved `LogicalPlan`, and the only constructor from a
  *     plan is `Dataset.ofRows`, also `private[sql]`.
  */
object StreamingFrameShim {

  /** A batch DataFrame over an analyzer-resolved logical plan
    * (`Dataset.ofRows`) — the MERGE-source seam for SQL DML.
    */
  def frameOf(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    org.apache.spark.sql.classic.Dataset.ofRows(classic, plan)
  }

  /** Re-tag an eagerly planned batch frame as a streaming micro-batch.
    * The RDD is still lazy — the batch plan executes when the
    * micro-batch runs, not here.
    */
  def asStreamingFrame(spark: SparkSession, batch: DataFrame): DataFrame = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.internalCreateDataFrame(
      batch.queryExecution.toRdd, batch.schema, isStreaming = true)
  }

  /** The reverse: re-tag a v1 `Sink.addBatch` micro-batch frame (whose
    * plan is the already-planned incremental execution) as a plain
    * batch frame a normal writer can consume.
    */
  def asBatchFrame(spark: SparkSession, streamBatch: DataFrame): DataFrame = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.internalCreateDataFrame(
      streamBatch.queryExecution.toRdd, streamBatch.schema, isStreaming = false)
  }
}
