package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The Spark-internal seams graft needs, isolated in one object.
  * It lives in a subpackage of `org.apache.spark.sql` purely to cross
  * the `private[sql]`/`private[spark]` access boundaries — the same
  * pattern every out-of-tree engine (Delta included) uses. Keep every
  * internal reach HERE; nothing else in the repo touches Spark internals.
  *
  *  1. streaming retag: a v1 `Source.getBatch` must return a DataFrame
  *     whose plan is marked `isStreaming = true` (`MicroBatchExecution`
  *     asserts it) — only `internalCreateDataFrame` can build one;
  *  2. plan→frame ([[frameOf]]): SQL DML on graft tables (DELETE /
  *     UPDATE / MERGE, `plans/GraftSqlRule`) receives the MERGE source
  *     as a resolved `LogicalPlan`, and the only constructor from a
  *     plan is `Dataset.ofRows`, also `private[sql]`;
  *  3. listener-bus drain ([[drainListenerBus]]): the bench's job-count
  *     bracketing reads a listener-fed counter, and the bus is async.
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

  /** Block until the asynchronous listener bus has delivered every
    * queued event. Without a drain, a job-count bracket read races event
    * delivery in BOTH directions: the timed run's own `onJobStart`s may
    * not be processed yet (undercount) while a prior run's late events
    * inflate the next bracket (ADVICE r13 — min-of-runs could adjudicate
    * a count that is too low).
    */
  def drainListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()

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
