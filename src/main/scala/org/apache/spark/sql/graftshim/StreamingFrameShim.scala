package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The ONE Spark-internal seam the versioned streaming source needs:
  * a v1 `Source.getBatch` must return a DataFrame whose logical plan is
  * marked `isStreaming = true` (`MicroBatchExecution` asserts it), and
  * the only constructor for that is `SparkSession.internalCreateDataFrame`,
  * which is `private[sql]`. This object lives in a subpackage of
  * `org.apache.spark.sql` purely to cross that access boundary — the
  * same pattern every out-of-tree v1 streaming source (Delta's
  * `DeltaSource` included) uses. Nothing else in the repo reaches into
  * Spark internals this way; keep it that way.
  */
object StreamingFrameShim {

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
