package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.types.{LongType, StructType}

/** Dense global row IDs — `ROW_NUMBER() OVER (ORDER BY ...)` at scale.
  * The naive window is a single-partition sort: every row of a 100 TB
  * table funnels through one reducer. The scalable shape is the
  * classic TWO-PASS: range-repartition on the order columns (partition
  * p holds a contiguous key range, ranges ascending with p), then
  * `zipWithIndex` — which runs one lightweight count job over the
  * partitions and offsets each partition's local indices by the sum of
  * counts before it. No stage ever sees more than one partition's
  * rows; the only sequential state is the O(partitions) count vector.
  *
  * Determinism contract: ids follow `orderCols`; ties are broken
  * arbitrarily (range splits can place equal keys on either side of a
  * boundary), so pass a TOTAL order (include a unique tiebreaker) when
  * downstream hashes the assignment — same rule as SQL's ROW_NUMBER.
  *
  * The RDD detour is deliberate (the "genuine per-partition imperative
  * logic" case): `zipWithIndex` is exactly the partition-offset
  * algorithm, already fused with Spark's scheduler; a pure-DF
  * emulation would pay an extra shuffle to window over partition ids.
  */
object DenseId {

  /** Append `idName` = start, start+1, … in `orderCols` order. */
  def assign(df: DataFrame, orderCols: Seq[Column], idName: String,
      start: Long = 0L, numPartitions: Option[Int] = None): DataFrame = {
    require(orderCols.nonEmpty, "dense ids need an explicit order")
    val parts = numPartitions.getOrElse(
      df.sparkSession.sessionState.conf.numShufflePartitions)
    val sorted = df.repartitionByRange(parts, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    val schema = StructType(sorted.schema.fields)
      .add(idName, LongType, nullable = false)
    val withId = sorted.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (start + i))
    }
    df.sparkSession.createDataFrame(withId, schema)
  }
}
