package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization (gaps-and-islands): assign a session index to
  * every event, where a session is a maximal run of events per entity
  * whose inter-event gap never exceeds `gapSec`.
  *
  * The reference's event handling is row-at-a-time through stored
  * procedures; the batch analytics idiom it would need at warehouse scale
  * is the classic two-window form:
  *
  *   is_new  = gap to previous event > threshold (or first event)
  *   session = running sum of is_new over the same ordering
  *
  * Determinism contract (oracle-stability): the gap test runs on
  * `unix_micros(ts)` — exact integer microseconds in both Spark and
  * DuckDB (`epoch_us`) — never on float seconds, and the ordering carries
  * a unique tie-breaker column so `lag` is reproducible under equal
  * timestamps.
  *
  * Scale design (100 TB): both windows share ONE shuffle on the entity
  * key and one per-partition sort — the second window reuses the first's
  * partitioning (same keys, same order), so sessionization costs exactly
  * one exchange of the fact table, the same class as a groupBy on
  * `entity`. No self-join, no collect; entity cardinality never
  * materializes on the driver.
  */
object Sessions {

  /** Adds `session_idx` (1-based, per entity) to `events`.
    *
    * @param entity    session scope column (e.g. user id)
    * @param ts        event-time timestamp column
    * @param tieBreak  unique column making the ordering total
    * @param gapSec    max allowed gap INSIDE a session, in seconds
    */
  def sessionize(events: DataFrame, entity: Column, ts: Column,
      tieBreak: Column, gapSec: Long): DataFrame = {
    val order = Seq(ts.asc, tieBreak.asc)
    val w = Window.partitionBy(entity).orderBy(order: _*)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val us = unix_micros(ts)
    val prevUs = lag(unix_micros(ts), 1).over(w)
    val isNew = when(prevUs.isNull || us - prevUs > gapSec * 1000000L, 1L)
      .otherwise(0L)
    events.withColumn("session_idx", sum(isNew).over(run))
  }
}
