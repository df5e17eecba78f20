package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental materialized-aggregate maintenance: aggregates with
  * MERGEABLE state — count/sum/min/max, the algebraic class — absorb a
  * delta batch by merging per-group states instead of recomputing over
  * the base. At 100 TB this is the difference between touching the new
  * partition and re-scanning the table: maintenance cost is O(|delta| +
  * |groups|) regardless of base size. (avg rides on (sum, count);
  * median/distinct do NOT merge exactly — that is what the sketch
  * entries' HLL/GK/CMS states are for, which ARE mergeable.)
  *
  * `state` and `merge` form a commutative monoid (merge is associative,
  * an empty state is the identity) — `IncrementalSpec` pins
  * merge(state(A), state(B)) == state(A ∪ B) and batch-order
  * independence.
  */
object Incremental {

  /** Per-group mergeable state of `valueCol` (decimal-exact sum). */
  def state(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("s_cnt"),
        sum(col(valueCol).cast("decimal(30,2)")).as("s_sum"),
        min(col(valueCol)).as("s_min"),
        max(col(valueCol)).as("s_max"))

  /** Merge any number of states (same key layout). */
  def merge(states: Seq[DataFrame], keys: Seq[String]): DataFrame =
    states.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("s_cnt")).as("s_cnt"),
        sum(col("s_sum")).as("s_sum"),
        min(col("s_min")).as("s_min"),
        max(col("s_max")).as("s_max"))
}
