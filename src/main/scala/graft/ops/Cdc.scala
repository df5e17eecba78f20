package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture APPLY: fold an ordered change feed into a
  * snapshot. The read side of CDC already exists (`q_table_diff`
  * derives I/U/D rows from two snapshots); this is the write side a
  * warehouse runs on every sync — the engine analog of replaying the
  * reference's per-load staged upsert (SharedCode/PGHelperFunction.py:
  * 61-79) when the source ships deltas instead of full extracts.
  *
  * Feed contract: one row per change with the business key, the full
  * payload (null for deletes), a per-key MONOTONE version (LSN /
  * binlog offset / kafka offset), and an op in {I, U, D}. Versions are
  * unique per key in any real log; ties nevertheless resolve
  * deterministically (op descending: U > I > D) so a malformed feed
  * cannot make the apply nondeterministic.
  *
  * Scale (100 TB snapshot, GB-scale feed): resolution is ONE
  * row_number window over the CHANGE FEED keyed on the business key —
  * the feed is hours of deltas, orders of magnitude smaller than the
  * snapshot. The snapshot is touched only by the key anti-join, the
  * exact `Upsert.merge` shape — so the bucketed-target variant
  * (`Upsert.runBucketed`) applies unchanged after [[resolve]]: a
  * bucketed snapshot never shuffles, only the resolved feed does.
  * Batch-split law (proved in CdcSpec): as long as versions grow
  * across batches, `apply(apply(base, f1), f2) == apply(base, f1∪f2)`
  * — replaying a backlog in one shot equals the nightly increments.
  */
object Cdc {

  /** Latest change per key: max version, ties by op descending. */
  def resolve(changes: DataFrame, keys: Seq[String],
      versionCol: String, opCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(versionCol).desc, col(opCol).desc)
    changes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Apply the feed: unchanged base rows (key anti-join) ∪ latest
    * non-delete payloads projected to the base schema.
    */
  def apply(base: DataFrame, changes: DataFrame, keys: Seq[String],
      versionCol: String, opCol: String): DataFrame = {
    val latest = resolve(changes, keys, versionCol, opCol)
    val survivors = latest.filter(upper(col(opCol)) =!= "D")
      .select(base.columns.map(col).toSeq: _*)
    base.join(latest.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(survivors)
  }
}
