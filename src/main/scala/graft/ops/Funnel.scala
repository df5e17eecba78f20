package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Parameterized ordered funnel with a per-step conversion window — the
  * operator behind `q_funnel`, lifted from the hard-coded 3-step query to
  * an arbitrary step list (label, predicate).
  *
  * Semantics ("first qualifying event"): the step-1 frontier is each
  * user's MIN event time among step-1 events; the step-k frontier is the
  * MIN time of step-k events in `(t_{k-1}, t_{k-1} + window]`. A user
  * converts through step k only if the steps happen in order AND within
  * the window of the previous frontier — the window is what keeps a dense
  * event stream from converting vacuously.
  *
  * Scale: each step is one filtered scan + an id-keyed equi-join against
  * the previous frontier + a per-user min — frontier relations are
  * |users|-sized (not event-sized), the join key is always the user id,
  * and map-side partial aggregation collapses each user's events before
  * the shuffle. Cost is linear in steps × matching events; nothing is
  * ever all-pairs.
  */
object Funnel {

  /** Per-step frontier relations `(label, (user, __t))`, in step order. */
  def frontiers(events: DataFrame, userCol: String, tsCol: String,
      steps: Seq[(String, Column)], window: Column): Seq[(String, DataFrame)] = {
    require(steps.nonEmpty, "a funnel needs at least one step")
    val first = events.filter(steps.head._2)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("__t"))
    steps.tail.scanLeft(steps.head._1 -> first) {
      case ((_, prev), (label, pred)) =>
        label -> events.filter(pred)
          .join(prev.select(col(userCol), col("__t").as("__tp")), Seq(userCol))
          .filter(col(tsCol) > col("__tp") && col(tsCol) <= col("__tp") + window)
          .groupBy(col(userCol)).agg(min(col(tsCol)).as("__t"))
    }
  }

  /** Per-step converted-user counts: (step_ord, step, n_users). */
  def counts(events: DataFrame, userCol: String, tsCol: String,
      steps: Seq[(String, Column)], window: Column): DataFrame =
    frontiers(events, userCol, tsCol, steps, window).zipWithIndex.map {
      case ((label, df), i) =>
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(i + 1).as("step_ord"), lit(label).as("step"), col("n_users"))
    }.reduce(_ unionByName _).orderBy(col("step_ord"))
}
