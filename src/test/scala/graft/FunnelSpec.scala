package graft

import graft.ops.Funnel
import org.apache.spark.sql.functions._

/** Funnel operator laws on a synthetic stream with known conversions:
  * order violations and window violations stop the funnel exactly where
  * they should, at 4 steps (the query entry only exercises 3).
  */
class FunnelSpec extends SparkSpec {

  import spark.implicits._

  private def at(min: Int) =
    java.sql.Timestamp.valueOf(f"2020-01-01 ${min / 60}%02d:${min % 60}%02d:00")

  // step predicates: event_type a -> b -> c -> d, 60-minute window
  private val steps = Seq(
    "a" -> (col("event_type") === "a"),
    "a>b" -> (col("event_type") === "b"),
    "a>b>c" -> (col("event_type") === "c"),
    "a>b>c>d" -> (col("event_type") === "d"))

  test("4-step funnel: full conversion, order violation, window violation, straggler step") {
    val events = Seq(
      // user 1: converts all 4 steps, each within the hour
      (1L, "a", at(0)), (1L, "b", at(30)), (1L, "c", at(59)), (1L, "d", at(100)),
      // user 2: d BEFORE c (d@20 < c@30) — order violation stops at a>b>c
      (2L, "a", at(0)), (2L, "b", at(10)), (2L, "d", at(20)), (2L, "c", at(30)),
      // user 3: c arrives 61 min after b — window violation stops at a>b
      (3L, "a", at(0)), (3L, "b", at(5)), (3L, "c", at(66)), (3L, "d", at(70)),
      // user 4: never does a — not even step 1 (b/c/d present)
      (4L, "b", at(0)), (4L, "c", at(1)), (4L, "d", at(2)),
      // user 5: a only
      (5L, "a", at(0)))
      .toDF("user_id", "event_type", "ts")
    val got = Funnel.counts(events, "user_id", "ts", steps, expr("INTERVAL 60 MINUTES"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1, "a", 4L), (2, "a>b", 3L), (3, "a>b>c", 2L), (4, "a>b>c>d", 1L)),
      s"got $got")
  }

  test("first-qualifying-event law: a later cheaper path cannot resurrect a dead funnel") {
    // user's FIRST a is at t=0; a second a at t=120 would give the b at
    // t=130 a valid window — but the frontier is the FIRST qualifying
    // event, so the funnel must not convert.
    val events = Seq(
      (1L, "a", at(0)), (1L, "a", at(120)), (1L, "b", at(130)))
      .toDF("user_id", "event_type", "ts")
    val got = Funnel.counts(events, "user_id", "ts",
        steps.take(2), expr("INTERVAL 60 MINUTES"))
      .collect().map(r => (r.getString(1), r.getLong(2))).toMap
    assert(got == Map("a" -> 1L, "a>b" -> 0L), s"got $got")
  }

  test("boundary law: an event exactly at frontier + window converts; one second over does not") {
    def run(offsetSec: Int): Long = {
      val events = Seq((1L, "a", at(0)),
        (1L, "b", new java.sql.Timestamp(at(0).getTime + offsetSec * 1000L)))
        .toDF("user_id", "event_type", "ts")
      Funnel.counts(events, "user_id", "ts", steps.take(2), expr("INTERVAL 60 MINUTES"))
        .filter(col("step_ord") === 2).head().getLong(2)
    }
    assert(run(3600) == 1L, "<= window converts")
    assert(run(3601) == 0L, "over the window does not")
  }
}
