package graft

import graft.ops.Sessions
import org.apache.spark.sql.functions._

/** Gaps-and-islands sessionization: boundary-exact gap law (a gap of
  * EXACTLY gapSec stays in-session; one microsecond more splits),
  * per-entity isolation, and tie-break determinism.
  */
class SessionsSpec extends SparkSpec {

  private def sess(rows: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    val df = rows.toDF("user", "us", "id")
      .withColumn("ts", timestamp_micros($"us"))
    Sessions.sessionize(df, $"user", $"ts", $"id", gapSec = 10L)
      .select($"user", $"id", $"session_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
  }

  test("gap of exactly gapSec stays in-session; one microsecond more splits") {
    val m = sess(Seq(
      (1L, 0L, 1L),
      (1L, 10000000L, 2L),     // +10s exactly  -> same session
      (1L, 20000001L, 3L)))    // +10.000001s   -> new session
    assert(m((1L, 1L)) == 1L)
    assert(m((1L, 2L)) == 1L, "gap == gapSec must NOT split (> law, not >=)")
    assert(m((1L, 3L)) == 2L, "gap one microsecond over gapSec must split")
  }

  test("sessions never leak across entities; first event always opens session 1") {
    val m = sess(Seq(
      (1L, 0L, 1L), (1L, 100000000L, 2L),
      (2L, 99999999L, 3L)))  // user 2's lone event lands mid-user-1 timeline
    assert(m((1L, 1L)) == 1L && m((1L, 2L)) == 2L)
    assert(m((2L, 3L)) == 1L, "each entity starts from session 1")
  }

  test("equal timestamps order by the tie-break column deterministically") {
    // Two events at the same microsecond: lag() must see them in id
    // order, so the session index sequence is reproducible.
    val m = sess(Seq(
      (1L, 0L, 2L), (1L, 0L, 1L), (1L, 20000001L, 3L)))
    assert(m((1L, 1L)) == 1L && m((1L, 2L)) == 1L)
    assert(m((1L, 3L)) == 2L)
  }
}
