package graft

import graft.ops.AsOf
import org.apache.spark.sql.functions._

/** As-of join semantics: <= time bound, per-key isolation, no-prior-row
  * nulls, exact-tie visibility, and deterministic right-side tie-break.
  */
class AsOfSpec extends SparkSpec {

  test("picks the latest right row at-or-before each left time, per key") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, "p1"), (1L, 250L, "p2"), (1L, 50L, "p0"),
      (2L, 100L, "p3")) // key 2 has no clicks at all
      .toDF("k", "t", "pid")
    val right = Seq(
      (1L, 60L, "c1"), (1L, 100L, "c2"), (1L, 240L, "c3"), (3L, 10L, "cX"))
      .toDF("k", "t", "cid")
      .withColumn("c_t", $"t")
    val out = AsOf.join(left, right, Seq("k"), "t", "t",
        Seq("cid", "c_t"), rightTie = "cid")
      .collect().map(r => r.getString(2) ->
        (Option(r.getString(3)).orNull, if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
    assert(out("p0") == (null, -1L), "no right row at or before t=50")
    assert(out("p1") == ("c2", 100L), "exact tie: right row AT the left time wins (<=)")
    assert(out("p2") == ("c3", 240L))
    assert(out("p3") == (null, -1L), "keys never leak across groups")
  }

  test("joinWithin nulls carries for stale matches, keeps fresh ones and no-match nulls") {
    import spark.implicits._
    val left = Seq((1L, 100L, "fresh"), (1L, 500L, "stale"), (2L, 50L, "none"))
      .toDF("k", "t", "pid")
    val right = Seq((1L, 90L, "c1")).toDF("k", "t", "cid")
    val out = AsOf.joinWithin(left, right, Seq("k"), "t", "t",
        Seq("cid"), rightTie = "cid")((l, r) => l - r <= 50L)
      .collect().map(r => r.getString(2) -> Option(r.getString(3)).orNull).toMap
    assert(out("fresh") == "c1", "gap 10 <= 50 carries")
    assert(out("stale") == null, "gap 410 > 50 must null the carry, not drop the row")
    assert(out("none") == null, "no prior right row stays null")
  }

  test("exact-time duplicates on the right break ties by rightTie, largest wins") {
    import spark.implicits._
    val left = Seq((1L, 100L, "p")).toDF("k", "t", "pid")
    val right = Seq((1L, 90L, "ca"), (1L, 90L, "cb")).toDF("k", "t", "cid")
    val out = AsOf.join(left, right, Seq("k"), "t", "t", Seq("cid"), "cid")
      .select("cid").head().getString(0)
    assert(out == "cb")
  }

  test("a NULL carry value on the matched row stays NULL (no fill from older rows)") {
    import spark.implicits._
    val left = Seq((1L, 100L, "p")).toDF("k", "t", "pid")
    // most recent right row (t=90) has cid = NULL; an older row (t=50) has
    // a non-null cid — per-column forward fill would resurrect "old"
    val right = Seq(
      (1L, 50L, Option("old"), Option("x50")),
      (1L, 90L, None: Option[String], Option("x90")))
      .toDF("k", "t", "cid", "tag")
    val row = AsOf.join(left, right, Seq("k"), "t", "t",
      Seq("cid", "tag"), rightTie = "tag").select("cid", "tag").head()
    assert(row.isNullAt(0), "NULL on the matched row must survive")
    assert(row.getString(1) == "x90", "all carry columns come from the SAME row")
  }

  test("timestamp time columns: NTZ and LTZ inputs produce identical matches (epoch longs too)") {
    // The union+carry window is TYPE-AGNOSTIC in the time column — any
    // orderable type works, including TIMESTAMP_NTZ (the round-7 testdata
    // regression hit the CALLERS' `unix_micros` algebra, not this
    // operator; q_join_asof's fix was normalizing at the Tables boundary).
    // Contract, pinned here: AsOf.join never does time arithmetic, so NTZ
    // and LTZ columns carrying the same instants match identically; only
    // a caller's `joinWithin` bound predicate owns unit/type algebra.
    import spark.implicits._
    import org.apache.spark.sql.types.TimestampNTZType
    val leftUs = Seq((1L, 100000000L, "p1"), (1L, 250000000L, "p2"),
      (1L, 50000000L, "p0"), (2L, 100000000L, "p3"))
    val rightUs = Seq((1L, 60000000L, "c1"), (1L, 100000000L, "c2"),
      (1L, 240000000L, "c3"), (3L, 10000000L, "cX"))
    def run(cast: org.apache.spark.sql.Column => org.apache.spark.sql.Column) = {
      val left = leftUs.toDF("k", "us", "pid")
        .withColumn("t", cast($"us")).drop("us")
      val right = rightUs.toDF("k", "us", "cid")
        .withColumn("t", cast($"us")).drop("us")
      AsOf.join(left, right, Seq("k"), "t", "t", Seq("cid"), rightTie = "cid")
        .collect().map(r => r.getAs[String]("pid") ->
          Option(r.getAs[String]("cid")).orNull).toMap
    }
    val asLong = run(identity)
    val asLtz = run(us => timestamp_micros(us))
    val asNtz = run(us => timestamp_micros(us).cast(TimestampNTZType))
    val expect = Map("p0" -> null, "p1" -> "c2", "p2" -> "c3", "p3" -> null)
    assert(asLong == expect && asLtz == expect && asNtz == expect,
      s"long=$asLong ltz=$asLtz ntz=$asNtz")

    // joinWithin over NTZ: the caller's bound must use timestamp algebra
    // (col arithmetic, not unix_micros — which rejects NTZ); a 50-second
    // staleness bound behaves identically to the epoch-long variant.
    val leftN = leftUs.toDF("k", "us", "pid")
      .withColumn("t", timestamp_micros($"us").cast(TimestampNTZType)).drop("us")
    val rightN = rightUs.toDF("k", "us", "cid")
      .withColumn("t", timestamp_micros($"us").cast(TimestampNTZType)).drop("us")
    val within = AsOf.joinWithin(leftN, rightN, Seq("k"), "t", "t",
        Seq("cid"), rightTie = "cid")((l, r) =>
        l <= r + expr("interval 50 seconds"))
      .collect().map(r => r.getAs[String]("pid") ->
        Option(r.getAs[String]("cid")).orNull).toMap
    assert(within == Map("p0" -> null, "p1" -> "c2", "p2" -> "c3", "p3" -> null),
      s"NTZ staleness bound must keep fresh matches: $within")
  }

  test("carry-column collision with the left schema fails loudly") {
    import spark.implicits._
    val df = Seq((1L, 1L, "x")).toDF("k", "t", "cid")
    intercept[IllegalArgumentException] {
      AsOf.join(df, df, Seq("k"), "t", "t", Seq("cid"), "cid")
    }
  }
}
