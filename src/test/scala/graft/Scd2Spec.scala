package graft

import graft.ops.Scd2
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SCD2 merge laws: idempotence, one open version per key, immutable
  * history, and as-of reconstruction across two merge generations.
  */
class Scd2Spec extends SparkSpec {

  private val keys = Seq("k")
  private val attrs = Seq("b", "pr")

  private def rows(df: DataFrame): Set[(Long, String, Double, String, String)] =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
      r.getString(3), Option(r.getString(4)).getOrElse("OPEN"))).toSet

  private def target = {
    import spark.implicits._
    Seq(
      (1L, "a", 10.0, "2024-01-01", null: String),
      (2L, "b", 20.0, "2024-01-01", null: String),
      (3L, "old", 5.0, "2023-01-01", "2024-01-01"), // closed history
      (3L, "new", 7.0, "2024-01-01", null: String))
      .toDF("k", "b", "pr", "eff_from", "eff_to")
  }

  test("merge closes changed, keeps unchanged, opens new; history immutable") {
    import spark.implicits._
    val updates = Seq(
      (1L, "a", 11.0),  // price changed → close + open
      (2L, "b", 20.0),  // identical → untouched
      (9L, "z", 1.0))   // new key → open
      .toDF("k", "b", "pr")
    val out = Scd2.merge(target, updates, keys, attrs, "2024-06-01")
    assert(rows(out) == Set(
      (1L, "a", 10.0, "2024-01-01", "2024-06-01"),
      (1L, "a", 11.0, "2024-06-01", "OPEN"),
      (2L, "b", 20.0, "2024-01-01", "OPEN"),
      (3L, "old", 5.0, "2023-01-01", "2024-01-01"),
      (3L, "new", 7.0, "2024-01-01", "OPEN"),
      (9L, "z", 1.0, "2024-06-01", "OPEN")))
    // exactly one open version per key
    val opens = out.filter($"eff_to".isNull).groupBy($"k").count()
      .collect().map(_.getLong(1))
    assert(opens.forall(_ == 1L))
  }

  test("idempotence: re-merging the same updates changes nothing") {
    import spark.implicits._
    val updates = Seq((1L, "a", 11.0), (9L, "z", 1.0)).toDF("k", "b", "pr")
    val once = Scd2.merge(target, updates, keys, attrs, "2024-06-01")
    val twice = Scd2.merge(once, updates, keys, attrs, "2024-07-01")
    assert(rows(twice) == rows(once),
      "the second merge sees its own values as current and must be a no-op")
  }

  test("closeMissing: full snapshot closes vanished keys; reappearance reopens") {
    import spark.implicits._
    // snapshot 1 drops key 2 entirely and changes key 1
    val snap1 = Seq((1L, "a", 11.0), (3L, "new", 7.0)).toDF("k", "b", "pr")
    val gen1 = Scd2.merge(target, snap1, keys, attrs, "2024-06-01",
      closeMissing = true)
    assert(rows(gen1) == Set(
      (1L, "a", 10.0, "2024-01-01", "2024-06-01"),
      (1L, "a", 11.0, "2024-06-01", "OPEN"),
      (2L, "b", 20.0, "2024-01-01", "2024-06-01"), // closed by absence
      (3L, "old", 5.0, "2023-01-01", "2024-01-01"),
      (3L, "new", 7.0, "2024-01-01", "OPEN")))
    // snapshot 2: key 2 comes back — a NEW version opens, leaving the
    // 2024-06→09 gap in its timeline (it really was gone)
    val snap2 = Seq((1L, "a", 11.0), (2L, "b", 21.0), (3L, "new", 7.0))
      .toDF("k", "b", "pr")
    val gen2 = Scd2.merge(gen1, snap2, keys, attrs, "2024-09-01",
      closeMissing = true)
    assert(rows(gen2) == Set(
      (1L, "a", 10.0, "2024-01-01", "2024-06-01"),
      (1L, "a", 11.0, "2024-06-01", "OPEN"),
      (2L, "b", 20.0, "2024-01-01", "2024-06-01"),
      (2L, "b", 21.0, "2024-09-01", "OPEN"), // reopened after the gap
      (3L, "old", 5.0, "2023-01-01", "2024-01-01"),
      (3L, "new", 7.0, "2024-01-01", "OPEN")))
    // incremental default is unchanged: absence keeps rows open
    val inc = Scd2.merge(target, snap1, keys, attrs, "2024-06-01")
    assert(rows(inc).contains((2L, "b", 20.0, "2024-01-01", "OPEN")))
  }

  test("as-of reconstruction across two generations") {
    import spark.implicits._
    val gen1 = Scd2.merge(target, Seq((1L, "a", 11.0)).toDF("k", "b", "pr"),
      keys, attrs, "2024-06-01")
    val gen2 = Scd2.merge(gen1, Seq((1L, "a", 12.0)).toDF("k", "b", "pr"),
      keys, attrs, "2024-09-01")
    // as-of a date: eff_from <= d < eff_to (open = +inf)
    def asOf(d: String) = gen2
      .filter($"eff_from" <= d && (coalesce($"eff_to", lit("9999")) > d))
      .filter($"k" === 1L).select($"pr").collect().map(_.getDouble(0)).toSeq
    assert(asOf("2024-03-01") == Seq(10.0))
    assert(asOf("2024-07-01") == Seq(11.0))
    assert(asOf("2024-10-01") == Seq(12.0))
  }
}
