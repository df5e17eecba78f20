package graft

import graft.ops.Cdc
import org.apache.spark.sql.DataFrame

/** Change-feed apply semantics (ops/Cdc): version resolution, delete /
  * insert ordering, and the batch-split law that makes backlog replay
  * equal nightly increments.
  */
class CdcSpec extends SparkSpec {

  private def base = {
    import spark.implicits._
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "st", "pr")
  }

  private def feed(rows: (Long, String, java.lang.Double, Long, String)*) = {
    import spark.implicits._
    rows.toDF("k", "st", "pr", "v", "op")
  }

  private def rowsOf(df: DataFrame): Map[Long, (String, Double)] =
    df.collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap

  test("latest version wins; delete removes; insert adds; untouched rows survive") {
    val f = feed(
      (1L, "a1", 11.0, 1L, "U"), (1L, "a2", 12.0, 2L, "U"),
      (2L, null, null, 1L, "D"),
      (9L, "new", 90.0, 1L, "I"))
    val out = rowsOf(Cdc.apply(base, f, Seq("k"), "v", "op"))
    assert(out == Map(
      1L -> (("a2", 12.0)), // v2 beats v1
      3L -> (("c", 30.0)),  // untouched
      9L -> (("new", 90.0))))
  }

  test("delete-then-insert resurrects; insert-then-delete removes") {
    val f = feed(
      (1L, null, null, 1L, "D"), (1L, "back", 99.0, 2L, "I"),
      (3L, "gone?", 31.0, 1L, "U"), (3L, null, null, 2L, "D"))
    val out = rowsOf(Cdc.apply(base, f, Seq("k"), "v", "op"))
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L) == (("back", 99.0)))
  }

  test("batch-split law: apply(apply(base,f1),f2) == apply(base, f1 ∪ f2)") {
    val f1 = feed(
      (1L, "x1", 1.0, 1L, "U"),
      (2L, null, null, 2L, "D"),
      (7L, "n7", 70.0, 3L, "I"))
    val f2 = feed(
      (1L, null, null, 10L, "D"), // later batch deletes what f1 updated
      (2L, "b2", 22.0, 11L, "I"), // and resurrects what f1 deleted
      (3L, "c2", 33.0, 12L, "U"))
    val stepwise = rowsOf(Cdc.apply(Cdc.apply(base, f1, Seq("k"), "v", "op"),
      f2, Seq("k"), "v", "op"))
    val oneShot = rowsOf(Cdc.apply(base, f1.unionByName(f2), Seq("k"), "v", "op"))
    assert(stepwise == oneShot, s"stepwise=$stepwise oneShot=$oneShot")
    assert(oneShot.keySet == Set(2L, 3L, 7L))
  }

  test("malformed same-version ties resolve deterministically (op desc, U over D)") {
    val f = feed((1L, "u", 1.0, 5L, "U"), (1L, null, null, 5L, "D"))
    val out = rowsOf(Cdc.apply(base, f, Seq("k"), "v", "op"))
    assert(out(1L) == (("u", 1.0)))
  }
}
