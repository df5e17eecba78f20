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

  test("randomized feeds match a sequential replay reference (200 trials worth of keys)") {
    // Reference model: fold the feed strictly in version order per key —
    // the semantics a single-threaded consumer of the log would produce.
    // One big randomized feed over 200 keys exercises every op
    // interleaving; the seed is fixed so a failure reproduces.
    val rnd = new scala.util.Random(42)
    val baseRows = (0 until 200).map(k => (k.toLong, s"b$k", k * 1.0))
    val feedRows = scala.collection.mutable.ListBuffer.empty[(Long, String, java.lang.Double, Long, String)]
    var version = 0L
    (0 until 600).foreach { i =>
      val k = rnd.nextInt(250).toLong // some keys beyond the base (inserts)
      version += 1 + rnd.nextInt(3)
      rnd.nextInt(3) match {
        case 0 => feedRows += ((k, s"u$i", i * 0.5, version, "U"))
        case 1 => feedRows += ((k, null, null, version, "D"))
        case 2 => feedRows += ((k, s"i$i", i * 0.25, version, "I"))
      }
    }
    // reference: per key, the max-version change decides survival/payload
    val ref = scala.collection.mutable.Map[Long, (String, Double)]()
    baseRows.foreach { case (k, st, pr) => ref(k) = (st, pr) }
    feedRows.groupBy(_._1).foreach { case (k, changes) =>
      val last = changes.maxBy(c => (c._4, c._5))
      if (last._5 == "D") ref.remove(k)
      else ref(k) = (last._2, last._3: Double)
    }
    import spark.implicits._
    val got = rowsOf(Cdc.apply(baseRows.toDF("k", "st", "pr"),
      feedRows.toSeq.toDF("k", "st", "pr", "v", "op"), Seq("k"), "v", "op"))
    assert(got == ref.toMap, {
      val diff = (got.keySet ++ ref.keySet).filter(k => got.get(k) != ref.get(k))
      s"mismatch on keys $diff: got=${diff.map(got.get)}, ref=${diff.map(ref.get)}"
    })
    // and the batch-split law on a random midpoint
    val (f1, f2) = feedRows.toSeq.sortBy(_._4).splitAt(300)
    val stepwise = rowsOf(Cdc.apply(
      Cdc.apply(baseRows.toDF("k", "st", "pr"), f1.toDF("k", "st", "pr", "v", "op"),
        Seq("k"), "v", "op"),
      f2.toDF("k", "st", "pr", "v", "op"), Seq("k"), "v", "op"))
    assert(stepwise == got, "stepwise replay must equal one-shot replay")
  }
}
