package graft

import graft.ops.{MaterializedView, Versioned}
import org.apache.spark.sql.functions._

/** Laws for the CDF-maintained materialized view: incremental == full
  * recompute across every commit kind, split == whole, idempotent
  * replay, and zero-count group eviction.
  */
class MaterializedViewSpec extends SparkSpec {

  import spark.implicits._

  private def mvRows(mvPath: String): Set[(String, Long, String)] =
    MaterializedView.readView(spark, mvPath, Seq("g")).collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).stripTrailingZeros.toPlainString)).toSet

  private def fullRows(t: String): Set[(String, Long, String)] =
    Versioned.read(spark, t).groupBy($"g")
      .agg(count(lit(1)).as("cnt"),
        sum($"v".cast("decimal(30,6)")).as("sv"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).stripTrailingZeros.toPlainString)).toSet

  test("incremental refresh equals full recompute across append/delete/update/merge") {
    val base = tmpDir("mv")
    val t = s"$base/t"; val mv = s"$base/mv"
    Versioned.commit(spark, t,
      (1 to 100).map(i => (i.toLong, s"g${i % 5}", i.toLong * 3)).toDF("id", "g", "v"))
    assert(MaterializedView.refresh(spark, t, mv, Seq("g"), "v") == 1L)
    assert(mvRows(mv) == fullRows(t).map { case (g, c, s) => (g, c, s) })
    // churn: a dv delete, a merge-on-read update, an append
    Versioned.deleteWhere(spark, t, $"id" % 7 === 0L)
    Versioned.updateWhere(spark, t, $"id" < 20L, Map("v" -> ($"v" + 1000L)))
    Versioned.commit(spark, t,
      (101 to 120).map(i => (i.toLong, s"g${i % 3}", i.toLong)).toDF("id", "g", "v"))
    assert(MaterializedView.refresh(spark, t, mv, Seq("g"), "v") == 4L)
    assert(mvRows(mv) == fullRows(t),
      "the folded view must equal a from-scratch aggregate of the latest snapshot")
  }

  test("split == whole, replay is a no-op, dead groups leave the view") {
    val base = tmpDir("mv-split")
    val t = s"$base/t"; val mvA = s"$base/mvA"; val mvB = s"$base/mvB"
    Versioned.commit(spark, t,
      (1 to 30).map(i => (i.toLong, s"g${i % 3}", i.toLong)).toDF("id", "g", "v"))
    // mvA refreshes after every commit; mvB once at the end
    MaterializedView.refresh(spark, t, mvA, Seq("g"), "v")
    Versioned.deleteWhere(spark, t, $"g" === "g1") // kills a whole group
    MaterializedView.refresh(spark, t, mvA, Seq("g"), "v")
    Versioned.commit(spark, t,
      Seq((31L, "g9", 5L)).toDF("id", "g", "v"))
    MaterializedView.refresh(spark, t, mvA, Seq("g"), "v")
    MaterializedView.refresh(spark, t, mvB, Seq("g"), "v")
    assert(mvRows(mvA) == mvRows(mvB), "per-commit folds == one catch-up fold")
    assert(!mvRows(mvA).exists(_._1 == "g1"),
      "a group whose rows were all deleted must leave the view")
    // replay: nothing new → same state version, bit-identical state
    val before = mvRows(mvA)
    assert(MaterializedView.refresh(spark, t, mvA, Seq("g"), "v") == 3L)
    assert(mvRows(mvA) == before)
  }

  test("far-behind consumers re-seed: catch-up past maxCatchup equals the fold") {
    val base = tmpDir("mv-reseed")
    val t = s"$base/t"; val mvA = s"$base/mvA"; val mvB = s"$base/mvB"
    Versioned.commit(spark, t,
      (1 to 40).map(i => (i.toLong, s"g${i % 3}", i.toLong)).toDF("id", "g", "v"))
    MaterializedView.refresh(spark, t, mvA, Seq("g"), "v")
    MaterializedView.refresh(spark, t, mvB, Seq("g"), "v")
    (1 to 6).foreach { j =>
      Versioned.commit(spark, t,
        Seq((100L + j, s"g${j % 3}", j.toLong)).toDF("id", "g", "v"))
    }
    Versioned.deleteWhere(spark, t, $"id" % 5 === 0L)
    // mvA folds the churn; mvB is forced down the re-seed path
    MaterializedView.refresh(spark, t, mvA, Seq("g"), "v")
    MaterializedView.refresh(spark, t, mvB, Seq("g"), "v", maxCatchup = 2)
    assert(mvRows(mvA) == mvRows(mvB),
      "the re-seed shortcut must land the identical state")
    assert(MaterializedView.current(spark, mvB).get._2 ==
      Versioned.latestVersion(spark, t).get)
  }

  test("minmax view: delete of a group's extremum rescans THAT group only; interior churn is free") {
    val base = tmpDir("mv-minmax")
    val t = s"$base/t"; val mv = s"$base/mv"
    def fullMinMax: Set[(String, Long, Long, Long)] =
      Versioned.read(spark, t).groupBy($"g")
        .agg(count(lit(1)), min($"v"), max($"v")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    def viewMinMax: Set[(String, Long, Long, Long)] =
      MaterializedView.readViewMinMax(spark, mv, Seq("g")).collect()
        .map(r => (r.getString(0), r.getLong(1),
          r.getDecimal(4).longValue, r.getDecimal(5).longValue)).toSet
    // g0..g4, values i; each group's max lives at its top ids
    Versioned.commit(spark, t,
      (1 to 100).map(i => (i.toLong, s"g${i % 5}", i.toLong)).toDF("id", "g", "v"))
    val (v1, r1, n1) = MaterializedView.refreshMinMax(spark, t, mv, Seq("g"), "v")
    assert((v1, r1, n1) == (1L, 0L, 5L))
    assert(viewMinMax == fullMinMax)
    // interior delete (strictly inside every group's (mn, mx)) + insert
    // above one group's max: NO rescan needed anywhere
    Versioned.deleteWhere(spark, t, $"id".between(40L, 50L))
    Versioned.commit(spark, t, Seq((500L, "g0", 500L)).toDF("id", "g", "v"))
    val (_, r2, _) = MaterializedView.refreshMinMax(spark, t, mv, Seq("g"), "v")
    assert(r2 == 0L, s"interior deletes and outward inserts must not rescan, got $r2")
    assert(viewMinMax == fullMinMax)
    // delete g1's current maximum (id=96,v=96) and g2's minimum (id=2):
    // exactly those two groups rescan
    Versioned.deleteWhere(spark, t, $"id" === 96L || $"id" === 2L)
    val (_, r3, n3) = MaterializedView.refreshMinMax(spark, t, mv, Seq("g"), "v")
    assert(r3 == 2L && r3 < n3,
      s"exactly the extremum-churned groups rescan: rescanned=$r3 total=$n3")
    assert(viewMinMax == fullMinMax)
    // split == whole: a fresh view catching up in one fold agrees
    val mvB = s"$base/mvB"
    MaterializedView.refreshMinMax(spark, t, mvB, Seq("g"), "v")
    assert(MaterializedView.readViewMinMax(spark, mvB, Seq("g")).collect().length == 5)
    // update that RAISES a group's max: old image deleted at the stored
    // max, new image inserted above it — the insert out-races the
    // delete, no rescan
    Versioned.updateWhere(spark, t, $"id" === 95L, Map("v" -> ($"v" + 1000L)))
    val (_, r4, _) = MaterializedView.refreshMinMax(spark, t, mv, Seq("g"), "v")
    assert(r4 == 0L, s"an upward update of the max must fold free, got $r4")
    assert(viewMinMax == fullMinMax)
  }

  test("landState keeps exactly one superseded generation for in-flight readers") {
    val base = tmpDir("mv-gen")
    val t = s"$base/t"; val mv = s"$base/mv"
    def stateDirs: Seq[String] = {
      val d = new java.io.File(mv)
      Option(d.listFiles()).getOrElse(Array.empty[java.io.File])
        .map(_.getName).filter(_.startsWith("state_v")).toSeq.sorted
    }
    Versioned.commit(spark, t, Seq((1L, "a", 1L)).toDF("id", "g", "v"))
    MaterializedView.refresh(spark, t, mv, Seq("g"), "v")
    Versioned.commit(spark, t, Seq((2L, "b", 2L)).toDF("id", "g", "v"))
    MaterializedView.refresh(spark, t, mv, Seq("g"), "v")
    assert(stateDirs == Seq("state_v000001", "state_v000002"),
      "the previous generation must survive — a reader that resolved it may still be mid-scan")
    Versioned.commit(spark, t, Seq((3L, "c", 3L)).toDF("id", "g", "v"))
    MaterializedView.refresh(spark, t, mv, Seq("g"), "v")
    assert(stateDirs == Seq("state_v000002", "state_v000003"),
      "older-than-previous generations are reclaimed")
  }

  test("null group keys fold as one group, not duplicates") {
    val base = tmpDir("mv-null")
    val t = s"$base/t"; val mv = s"$base/mv"
    Versioned.commit(spark, t,
      Seq((1L, Some("a"), 10L), (2L, None, 5L), (3L, None, 7L))
        .toDF("id", "g", "v"))
    MaterializedView.refresh(spark, t, mv, Seq("g"), "v")
    Versioned.commit(spark, t, Seq((4L, Option.empty[String], 8L)).toDF("id", "g", "v"))
    MaterializedView.refresh(spark, t, mv, Seq("g"), "v")
    val nulls = MaterializedView.readView(spark, mv, Seq("g"))
      .filter($"g".isNull).collect()
    assert(nulls.length == 1 && nulls.head.getLong(1) == 3L &&
      nulls.head.getDecimal(2).longValue == 20L,
      "the NULL group must stay a single group through the null-safe fold")
  }
}
