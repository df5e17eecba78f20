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

  // --- join MV -----------------------------------------------------------

  private def joinFull(fact: String, dim: String): Set[(String, Long, String)] =
    Versioned.read(spark, fact).alias("f")
      .join(Versioned.read(spark, dim).alias("d"), $"f.k" === $"d.k")
      .groupBy($"d.g")
      .agg(count(lit(1)).as("cnt"), sum($"f.v".cast("decimal(30,6)")).as("sv"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).stripTrailingZeros.toPlainString)).toSet

  private def joinView(mv: String): Set[(String, Long, String)] =
    MaterializedView.readJoinView(spark, mv, "g").collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).stripTrailingZeros.toPlainString)).toSet

  test("join MV equals full recompute under fact churn, dim churn, and both at once") {
    val base = tmpDir("mv-join")
    val fact = s"$base/fact"; val dim = s"$base/dim"; val mv = s"$base/mv"
    Versioned.commit(spark, fact,
      (1 to 120).map(i => (i.toLong, (i % 12).toLong, i.toLong * 2)).toDF("id", "k", "v"))
    Versioned.commit(spark, dim,
      (0 to 11).map(k => (k.toLong, s"seg${k % 3}")).toDF("k", "g"))
    assert(MaterializedView.refreshJoin(spark, fact, dim, mv,
      "k", "g", "v") == ((1L, 1L)))
    assert(joinView(mv) == joinFull(fact, dim), "seed must equal the live join")
    // fact-only churn: dv delete + MoR update + append
    Versioned.deleteWhere(spark, fact, $"id" % 5 === 0L)
    Versioned.updateWhere(spark, fact, $"id" < 15L, Map("v" -> ($"v" + 100L)))
    Versioned.commit(spark, fact,
      (121 to 140).map(i => (i.toLong, (i % 7).toLong, i.toLong)).toDF("id", "k", "v"))
    assert(MaterializedView.refreshJoin(spark, fact, dim, mv,
      "k", "g", "v") == ((4L, 1L)))
    assert(joinView(mv) == joinFull(fact, dim), "fact churn must fold exactly")
    // dim-only churn: re-segment two keys (update), drop one key entirely
    Versioned.updateWhere(spark, dim, $"k" < 2L, Map("g" -> lit("seg9")))
    Versioned.deleteWhere(spark, dim, $"k" === 7L)
    assert(MaterializedView.refreshJoin(spark, fact, dim, mv,
      "k", "g", "v") == ((4L, 3L)))
    assert(joinView(mv) == joinFull(fact, dim),
      "dim churn must move the stored per-key fact mass between groups")
    // both feeds churn before one refresh (the cross-term case)
    Versioned.commit(spark, fact,
      (141 to 150).map(i => (i.toLong, (i % 12).toLong, i.toLong)).toDF("id", "k", "v"))
    Versioned.commit(spark, dim, Seq((12L, "seg_new")).toDF("k", "g"))
    Versioned.deleteWhere(spark, fact, $"id" % 11 === 0L)
    Versioned.updateWhere(spark, dim, $"k" === 3L, Map("g" -> lit("seg9")))
    assert(MaterializedView.refreshJoin(spark, fact, dim, mv,
      "k", "g", "v") == ((6L, 5L)))
    assert(joinView(mv) == joinFull(fact, dim),
      "simultaneous fact+dim churn must fold exactly (DeltaA x DeltaD absorbed)")
    // replay is a no-op
    assert(MaterializedView.refreshJoin(spark, fact, dim, mv,
      "k", "g", "v") == ((6L, 5L)))
    assert(joinView(mv) == joinFull(fact, dim))
  }

  test("join MV: null join keys drop (inner-join semantics), null groups fold") {
    val base = tmpDir("mv-join-null")
    val fact = s"$base/fact"; val dim = s"$base/dim"; val mv = s"$base/mv"
    Versioned.commit(spark, fact,
      Seq((1L, Some(1L), 10L), (2L, None, 99L), (3L, Some(2L), 20L))
        .toDF("id", "k", "v"))
    Versioned.commit(spark, dim,
      Seq((1L, Some("a")), (2L, None)).toDF("k", "g"))
    MaterializedView.refreshJoin(spark, fact, dim, mv, "k", "g", "v")
    // fact row with null k never joins; dim group NULL is a real group
    Versioned.commit(spark, fact,
      Seq((4L, Some(2L), 5L), (5L, Option.empty[Long], 7L)).toDF("id", "k", "v"))
    MaterializedView.refreshJoin(spark, fact, dim, mv, "k", "g", "v")
    val got = joinView(mv)
    assert(got == Set(("a", 1L, "10"), (null, 2L, "25")),
      s"null-key rows must drop, null groups must fold: $got")
  }
}
