package graft

import graft.ops.Hierarchy
import org.apache.spark.sql.functions._

/** Hierarchy-closure laws: exact closure on a hand tree, the O(log depth)
  * doubling round count (the whole point vs one-level-per-round), forest
  * validation, and the subtree rollup.
  */
class HierarchySpec extends SparkSpec {

  import spark.implicits._

  private def edges(rows: (Long, Long)*) = rows.toDF("child", "parent")

  test("closure of a hand forest is exact, with distances") {
    //      1        6
    //     / \       |
    //    2   3      7
    //    |
    //    4
    val e = edges(2L -> 1L, 3L -> 1L, 4L -> 2L, 7L -> 6L)
    val clo = Hierarchy.ancestorClosure(e, "child", "parent")
      .as[(Long, Long, Long)].collect().toSet
    assert(clo == Set((2L, 1L, 1L), (3L, 1L, 1L), (4L, 2L, 1L), (7L, 6L, 1L),
      (4L, 1L, 2L)))
  }

  test("path doubling closes a deep chain in O(log depth) rounds") {
    // a 64-node path: depth 63; one-level-per-round would take 63 rounds
    val e = edges((2L to 64L).map(i => i -> (i - 1)): _*)
    val (clo, rounds) = Hierarchy.closureWithRounds(e, "child", "parent")
    assert(clo.count() == (63L * 64L) / 2, "a path's closure is n(n-1)/2 pairs")
    // ceil(log2 63) = 6 doubling rounds + 1 fixed-point check
    assert(rounds <= 8, s"doubling must close depth 63 in <= 8 rounds, took $rounds")
    // spot: the deepest pair has the full distance
    val deepest = clo.filter($"node" === 64L && $"anc" === 1L)
      .select($"dist").as[Long].head()
    assert(deepest == 63L)
  }

  test("a non-forest (two parents) is rejected loudly") {
    val e = edges(2L -> 1L, 2L -> 3L)
    val ex = intercept[IllegalArgumentException] {
      Hierarchy.ancestorClosure(e, "child", "parent")
    }
    assert(ex.getMessage.contains("forest"), ex.getMessage)
  }

  test("subtree rollup: every node aggregates itself plus all descendants") {
    val e = edges(2L -> 1L, 3L -> 1L, 4L -> 2L)
    val nodes = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0), (4L, 40.0))
      .toDF("id", "v")
    val clo = Hierarchy.ancestorClosure(e, "child", "parent")
    val byId = Hierarchy.subtreeSum(nodes, "id", "v", clo)
      .collect().map(r => r.getLong(0) -> (r.getLong(1),
        r.getDecimal(2).doubleValue())).toMap
    assert(byId(1L) == ((4L, 100.0)), s"root rolls up everything: ${byId(1L)}")
    assert(byId(2L) == ((2L, 60.0)))
    assert(byId(3L) == ((1L, 30.0)))
    assert(byId(4L) == ((1L, 40.0)))
  }

  private def cloSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
    df.select($"node", $"anc", $"dist").as[(Long, Long, Long)].collect().toSet

  test("incremental closure: batch(A then B then C) == full(A ∪ B ∪ C)") {
    val st = tmpDir("inc-hier")
    // stored: heap forest over 2..40 (parent = id/2)
    val a = (2L to 40L).map(i => (i, i / 2L)).toDF("child", "parent")
    graft.ops.IncrementalHierarchy.init(spark, st, a, "child", "parent")
    // batch B grafts 41..80 (attaches under stored nodes AND other new
    // nodes); batch C grafts 81..160 — deep chains cross BOTH boundaries
    val b = (41L to 80L).map(i => (i, i / 2L)).toDF("child", "parent")
    val c = (81L to 160L).map(i => (i, i / 2L)).toDF("child", "parent")
    val nb = graft.ops.IncrementalHierarchy.addBatch(spark, st, b, "child", "parent")
    assert(nb.count() > 0)
    graft.ops.IncrementalHierarchy.addBatch(spark, st, c, "child", "parent")
    val full = Hierarchy.ancestorClosure(
      (2L to 160L).map(i => (i, i / 2L)).toDF("child", "parent"),
      "child", "parent")
    assert(cloSet(graft.ops.IncrementalHierarchy.closure(spark, st)) == cloSet(full),
      "incremental grafting must land the exact full closure")
    // replayed batch: state no-op, zero pairs
    val replay = graft.ops.IncrementalHierarchy.addBatch(spark, st, b, "child", "parent")
    assert(replay.count() == 0)
    assert(cloSet(graft.ops.IncrementalHierarchy.closure(spark, st)) == cloSet(full))
    // reparenting a stored node fails loudly
    val e = intercept[IllegalArgumentException] {
      graft.ops.IncrementalHierarchy.addBatch(spark, st,
        Seq((40L, 7L)).toDF("child", "parent"), "child", "parent")
    }
    assert(e.getMessage.contains("re-parents"), e.getMessage)
  }

  test("a cycle among new batch nodes fails loudly instead of looping forever") {
    // x→y plus y→x: each child appears once (passes the dup-child
    // check), neither is stored (passes the reparent guard) — without
    // the 64-round convergence bound the path-doubling loop would grow
    // dist unboundedly and never terminate.
    val st = tmpDir("inc-hier-cycle")
    graft.ops.IncrementalHierarchy.init(spark, st,
      edges(2L -> 1L), "child", "parent")
    val ex = intercept[IllegalArgumentException] {
      graft.ops.IncrementalHierarchy.addBatch(spark, st,
        edges(10L -> 11L, 11L -> 10L), "child", "parent")
    }
    assert(ex.getMessage.contains("cycle"), ex.getMessage)
  }

  test("crash between closure append and edges append replays to a converged state") {
    // The state update is closure-append THEN edges-append. Stage the
    // crash window: land the batch's closure pairs WITHOUT the edges
    // (exactly what a crash after the first write leaves), then replay
    // the batch. The replay must pass the edges-keyed guard, re-append
    // ZERO duplicate closure pairs (idempotent anti-join), land the
    // edges, and leave the state equal to the full recompute.
    val st = tmpDir("inc-hier-crash")
    val shadow = tmpDir("inc-hier-crash-shadow")
    val a = (2L to 20L).map(i => (i, i / 2L)).toDF("child", "parent")
    val b = (21L to 40L).map(i => (i, i / 2L)).toDF("child", "parent")
    graft.ops.IncrementalHierarchy.init(spark, st, a, "child", "parent")
    graft.ops.IncrementalHierarchy.init(spark, shadow, a, "child", "parent")
    // compute the batch's pairs on the shadow state, then write ONLY
    // them into the real state's closure — the crashed half-commit
    val pairs = graft.ops.IncrementalHierarchy.addBatch(spark, shadow, b,
      "child", "parent")
    pairs.write.mode("append").parquet(s"$st/closure")
    // replay on the real state
    val replayed = graft.ops.IncrementalHierarchy.addBatch(spark, st, b,
      "child", "parent")
    assert(replayed.count() == pairs.count())
    val clo = graft.ops.IncrementalHierarchy.closure(spark, st)
    assert(clo.count() == clo.select($"node", $"anc").distinct().count(),
      "replay after a half-committed batch must not duplicate closure pairs")
    val full = Hierarchy.ancestorClosure(a.unionByName(b), "child", "parent")
    assert(cloSet(clo) == cloSet(full))
  }
}
