package graft

import graft.ops.PageRank
import org.apache.spark.sql.functions._

/** Fixed-point PageRank laws: exact equality with a single-threaded
  * reference fold on hand graphs (including a dangling sink), bounded
  * truncation leak on a symmetric graph, hub dominance, determinism.
  */
class PageRankSpec extends SparkSpec {

  import spark.implicits._

  /** Textbook single-threaded reference with the identical integer
    * recurrence — Map fold, no Spark.
    */
  private def reference(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size.toLong
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val base = (3L * PageRank.Scale) / (20L * n)
    var r = nodes.map(_ -> PageRank.Scale / n).toMap
    (1 to iters).foreach { _ =>
      val sums = edges
        .map { case (s, d) => d -> r(s) / deg(s) }
        .groupBy(_._1).map { case (d, cs) => d -> cs.map(_._2).sum }
      r = nodes.map(v => v -> (base + (17L * sums.getOrElse(v, 0L)) / 20L)).toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    PageRank.ranks(edges.toDF("src", "dst"), iters)
      .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap

  test("matches the reference fold exactly on a directed graph with a dangling sink") {
    // 4 is a sink (no out-edges): receives rank, redistributes none.
    val edges = Seq[(Long, Long)]((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (2L, 4L), (3L, 4L))
    (1 to 4).foreach { iters =>
      assert(run(edges, iters) === reference(edges, iters),
        s"divergence from the reference recurrence at iters=$iters")
    }
  }

  test("symmetric-graph mass is conserved up to the truncation bound") {
    // Undirected ring of 10 nodes (both directions): no dangling leak, so
    // the only loss is integer truncation — strictly fewer than N units
    // per division site per iteration.
    val ring = (0L until 10L).flatMap(i =>
      Seq((i, (i + 1) % 10), ((i + 1) % 10, i)))
    val iters = 5
    val total = run(ring, iters).values.sum
    val n = 10L
    // per iteration: N base truncations + N contrib truncations + N
    // damping truncations, each < 1 unit, plus the initial seed truncation
    val maxLeak = n * (3 * iters + 1)
    assert(total <= PageRank.Scale, "mass can never exceed 1.0")
    assert(total > PageRank.Scale - maxLeak,
      s"leaked more than the truncation bound: total=$total")
  }

  test("the hub of a star graph outranks every leaf") {
    val star = (1L to 8L).flatMap(i => Seq((0L, i), (i, 0L)))
    val r = run(star, 5)
    val hub = r(0L)
    (1L to 8L).foreach(i => assert(r(i) < hub, s"leaf $i >= hub"))
    // all leaves are symmetric — identical rank to the last unit
    assert((1L to 8L).map(r).distinct.size === 1)
  }

  test("deterministic across runs") {
    val edges = (0L until 40L).map(i => (i, (i * 7 + 3) % 40))
    assert(run(edges, 3) === run(edges, 3))
  }

  // --- ranksFrom (warm-start continuation) ---

  private def runFrom(edges: Seq[(Long, Long)], prior: Map[Long, Long],
      iters: Int): Map[Long, Long] =
    PageRank.ranksFrom(edges.toDF("src", "dst"),
        prior.toSeq.toDF("id", "rank_fp"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("ranksFrom seeded with the uniform prior equals a cold start; split runs compose") {
    val edges = (0L until 40L).map(i => (i, (i * 7 + 3) % 40))
    val n = (edges.map(_._1) ++ edges.map(_._2)).distinct.size.toLong
    val uniform = (edges.map(_._1) ++ edges.map(_._2)).distinct
      .map(_ -> PageRank.Scale / n).toMap
    assert(runFrom(edges, uniform, 4) === run(edges, 4),
      "uniform warm start must be indistinguishable from a cold start")
    // composition: 2 cold rounds persisted, then 2 warm rounds == 4 cold
    assert(runFrom(edges, run(edges, 2), 2) === run(edges, 4),
      "warm continuation must compose with the persisted prefix")
  }

  test("ranksFrom: delta-introduced nodes seed at the NEW uniform prior; warm start beats cold") {
    // base: 60 nodes, a hub (everyone links node 0) + a scatter edge per
    // node — converged ranks are far from uniform, which is where a warm
    // start earns its keep (on a ring the fixed point IS uniform and a
    // cold start is trivially exact — no incremental operator can win
    // there). delta: 4 new nodes wired into the existing graph.
    val base = (1L until 60L).flatMap(i => Seq((i, 0L), (i, (i * 7 + 3) % 60))) :+ (0L, 1L)
    val delta = (60L until 64L).flatMap(i => Seq((i, i % 60), (i % 60, i)))
    val full = base ++ delta
    val prior = run(base, 15) // "nightly" converged state
    val warm = runFrom(full, prior, 3)
    // new nodes got a rank (seeded, iterated) — present with sane mass
    assert((60L until 64L).forall(warm.contains))
    // warm start is CLOSER to the true fixed point than the same budget
    // cold — the whole point of persisting the vector
    val converged = run(full, 40)
    def l1(a: Map[Long, Long]) = converged.keys.map(k =>
      math.abs(a(k) - converged(k))).sum
    val cold = run(full, 3)
    assert(l1(warm) < l1(cold),
      s"warm L1 ${l1(warm)} must beat cold L1 ${l1(cold)} at equal budget")
  }

  // --- triangleCounts ---

  private def triangles(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    PageRank.triangleCounts(pairs.toDF("u", "v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Brute-force reference: every id triple with all three edges. */
  private def bruteTriangles(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val es = pairs.map { case (a, b) => (a min b, a max b) }.toSet
    val ids = es.toSeq.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val counts = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for {
      i <- ids.indices; j <- (i + 1) until ids.size; k <- (j + 1) until ids.size
      (a, b, c) = (ids(i), ids(j), ids(k))
      if es((a, b)) && es((b, c)) && es((a, c))
    } { counts(a) += 1; counts(b) += 1; counts(c) += 1 }
    ids.map(id => id -> counts(id)).toMap
  }

  test("K4: every node closes 3 triangles; bipartite graph closes none") {
    val k4 = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    assert(triangles(k4) === Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
    val bipartite = for (l <- 0L to 2L; r <- 10L to 12L) yield (l, r)
    assert(triangles(bipartite).values.forall(_ == 0L))
  }

  test("matches the brute-force reference on a random graph (hub included)") {
    // pseudo-random edges plus a hub touching everything: the hub's high
    // degree orients almost all its edges inward, exercising the
    // degree-orientation path
    val rnd = (0L until 120L).map(i => (i % 25L, (i * 13 + 7) % 25L)).filter(e => e._1 != e._2)
    val hub = (1L to 24L).map(i => (0L, i))
    val edges = rnd ++ hub
    assert(triangles(edges) === bruteTriangles(edges))
  }

  test("triangle plan uses equi-joins only — no cartesian, no nested loop") {
    val edges = (0L until 60L).map(i => (i % 20L, (i * 3 + 1) % 20L)).filter(e => e._1 != e._2)
    val plan = PageRank.triangleCounts(edges.toDF("u", "v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }
}
