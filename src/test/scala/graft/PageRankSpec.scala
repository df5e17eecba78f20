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
}
