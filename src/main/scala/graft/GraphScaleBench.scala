package graft

import graft.ops.PageRank
import org.apache.spark.sql.functions._

/** Scaling evidence for the PageRank loop (COVERAGE.md "Graph
  * analytics"): per iteration the edge relation is scanned from its
  * src-partitioned checkpoint, the node-sized rank relation joins in,
  * and one dst-keyed aggregate shuffles the contributions — so wall time
  * per iteration should grow LINEARLY in |E| at fixed degree. A plan
  * that re-derived the edges per round, re-shuffled them, or let the
  * rank lineage re-expand would bend the curve super-linearly.
  *
  * Synthetic graph, fully distributed generation (no testdata
  * dependence, any size): |V| = edges/10 nodes, each edge id e connects
  * (e mod V) → (xxhash64(e) mod V) — pseudo-random degree-10 graph with
  * self-loops dropped and duplicates removed (the operator's distinct-
  * pairs contract).
  *
  * Usage (ONE size per invocation — fresh JVM per curve point, so JIT/GC
  * state from a smaller point never flatters a bigger one):
  *   sbt "runMain graft.GraphScaleBench [edges=2000000] [runs=3] [partitions=32]"
  * Prints one JSON line {"metric":"pagerank_scale",...}.
  *
  * `partitions` follows the DedupScaleBench lesson: in local[] range
  * generation the partition count must track the data (a real cluster's
  * input splits do this automatically) or per-task state spills at the
  * top of the curve.
  */
object GraphScaleBench {

  def main(args: Array[String]): Unit = {
    val nEdges = args.headOption.map(_.toLong).getOrElse(2000000L)
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val parts = args.lift(2).map(_.toInt).getOrElse(32)
    val iters = 5
    val spark = Engine.session()
    import spark.implicits._

    val nNodes = (nEdges / 10L) max 10L
    val edges = spark.range(0, nEdges, 1, parts)
      .select(pmod($"id", lit(nNodes)).as("src"),
        pmod(xxhash64($"id"), lit(nNodes)).as("dst"))
      .filter($"src" =!= $"dst")
      .distinct()

    def job(): Long = PageRank.ranks(edges, iters)
      .agg(sum($"rank_fp")).collect()(0).getLong(0)

    val mass = job() // warmup; also the truncation-leak sanity anchor
    val times = (1 to runs).map { _ =>
      val t0 = System.nanoTime(); job(); (System.nanoTime() - t0) / 1e9
    }.sorted
    val med = times(times.length / 2)
    println(s"""{"metric":"pagerank_scale","edges":$nEdges,"iters":$iters,"runs":$runs,"partitions":$parts,"rank_mass_fp":$mass,"median_sec":$med,"edge_iters_per_sec":${(nEdges * iters / med).toLong}}""")
    spark.stop()
  }
}
