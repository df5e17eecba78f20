package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-point integer PageRank over a directed edge relation.
  *
  * Graph analytics is how production training-data pipelines weight web
  * documents (a page's rank in the link graph is a standard quality
  * prior — the original use of the algorithm); the reference has no
  * graph operator at all (its analytics end at Postgres stored procs,
  * `/root/reference/SharedCode/PGHelperFunction.py:74-75`), so this is
  * north-star capability like the dedup/ANN family.
  *
  * EXACTNESS DESIGN (the repo's fixed-point discipline, see
  * `llm/Retrieval` / `llm/Lm`): ranks are BIGINT micro-units on a 1e12
  * scale and every step is integer arithmetic —
  *
  *   r0(v)      = Scale div N
  *   contrib(e) = r(src) div outdeg(src)
  *   r'(v)      = (3·Scale) div (20·N)  +  (17 · Σ contrib) div 20
  *
  * (damping 0.85 = 17/20). Integer sums are order-independent, so the
  * result is bit-identical no matter how partitions combine, and a
  * DuckDB oracle that unrolls the same iterations reproduces every rank
  * to the last unit. Truncating division leaks < 1 unit (= 1e-12 rank
  * mass) per division — deterministic, engine-identical, and bounded by
  * N·iters units total (asserted in PageRankSpec's mass law). Dangling
  * nodes (no out-edges) keep receiving rank but redistribute none —
  * the standard simplified variant; the leak is deliberate and matches
  * the oracle.
  *
  * 100 TB SHAPE: the edge relation is shuffled ONCE — `edgesDeg` is
  * repartitioned by src and eagerly localCheckpoint'ed before the loop,
  * so every iteration reuses that partitioning and only the |V|-sized
  * rank relation moves (join on src, then one aggregate shuffle on dst).
  * Per-iteration cost is 2 small shuffles + the static edge scan; rank
  * lineage is truncated every `checkpointInterval` rounds (see `ranks`
  * scaladoc for why fixed-iteration loops need less checkpointing than
  * convergence-probed ones). On a cluster, swap reliable `checkpoint`
  * for executor-loss tolerance. The only driver-side action is one
  * `count()` of the node set (a scalar aggregate job — N itself is
  * needed to seed the uniform prior).
  */
object PageRank {

  /** 1e12 — rank units per 1.0 of probability mass. */
  val Scale = 1000000000000L

  /** Iterate `iters` rounds of fixed-point PageRank over `edges`
    * (columns `src`, `dst`; must be distinct pairs). Returns (id: long,
    * rank_fp: long) — one row per node that appears in the edge set.
    *
    * Lineage: unlike `Dedup.connectedComponents` (unbounded rounds, a
    * convergence probe that re-executes the frontier), the iteration
    * count here is FIXED and probe-free, so per-round eager
    * checkpointing would only buy job-launch latency — the whole loop
    * plans as ONE action whose depth is `iters` joins+aggs. Lineage is
    * truncated every `checkpointInterval` rounds (default 10) so long
    * runs can't grow an unbounded plan; short runs stay a single job.
    */
  def ranks(edges: DataFrame, iters: Int, checkpointInterval: Int = 10): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    // Materialize the edge input ONCE: callers typically derive edges
    // from an expensive join (the co-purchase self-join), and both the
    // node set and the degree-carrying edge relation consume it.
    val e = edges.localCheckpoint(true)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct().localCheckpoint(true)
    val n = nodes.count()
    require(n > 0, "empty graph")
    val r0 = Scale / n
    val base = (3L * Scale) / (20L * n)

    // Static per-edge relation carrying the src out-degree, partitioned
    // by src ONCE — iterations join the moving rank relation into this
    // layout instead of re-shuffling the edges every round.
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val edgesDeg = e.join(outDeg, "src")
      .repartition(col("src"))
      .localCheckpoint(true)

    var ranks = nodes.select(col("id"), lit(r0).as("rank_fp"))
    (1 to iters).foreach { i =>
      val contrib = edgesDeg
        .join(ranks, edgesDeg("src") === ranks("id"))
        .select(col("dst"), expr("rank_fp div deg").as("c"))
      val sums = contrib.groupBy(col("dst")).agg(sum(col("c")).as("s"))
      ranks = nodes.join(sums, nodes("id") === sums("dst"), "left")
        .select(col("id"),
          (lit(base) + expr("(17 * coalesce(s, 0L)) div 20")).as("rank_fp"))
      if (i % checkpointInterval == 0 && i < iters)
        ranks = ranks.localCheckpoint(true)
    }
    ranks
  }
}
