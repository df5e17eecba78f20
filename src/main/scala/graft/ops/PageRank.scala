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
  * convergence-probed ones). Every truncation goes through
  * [[Checkpoints.stage]]: `setCheckpointDir` on the SparkContext flips
  * the loop to RELIABLE checkpoints (executor-loss-safe on a cluster);
  * unset, it stays eager localCheckpoint. The only driver-side action is one
  * `count()` of the node set (a scalar aggregate job — N itself is
  * needed to seed the uniform prior).
  */
object PageRank {

  /** 1e12 — rank units per 1.0 of probability mass. */
  val Scale = 1000000000000L

  /** Node-count ceiling for the broadcast-iteration regime: 2M rank rows
    * ≈ 64 MB broadcast (16 bytes + row overhead each) — safely under
    * executor broadcast budgets. Above it, iterations fall back to the
    * shuffle discipline (src-partitioned edges + two keyed shuffles).
    */
  val BroadcastNodeLimit: Long = 2000000L

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
  def ranks(edges: DataFrame, iters: Int, checkpointInterval: Int = 10): DataFrame =
    run(edges, None, iters, checkpointInterval)

  /** WARM-START continuation — the incremental sibling of [[ranks]]
    * (same staged-swap family as `llm/IncrementalDedup` /
    * `llm/IncrementalAnn`): iterate over the UPDATED edge set starting
    * from a persisted rank vector instead of the uniform prior. Nodes
    * present in `prior` (columns `id`, `rank_fp`) keep their persisted
    * rank; nodes the delta introduced start at the uniform `Scale div N`
    * of the NEW node count.
    *
    * What "incremental" buys for PageRank: the per-iteration edge scan
    * is irreducible (every round redistributes over the whole
    * transition matrix — no per-edge locality to exploit), so the win
    * is ITERATION COUNT: a crawl increment perturbs an already-converged
    * vector locally, and a warm start re-converges in a few rounds where
    * a cold start repays the full budget. Every step stays the same
    * integer fixed-point arithmetic, so `prior + j rounds` is
    * bit-reproducible and the DuckDB oracle unrolls it exactly
    * (`q_pagerank_incremental`).
    */
  def ranksFrom(edges: DataFrame, prior: DataFrame, iters: Int,
      checkpointInterval: Int = 10): DataFrame =
    run(edges, Some(prior), iters, checkpointInterval)

  private def run(edges: DataFrame, prior: Option[DataFrame], iters: Int,
      checkpointInterval: Int): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    // Materialize the edge input ONCE: callers typically derive edges
    // from an expensive join (the co-purchase self-join), and both the
    // node set and the degree-carrying edge relation consume it.
    val e = edges.transform(graft.ops.Checkpoints.stage)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct().transform(graft.ops.Checkpoints.stage)
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
      .transform(graft.ops.Checkpoints.stage)
    // BROADCAST REGIME: the rank vector is |V| rows of (long, long). When
    // it fits a broadcast (the co-purchase graphs here: |V| = |parts|,
    // tens of thousands), every iteration's two rank joins go map-side —
    // the EDGE relation never shuffles and never sort-merges, only the
    // |V|-sized partial aggregates move. Past the limit (a web-scale
    // graph) the shuffle discipline above takes over unchanged. Same
    // runtime-stats-driven join planning as [[Versioned.joinWithStats]]:
    // n is already counted for the uniform prior, so the decision is free.
    val useBroadcast = n <= BroadcastNodeLimit

    // Track the rank checkpoints this loop OWNS so each can be freed the
    // moment a newer one supersedes it (Checkpoints.free scaladoc) —
    // nodes/edgesDeg stay live for the whole run and are never tracked.
    var prevCkpt: Option[DataFrame] = None
    var ranks = prior match {
      case None => nodes.select(col("id"), lit(r0).as("rank_fp"))
      case Some(p) =>
        // one outer join seeds the vector; checkpoint so iterations
        // re-read the seeded vector, not the persisted-state scan + join
        val seeded = nodes
          .join(p.select(col("id"), col("rank_fp").as("__prior")), Seq("id"), "left")
          .select(col("id"), coalesce(col("__prior"), lit(r0)).as("rank_fp"))
          .transform(graft.ops.Checkpoints.stage)
        prevCkpt = Some(seeded)
        seeded
    }
    (1 to iters).foreach { i =>
      val rhs = if (useBroadcast) broadcast(ranks) else ranks
      val contrib = edgesDeg
        .join(rhs, edgesDeg("src") === rhs("id"))
        .select(col("dst"), expr("rank_fp div deg").as("c"))
      val sums0 = contrib.groupBy(col("dst")).agg(sum(col("c")).as("s"))
      val sums = if (useBroadcast) broadcast(sums0) else sums0
      ranks = nodes.join(sums, nodes("id") === sums("dst"), "left")
        .select(col("id"),
          (lit(base) + expr("(17 * coalesce(s, 0L)) div 20")).as("rank_fp"))
      if (i % checkpointInterval == 0 && i < iters) {
        ranks = ranks.transform(graft.ops.Checkpoints.stage)
        prevCkpt.foreach(Checkpoints.free)
        prevCkpt = Some(ranks)
      }
    }
    ranks
  }

  /** Exact triangle count per node over an UNDIRECTED edge set given as
    * canonical (u < v) pairs, plus the global count — the clustering /
    * community-density signal (spam farms in a web corpus have
    * abnormally dense triangle neighborhoods; link-quality priors use
    * exactly this).
    *
    * THE SCALE TRICK is degree orientation (the compact-forward /
    * Schank-Wagner algorithm): orient every undirected edge from its
    * LOWER-degree endpoint to its higher-degree endpoint (node id breaks
    * degree ties). Every triangle then has exactly ONE wedge whose two
    * oriented edges leave its (degree-)smallest vertex, so counting
    * closed oriented wedges counts each triangle exactly once — and the
    * wedge fan-out per node is its OUT-degree in the orientation, which
    * is O(sqrt(|E|)) for ANY graph (bounded by arboricity): a celebrity
    * node with 10^8 undirected neighbors has tiny out-degree, because
    * almost all its edges orient INTO it. The naive wedge join on the
    * undirected adjacency would square that hot vertex; the oriented
    * join cannot. Plan: two self-joins on node keys (wedge build on the
    * shared low vertex, closure probe on the (v, w) pair) — equi-joins
    * only, no cartesian anywhere (pinned in PageRankSpec).
    */
  def triangleCounts(pairs: DataFrame): DataFrame = {
    val canon = pairs
      .select(least(col("u"), col("v")).as("a"), greatest(col("u"), col("v")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct().transform(graft.ops.Checkpoints.stage)
    // undirected degree per node
    val deg = canon.select(col("a").as("id")).union(canon.select(col("b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("d"))
    // orient: (src = lower-degree endpoint) → (dst), ties on id
    val oriented = canon
      .join(deg.withColumnRenamed("id", "a").withColumnRenamed("d", "da"), "a")
      .join(deg.withColumnRenamed("id", "b").withColumnRenamed("d", "db"), "b")
      .select(
        when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
          col("a")).otherwise(col("b")).as("src"),
        when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
          col("b")).otherwise(col("a")).as("dst"))
      .transform(graft.ops.Checkpoints.stage)
    // wedges out of the orientation-smallest vertex; canonical (lo, hi)
    // third side so the closure probe matches the oriented edge that
    // completes the triangle regardless of ITS orientation direction
    val w1 = oriented.select(col("src").as("s"), col("dst").as("x"))
    val w2 = oriented.select(col("src").as("s"), col("dst").as("y"))
    val wedges = w1.join(w2, "s").filter(col("x") < col("y"))
    val closures = oriented
      .select(least(col("src"), col("dst")).as("x"), greatest(col("src"), col("dst")).as("y"))
    val triangles = wedges.join(closures, Seq("x", "y"))
      .select(col("s"), col("x"), col("y"))
    // per-node counts: each triangle increments all three corners
    val corners = triangles.select(col("s").as("id"))
      .union(triangles.select(col("x").as("id")))
      .union(triangles.select(col("y").as("id")))
    deg.select(col("id")).join(
        corners.groupBy(col("id")).agg(count(lit(1)).as("n_tri")),
        Seq("id"), "left")
      .select(col("id"), coalesce(col("n_tri"), lit(0L)).as("n_tri"))
  }
}
