package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hierarchy traversal — the recursive-CTE capability Spark SQL lacks
  * (`WITH RECURSIVE` in DuckDB/Postgres; the reference's stored-proc
  * layer could express it, its engine-side code never does): ancestor
  * closure over a parent-pointer FOREST, i.e. BOM explosion, org-chart
  * rollups, category trees.
  *
  * Algorithm: PATH DOUBLING (pointer jumping), not one-level-per-round
  * expansion. Round k holds every (node, ancestor, dist) pair with
  * dist < 2^k; joining the closure with ITSELF (`node ← anc`) doubles
  * the reachable distance per round, so a depth-d hierarchy closes in
  * ⌈log₂ d⌉ + 1 rounds — at a plausible catalog depth of 10⁴ that is 15
  * rounds of id-keyed equi-joins instead of 10⁴ sequential joins, the
  * same O(log) discipline as `Dedup.connectedComponents`' star
  * alternation. Each pair in a forest has a UNIQUE path, so the union
  * stays duplicate-free under `distinct()` and the closure is exact.
  *
  * 100 TB shape: every round is one self-equi-join on the jump column +
  * distinct — all shuffles are id-keyed; output size is Σ depth(node)
  * (the closure itself), never corpus². The per-round driver action is
  * one `count()` for the fixed-point test, bounded by the O(log d)
  * round count. `localCheckpoint` per round keeps the plan linear
  * (iterative self-joins otherwise stack lineage exponentially).
  */
object Hierarchy {

  /** Full ancestor closure (node, anc, dist ≥ 1) of a forest given as
    * (childCol, parentCol) edges. Roots appear only on the `anc` side.
    * Requires a forest: at most one parent per child (validated with
    * one 1-row aggregate unless `validateForest=false`) — on a general
    * DAG "the" distance is ill-defined and pair counts explode with
    * path multiplicity.
    */
  def ancestorClosure(edges: DataFrame, childCol: String, parentCol: String,
      validateForest: Boolean = true): DataFrame =
    closureWithRounds(edges, childCol, parentCol, validateForest)._1

  /** The closure plus the number of doubling rounds taken — exposed so
    * `HierarchySpec` can pin the O(log depth) round law.
    */
  private[graft] def closureWithRounds(edges: DataFrame, childCol: String,
      parentCol: String, validateForest: Boolean = true): (DataFrame, Int) = {
    val e = edges.select(col(childCol).cast("long").as("node"),
      col(parentCol).cast("long").as("anc"))
    if (validateForest) {
      val bad = e.groupBy(col("node")).agg(count(lit(1)).as("n"))
        .filter(col("n") > 1).limit(1).count()
      require(bad == 0,
        s"hierarchy edges must form a forest: some $childCol has multiple parents")
    }
    var clo = e.withColumn("dist", lit(1L)).transform(graft.ops.Checkpoints.stage)
    // Cycle guard: in a forest no node is its own ancestor, but a CYCLE
    // (x→y, y→x passes the one-parent-per-child check) makes path
    // doubling diverge — dist takes ever more values, so the distinct
    // pair set DOUBLES per round and the loop never converges. Any
    // cycle of length L produces a (node == anc) pair within ⌈log₂ L⌉
    // rounds, while the frame is still cycle-sized — check it per round
    // (piggybacked on the fixed-point count, one aggregate) and fail
    // loudly instead of running a non-terminating, memory-exploding job.
    def countAndCycles(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        count(when(col("node") === col("anc"), lit(1)))).head()
      (r.getLong(0), r.getLong(1))
    }
    val (n0, c0) = countAndCycles(clo)
    require(c0 == 0,
      "hierarchy edges contain a self-loop — a node cannot be its own parent")
    var n = n0
    var rounds = 0
    var grown = true
    while (grown) {
      rounds += 1
      val jumped = clo.toDF("node", "mid", "d1")
        .join(clo.toDF("mid", "anc", "d2"), Seq("mid"))
        .select(col("node"), col("anc"), (col("d1") + col("d2")).as("dist"))
      val next = clo.unionByName(jumped).distinct().transform(graft.ops.Checkpoints.stage)
      val (m, cycles) = countAndCycles(next)
      require(cycles == 0,
        "hierarchy edges contain a cycle, not a forest — some node is its own ancestor")
      grown = m > n
      // `next` is eagerly materialized; the superseded round's blocks
      // are dead — release them instead of pinning storage for the
      // session (Checkpoints.free scaladoc)
      Checkpoints.free(clo)
      clo = next
      n = m
    }
    (clo, rounds)
  }

  /** Subtree rollup: for every node, the aggregate of `valueCol` over
    * its proper DESCENDANTS plus itself — the BOM cost/org headcount
    * query, one closure join + one keyed aggregation.
    */
  def subtreeSum(nodes: DataFrame, idCol: String, valueCol: String,
      closure: DataFrame): DataFrame = {
    // decimal, not double: subtree sums must be addition-order-free so
    // oracle hash-compares can't drift (the float-aggregate discipline
    // every oracle entry follows)
    val vals = nodes.select(col(idCol).cast("long").as("node"),
      col(valueCol).cast("decimal(30,2)").as("v"))
    val contrib = closure.select(col("node"), col("anc"))
      .join(vals, Seq("node"))
      .select(col("anc").as("id"), col("v"))
      .unionByName(vals.select(col("node").as("id"), col("v")))
    contrib.groupBy(col("id"))
      .agg(count(lit(1)).as("n_subtree"), sum(col("v")).as("subtree_sum"))
  }
}
