package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental ancestor closure over a PERSISTED forest — the
  * `IncrementalDedup` discipline applied to [[Hierarchy]]: the stored
  * closure is append-only state, and a batch of new edges costs work
  * proportional to the BATCH, never a recompute of the stored forest.
  *
  * The append shape every growing catalog/BOM/org hierarchy has: a batch
  * GRAFTS new nodes under existing (or other new) parents; stored nodes
  * are never re-parented (validated loudly — a reparent invalidates
  * descendants' stored paths and needs the batch operator's inverse,
  * not silence). Under that contract the closure of the union splits
  * exactly:
  *
  *   closure(A ∪ B) = closure(A)  ∪  cloB  ∪  (cloB ⋈ closure(A))
  *
  * where `cloB` is the path-doubled closure of the batch edges alone
  * (depth of the NEW subtrees only) and the join extends each new
  * node's path through its attachment ancestor into the stored closure
  * — one id-keyed equi-join on the attachment points. No stored pair is
  * ever recomputed or touched.
  *
  * 100 TB shape: state IO is append-only (`sets`-style staged dirs);
  * the per-batch cost is |cloB| + one keyed join against the stored
  * closure partitioned on `node` — at a billion stored pairs and a
  * thousand-node batch, the probe moves the batch, not the billion.
  * Replayed batches are a state no-op (anti-join guard, the
  * `IncrementalSetJoin` replay discipline).
  */
object IncrementalHierarchy {

  private def norm(edges: DataFrame, childCol: String,
      parentCol: String): DataFrame =
    edges.select(col(childCol).cast("long").as("node"),
      col(parentCol).cast("long").as("anc"))

  /** Seed the state: stored edges + their full closure. */
  def init(spark: SparkSession, stateDir: String, edges: DataFrame,
      childCol: String, parentCol: String): Unit = {
    val e = norm(edges, childCol, parentCol).localCheckpoint(true)
    e.write.mode("overwrite").parquet(s"$stateDir/edges")
    Hierarchy.ancestorClosure(e, "node", "anc")
      .write.mode("overwrite").parquet(s"$stateDir/closure")
  }

  /** Graft `newEdges` onto the stored forest; append the new closure
    * pairs to the state and return them. Batch children must be NEW
    * nodes (no reparenting — loud error), and the batch must itself be
    * a forest slice. A replayed batch (children already indexed) is a
    * state no-op returning zero pairs.
    */
  def addBatch(spark: SparkSession, stateDir: String, newEdges: DataFrame,
      childCol: String, parentCol: String): DataFrame = {
    val stored = spark.read.parquet(s"$stateDir/edges")
    val storedClosure = spark.read.parquet(s"$stateDir/closure")
    // replay guard FIRST: a crash-replayed batch must not double-append
    val b0 = norm(newEdges, childCol, parentCol)
    val b = b0.join(stored.select(col("node")), Seq("node"), "left_anti")
      .localCheckpoint(true)
    // reparent check: a PARTIALLY-replayed overlap is a contract
    // violation, not a replay — a child present in the store with a
    // DIFFERENT parent must fail loudly
    val conflicting = b0.join(stored.withColumnRenamed("anc", "stored_anc"),
        Seq("node"))
      .filter(col("anc") =!= col("stored_anc")).limit(1).count()
    require(conflicting == 0,
      "batch re-parents a stored node — incremental grafting only adds new children")
    if (b.isEmpty) return storedClosure.limit(0)
    val dup = b.groupBy(col("node")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).limit(1).count()
    require(dup == 0, "batch edges must form a forest: duplicate child in batch")
    // closure of the batch edges alone: O(log depth(new subtrees)) rounds
    val cloB = Hierarchy.ancestorClosure(b, "node", "anc",
      validateForest = false).localCheckpoint(true)
    // extend through the attachment points: (n →d a) with a stored,
    // (a →d2 anc) stored ⇒ (n →d+d2 anc). One equi-join, batch-sized
    // left side.
    val extended = cloB.toDF("node", "mid", "d1")
      .join(storedClosure.toDF("mid", "anc", "d2"), Seq("mid"))
      .select(col("node"), col("anc"), (col("d1") + col("d2")).as("dist"))
    val newPairs = cloB.unionByName(extended).localCheckpoint(true)
    // CRASH-REPLAY ATOMICITY: the state update is two appends that
    // cannot be made one rename, so the closure append is made
    // IDEMPOTENT (anti-join against the stored closure — in a forest
    // (node, anc) determines dist, so the pair key suffices) and runs
    // BEFORE the edges append. A crash between the two leaves closure
    // pairs whose edges are missing; the replay's anti-join guard on
    // edges lets the batch through again, recomputes the same pairs,
    // and the closure anti-join appends zero duplicates before the
    // edges append finally lands — the state converges, never
    // double-counts.
    val freshPairs = newPairs.join(
      storedClosure.select(col("node"), col("anc")),
      Seq("node", "anc"), "left_anti")
    freshPairs.write.mode("append").parquet(s"$stateDir/closure")
    b.write.mode("append").parquet(s"$stateDir/edges")
    newPairs
  }

  /** The full stored closure (for reads / rollups). */
  def closure(spark: SparkSession, stateDir: String): DataFrame =
    spark.read.parquet(s"$stateDir/closure")
}
