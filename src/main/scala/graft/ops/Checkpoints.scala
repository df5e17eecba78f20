package graft.ops

import org.apache.spark.sql.DataFrame

/** Explicit release of DEAD local-checkpoint blocks — the missing half
  * of the iterative-loop checkpoint discipline. Every path-doubling /
  * star-alternation / rank-iteration round eagerly `localCheckpoint`s
  * its new frame to truncate lineage, but the superseded round's blocks
  * stay pinned in the block manager until the driver GC happens to
  * collect the Dataset and the ContextCleaner notices. In a long-lived
  * session running many queries (the bench driver: 180 queries, one
  * JVM), those dead blocks accumulate into real storage-memory pressure
  * — evictions and GC stalls that slow UNRELATED queries (the round-9
  * `q_dedup_clusters` 2.7× ghost: clean in isolation, slow mid-suite).
  *
  * `free` unpersists the checkpoint RDD behind a frame the caller
  * PROVES is dead (local checkpoints truncate lineage, so an
  * unpersisted one cannot be recomputed — only call this on frames
  * nothing will touch again). Safe no-op on frames that are not
  * checkpoint-backed.
  */
object Checkpoints {

  /** Release the block-manager storage behind an eagerly
    * local-checkpointed frame. The caller must guarantee the frame is
    * dead (every consumer already eagerly materialized) — after this,
    * reading `df` fails rather than silently recomputing. On a
    * RELIABLY-checkpointed frame ([[stage]] under a configured
    * checkpoint dir) this only drops the memory replica — the
    * checkpoint FILES keep the frame readable, so the call is safe
    * either way.
    */
  private[graft] def free(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** The lineage-truncation point every iterative loop (PageRank,
    * connected components, hierarchy closure, MV extremum rescan,
    * incremental-linkage folds) stages its per-round frame through —
    * VERDICT r12 item 5:
    *
    *  - with NO checkpoint dir configured (local[32], the bench/test
    *    posture): eager `localCheckpoint` — blocks live in executor
    *    storage, zero distributed-FS round trips, dies with an executor
    *    (which in local mode is the driver: nothing to survive);
    *  - with `spark.sparkContext.setCheckpointDir(...)` set (the
    *    CLUSTER posture): eager RELIABLE `checkpoint()` — each round's
    *    frame lands on the checkpoint filesystem, so an executor loss
    *    mid-loop recomputes NOTHING (localCheckpoint would abort the
    *    job: truncated lineage cannot recompute lost blocks).
    *
    * Same integer/row semantics either way — `ReliableCheckpointSpec`
    * pins result equality across both modes. Checkpoint files are
    * released by Spark's ContextCleaner when
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true`, or swept
    * with the checkpoint dir.
    */
  def stage(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint(true)
}
