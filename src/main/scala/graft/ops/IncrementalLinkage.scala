package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** INCREMENTAL entity resolution — [[Linkage]] against a persisted
  * blocking-key index, the last candidate-generation operator to get a
  * persisted-index sibling (the `llm/IncrementalDedup` pattern:
  * append-only candidate index + staged-swap assignment + star-edge
  * connectivity carry-over). The production use is master-data ingest:
  * each day's new records must resolve against every entity already
  * known WITHOUT re-blocking or re-comparing the stored corpus — at
  * batch cost, with cross-batch merges handled exactly (two previously
  * distinct entities that a new record bridges collapse into one).
  *
  * Persisted state under `stateDir` (plain parquet):
  *  - `recs/`   — (id, name, blk): every record ever added, keyed by its
  *    blocking key. APPEND-ONLY: the key is per-record and
  *    corpus-independent, so old rows never change (the same property
  *    that makes the MinHash band index append-only).
  *  - `assign/` — (record_id, entity_id): current resolution, entity =
  *    min record id of the match cluster. REWRITTEN per batch via the
  *    staged swap (`IncrementalDedup.swapWrite` discipline).
  *
  * Per-batch work (`addBatch`):
  *  1. Key the BATCH only (blocking key = caller's Column over the name,
  *     as in `Linkage.matches`). Cost O(|batch|).
  *  2. Append to `recs/`, then equi-join the batch's keys against the
  *     FULL index on blk — one join yields batch×stored AND batch×batch
  *     candidates; `levenshtein(_, _, maxDist)` verifies (threshold form:
  *     the DP abandons at the bound). Cost is Σ (batch-block × block),
  *     never corpus².
  *  3. `IncrementalDedup.step`: connected components over (new matched
  *     pairs ∪ star edges of the stored assignment). The star edges carry
  *     the prior connectivity exactly, so
  *     CC(star(A) ∪ pairs(A×B ∪ B×B)) ≡ CC(pairs(A ∪ B)) — the law
  *     `batch(A then B) == full(A ∪ B)`, proved in LinkageSpec (including
  *     a cross-batch entity MERGE) and hash-checked against the DuckDB
  *     recursive-CC closure oracle by `q_entity_resolution_incremental`.
  *  4. Staged-swap the new assignment; unmatched records are their own
  *     entity (left join + coalesce, as in `Linkage.resolve`).
  *
  * Batches must be id-disjoint from records already added (append-only
  * corpus semantics); a replayed batch is screened out by an anti-join —
  * state no-op, same discipline as `IncrementalSetJoin.addBatch`.
  *
  * 100 TB shape: the only corpus-wide relation ever shuffled is the
  * (id, comp) assignment (two narrow columns); the probe join is keyed
  * by blocking key with the batch side small, and CC runs over the
  * matched-pair graph (bounded by true duplicates + prior star edges),
  * not the corpus. Hot blocks are the caller's selectivity/salting knob,
  * exactly as in batch [[Linkage]].
  */
object IncrementalLinkage {

  /** Matched new pairs: the batch's (id, name, blk) rows probed against
    * the full index on the blocking key — exposed so `LinkageSpec` can
    * pin the plan (keyed equi-join + threshold levenshtein, never a
    * cartesian) without reproducing the join internals.
    */
  private[graft] def probePairs(keyedBatch: DataFrame, fullIndex: DataFrame,
      maxDist: Int): DataFrame =
    keyedBatch.select(col("id").as("id_l"), col("name").as("name_l"),
        col("blk"))
      .join(fullIndex.select(col("id").as("id_r"), col("name").as("name_r"),
        col("blk")), Seq("blk"))
      .filter(col("id_l") =!= col("id_r"))
      .filter(levenshtein(col("name_l"), col("name_r"), maxDist) >= 0)
      .select(least(col("id_l"), col("id_r")).as("id_a"),
        greatest(col("id_l"), col("id_r")).as("id_b"))
      .distinct()

  /** Add one batch to the persisted state; returns the NEW full
    * assignment (record_id, entity_id) as read back from disk — exactly
    * what the next batch will see.
    */
  def addBatch(spark: SparkSession, stateDir: String, batch: DataFrame,
      idCol: String, nameCol: String, blockKey: Column, maxDist: Int): DataFrame = {
    val recsPath = s"$stateDir/recs"
    val assignPath = s"$stateDir/assign"
    val fs = new Path(stateDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    Upsert.recover(fs, assignPath) // heal a crash mid-swap

    val keyedAll = batch.select(col(idCol).cast("long").as("id"),
      col(nameCol).as("name"), blockKey.as("blk"))
    // replay/duplicate-id guard: only genuinely new records enter the index
    val keyed = (if (fs.exists(new Path(recsPath)))
        keyedAll.join(spark.read.parquet(recsPath).select(col("id")),
          Seq("id"), "left_anti")
      else keyedAll).transform(graft.ops.Checkpoints.stage)

    keyed.write.mode("append").parquet(recsPath)
    // Fresh read AFTER the append: one probe join covers batch×stored
    // and batch×batch candidates.
    val newPairs = probePairs(keyed, spark.read.parquet(recsPath), maxDist)

    val storedAssign =
      if (fs.exists(new Path(assignPath)))
        spark.read.parquet(assignPath)
          .select(col("record_id").as("id"), col("entity_id").as("comp"))
      else spark.range(0).select(col("id"), col("id").as("comp"))

    val next = graft.llm.IncrementalDedup
      .step(storedAssign, newPairs, keyed.select(col("id")))
      .select(col("id").as("record_id"), col("comp").as("entity_id"))
    graft.llm.IncrementalDedup.swapWrite(spark, fs, next, assignPath)
    spark.read.parquet(assignPath)
  }
}
