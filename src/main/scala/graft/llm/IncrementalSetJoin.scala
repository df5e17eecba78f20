package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** INCREMENTAL exact set-similarity join — probe new document batches
  * against a persisted prefix-token index ([[SetJoin]]'s staged-swap
  * sibling; the family shape of `IncrementalDedup` / `IncrementalAnn`).
  * The production use is contamination screening at ingest: every new
  * batch must report ALL pairs with Jaccard ≥ t against everything
  * already indexed, at batch cost, without re-tokenizing the corpus.
  *
  * THE EXACTNESS TRICK: the prefix-filter lemma (SetJoin scaladoc) holds
  * for ANY fixed total order on tokens — df-ascending order is only the
  * COST optimizer. So the df table is FROZEN at `init` (the immutable-
  * quantizer move from IncrementalAnn: centroids there, token order
  * here), every batch computes prefixes under the frozen order, and the
  * index stays append-only with the no-miss guarantee intact. Tokens the
  * frozen table has never seen rank as df=0 — rarest, straight into the
  * prefix: the SAFE direction (extra candidates, never a miss) and the
  * cheap one (genuinely new tokens have tiny buckets by definition).
  * Cost drifts as the frozen df ages (a token that became a stopword
  * after init keeps its small frozen rank and its bucket grows); the
  * remedy is an index rebuild — re-freeze — exactly IVF's centroid
  * retrain, on the same schedule logic.
  *
  * State layout (all plain parquet; `dforder`/`prefix` live under
  * [[graft.ops.StateSwap]]'s generation-pointer dirs so a re-freeze
  * replaces BOTH in one atomic pointer advance — a torn state pairing a
  * new token order with old prefixes would silently MISS pairs, since
  * the prefix lemma needs both sides under the same total order):
  * {{{
  *   <stateDir>/GENERATION        pointer (StateSwap)
  *   <stateDir>/gen-<N>/dforder   (tok, df)    frozen at init/re-freeze
  *   <stateDir>/gen-<N>/prefix    (tok, id, n) append-only within a gen
  *   <stateDir>/sets              (id, toks)   append-only (verification side)
  * }}}
  *
  * 100 TB shuffle inventory per batch: tokenize + one window over BATCH
  * ids only; one broadcast-ish join batch-tokens × frozen df (df table is
  * vocabulary-sized); the probe equi-join batch-prefix × full index keyed
  * by (rare) token; two id-keyed verification joins. The corpus index is
  * scanned but never re-shuffled wide — and never re-tokenized.
  */
object IncrementalSetJoin {

  import graft.ops.StateSwap

  private def setsPath(stateDir: String) = s"$stateDir/sets"

  /** The live frozen token-order relation (tok, df) — resolver for specs
    * and callers (state moved to generation dirs in r14).
    */
  def dford(spark: SparkSession, stateDir: String): DataFrame =
    spark.read.parquet(StateSwap.livePath(spark, stateDir, "dforder"))

  /** The live prefix index (tok, id, n). */
  def prefix(spark: SparkSession, stateDir: String): DataFrame =
    spark.read.parquet(StateSwap.livePath(spark, stateDir, "prefix"))

  /** The stored verification sets (id, toks). */
  def sets(spark: SparkSession, stateDir: String): DataFrame =
    spark.read.parquet(setsPath(stateDir))

  private def toSets(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("id"),
      array_distinct(TextOps.tokens(col(textCol))).as("toks"))

  /** Prefix entries of `sets` under the FROZEN (df, tok) order; unseen
    * tokens rank df=0. Same length arithmetic (and the same one-ulp
    * guard) as `SetJoin.prefixCandidates`.
    */
  private def prefixUnder(sets: DataFrame, dford: DataFrame,
      threshold: Double): DataFrame = {
    val tok = sets.select(col("id"), size(col("toks")).cast("bigint").as("n"),
      explode(col("toks")).as("tok"))
    tok.join(dford, Seq("tok"), "left")
      .withColumn("df", coalesce(col("df"), lit(0L)))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("df"), col("tok"))))
      .filter(col("rk") <= col("n") - ceil(lit(threshold) * col("n") - lit(1e-9)) + 1)
      .select(col("tok"), col("id"), col("n"))
  }

  /** Freeze the token order on `corpus`, index it, and persist state. */
  def init(spark: SparkSession, stateDir: String, corpus: DataFrame,
      textCol: String, idCol: String, threshold: Double): Unit = {
    val s = toSets(corpus, textCol, idCol).localCheckpoint(true)
    s.write.mode("overwrite").parquet(setsPath(stateDir))
    val dfOut = StateSwap.stagePath(spark, stateDir, "dforder")
    s.select(explode(col("toks")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .write.mode("overwrite").parquet(dfOut)
    prefixUnder(s, spark.read.parquet(dfOut), threshold)
      .write.mode("overwrite")
      .parquet(StateSwap.stagePath(spark, stateDir, "prefix"))
    StateSwap.publish(spark, stateDir, legacyNames = Seq("dforder", "prefix"))
  }

  /** DRIFT-TRIGGERED RE-FREEZE — [[graft.llm.IncrementalAnn.maintain]]'s
    * sibling for the frozen token order (VERDICT r12 item 6's second
    * half). Unlike the IVF quantizer, a stale df order can never MISS a
    * pair (the prefix lemma holds under any fixed order — exactness is
    * structural); what drifts is COST: a token that became a stopword
    * after `init` keeps its small frozen rank, stays inside every new
    * document's prefix, and its candidate bucket grows quadratically.
    * The decision statistic targets exactly that pathology: the FLOOD
    * SHARE — the fraction of the batch's token occurrences landing on
    * tokens that are frozen-RARE (df ≤ `rareDf`: forever
    * prefix-resident under the frozen order) AND repeated within the
    * batch (cb ≥ 2 — a once-seen token grows no bucket). Distribution
    * distances (KS/TV, [[graft.ops.Drift]]) are the right family for
    * VALUE drift (the ANN sibling uses KS over norms) but are
    * sample-size-dominated for token batches — a single in-vocabulary
    * document already measures TV ≈ 0.6 against a corpus-sized frozen
    * table, while its flood share is exactly 0. One vocabulary-keyed
    * join, batch cost:
    *
    *  - `floodShare <= threshold` → plain [[addBatch]] (the common case);
    *  - `floodShare > threshold` → RE-FREEZE: recount df over stored ∪ batch
    *    sets (stored sets re-read, never re-tokenized), rewrite the
    *    frozen order and the stored prefixes under it, then index the
    *    batch normally. One full-index pass — the amortized nightly
    *    cost, exactly the IVF retrain schedule.
    *
    * Returns (refrozen, floodShare, the batch's verified pairs — the
    * same contract as [[addBatch]]).
    */
  def maintain(spark: SparkSession, stateDir: String, batch: DataFrame,
      textCol: String, idCol: String, threshold: Double,
      floodThreshold: Double = 0.1, rareDf: Long = 1L)
      : (Boolean, Double, DataFrame) = {
    val bdf = toSets(batch, textCol, idCol)
      .select(explode(col("toks")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cb"))
    val agg = bdf.join(dford(spark, stateDir), Seq("tok"), "left")
      .na.fill(0L, Seq("df"))
      .agg(
        sum(when(col("df") <= rareDf && col("cb") >= 2L, col("cb"))
          .otherwise(0L)).as("flood"),
        sum(col("cb")).as("total")).head()
    val flood =
      if (agg.isNullAt(1) || agg.getLong(1) == 0L) 0.0
      else agg.getLong(0).toDouble / agg.getLong(1)
    if (flood <= floodThreshold)
      (false, flood, addBatch(spark, stateDir, batch, textCol, idCol, threshold))
    else {
      // RE-FREEZE: stage the new order AND the stored prefixes under it
      // into the NEXT generation, publish with one atomic pointer
      // advance. The old (order, prefix) pair stays live and CONSISTENT
      // until the instant both halves of the new one are complete — the
      // old two-rename swap had a crash window pairing the new order
      // with old prefixes, which breaks the no-miss lemma silently.
      stageRefreeze(spark, stateDir, batch, textCol, idCol, threshold)
      StateSwap.publish(spark, stateDir, legacyNames = Seq("dforder", "prefix"))
      (true, flood, addBatch(spark, stateDir, batch, textCol, idCol, threshold))
    }
  }

  /** Stage a full re-freeze (recounted df over stored ∪ batch, stored
    * prefixes under the new order) into the next generation WITHOUT
    * publishing — the crash spec stops here to assert the live index is
    * untouched; [[maintain]] follows it with `StateSwap.publish`.
    */
  private[graft] def stageRefreeze(spark: SparkSession, stateDir: String,
      batch: DataFrame, textCol: String, idCol: String,
      threshold: Double): Unit = {
    val stored = sets(spark, stateDir)
    val dfOut = StateSwap.stagePath(spark, stateDir, "dforder")
    // new frozen order reflects the post-drift distribution (stored ∪
    // batch); stored sets are re-read, never re-tokenized
    stored.select(explode(col("toks")).as("tok"))
      .unionByName(toSets(batch, textCol, idCol)
        .select(explode(col("toks")).as("tok")))
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .write.mode("overwrite").parquet(dfOut)
    prefixUnder(stored, spark.read.parquet(dfOut), threshold)
      .write.mode("overwrite")
      .parquet(StateSwap.stagePath(spark, stateDir, "prefix"))
  }

  /** Index `batch` and return EVERY pair with exact Jaccard ≥ threshold
    * that touches the batch — batch×corpus and batch×batch, (id_a <
    * id_b, n_inter, n_a, n_b, jaccard), the same verified-exact contract
    * as `SetJoin.similarityJoin` restricted to pairs a full re-run would
    * report involving at least one batch doc.
    */
  def addBatch(spark: SparkSession, stateDir: String, batch: DataFrame,
      textCol: String, idCol: String, threshold: Double): DataFrame = {
    val dfOrder = dford(spark, stateDir)
    // IDEMPOTENCE GUARD (ADVICE r8): anti-join the batch against ids the
    // index already holds BEFORE appending — a crash-replayed or
    // accidentally repeated batch (or one reusing an existing doc_id)
    // would otherwise double-index its documents and emit duplicate/self
    // pairs on every later probe. A full replay is thus a state no-op
    // that returns zero pairs; callers needing the original pair output
    // must persist it downstream (the CDC-stream replay discipline).
    val bsets = toSets(batch, textCol, idCol)
      .join(sets(spark, stateDir).select(col("id")), Seq("id"), "left_anti")
      .localCheckpoint(true)
    val bprefix = prefixUnder(bsets, dfOrder, threshold).localCheckpoint(true)
    bsets.write.mode("append").parquet(setsPath(stateDir))
    bprefix.write.mode("append")
      .parquet(StateSwap.livePath(spark, stateDir, "prefix"))

    // Fresh read AFTER the append: one probe covers batch×corpus AND
    // batch×batch (the batch's own entries are in the index now).
    val fullPrefix = prefix(spark, stateDir)
    val fullSets = sets(spark, stateDir)
    val cands = bprefix.toDF("tok", "pid", "pn")
      .join(fullPrefix.toDF("tok", "qid", "qn"), Seq("tok"))
      .filter(col("pid") =!= col("qid"))
      .select(
        least(col("pid"), col("qid")).as("id_a"),
        greatest(col("pid"), col("qid")).as("id_b"),
        when(col("pid") < col("qid"), col("pn")).otherwise(col("qn")).as("n_a"),
        when(col("pid") < col("qid"), col("qn")).otherwise(col("pn")).as("n_b"))
      .filter(least(col("n_a"), col("n_b")).cast("double") >=
        lit(threshold) * greatest(col("n_a"), col("n_b")).cast("double") - lit(1e-9))
      .select(col("id_a"), col("id_b"))
      .distinct()
    cands
      .join(fullSets.select(col("id").as("id_a"), col("toks").as("toks_a")), Seq("id_a"))
      .join(fullSets.select(col("id").as("id_b"), col("toks").as("toks_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("toks_a"), col("toks_b"))).cast("bigint").as("n_inter"),
        size(col("toks_a")).cast("bigint").as("n_a"),
        size(col("toks_b")).cast("bigint").as("n_b"))
      .withColumn("jaccard",
        col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter")).cast("double"))
      .filter(col("jaccard") >= lit(threshold))
  }
}
