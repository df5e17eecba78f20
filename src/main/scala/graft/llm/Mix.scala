package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget CORPUS MIXING — the data-mixture step of a training
  * pipeline: given per-source token budgets (the mixture weights ×
  * total budget), select documents from each source until its budget
  * fills. Selection is DETERMINISTIC — docs are consumed in md5(id)
  * order, so re-runs, re-shards, and incremental corpus growth never
  * change which docs an unchanged budget selects (the same
  * content-stability argument as the hash split `q_hash_split` pins);
  * a doc is selected iff its INCLUSIVE running token sum stays within
  * the budget.
  *
  * 100 TB shape: the running sum is the two-pass DISTRIBUTED prefix
  * sum (the Pack/Drift discipline): pass 1 computes local running sums
  * inside (source, hash-bucket) windows in parallel — the bucket is
  * the md5's first byte, so bucket order refines hash order; pass 2
  * runs the only sequential window over the 256 PER-BUCKET SUBTOTALS
  * per source, never the docs. No single reducer ever sees a whole
  * source — the skew a naive `Window.partitionBy(source)` would melt
  * under is bounded at 1/256th of the hottest source.
  *
  * Token counts are whitespace tokens of the [[TextOps.norm]]alized
  * text — swap in a real tokenizer column upstream if the budget is
  * BPE-denominated; the selection law is count-agnostic.
  */
object Mix {

  /** Select docs source-by-source in hash order until each source's
    * token budget (from `budgets`: `(sourceCol, __budget)`) fills.
    * Returns the selected docs with `__tokens` (the doc's token count)
    * and `__cum` (its inclusive running sum) attached.
    */
  def sampleToBudget(docs: DataFrame, budgets: DataFrame,
      sourceCol: String, textCol: String, idCol: String): DataFrame = {
    val withTok = docs
      .withColumn("__tokens",
        size(split(TextOps.norm(col(textCol)), " ")).cast("long"))
      .withColumn("__h", md5(col(idCol).cast("string")))
      .withColumn("__b", conv(substring(col("__h"), 1, 2), 16, 10).cast("int"))
    // pass 1: parallel local running sums inside (source, bucket)
    val wLocal = Window.partitionBy(col(sourceCol), col("__b"))
      .orderBy(col("__h"))
    val local = withTok.withColumn("__local", sum(col("__tokens")).over(wLocal))
    // pass 2: sequential window over SUBTOTALS only (≤256 rows/source)
    val wOff = Window.partitionBy(col(sourceCol)).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = withTok.groupBy(col(sourceCol), col("__b"))
      .agg(sum(col("__tokens")).as("__bsum"))
      .withColumn("__off", coalesce(sum(col("__bsum")).over(wOff), lit(0L)))
      .drop("__bsum")
    local
      .join(broadcast(offsets), Seq(sourceCol, "__b"))
      .withColumn("__cum", col("__off") + col("__local"))
      .join(broadcast(budgets), Seq(sourceCol))
      .filter(col("__cum") <= col("__budget"))
      .drop("__b", "__h", "__local", "__off", "__budget")
  }
}
