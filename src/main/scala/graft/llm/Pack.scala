package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining: documents are concatenated in a
  * deterministic order (the id column) and sliced into fixed token-budget
  * chunks — the GPT-style "concat and chunk" batch shape. The core of the
  * operator is a GLOBAL prefix sum of per-doc token counts, which a naive
  * `Window.orderBy(id)` implements by dragging every row into ONE
  * partition — the classic scale trap. This implementation is the
  * distributed two-pass prefix sum instead:
  *
  *   1. bucket rows by an order-preserving key range (`id div width`) and
  *      run the prefix sum per bucket (parallel, bounded partitions);
  *   2. aggregate one subtotal per bucket — a relation of |rows|/width
  *      entries — and prefix-sum THAT tiny relation in a single
  *      partition (legal: at 100 TB with width=1e6 it is ~1e5 rows);
  *   3. broadcast the bucket offsets back and add.
  *
  * Result: exact global offsets with no single-partition pass over the
  * data. `PackSpec` pins the equivalence against the naive global window.
  */
object Pack {

  /** Exact global token offsets in `idCol` order via the distributed
    * prefix sum. Adds `tok_start` (inclusive, 0-based) and `tok_end`
    * (exclusive): doc d occupies `[tok_start, tok_end)` of the
    * concatenated token stream.
    *
    * `bucketWidth` trades parallelism against the size of the step-2
    * subtotal relation; any positive value gives identical results
    * (non-dense or skewed ids only unbalance bucket SIZES, never
    * correctness, since `id div width` preserves order).
    */
  def packOffsets(docs: DataFrame, idCol: String, nTokCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val inBucket = Window.partitionBy(col("__bucket")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCum = docs
      .withColumn("__bucket", expr(s"`$idCol` div $bucketWidth"))
      .withColumn("__cum", sum(col(nTokCol)).over(inBucket))
    // One row per bucket; the single-partition window is over THIS tiny
    // relation only (|rows| / bucketWidth entries), never the data.
    val exclusivePrefix = Window.orderBy(col("__bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = withCum.groupBy(col("__bucket"))
      .agg(sum(col(nTokCol)).as("__btot"))
      .withColumn("__boff", coalesce(sum(col("__btot")).over(exclusivePrefix), lit(0L)))
      .select(col("__bucket"), col("__boff"))
    withCum.join(broadcast(offsets), Seq("__bucket"))
      .withColumn("tok_end", col("__boff") + col("__cum"))
      .withColumn("tok_start", col("tok_end") - col(nTokCol))
      .drop("__bucket", "__cum", "__boff")
  }

  /** Slice the concatenated stream into `budget`-token chunks and report
    * per-chunk packing stats: how many docs touch the chunk and how many
    * of its token slots they fill (= exactly `budget` for every chunk but
    * the last — the invariant `PackSpec` pins). A doc spanning a chunk
    * boundary contributes its overlap to each side, so the explode fans
    * out only `ceil(n_tok/budget)+1` rows per doc, never `n_tok`.
    */
  def chunkStats(spans: DataFrame, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val b = lit(budget)
    spans.filter(col("tok_end") > col("tok_start"))
      .withColumn("chunk", explode(sequence(
        expr(s"tok_start div $budget"), expr(s"(tok_end - 1) div $budget"))))
      .groupBy(col("chunk"))
      .agg(count(lit(1)).as("n_docs"),
        sum(least(col("tok_end"), (col("chunk") + 1) * b) -
          greatest(col("tok_start"), col("chunk") * b)).as("n_tokens"))
  }

  /** Whitespace token count of a MATERIALIZED normalized-text column
    * (TextOps perf contract).
    */
  def tokenCountOfNorm(normText: Column): Column =
    size(split(normText, " ")).cast("long")
}
