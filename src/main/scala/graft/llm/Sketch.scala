package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch over a token stream — the fixed-memory frequency
  * summary a corpus-statistics pipeline keeps when exact per-token counts
  * are too large to materialize. The sketch is `depth × width` counters
  * REGARDLESS of corpus size: each map partition pre-aggregates into at
  * most depth×width rows (partial agg collapses repeats map-side), so the
  * shuffle moves O(depth × width × partitions) rows at 100 TB, not
  * O(tokens). Estimates never undercount (every counter a token maps to
  * includes its full count) and overcount by at most ε·N with probability
  * 1−δ for width = ⌈e/ε⌉, depth = ⌈ln 1/δ⌉ — `SketchSpec` pins both
  * properties.
  *
  * Hashes are md5-derived (TextOps.hash32, salted per row of the sketch)
  * so the DuckDB oracle rebuilds the identical sketch and the estimates
  * are hash-comparable — a sketch that differs by one counter anywhere
  * flips the driver row red.
  */
object Sketch {

  /** Bucket of `tok` in sketch row `i`. */
  def cmsBucket(tok: Column, i: Int, width: Int): Column =
    pmod(TextOps.hash32(concat(lit(s"cms$i:"), tok)), lit(width.toLong))

  private def ibPairs(tok: Column, depth: Int, width: Int): Column =
    explode(array((0 until depth).map(i =>
      struct(lit(i).as("i"), cmsBucket(tok, i, width).as("bucket"))): _*))

  /** Build the sketch: one counter row per (sketch row, bucket) actually
    * hit — at most depth × width rows total.
    */
  def countMin(toks: DataFrame, tokCol: String, depth: Int, width: Int): DataFrame =
    toks.select(ibPairs(col(tokCol), depth, width).as("__ib"))
      .select(col("__ib.i").as("i"), col("__ib.bucket").as("bucket"))
      .groupBy(col("i"), col("bucket"))
      .agg(count(lit(1)).as("c"))

  /** Point-estimate the frequency of each token in `queries(tokCol)`:
    * min over the sketch rows of the counter the token hashes to. The
    * sketch is bounded (depth × width rows) so the join broadcasts —
    * estimation is map-side against the query stream.
    *
    * The sketch only materializes counters that were HIT, so a counter
    * row absent from it means count 0 — the join is LEFT and missing
    * counters coalesce to 0 (standard CMS point-query semantics: a token
    * with any empty counter, i.e. one the corpus never touched, estimates
    * 0 rather than being overestimated or dropped; ADVICE r5).
    */
  def estimate(sketch: DataFrame, queries: DataFrame, tokCol: String,
      depth: Int, width: Int): DataFrame =
    queries.select(col(tokCol), ibPairs(col(tokCol), depth, width).as("__ib"))
      .select(col(tokCol), col("__ib.i").as("i"), col("__ib.bucket").as("bucket"))
      .join(broadcast(sketch), Seq("i", "bucket"), "left")
      .groupBy(col(tokCol))
      .agg(min(coalesce(col("c"), lit(0L))).as("cms_est"))
}
