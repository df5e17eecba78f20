package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring between two samples (today's feed vs
  * yesterday's, one table version vs another): the two-sample
  * KOLMOGOROV-SMIRNOV distance sup|F_a − F_b|, computed EXACTLY — the
  * supremum of an ECDF difference is attained at a data point, and at
  * any point `|F_a − F_b| = |cum_a·n_b − cum_b·n_a| / (n_a·n_b)`, whose
  * numerator is an INTEGER. Returning (ks_num, n_a, n_b) keeps the
  * statistic bigint-exact — no float ECDFs, so cross-engine oracle
  * hashes cannot drift (the fixed-point discipline of `llm/Retrieval`).
  *
  * Scale shape: the ECDF needs a GLOBAL running count in value order —
  * the naive `Window.orderBy(v)` drags every distinct value into one
  * partition, the same trap [[graft.llm.Pack]] documents. Same cure:
  * bucket by the order-preserving key range `v div bucketWidth`, run the
  * running sums per bucket in parallel, prefix-sum only the per-bucket
  * SUBTOTALS in a single partition (tiny by construction), broadcast
  * the offsets back. `DriftSpec` pins equivalence against the naive
  * global window and against a hand ECDF.
  */
object Drift {

  /** (n_a, n_b, ks_num, v_at_max) for two samples of a LONG value
    * column `v` (callers fix-point their doubles first — e.g. cents).
    * `KS = ks_num / (n_a·n_b)`; `v_at_max` is the smallest value
    * attaining the supremum (deterministic tie-break).
    */
  def ksStatistic(a: DataFrame, b: DataFrame, valueCol: String,
      bucketWidth: Long = 1L << 20): DataFrame = {
    val av = a.select(col(valueCol).cast("long").as("v"))
    val bv = b.select(col(valueCol).cast("long").as("v"))
    val pts = av.groupBy(col("v")).agg(count(lit(1)).as("ca"))
      .withColumn("cb", lit(0L))
      .unionByName(bv.groupBy(col("v")).agg(count(lit(1)).as("cb"))
        .withColumn("ca", lit(0L)))
      .groupBy(col("v")).agg(sum(col("ca")).as("ca"), sum(col("cb")).as("cb"))
    ksFromCounts(pts, bucketWidth)
  }

  /** The KS core over PRE-GROUPED per-value counts `(v, ca, cb)` — the
    * seam [[IncrementalDrift]] re-enters with a PERSISTED reference side:
    * the statistic depends on the samples only through these counts, so
    * a stored count relation is a lossless substitute for rescanning the
    * reference sample.
    */
  private[graft] def ksFromCounts(ptsRaw: DataFrame,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val pts = ptsRaw.withColumn("__bucket", floor(col("v") / bucketWidth))
    val inBucket = Window.partitionBy(col("__bucket")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val perBucket = pts
      .withColumn("ra", sum(col("ca")).over(inBucket))
      .withColumn("rb", sum(col("cb")).over(inBucket))
    // subtotal relation: one row per bucket — the only single-partition
    // window runs over THIS, never the data
    val exclusive = Window.orderBy(col("__bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = pts.groupBy(col("__bucket"))
      .agg(sum(col("ca")).as("sa"), sum(col("cb")).as("sb"))
      .withColumn("oa", coalesce(sum(col("sa")).over(exclusive), lit(0L)))
      .withColumn("ob", coalesce(sum(col("sb")).over(exclusive), lit(0L)))
      .select(col("__bucket"), col("oa"), col("ob"))
    val totals = pts.agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"))
    val diffs = perBucket.join(broadcast(offsets), Seq("__bucket"))
      .crossJoin(broadcast(totals))
      .select(col("v"), col("n_a"), col("n_b"),
        abs((col("ra") + col("oa")) * col("n_b") -
            (col("rb") + col("ob")) * col("n_a")).as("diff"))
    val top = diffs.agg(max(col("diff")).as("ks_num"))
    diffs.join(broadcast(top), col("diff") === col("ks_num"))
      .groupBy(col("n_a"), col("n_b"), col("ks_num"))
      .agg(min(col("v")).as("v_at_max"))
      .select(col("n_a"), col("n_b"), col("ks_num"), col("v_at_max"))
  }

  /** Categorical sibling of [[ksStatistic]]: TOTAL-VARIATION distance
    * `TV = ½ Σ_cat |p_a − p_b|`, again with an integer numerator —
    * `tv_num = Σ |c_a·n_b − c_b·n_a|`, `TV = tv_num / (2·n_a·n_b)` —
    * so categorical drift hashes exactly too (χ²/PSI put a different
    * denominator under every category and lose integrality; TV is the
    * metric that keeps it). One groupBy per side + one category-keyed
    * outer merge; no windows at all. Returns (n_a, n_b, tv_num,
    * top_cat) with `top_cat` the lexicographically-smallest category
    * attaining the largest single-category gap.
    */
  def tvDistance(a: DataFrame, b: DataFrame, catCol: String): DataFrame = {
    val ca = a.select(col(catCol).cast("string").as("cat"))
      .groupBy(col("cat")).agg(count(lit(1)).as("ca")).withColumn("cb", lit(0L))
    val cb = b.select(col(catCol).cast("string").as("cat"))
      .groupBy(col("cat")).agg(count(lit(1)).as("cb")).withColumn("ca", lit(0L))
    val g = ca.unionByName(cb).groupBy(col("cat"))
      .agg(sum(col("ca")).as("ca"), sum(col("cb")).as("cb"))
    tvFromCounts(g)
  }

  /** The TV core over PRE-GROUPED per-category counts `(cat, ca, cb)` —
    * the [[IncrementalDrift]] seam, mirroring [[ksFromCounts]].
    */
  private[graft] def tvFromCounts(g: DataFrame): DataFrame = {
    val totals = g.agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"))
    val diffs = g.crossJoin(broadcast(totals))
      .select(col("cat"), col("n_a"), col("n_b"),
        abs(col("ca") * col("n_b") - col("cb") * col("n_a")).as("diff"))
    val top = diffs.agg(max(col("diff")).as("max_diff"))
    val topCat = diffs.join(broadcast(top), col("diff") === col("max_diff"))
      .agg(min(col("cat")).as("top_cat"))
    diffs.groupBy(col("n_a"), col("n_b"))
      .agg(sum(col("diff")).as("tv_num"))
      .crossJoin(broadcast(topCat))
      .select(col("n_a"), col("n_b"), col("tv_num"), col("top_cat"))
  }
}
