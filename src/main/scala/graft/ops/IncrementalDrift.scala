package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental state for the [[Drift]] monitors — the persisted-index
  * family's eighth member (dedup / ANN / set-join / BM25 / PageRank /
  * linkage / hierarchy / drift): the two-sample statistics depend on
  * each sample only through its per-value (KS) or per-category (TV)
  * COUNTS, so the reference side is persisted as exactly that count
  * relation and every later `monitor` run loads yesterday's side at
  * metadata cost instead of rescanning it. `addBatch` folds a new
  * reference slice in with one count-keyed merge — `init(A1); addBatch
  * (A2)` is provably `init(A1 ∪ A2)` because counts are additive
  * (DriftSpec pins the law, and that `monitor` equals the two-sample
  * recompute bit-for-bit).
  *
  * 100 TB shape: the state is O(distinct values), not O(rows) — a year
  * of reference data folds to one tiny parquet; the daily monitor scans
  * only TODAY's sample. State writes go through the staged-swap
  * discipline every incremental operator here shares
  * ([[graft.llm.IncrementalDedup.swapWrite]]); a crash mid-swap is
  * healed by the [[Upsert.recover]] preamble on the next call.
  */
object IncrementalDrift {

  private def counts(df: DataFrame, valueCol: String): DataFrame =
    df.select(col(valueCol).cast("long").as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("c"))

  private def catCounts(df: DataFrame, catCol: String): DataFrame =
    df.select(col(catCol).cast("string").as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("c"))

  private def fold(spark: SparkSession, statePath: String,
      batchCounts: DataFrame): Unit = {
    val fs = new Path(statePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Upsert.recover(fs, statePath)
    val merged =
      if (fs.exists(new Path(statePath)))
        spark.read.parquet(statePath).unionByName(batchCounts)
          .groupBy(col("v")).agg(sum(col("c")).as("c"))
      else batchCounts
    graft.llm.IncrementalDedup.swapWrite(spark, fs, merged, statePath)
  }

  /** Seed (or reset) the KS reference state with sample `ref`. */
  def init(spark: SparkSession, ref: DataFrame, valueCol: String,
      statePath: String): Unit = {
    val fs = new Path(statePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Upsert.recover(fs, statePath)
    if (fs.exists(new Path(statePath)))
      fs.delete(new Path(statePath), true)
    fold(spark, statePath, counts(ref, valueCol))
  }

  /** Fold another reference slice into the state — counts are additive,
    * so this commutes with [[init]] on the union.
    */
  def addBatch(spark: SparkSession, batch: DataFrame, valueCol: String,
      statePath: String): Unit =
    fold(spark, statePath, counts(batch, valueCol))

  /** [[Drift.ksStatistic]](reference, cur) with the reference side read
    * from the persisted counts — same output schema
    * (n_a, n_b, ks_num, v_at_max), bit-equal to the recompute.
    */
  def monitor(spark: SparkSession, cur: DataFrame, valueCol: String,
      statePath: String, bucketWidth: Long = 1L << 20): DataFrame = {
    val ref = spark.read.parquet(statePath)
    val pts = ref.select(col("v"), col("c").as("ca"), lit(0L).as("cb"))
      .unionByName(counts(cur, valueCol)
        .select(col("v"), lit(0L).as("ca"), col("c").as("cb")))
      .groupBy(col("v")).agg(sum(col("ca")).as("ca"), sum(col("cb")).as("cb"))
    Drift.ksFromCounts(pts, bucketWidth)
  }

  /** Categorical sibling: seed the TV reference state. */
  def initCat(spark: SparkSession, ref: DataFrame, catCol: String,
      statePath: String): Unit = {
    val fs = new Path(statePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Upsert.recover(fs, statePath)
    if (fs.exists(new Path(statePath)))
      fs.delete(new Path(statePath), true)
    fold(spark, statePath, catCounts(ref, catCol))
  }

  /** Fold a categorical reference slice in. */
  def addBatchCat(spark: SparkSession, batch: DataFrame, catCol: String,
      statePath: String): Unit =
    fold(spark, statePath, catCounts(batch, catCol))

  /** [[Drift.tvDistance]](reference, cur) from the persisted category
    * counts — same output schema (n_a, n_b, tv_num, top_cat).
    */
  def monitorCat(spark: SparkSession, cur: DataFrame, catCol: String,
      statePath: String): DataFrame = {
    val ref = spark.read.parquet(statePath)
    val g = ref.select(col("v").as("cat"), col("c").as("ca"), lit(0L).as("cb"))
      .unionByName(catCounts(cur, catCol)
        .select(col("v").as("cat"), lit(0L).as("ca"), col("c").as("cb")))
      .groupBy(col("cat")).agg(sum(col("ca")).as("ca"), sum(col("cb")).as("cb"))
    Drift.tvFromCounts(g)
  }
}
