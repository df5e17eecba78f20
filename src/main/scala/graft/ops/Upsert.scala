package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Upsert (MERGE) module — the heart of reference parity (SURVEY.md M3).
  *
  * Re-expresses the reference's Postgres MERGE template
  * (`/root/reference/SharedCode/PGHelperFunction.py:44-57`: CTE UPDATE ...
  * RETURNING pk, then INSERT ... LEFT JOIN updates WHERE pk IS NULL GROUP
  * BY s_pk) as DataFrame algebra:
  *
  *   merged = dedup(source, keys) UNION ALL (target ANTI-JOIN source ON keys)
  *
  * which is equivalent: matched keys take the source row (the UPDATE
  * branch), unmatched target rows survive, unmatched source rows insert.
  *
  * Semantics pinned from the reference:
  *  - Key validation: empty/missing key columns raise, mirroring the
  *    "no primary key" error at `PGHelperFunction.py:22-23`.
  *  - Source dedup: Postgres relies on `GROUP BY s_pk` + PK functional
  *    dependency (`:56`, temp table clones constraints via `LIKE ...
  *    INCLUDING ALL`, `:74`). Spark has no PK-dependency shortcut, so we
  *    pick a DETERMINISTIC representative per key: `row_number()` over the
  *    keys ordered by every non-key column (SURVEY §7 last risk).
  *  - Column-list projection (B6, `PGHelperFunction.py:63-64`): the source
  *    is projected to the target's column list/order before the union.
  *
  * Scale design (100 TB): one shuffle on the key columns for the window
  * dedup, one for the anti-join — and with AQE both reuse the same
  * hash-partitioning. The anti-join build side is only the DISTINCT KEYS
  * of the (usually much smaller) source, not its payload. On a real
  * cluster the target table is BUCKETED by the keys (`runBucketed`): the
  * target side of the anti-join arrives pre-partitioned from the scan, so
  * the TARGET (the 100 TB side) never shuffles — the plan's only
  * exchanges are on the source; proven by plan assertion in
  * `BucketingSpec` and measured at sf0.1 (numbers in COVERAGE.md). The
  * algebra is unchanged between the two sinks.
  */
object Upsert {

  final case class KeyError(message: String) extends IllegalArgumentException(message)

  private def validateKeys(target: DataFrame, source: DataFrame, keys: Seq[String]): Unit = {
    // Mirrors PGHelperFunction.py:22-23 ("no primary key identified").
    if (keys.isEmpty)
      throw KeyError("Error - no primary key identified for upsert target")
    val t = target.columns.toSet
    val s = source.columns.toSet
    val missing = keys.filterNot(k => t.contains(k) && s.contains(k))
    if (missing.nonEmpty)
      throw KeyError(s"Error - key columns absent from target/source: ${missing.mkString(",")}")
  }

  /** Deterministic one-row-per-key representative: smallest row under the
    * ordering of all non-key columns (ascending, nulls first). Declared
    * semantics for the reference's `GROUP BY s_pk` (SURVEY §7).
    */
  def dedupByKey(source: DataFrame, keys: Seq[String]): DataFrame = {
    val nonKey = source.columns.filterNot(keys.contains)
    val ordering =
      if (nonKey.isEmpty) keys.map(col(_).asc) // key-only schema: any row is the row
      else nonKey.toSeq.map(col(_).asc_nulls_first)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
    source
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Pure MERGE algebra — returns the upserted relation (no IO). */
  def merge(target: DataFrame, source: DataFrame, keys: Seq[String]): DataFrame = {
    validateKeys(target, source, keys)
    val targetCols = target.columns.toSeq
    // B6 column-list projection: source takes the target's column order.
    val src = dedupByKey(source, keys).select(targetCols.map(col): _*)
    val untouched = target.join(src.select(keys.map(col): _*), keys, "left_anti")
    untouched.unionByName(src)
  }

  /** Upsert into a parquet table directory with a staged swap: write the
    * merged relation to `<path>._staging`, stage the old table out to
    * `<path>._old`, rename staging in, delete `._old` (SURVEY §7 "upsert
    * atomicity without Delta"). The staging write fully succeeds before
    * the old data is touched, so no reader ever sees a half-written MIX —
    * but the swap itself is two renames, not one atomic operation: a crash
    * between them leaves the table absent at `targetPath` (with the intact
    * copy parked at `._old`) until the recovery preamble of the next
    * `run()` — or any caller invoking `recover()` — restores it. True
    * single-operation swaps need a metadata/pointer layer (a table format
    * like Delta/Iceberg); this is the documented non-transactional
    * approximation over a bare FileSystem.
    */
  def run(spark: SparkSession, targetPath: String, source: DataFrame, keys: Seq[String]): Unit =
    transformAndSwap(spark, targetPath)(target => merge(target, source, keys))

  /** The staged-swap skeleton of [[run]], generalized: read the current
    * table, apply `f`, land the result via the staging/old rename dance.
    * Shared by MERGE upserts and the CDC apply stream (whose per-batch
    * transform includes deletes, which `merge` cannot express).
    */
  def transformAndSwap(spark: SparkSession, targetPath: String)
      (f: DataFrame => DataFrame): Unit = {
    val fs = new Path(targetPath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    recover(fs, targetPath)
    val target = spark.read.parquet(targetPath)
    val next = f(target)
    val staging = targetPath + "._staging"
    next.write.mode("overwrite").parquet(staging)
    val tgt = new Path(targetPath)
    val old = new Path(targetPath + "._old")
    if (fs.exists(old)) fs.delete(old, true)
    if (!fs.rename(tgt, old))
      throw new java.io.IOException(s"Error - could not stage out old table at $targetPath")
    if (!fs.rename(new Path(staging), tgt)) {
      fs.rename(old, tgt) // roll back
      throw new java.io.IOException(s"Error - could not swap staging into $targetPath")
    }
    fs.delete(old, true)
  }

  /** B3 at warehouse scale: MERGE into a metastore table BUCKETED by the
    * key columns. The bucketed scan hands the anti-join a pre-partitioned
    * target side, so the big side never shuffles — only the source's
    * window dedup and distinct-keys side exchange (BucketingSpec pins the
    * plan). The merged result is written bucketed on the same keys (one
    * repartition to line writes up with the bucket hash — Spark's bucket
    * id IS Murmur3 `hash(keys) pmod numBuckets`, so this is the same
    * partitioning the merge already produced under AQE), keeping the
    * table shuffle-free for every FUTURE upsert too. Staged swap via
    * ALTER RENAME mirrors `run()`'s dir swap, with the same non-atomic
    * window caveat; `recoverTable` heals a crash between the renames.
    */
  def runBucketed(spark: SparkSession, table: String, source: DataFrame,
      keys: Seq[String], numBuckets: Int = 32): Unit =
    transformAndSwapBucketed(spark, table, keys, numBuckets)(target =>
      merge(target, source, keys))

  /** The bucketed staged-swap skeleton of [[runBucketed]], generalized
    * exactly as [[transformAndSwap]] generalizes [[run]]: read the
    * bucketed table, apply `f`, land the result as a NEW bucketed table
    * on the same keys via the ALTER-RENAME dance — so the table stays
    * shuffle-free for every future keyed transform. Shared by MERGE
    * upserts and the bucketed CDC apply stream (whose per-batch
    * transform includes deletes).
    */
  def transformAndSwapBucketed(spark: SparkSession, table: String,
      keys: Seq[String], numBuckets: Int = 32)(f: DataFrame => DataFrame): Unit = {
    recoverTable(spark, table)
    val next = f(spark.table(table))
    val staging = s"${table}_staging"
    val old = s"${table}_old"
    spark.sql(s"DROP TABLE IF EXISTS $staging")
    next.repartition(numBuckets, keys.map(col): _*)
      .write.mode("overwrite")
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(staging)
    spark.sql(s"DROP TABLE IF EXISTS $old")
    spark.sql(s"ALTER TABLE $table RENAME TO $old")
    try spark.sql(s"ALTER TABLE $staging RENAME TO $table")
    catch {
      case e: Throwable =>
        spark.sql(s"ALTER TABLE $old RENAME TO $table") // roll back
        throw e
    }
    spark.sql(s"DROP TABLE $old")
  }

  /** Restore a bucketed-upsert table stranded at `<table>_old` by a crash
    * inside `runBucketed`'s rename window (target absent, old present).
    */
  def recoverTable(spark: SparkSession, table: String): Unit = {
    val cat = spark.catalog
    if (!cat.tableExists(table) && cat.tableExists(s"${table}_old"))
      spark.sql(s"ALTER TABLE ${table}_old RENAME TO $table")
  }

  /** Restore a table stranded at `._old` by a crash inside `run()`'s
    * rename window (target absent, old copy present).
    */
  def recover(fs: FileSystem, targetPath: String): Unit = {
    val tgt = new Path(targetPath)
    val old = new Path(targetPath + "._old")
    if (!fs.exists(tgt) && fs.exists(old) && !fs.rename(old, tgt))
      throw new java.io.IOException(s"Error - could not restore $targetPath from ._old")
  }

  def recover(spark: SparkSession, targetPath: String): Unit =
    recover(new Path(targetPath).getFileSystem(spark.sparkContext.hadoopConfiguration),
      targetPath)

  /** Plain append sink — the reference's `insert` branch (A11,
    * `/root/reference/adffunction/__init__.py:166-168`, raw COPY append).
    */
  def append(df: DataFrame, targetPath: String): Unit =
    df.write.mode("append").parquet(targetPath)
}
