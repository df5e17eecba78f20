package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned parquet table with time travel — the minimal commit-log
  * design (the Delta/Iceberg snapshot idea, built from scratch on plain
  * parquet + a manifest directory). The reference's pipeline answers
  * "what did the table hold yesterday?" with its archive folders
  * (`HelperFunction.py:51-60` moves consumed inputs under timestamped
  * dirs); this is the same need answered at the TABLE layer: every write
  * is a new immutable snapshot, old snapshots stay readable, and
  * rollback is a metadata operation.
  *
  * Layout:
  * {{{
  *   <table>/data/v%06d/        immutable parquet dir, one per writing commit
  *   <table>/_commits/%06d.manifest
  *       line 1: op=<append|overwrite|rollback>
  *       rest:   referenced data dir names, one per line
  * }}}
  *
  * Commit protocol: data dirs are written first, then the manifest is
  * staged to `.tmp` and RENAMEd into place — on a filesystem with atomic
  * rename (HDFS, local; object stores need their committer), readers
  * either see a complete manifest or none: a crashed writer leaves only
  * an orphan data dir that the next `vacuum` removes. Version numbers are
  * dense integers; `latestVersion` is one listing. Single-writer by
  * design (the reference's pipelines are too); multi-writer needs a
  * compare-and-swap on the manifest name, which object stores now offer
  * (conditional PUT) — out of scope here.
  *
  * 100 TB shape: `read` at any version is a plain multi-dir parquet scan
  * — footer pruning, predicate pushdown, and partition-level parallelism
  * all apply unchanged; APPEND commits reference the parent's dirs
  * instead of rewriting them (write cost = the delta, exactly the
  * incremental-dedup/ANN staged-swap discipline); ROLLBACK writes no
  * data at all. `vacuum` deletes data dirs unreferenced by the LATEST
  * manifest — after it, time travel to versions that needed those dirs
  * fails loudly (the standard lakehouse retention trade).
  */
object Versioned {

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def commitsDir(table: String) = new Path(s"$table/_commits")
  private def manifestPath(table: String, v: Long) =
    new Path(s"$table/_commits/${"%06d".format(v)}.manifest")

  /** Highest committed version, or None for a fresh path. */
  def latestVersion(spark: SparkSession, table: String): Option[Long] = {
    val dir = commitsDir(table)
    val f = fs(spark, dir)
    if (!f.exists(dir)) None
    else {
      val vs = f.listStatus(dir).toSeq.map(_.getPath.getName)
        .filter(_.endsWith(".manifest"))
        .map(_.stripSuffix(".manifest").toLong)
      if (vs.isEmpty) None else Some(vs.max)
    }
  }

  private def readManifest(spark: SparkSession, table: String,
      v: Long): (String, Seq[String]) = {
    val p = manifestPath(table, v)
    val f = fs(spark, p)
    require(f.exists(p), s"version $v does not exist under $table")
    val in = f.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val lines = text.linesIterator.toSeq.filter(_.nonEmpty)
    (lines.head.stripPrefix("op="), lines.tail)
  }

  private def writeManifest(spark: SparkSession, table: String, v: Long,
      op: String, refs: Seq[String]): Unit = {
    val p = manifestPath(table, v)
    val tmp = new Path(p.toString + ".tmp")
    val f = fs(spark, p)
    f.mkdirs(p.getParent)
    val out = f.create(tmp, true)
    try out.write((s"op=$op" +: refs).mkString("\n").getBytes("UTF-8"))
    finally out.close()
    if (!f.rename(tmp, p))
      throw new java.io.IOException(s"commit rename failed for version $v of $table")
  }

  /** Write `df` as the next version. `overwrite=false` (append) keeps the
    * parent's data dirs in the new snapshot; `overwrite=true` references
    * only the new dir. Returns the committed version number.
    */
  def commit(spark: SparkSession, table: String, df: DataFrame,
      overwrite: Boolean = false): Long = {
    val v = latestVersion(spark, table).getOrElse(0L) + 1
    val dirName = s"v${"%06d".format(v)}"
    df.write.mode("errorifexists").parquet(s"$table/data/$dirName")
    val parentRefs =
      if (overwrite || v == 1) Seq.empty
      else readManifest(spark, table, v - 1)._2
    writeManifest(spark, table, v,
      if (overwrite) "overwrite" else "append", parentRefs :+ dirName)
    v
  }

  /** Metadata-only rollback: the next version references exactly the data
    * dirs of `toVersion` — no bytes rewritten, old history intact.
    */
  def rollback(spark: SparkSession, table: String, toVersion: Long): Long = {
    val refs = readManifest(spark, table, toVersion)._2
    val v = latestVersion(spark, table).get + 1
    writeManifest(spark, table, v, "rollback", refs)
    v
  }

  /** Read the table at `version` (default: latest). */
  def read(spark: SparkSession, table: String,
      version: Option[Long] = None): DataFrame = {
    val v = version.orElse(latestVersion(spark, table))
      .getOrElse(throw new IllegalArgumentException(s"no commits under $table"))
    val refs = readManifest(spark, table, v)._2
    val dirs = refs.map { d =>
      val p = new Path(s"$table/data/$d")
      require(fs(spark, p).exists(p),
        s"version $v references vacuumed data dir $d — time travel past retention")
      p.toString
    }
    spark.read.parquet(dirs: _*)
  }

  /** OPTIMIZE — the small-files compaction every append-heavy table
    * eventually needs: each append adds a data dir, and a snapshot
    * referencing hundreds of dirs pays per-file open cost on every
    * read. `compact` commits the latest snapshot rewritten as ONE data
    * dir of `numFiles` parquet files; history stays readable until
    * [[vacuum]] reclaims the superseded dirs. Content-identity is the
    * law: compact must be invisible to readers.
    */
  def compact(spark: SparkSession, table: String, numFiles: Int = 32): Long =
    commit(spark, table, read(spark, table).repartition(numFiles),
      overwrite = true)

  /** Erase rows matching `predicate` from the table — the
    * right-to-be-forgotten operation, which a commit-log design makes
    * SUBTLE: a plain overwrite hides the rows from the latest snapshot
    * but every older version still holds the bytes. `purge` commits a
    * new version whose data is the latest snapshot REWRITTEN without the
    * matching rows (honest cost: the referenced dirs are rewritten — at
    * scale, partition/file pruning via [[graft.ops.Layout.skipScan]]-
    * style stats bounds the rewrite to files that can contain the key),
    * and returns the new version. The bytes are GONE from disk only
    * after [[vacuum]] drops the superseded dirs — `VersionedSpec` pins
    * exactly that two-step contract by scanning the raw data dirs.
    */
  def purge(spark: SparkSession, table: String,
      predicate: org.apache.spark.sql.Column): Long = {
    val kept = read(spark, table).filter(!predicate)
    commit(spark, table, kept, overwrite = true)
  }

  /** Delete data dirs the LATEST snapshot does not reference (orphans
    * from crashed writers included). Returns the deleted dir names;
    * versions that needed them stop being readable.
    */
  def vacuum(spark: SparkSession, table: String): Seq[String] = {
    val live = latestVersion(spark, table)
      .map(v => readManifest(spark, table, v)._2.toSet).getOrElse(Set.empty)
    val dataRoot = new Path(s"$table/data")
    val f = fs(spark, dataRoot)
    if (!f.exists(dataRoot)) Seq.empty
    else f.listStatus(dataRoot).toSeq.map(_.getPath.getName)
      .filterNot(live.contains)
      .map { d => f.delete(new Path(s"$table/data/$d"), true); d }
      .sorted
  }
}
