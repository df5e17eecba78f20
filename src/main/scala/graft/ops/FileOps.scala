package graft.ops

import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Filesystem dataflow operators (A6/A7/A8/A12) over Hadoop `FileSystem`,
  * the engine's replacement for the reference's blob-service calls. Works
  * against any Hadoop-compatible FS (local, HDFS, cloud connectors) — path
  * = dataset identity, as in SURVEY §1.1.
  */
object FileOps {

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Bounded linear retry policy — the engine analog of the reference's
    * blob IO hardening (`LinearRetry` at
    * `/root/reference/adffunction/__init__.py:76`): a FIXED pause between
    * attempts, not exponential, matching the reference's policy choice.
    * The reference's other half, the 15 s per-blob timeout
    * (`HelperFunction.py:66`), has no call-site analog on Hadoop
    * `FileSystem` — per-operation deadlines live in the connector config
    * (e.g. `fs.s3a.connection.timeout`), which is where a deployment
    * should set them.
    */
  final case class RetryPolicy(attempts: Int, backoffMs: Long) {
    require(attempts >= 1, s"attempts must be >= 1: $attempts")
  }
  val NoRetry: RetryPolicy = RetryPolicy(1, 0L)
  val LinearRetry: RetryPolicy = RetryPolicy(3, 1000L)

  /** Run `op` under `policy`, retrying only failures `retryOn` deems
    * transient (IO errors by default — a permission error or a logic bug
    * must fail immediately). The final failure propagates: a retry
    * wrapper must never convert persistent failure into silence.
    * `sleep` is injectable so specs can fault-inject between attempts
    * without waiting out real backoffs.
    */
  def withRetry[T](policy: RetryPolicy,
      retryOn: Throwable => Boolean = _.isInstanceOf[java.io.IOException],
      sleep: Long => Unit = Thread.sleep)(op: => T): T = {
    var attempt = 1
    while (true) {
      try return op
      catch {
        case e if attempt < policy.attempts && retryOn(e) =>
          sleep(policy.backoffMs)
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** A6: file-listing scan with the reference's filters
    * (`/root/reference/adffunction/__init__.py:97-101`): skip
    * `placeholder.txt`, keep `*.xls*` case-insensitively — expressed as
    * Column predicates over a listing DataFrame so downstream code can add
    * glob-style filters freely.
    */
  def listFiles(spark: SparkSession, dir: String): DataFrame = {
    val p = new Path(dir)
    val entries = fs(spark, p).listStatus(p).toSeq.map { st =>
      (st.getPath.toString, st.getPath.getName, st.getLen, st.isDirectory)
    }
    spark.createDataFrame(entries).toDF("path", "name", "size", "is_dir")
  }

  /** The reference's EP1 blob filters as a reusable predicate. */
  def excelInputFilter(name: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    name =!= "placeholder.txt" && lower(name).rlike("\\.xls")

  /** A7: archive move with timestamp rename — batch equivalent of
    * `copy_azure_files` (`HelperFunction.py:51-60`): move `<dir>/<file>`
    * to `<archiveRoot>/<dir-name>/_<yyyyMMddHHmm>/<file>`. (Streaming gets
    * the same semantics from the file source's `cleanSource=archive`,
    * see graft.streaming.) Returns the destination path.
    */
  def archiveMove(spark: SparkSession, file: String, archiveRoot: String,
      now: LocalDateTime = LocalDateTime.now(),
      retry: RetryPolicy = NoRetry): String = {
    val stamp = now.format(DateTimeFormatter.ofPattern("yyyyMMddHHmm"))
    val src = new Path(file)
    val dest = new Path(s"$archiveRoot/${src.getParent.getName}/_$stamp/${src.getName}")
    val f = fs(spark, src)
    withRetry(retry) {
      f.mkdirs(dest.getParent)
      if (!f.rename(src, dest))
        throw new java.io.IOException(s"Error - archive move failed: $file -> $dest")
    }
    dest.toString
  }

  /** A8: delete everything under a prefix — `delete_azure_files_in_container`
    * (`HelperFunction.py:87-91`), guarded so a bare root cannot be wiped.
    */
  def deletePrefix(spark: SparkSession, dir: String,
      retry: RetryPolicy = NoRetry): Boolean = {
    val p = new Path(dir)
    require(p.depth() >= 2, s"Error - refusing to prefix-delete near-root path $dir")
    withRetry(retry)(fs(spark, p).delete(p, true))
  }

  /** A12: work-dir reset (`__init__.py:43-48`) — recreate empty dirs. */
  def resetWorkDirs(spark: SparkSession, dirs: Seq[String]): Unit =
    dirs.foreach { d =>
      val p = new Path(d)
      val f = fs(spark, p)
      if (f.exists(p)) f.delete(p, true)
      f.mkdirs(p)
    }
}
