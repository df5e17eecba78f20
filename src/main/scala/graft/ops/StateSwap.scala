package graft.ops

import java.util.UUID

import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
import org.apache.spark.sql.SparkSession

/** Generation-pointer state directories — the ATOMIC stage-and-swap atom
  * for persisted index state (VERDICT r13 item 1).
  *
  * A rebuild that `delete(live); rename(staged, live)`s has a crash
  * window with NO readable index (and on an object store the rename
  * itself widens it); a rebuild that swaps two sibling dirs one at a
  * time can crash BETWEEN the swaps and leave a torn index whose halves
  * disagree (new token order + old prefixes ⇒ silently missed pairs in
  * [[graft.llm.IncrementalSetJoin]]). This helper removes both windows
  * with the same discipline every [[Versioned]] verb uses — stage
  * everything, then publish with ONE atomic pointer advance:
  *
  * {{{
  *   <stateDir>/GENERATION      pointer file, holds the live gen number
  *   <stateDir>/gen-<N>/<name>  the live generation's state dirs
  *   <stateDir>/gen-<N+1>/...   a rebuild in flight (invisible to readers)
  * }}}
  *
  * The pointer advances via `FileContext.rename(OVERWRITE)` — the
  * [[Versioned.ackCursor]] atom — so every observable state holds either
  * the old or the new generation, never neither and never a mix. Crash
  * BEFORE publish: the old generation stays live and fully consistent;
  * the half-staged `gen-<N+1>` is overwritten by the retry (writers use
  * `mode("overwrite")` into [[stagePath]]). Crash AFTER publish: the new
  * generation is live; the superseded dir is best-effort garbage whose
  * deletion the next publish retries. Single-writer discipline (the
  * nightly maintenance loop) is assumed, as for every frozen-index verb.
  *
  * Legacy layout (plain `<stateDir>/<name>` dirs, no pointer — state
  * written by pre-generation builds) resolves transparently: [[livePath]]
  * falls back to the plain dir until the first [[publish]] migrates the
  * state and deletes the plain dirs it replaced.
  */
object StateSwap {

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def ptr(stateDir: String) = new Path(s"$stateDir/GENERATION")

  /** Live generation number, or -1 when no pointer exists yet (fresh or
    * legacy state dir).
    */
  def currentGen(spark: SparkSession, stateDir: String): Long = {
    val p = ptr(stateDir)
    val f = fsOf(spark, p)
    if (!f.exists(p)) -1L
    else {
      val in = f.open(p)
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](64)
        var n = in.read(chunk)
        while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
        new String(buf.toByteArray, "UTF-8").trim.toLong
      } finally in.close()
    }
  }

  /** The live data dir for logical state `name`: the current generation's
    * subdir, or the legacy plain dir when no pointer exists.
    */
  def livePath(spark: SparkSession, stateDir: String, name: String): String = {
    val g = currentGen(spark, stateDir)
    if (g >= 0L) s"$stateDir/gen-$g/$name" else s"$stateDir/$name"
  }

  /** Where a rebuild stages the NEXT generation of `name`. Writers must
    * use `mode("overwrite")` so a retry heals a crashed prior staging.
    */
  def stagePath(spark: SparkSession, stateDir: String, name: String): String =
    s"$stateDir/gen-${currentGen(spark, stateDir) + 1L}/$name"

  /** Publish the staged generation: ONE atomic pointer overwrite-rename
    * (the commit point), then best-effort cleanup of the superseded
    * generation dir and any legacy plain dirs listed in `legacyNames`.
    * Returns the new live generation number.
    */
  def publish(spark: SparkSession, stateDir: String,
      legacyNames: Seq[String] = Nil): Long = {
    val prev = currentGen(spark, stateDir)
    val next = prev + 1L
    val p = ptr(stateDir)
    val f = fsOf(spark, p)
    val tmp = new Path(s"$stateDir/GENERATION.tmp-${UUID.randomUUID().toString.take(8)}")
    val out = f.create(tmp, true)
    try out.write(next.toString.getBytes("UTF-8")) finally out.close()
    val fc = FileContext.getFileContext(f.getUri,
      spark.sparkContext.hadoopConfiguration)
    fc.rename(f.makeQualified(tmp), f.makeQualified(p), Options.Rename.OVERWRITE)
    // COMMIT POINT passed — everything below is reclaimable garbage
    if (prev >= 0L)
      try f.delete(new Path(s"$stateDir/gen-$prev"), true)
      catch { case _: java.io.IOException => }
    legacyNames.foreach { n =>
      try f.delete(new Path(s"$stateDir/$n"), true)
      catch { case _: java.io.IOException => }
    }
    next
  }
}
