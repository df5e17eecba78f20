package graft

import org.apache.spark.sql.functions._

/** COMMIT-LOG scale evidence (VERDICT r12 item 8): LayoutSpec pins 50k
  * FILES in one manifest; this pins a long HISTORY — the O(commits)
  * metadata walks that bite first at a million commits. A synthetic
  * table takes `n` tiny commits (the streaming-sink shape: many small
  * appends), then every protocol read that could secretly walk the
  * whole log is timed:
  *
  *  - `latestVersion` WITH the `_head` hint (must be O(1 + gap): one
  *    hint read + forward exists() probes) vs with the hint DELETED
  *    (the full-listing fallback — O(commits), the pre-hint cost the
  *    hint exists to avoid);
  *  - `readManifest(head)` — O(refs of that one manifest), never
  *    O(commits); ref count grows with appends until OPTIMIZE folds it,
  *    which the bench also demonstrates (post-compact manifest is
  *    O(numFiles));
  *  - `changesSince` from a cursor 5 behind head — O(drained × churn),
  *    never O(history); the full drain from 0 is the linear anchor it
  *    is compared against;
  *  - `versionAsOf` (timestamp resolution) — O(log commits) manifest
  *    probes on tsm-marked logs (the write-time clamp, r14; `ts_probes`
  *    records the count), with the linear walk kept as the legacy-log
  *    fallback;
  *  - `vacuum(retainLast=5)` — O(retained manifests + data dirs),
  *    never O(commits).
  *
  * Usage (one size per invocation — fresh JVM per curve point):
  *   sbt "runMain graft.LogScaleBench [commits=1000] [probeRuns=20]"
  * Prints one JSON line {"metric":"log_scale",...} with per-op seconds.
  */
object LogScaleBench {

  private def time[T](body: => T): (Double, T) = {
    val t0 = System.nanoTime()
    val r = body
    ((System.nanoTime() - t0) / 1e9, r)
  }

  private def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000)
    val probeRuns = args.lift(1).map(_.toInt).getOrElse(20)
    val spark = Engine.session()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.ops.Versioned

    val t = sys.props("java.io.tmpdir") +
      s"/graft_logscale_${ProcessHandle.current().pid()}/t"
    graft.ops.FileOps.resetWorkDirs(spark, Seq(t))

    // the streaming-sink shape: n tiny appends
    val (buildSec, _) = time {
      (1 to n).foreach { i =>
        Versioned.commit(spark, t, Seq((i.toLong, s"r$i")).toDF("id", "s"))
      }
    }
    val head = Versioned.latestVersion(spark, t).get
    require(head == n.toLong, s"expected $n commits, got $head")

    def probes(body: => Any): Double =
      med((1 to probeRuns).map(_ => time(body)._1))

    val headHinted = probes(Versioned.latestVersion(spark, t))
    // delete the hint: the full-listing fallback is the cost the hint
    // exists to avoid
    val hintPath = new org.apache.hadoop.fs.Path(s"$t/_commits/_head")
    val hfs = hintPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hintBytes = {
      val in = hfs.open(hintPath)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    }
    hfs.delete(hintPath, false)
    val headListed = probes(Versioned.latestVersion(spark, t))
    val out = hfs.create(hintPath, true)
    try out.write(hintBytes.getBytes("UTF-8")) finally out.close()

    val manifestHead = probes(Versioned.readManifest(spark, t, head))
    // mid-history resolution forces a real bisection (head/first-commit
    // stamps short-circuit); tsm logs must answer in O(log n) manifest
    // probes — the probe COUNT is the evidence, the seconds the bonus
    val tss = Versioned.commitTimestamps(spark, t)
    val midStamp = tss(tss.size / 2)._2
    val tsResolve = probes(Versioned.versionAsOf(spark, t, midStamp))
    val tsProbesUsed = Versioned.lastTsProbes.get()

    // CDF drains: near-head cursor (the live-replica cadence) vs a
    // 100-version linear anchor — drain cost must scale with DRAINED
    // versions, never history (the per-version constant is the
    // protocol-planning cost q_cdf_replica tracks)
    val cursor = s"$t/_cursor_bench"
    Versioned.ackCursor(spark, cursor, head - 5)
    val (drain5Sec, drained5) = time {
      val (df, v) = Versioned.changesSince(spark, t, cursor).get
      (df.count(), v)
    }
    val anchorN = math.min(n - 1, 100).toLong
    val cursor100 = s"$t/_cursor_bench100"
    Versioned.ackCursor(spark, cursor100, head - anchorN)
    val (drain100Sec, drained100) = time {
      val (df, v) = Versioned.changesSince(spark, t, cursor100).get
      (df.count(), v)
    }

    // OPTIMIZE folds the O(appends) ref growth back to O(numFiles);
    // vacuum AFTER it (retain 1) sweeps every superseded append dir —
    // an append-only history has nothing sweepable before the fold
    val refsBefore = Versioned.readManifest(spark, t, head).refs.size
    val (optimizeSec, _) = time(Versioned.compact(spark, t, numFiles = 4))
    val refsAfter =
      Versioned.readManifest(spark, t, head + 1).refs.size
    val manifestCompact = probes(Versioned.readManifest(spark, t, head + 1))
    val (vacuumSec, swept) = time(Versioned.vacuum(spark, t, retainLast = 1))

    val line =
      f"""{"metric":"log_scale","commits":$n,"build_sec":$buildSec%.1f,""" +
      f""""head_hinted_sec":$headHinted%.5f,"head_listed_sec":$headListed%.5f,""" +
      f""""manifest_head_sec":$manifestHead%.5f,"manifest_compact_sec":$manifestCompact%.5f,""" +
      f""""ts_resolve_sec":$tsResolve%.4f,"ts_probes":$tsProbesUsed,""" +
      f""""drain5_sec":$drain5Sec%.2f,"drain5_rows":${drained5._1},""" +
      f""""drain100_sec":$drain100Sec%.2f,"drain100_rows":${drained100._1},""" +
      f""""vacuum_sec":$vacuumSec%.2f,"vacuum_swept":${swept.size},""" +
      f""""optimize_sec":$optimizeSec%.2f,"refs_before":$refsBefore,"refs_after":$refsAfter}"""
    spark.stop()
    val raw = new java.io.PrintStream(
      new java.io.FileOutputStream(java.io.FileDescriptor.out), true, "UTF-8")
    raw.println(line)
    raw.flush()
  }
}
