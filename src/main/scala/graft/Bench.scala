package graft

/** Benchmark main (driver contract): runs every SparkEntry query on
  * `SPARK_GRAFT_SF_DIR`, prints ONE JSON line.
  *
  * Procedure per BASELINE.md: one warmup pass over every query (JIT +
  * parquet footer caches), then N=5 timed runs, median reported. Each run
  * fully materializes via the `noop` sink — `count()` would let Catalyst
  * prune sorts and unreferenced aggregate columns and under-measure.
  * Failures are recorded under "errors" (not swallowed into the totals:
  * a broken query must not show up as a fast query).
  *
  * LOAD CALIBRATION: sub-second queries on a shared machine produce 2-6×
  * one-off spikes that are load artifacts, not regressions (3 adjudicated
  * in round 4, 6 in round 3). The PROBE is a pinned, sf-independent,
  * CPU-bound job (xxhash64 over a 20M range, 32 partitions) timed before
  * and after the suite; its median is the machine-speed unit of this run.
  * The JSON reports `probe_sec` and per-query `ratios` (median / probe) —
  * the regression rule in BASELINE.md compares RATIOS, which cancel
  * machine load, instead of absolute seconds.
  */
object Bench {
  private val N = 5

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.session()

    def materialize(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    // Pinned probe: fixed work, no IO, no sf dependence, nothing to
    // optimize away (xxhash64 over a non-foldable range relation).
    def probeOnce(): Double = {
      import org.apache.spark.sql.functions._
      val t0 = System.nanoTime()
      spark.range(0, 20000000L, 1, 32)
        .select(xxhash64(org.apache.spark.sql.functions.col("id")).as("h"))
        .agg(bit_xor(org.apache.spark.sql.functions.col("h"))) // xor: no ANSI overflow
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def probeRuns(): Seq[Double] = { probeOnce(); (1 to N).map(_ => probeOnce()) }

    val names = SparkEntry.queries.keys.toSeq.sorted
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val probePre = probeRuns()

    // warmup (also shakes out failures so timed runs only see good queries)
    names.foreach { n =>
      try materialize(n)
      catch { case e: Throwable =>
        errors(n) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
      }
    }

    // A query that survived warmup can still fail a timed run (OOM,
    // transient FS error); demote it to `errors` instead of letting the
    // exception destroy every other query's medians (ADVICE r2).
    val medians = names.filterNot(errors.contains).flatMap { n =>
      try {
        val times = (1 to N).map { _ =>
          val t0 = System.nanoTime()
          materialize(n)
          (System.nanoTime() - t0) / 1e9
        }.sorted
        Some(n -> times(times.length / 2))
      } catch { case e: Throwable =>
        errors(n) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
        None
      }
    }

    // Probe again AFTER the suite: the combined median reflects machine
    // speed across the whole run, not just its first seconds.
    val probePost = probeRuns()
    val allProbes = (probePre ++ probePost).sorted
    val probeMed = allProbes(allProbes.length / 2)

    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    val qs = medians.map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
    val rs = medians.map { case (k, v) =>
      s"${jstr(k)}:${"%.2f".format(v / probeMed)}" }.mkString("{", ",", "}")
    val es = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val total = medians.map(_._2).sum
    println(s"""{"metric":"total_median_sec","value":$total,"unit":"sec","n_runs":$N,"probe_sec":$probeMed,"queries":$qs,"ratios":$rs,"errors":$es,"sf":${jstr(sfDir)}}""")
    spark.stop()
  }
}
