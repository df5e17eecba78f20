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
  */
object Bench {
  private val N = 5

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.session()

    def materialize(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    val names = SparkEntry.queries.keys.toSeq.sorted
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()

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

    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    val qs = medians.map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
    val es = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val total = medians.map(_._2).sum
    println(s"""{"metric":"total_median_sec","value":$total,"unit":"sec","n_runs":$N,"queries":$qs,"errors":$es,"sf":${jstr(sfDir)}}""")
    spark.stop()
  }
}
