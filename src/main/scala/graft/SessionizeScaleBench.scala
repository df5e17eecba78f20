package graft

import org.apache.spark.sql.functions._

/** Scaling evidence for the sessionize shape (COVERAGE.md "Event
  * analytics"): one shuffle on the entity key shared by both windows —
  * if that claim holds, wall time should grow LINEARLY with event count
  * at fixed user cardinality (per-key timelines grow, the shuffle and
  * sorts grow with rows, nothing quadratic or driver-bound appears).
  *
  * Synthetic events: deterministic xxhash64-derived timestamps over a
  * 30-day window for `users` users — no testdata dependence, any size.
  *
  * Usage: sbt "runMain graft.SessionizeScaleBench [rowsList=2000000,10000000,20000000] [users=20000] [runs=3]"
  * Prints one JSON line {"metric":"sessionize_scale","curve":[...]}.
  */
object SessionizeScaleBench {

  def main(args: Array[String]): Unit = {
    val rowsList = args.headOption.getOrElse("2000000,10000000,20000000")
      .split(",").map(_.trim.toLong).toSeq
    val users = args.lift(1).map(_.toLong).getOrElse(20000L)
    val runs = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = Engine.session()
    import spark.implicits._

    val curve = rowsList.map { n =>
      val events = spark.range(0, n, 1, 32)
        .select($"id".as("event_id"),
          ($"id" % users).as("user_id"),
          timestamp_micros(lit(1704067200000000L) + // 2024-01-01 UTC
            pmod(xxhash64($"id"), lit(30L * 86400 * 1000000L))).as("ts"))
      def job() = graft.ops.Sessions
        .sessionize(events, $"user_id", $"ts", $"event_id", gapSec = 1800L)
        .groupBy($"user_id", $"session_idx")
        .agg(count(lit(1)).as("n_events"), min($"ts").as("t0"))
        .write.format("noop").mode("overwrite").save()
      job() // warmup
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime(); job(); (System.nanoTime() - t0) / 1e9
      }.sorted
      val med = times(times.length / 2)
      (n, med, n / med)
    }
    val entries = curve.map { case (n, sec, rps) =>
      s"""{"rows":$n,"median_sec":$sec,"rows_per_sec":${rps.toLong}}"""
    }.mkString("[", ",", "]")
    println(s"""{"metric":"sessionize_scale","users":$users,"runs":$runs,"curve":$entries}""")
    spark.stop()
  }
}
