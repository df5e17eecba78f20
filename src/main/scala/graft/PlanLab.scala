package graft

/** Plan/perf lab (dev tool, not part of the driver contract): runs ONE
  * named SparkEntry query, prints per-run wall time and the formatted
  * physical plan so a hot query can be iterated on without paying for the
  * whole Bench suite.
  *
  * Usage: runMain graft.PlanLab <query> [sfDir] [runs] [--explain]
  */
object PlanLab {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    def isRuns(a: String) = a.nonEmpty && a.forall(_.isDigit)
    val positional = args.drop(1).filterNot(_.startsWith("--"))
    val sfDir = positional.find(a => !isRuns(a)).getOrElse("/root/testdata/sf0.1")
    val runs = positional.find(isRuns).map(_.toInt).getOrElse(3)
    val spark = Engine.session()

    def df = SparkEntry.queries(name)(spark, sfDir)
    if (args.contains("--explain")) df.explain("formatted")

    // --jobs: count Spark jobs per run — the job-count audit for
    // protocol-heavy entries (driver-side per-job overhead is what
    // multiplies under suite pressure, so fewer jobs = less exposure).
    // --trace additionally prints each job's callsite + description so
    // the count decomposes into named per-verb passes (optimization-
    // round diagnostic: WHICH pass pays the 80 jobs).
    val jobCount = new java.util.concurrent.atomic.AtomicLong(0L)
    if (args.contains("--jobs") || args.contains("--trace"))
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(
              js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            val n = jobCount.incrementAndGet()
            if (args.contains("--trace")) {
              val site = js.stageInfos.lastOption.map(_.name).getOrElse("")
              val tasks = js.stageInfos.map(_.numTasks).sum
              println(f"JOBTRACE #$n%-4d tasks=$tasks%-5d $site")
            }
          }
        })

    df.write.format("noop").mode("overwrite").save() // warmup
    (1 to runs).foreach { i =>
      val j0 = jobCount.get()
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      val jobs = if (args.contains("--jobs")) s" jobs=${jobCount.get() - j0}" else ""
      println(f"PLANLAB $name run$i $dt%.3f s$jobs")
    }
    spark.stop()
  }
}
