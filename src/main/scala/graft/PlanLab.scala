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

    df.write.format("noop").mode("overwrite").save() // warmup
    (1 to runs).foreach { i =>
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"PLANLAB $name run$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
