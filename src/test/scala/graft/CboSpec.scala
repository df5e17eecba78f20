package graft

import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}

/** Cost-based join reorder evidence: with table + column stats ANALYZEd,
  * Catalyst's CostBasedJoinReorder must rewrite a badly-ordered join
  * chain so the REDUCTIVE tiny dim joins the fact first, shrinking the
  * intermediate before the expensive big-dim join. At 100 TB the
  * syntactic order is whatever the query author typed; stats are what
  * let the engine fix it — this pins that the machinery actually fires
  * on ANALYZE'd tables (it silently no-ops when any input lacks stats).
  */
class CboSpec extends SparkSpec {

  import spark.implicits._
  import org.apache.spark.sql.functions._

  /** Leaf relation strings of the bottom-most Join (no Join below it). */
  private def bottomJoinLeaves(plan: LogicalPlan): Seq[String] = {
    val joins = plan.collect { case j: Join => j }
    val bottom = joins.filter(j =>
      j.children.forall(c => c.collect { case x: Join => x }.isEmpty))
    bottom.flatMap(_.collectLeaves().map(_.toString))
  }

  test("stats flip a bad join order: tiny reductive dim joins the fact first") {
    val db = "cbospec"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    val keys = Seq(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.cbo.joinReorder.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      spark.range(0, 200000)
        .select($"id".as("f_id"), ($"id" % 50000).as("b_k"), ($"id" % 100).as("t_k"))
        .write.mode("overwrite").saveAsTable(s"$db.fact")
      spark.range(0, 50000).select($"id".as("k"), concat(lit("b"), $"id").as("bv"))
        .write.mode("overwrite").saveAsTable(s"$db.dbig")
      // 10 of the 100 t_k values: joining tiny FIRST cuts the fact 10×.
      spark.range(0, 10).select($"id".as("k"), concat(lit("t"), $"id").as("tv"))
        .write.mode("overwrite").saveAsTable(s"$db.dtiny")
      Seq("fact", "dbig", "dtiny").foreach { t =>
        spark.sql(s"ANALYZE TABLE $db.$t COMPUTE STATISTICS")
        spark.sql(s"ANALYZE TABLE $db.$t COMPUTE STATISTICS FOR ALL COLUMNS")
      }
      // syntactic order: big dim first — the order CBO must override.
      def q = spark.sql(
        s"""SELECT f.f_id, b.bv, t.tv FROM $db.fact f
           |JOIN $db.dbig b ON f.b_k = b.k
           |JOIN $db.dtiny t ON f.t_k = t.k""".stripMargin)

      val without = bottomJoinLeaves(q.queryExecution.optimizedPlan).mkString("\n")
      assert(without.contains("dbig") && !without.contains("dtiny"),
        s"without CBO the syntactic (big-first) order must survive:\n$without")

      keys.foreach { case (k, v) => spark.conf.set(k, v) }
      val withCbo = q
      val leaves = bottomJoinLeaves(withCbo.queryExecution.optimizedPlan).mkString("\n")
      assert(leaves.contains("dtiny"),
        s"with stats + CBO the tiny reductive dim must join first:\n$leaves")
      assert(withCbo.count() == 20000L, "reorder must not change the result")
    } finally {
      prev.foreach { case (k, v) => v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
      ()
    }
  }
}
