package graft

import java.io.File

import org.apache.spark.sql.functions._

/** Bucketing — the co-located-join lever (brief: "repartition()/bucketing
  * for co-located joins"): two tables bucketed by the join key join
  * WITHOUT a shuffle on either side, and sortWithinPartitions keeps
  * partition-local order without a global exchange.
  */
class BucketingSpec extends SparkSpec {

  import spark.implicits._

  test("join of two tables bucketed on the key plans with no Exchange") {
    val db = "bucketspec"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    // Force the sort-merge path: at this toy size the planner prefers a
    // broadcast (which disables bucketed reads); at warehouse scale both
    // sides are too big to broadcast and bucketing is what kills the
    // shuffle — that is the plan this test pins.
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val left = (1 to 1000).map(i => (i.toLong, s"l$i")).toDF("k", "lv")
      val right = (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "rv")
      left.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
        .saveAsTable(s"$db.bleft")
      right.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
        .saveAsTable(s"$db.bright")
      val joined = spark.table(s"$db.bleft").join(spark.table(s"$db.bright"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      assert(joined.count() === 1000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
      ()
    }
  }

  test("sortWithinPartitions orders rows inside each partition without a global exchange") {
    val df = (1 to 1000).map(i => ((i * 7919) % 1000, i)).toDF("k", "v")
      .repartition(4, $"k" % 4)
      .sortWithinPartitions($"k")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("rangepartitioning"),
      s"partition-local sort must not add a range exchange:\n$plan")
    val sortedPerPartition = df.mapPartitions { it =>
      val ks = it.map(_.getInt(0)).toSeq
      Iterator(ks == ks.sorted)
    }.collect()
    assert(sortedPerPartition.forall(identity))
  }
}
