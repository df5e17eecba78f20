package graft

import graft.ops.Skew
import org.apache.spark.sql.functions._

/** Salted skew join: result-identical to the plain join, and the salt
  * actually spreads a hot key across buckets.
  */
class SkewSpec extends SparkSpec {

  import spark.implicits._

  test("saltedJoin equals the plain inner join, including duplicate rows") {
    // hot key 1 dominates; duplicates present on both sides of the data
    val big = (Seq.fill(500)((1L, "a")) ++ Seq((2L, "b"), (2L, "b"), (3L, "c")))
      .toDF("k", "payload")
    val dim = Seq((1L, "one"), (2L, "two"), (4L, "four")).toDF("k", "name")
    val salted = Skew.saltedJoin(big, dim, "k", 8)
      .groupBy($"k", $"payload", $"name").count()
    val plain = big.join(dim, Seq("k"))
      .groupBy($"k", $"payload", $"name").count()
    assert(salted.except(plain).count() === 0)
    assert(plain.except(salted).count() === 0)
  }

  test("a hot key's rows land in multiple salt buckets") {
    val big = (1 to 1000).map(i => (1L, s"row$i")).toDF("k", "payload")
    val buckets = big
      .withColumn("__salt", pmod(xxhash64(big.columns.map(col): _*), lit(8L)).cast("int"))
      .select("__salt").distinct().count()
    assert(buckets > 4, s"expected the hot key spread over >4 of 8 buckets, got $buckets")
  }

  test("AQE splits the hot partition of a skewed sort-merge join at runtime") {
    // The OTHER half of the skew story (Skew.saltedJoin's scaladoc):
    // when the skewed join IS a plain sort-merge join, Engine.builder's
    // `spark.sql.adaptive.skewJoin.enabled` must handle the hot key with
    // no manual rewrite. One key carries half the fact rows (~15 MB of
    // payload vs a 64 KB skew threshold scoped to this test); after
    // execution the final adaptive plan must show the skew split
    // (`skew=true` on the SMJ), proving the runtime re-plan fires — at
    // 100 TB this is the difference between one straggler task holding
    // the stage for hours and N bounded splits.
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB")
    val prev = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      keys.foreach { case (k, v) => spark.conf.set(k, v) }
      val big = spark.range(0, 300000).select(
        when($"id" % 10 > 0, 1L).otherwise($"id").as("k"),
        lpad($"id".cast("string"), 100, "x").as("payload"))
      val dim = spark.range(0, 1000).select($"id".as("k"),
        concat(lit("d"), $"id").as("name"))
      val j = big.join(dim, Seq("k"))
        .agg(count(lit(1)).as("n"), sum(length($"payload")).as("bytes"))
      val row = j.collect()(0)
      // 270000 rows (id%10>0) collapse onto k=1 (matches dim key 1) plus
      // the 100 multiples of 10 below 1000 matching their own dim key.
      assert(row.getLong(0) == 270100L,
        s"join result wrong under skew split: ${row.getLong(0)}")
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE to mark the SMJ skew=true in the final plan:\n${plan.take(3000)}")
    } finally prev.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }
}
