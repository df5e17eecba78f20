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

  private def skewedFact = spark.range(0, 100000).select(
    when($"id" % 10 < 9, lit(1L)).otherwise($"id" % 500).as("k"),
    ($"id" * 3).as("v"))

  private def bigDim = spark.range(0, 500).select(
    $"id".as("k"), concat(lit("d"), $"id").as("attr"))

  private def canon(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, String)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1),
      if (r.isNullAt(2)) "" else r.getString(2))).toSet

  test("saltedJoinHot: inner and left equal plain joins; only hot keys detected") {
    val plainInner = skewedFact.join(bigDim, Seq("k"), "inner")
    val (saltedInner, hot) = Skew.saltedJoinHot(skewedFact, bigDim, "k",
      joinType = "inner", salt = 8, hotThreshold = 10000L)
    assert(hot == Seq(1L), s"key 1 holds 90% of the fact, got hot=$hot")
    assert(canon(saltedInner.select($"k", $"v", $"attr")) ==
      canon(plainInner.select($"k", $"v", $"attr")))
    // left join: fact keys missing from the dim survive exactly once
    val factWithMiss = skewedFact.unionByName(
      Seq((9999L, 1L), (9999L, 2L)).toDF("k", "v"))
    val plainLeft = factWithMiss.join(bigDim, Seq("k"), "left")
    val (saltedLeft, _) = Skew.saltedJoinHot(factWithMiss, bigDim, "k",
      joinType = "left", salt = 8, hotThreshold = 10000L)
    assert(canon(saltedLeft.select($"k", $"v", $"attr")) ==
      canon(plainLeft.select($"k", $"v", $"attr")))
    // dim-side duplicates multiply identically
    val dupDim = bigDim.unionByName(bigDim.filter($"k" === 1L))
    val plainDup = skewedFact.join(dupDim, Seq("k"), "inner").count()
    val (saltedDup, _) = Skew.saltedJoinHot(skewedFact, dupDim, "k",
      joinType = "inner", salt = 4, hotThreshold = 10000L)
    assert(saltedDup.count() == plainDup)
  }

  test("saltedJoinHot spreads the hot key across shuffle partitions") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force a SHUFFLE join (broadcast would sidestep skew entirely —
    // the scenario is a dim too big to broadcast) and freeze the
    // partitioning so per-partition row counts are observable
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      def partMax(df: org.apache.spark.sql.DataFrame): Long =
        df.withColumn("p", spark_partition_id()).groupBy($"p")
          .count().agg(max($"count")).head().getLong(0)
      val plain = partMax(skewedFact.join(bigDim, Seq("k"), "inner"))
      val (salted, _) = Skew.saltedJoinHot(skewedFact, bigDim, "k",
        joinType = "inner", salt = 16, hotThreshold = 10000L)
      val saltedMax = partMax(salted)
      assert(saltedMax * 2 < plain,
        s"salting must break the hot partition: salted max $saltedMax vs plain $plain")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prev)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }

  test("saltedJoinHot: no hot keys → plain join; loud refusal on outer dim sides") {
    val uniform = spark.range(0, 5000).select(($"id" % 500).as("k"), $"id".as("v"))
    val (j, hot) = Skew.saltedJoinHot(uniform, bigDim, "k", salt = 8,
      hotThreshold = 1000L)
    assert(hot.isEmpty && j.count() == uniform.join(bigDim, Seq("k")).count())
    val e = intercept[IllegalArgumentException] {
      Skew.saltedJoinHot(uniform, bigDim, "k", joinType = "full")
    }
    assert(e.getMessage.contains("inner/left"))
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
