package graft

import graft.ops.Versioned
import org.apache.spark.sql.functions._

/** Bucketed single-table aggregation (VERDICT r16 item 4): `GROUP BY k`
  * on a `bucket(n, k)` graft table plans the bucket-aligned scan and
  * delegates to AggUtils through the graftshim seam — zero Exchange,
  * results identical to the vanilla Exchange-bearing plan.
  */
class BucketedAggSpec extends SparkSpec {
  import spark.implicits._

  private def mkBucketed(path: String, rows: Int, n: Int): Unit =
    Versioned.commitPartitioned(spark, path,
      spark.range(1, rows + 1)
        .select(($"id" % 500).as("k"), ($"id" * 3).as("v"),
          ($"id" % 7).as("g")),
      Seq(s"bucket:$n:k"))

  private def rel(p: String) =
    spark.read.format("graft-table").option("path", p).load()

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("GROUP BY the bucket key: bucket-aligned scan, two-phase agg, zero Exchange, vanilla-equal") {
    val t = tmpDir("bagg") + "/t"
    mkBucketed(t, 5000, 8)
    val fast = rel(t).groupBy($"k")
      .agg(count(lit(1)).as("n"), sum($"v").as("sv"), max($"g").as("mg"))
    val plan = planOf(fast)
    assert(plan.contains("GraftBucketedScan"),
      s"the bucketed-agg strategy must fire:\n$plan")
    assert(plan.contains("HashAggregate"), s"two-phase agg expected:\n$plan")
    assert(!plan.contains("Exchange"),
      s"GROUP BY the bucket key must pay ZERO Exchange:\n$plan")
    val got = fast.agg(count(lit(1)), sum($"k"), sum($"n"), sum($"sv"),
      sum($"mg")).head()
    spark.conf.set("spark.graft.bucketedAgg.enabled", "false")
    try {
      val vanilla = rel(t).groupBy($"k")
        .agg(count(lit(1)).as("n"), sum($"v").as("sv"), max($"g").as("mg"))
      assert(!planOf(vanilla).contains("GraftBucketedScan"),
        "the kill switch must disable the strategy")
      val want = vanilla.agg(count(lit(1)), sum($"k"), sum($"n"), sum($"sv"),
        sum($"mg")).head()
      assert(got == want, s"bucketed and vanilla aggs must agree: $got vs $want")
    } finally spark.conf.set("spark.graft.bucketedAgg.enabled", "true")
  }

  test("grouping supersets of the bucket key and filtered scans stay Exchange-free") {
    val t = tmpDir("bagg-super") + "/t"
    mkBucketed(t, 4000, 8)
    // (k, g) superset: same-key rows still colocate, HashPartitioning(k)
    // satisfies ClusteredDistribution(k, g)
    val sup = rel(t).groupBy($"k", $"g").agg(sum($"v").as("sv"))
    val psup = planOf(sup)
    assert(psup.contains("GraftBucketedScan") && !psup.contains("Exchange"),
      s"superset grouping must stay Exchange-free:\n$psup")
    // a WHERE clause rides as FilterExec over the scan
    val fil = rel(t).filter($"v" % 2L === 0L).groupBy($"k")
      .agg(count(lit(1)).as("n"))
    val pfil = planOf(fil)
    assert(pfil.contains("GraftBucketedScan") && !pfil.contains("Exchange"),
      s"filtered GROUP BY k must stay Exchange-free:\n$pfil")
    spark.conf.set("spark.graft.bucketedAgg.enabled", "false")
    try {
      val wantSup = rel(t).groupBy($"k", $"g").agg(sum($"v").as("sv"))
        .agg(count(lit(1)), sum($"sv")).head()
      val wantFil = rel(t).filter($"v" % 2L === 0L).groupBy($"k")
        .agg(count(lit(1)).as("n")).agg(count(lit(1)), sum($"n")).head()
      spark.conf.set("spark.graft.bucketedAgg.enabled", "true")
      assert(sup.agg(count(lit(1)), sum($"sv")).head() == wantSup)
      assert(fil.agg(count(lit(1)), sum($"n")).head() == wantFil)
    } finally spark.conf.set("spark.graft.bucketedAgg.enabled", "true")
  }

  test("declines: DISTINCT aggregates, non-key grouping, rollup, dv-bearing tables") {
    val t = tmpDir("bagg-decline") + "/t"
    mkBucketed(t, 3000, 8)
    // DISTINCT needs its own mid-query distribution — vanilla plans it
    val dist = rel(t).groupBy($"k").agg(countDistinct($"v").as("nd"))
    assert(!planOf(dist).contains("GraftBucketedScan"),
      "DISTINCT aggregate must decline")
    assert(dist.agg(sum($"nd")).head().getLong(0) == 3000L)
    // grouping that lacks the bucket key: one group spans buckets
    val nonKey = rel(t).groupBy($"g").agg(count(lit(1)).as("n"))
    assert(!planOf(nonKey).contains("GraftBucketedScan"),
      "non-key grouping must decline")
    assert(nonKey.count() == 7L)
    // rollup's Expand sits between aggregate and relation
    val ru = rel(t).rollup($"k").agg(count(lit(1)).as("n"))
    assert(!planOf(ru).contains("GraftBucketedScan"), "rollup must decline")
    // a dv-bearing table: MoR subtraction owns that scan
    val td = tmpDir("bagg-dv") + "/t"
    mkBucketed(td, 3000, 8)
    Versioned.deleteWhere(spark, td, $"v" === 9L)
    val dv = rel(td).groupBy($"k").agg(count(lit(1)).as("n"))
    assert(!planOf(dv).contains("GraftBucketedScan"),
      "dv-bearing table must decline")
    assert(dv.agg(sum($"n")).head().getLong(0) == 2999L)
  }
}
