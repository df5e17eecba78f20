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

  test("bucketed upsert: the target side never shuffles and the table stays bucketed") {
    val db = "bucketup"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      (1 to 20000).map(i => (i.toLong, s"t$i", i * 1.0)).toDF("k", "s", "v")
        .write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable(s"$db.t")
      val source = (19001 to 21000).map(i => (i.toLong, s"n$i", i * 2.0)).toDF("k", "s", "v")
      // Plan evidence for the Upsert scaladoc claim: the merge's anti-join
      // takes the bucketed target WITHOUT an Exchange — the only exchanges
      // are the source's window dedup and the source keys side of the
      // anti-join (shuffled to the target's 8 buckets).
      val merged = graft.ops.Upsert.merge(spark.table(s"$db.t"), source, Seq("k"))
      val plan = merged.queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"),
        s"target scan must use the bucketed layout:\n$plan")
      // structural check: the bucketed target scan feeds the anti-join
      // through a bucket-local Sort — its parent chain holds no Exchange
      val lines = plan.linesIterator.toVector
      val scanIdx = lines.indexWhere(l => l.contains("FileScan") && l.contains("Bucketed: true"))
      assert(scanIdx > 1, s"bucketed scan not found:\n$plan")
      assert(lines(scanIdx - 1).contains("Sort") && !lines(scanIdx - 1).contains("Exchange"),
        s"bucketed target must reach the join without an Exchange:\n$plan")
      // and every Exchange in the plan is on the SOURCE: the window dedup
      // subtree (planned twice — both union branches reference it) plus
      // the anti-join's distinct-keys side; the 20k-row target contributes
      // none. hashpartitioning is only ever over source attribute ids.
      val exchanges = "Exchange".r.findAllMatchIn(plan).length
      assert(exchanges == 3,
        s"expected exactly the 3 source-side exchanges, got $exchanges:\n$plan")
      // End-to-end through the staged ALTER-RENAME swap.
      graft.ops.Upsert.runBucketed(spark, s"$db.t", source, Seq("k"), numBuckets = 8)
      val after = spark.table(s"$db.t")
      assert(after.count() === 21000)
      assert(after.filter($"k" === 19500L).select($"s").head().getString(0) === "n19500",
        "overlapping key must take the source row")
      assert(after.filter($"k" === 100L).select($"s").head().getString(0) === "t100",
        "untouched target row must survive")
      // The rewritten table must still be bucketed, so the NEXT upsert's
      // target side is also shuffle-free — bucketing survives the swap.
      val again = graft.ops.Upsert.merge(spark.table(s"$db.t"), source, Seq("k"))
      assert(again.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        .contains("Bucketed: true"), "bucketing must survive the table swap")
      // no staging/old tables left behind
      assert(!spark.catalog.tableExists(s"$db.t_staging"))
      assert(!spark.catalog.tableExists(s"$db.t_old"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
      ()
    }
  }

  test("CDC apply onto a bucketed target: the target reaches the anti-join with no Exchange") {
    // The exact transform cdcApplyStreamBucketed runs per micro-batch
    // (foreachBatch → Cdc.apply over spark.table(bucketed target)): the
    // plan-level proof that the streaming silver-layer loop never
    // shuffles the big side — the batch upsert's pin, extended to the
    // stream path's transform.
    val db = "bucketcdc"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      (1 to 20000).map(i => (i.toLong, s"t$i", i * 1.0)).toDF("k", "st", "pr")
        .write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable(s"$db.t")
      val feed = (19001 to 21000).map(i =>
        (i.toLong, s"n$i", i * 2.0, 1L, if (i % 5 == 0) "D" else "U"))
        .toDF("k", "st", "pr", "v", "op")
      val next = graft.ops.Cdc.apply(spark.table(s"$db.t"), feed,
        Seq("k"), "v", "op")
      val plan = next.queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"),
        s"target scan must use the bucketed layout:\n$plan")
      val lines = plan.linesIterator.toVector
      val scanIdx = lines.indexWhere(l => l.contains("FileScan") && l.contains("Bucketed: true"))
      assert(scanIdx > 1, s"bucketed scan not found:\n$plan")
      assert(!lines(scanIdx - 1).contains("Exchange"),
        s"bucketed target must reach the CDC anti-join without an Exchange:\n$plan")
      // end-to-end through the generalized bucketed swap — the stream
      // loop's exact write path
      graft.ops.Upsert.transformAndSwapBucketed(spark, s"$db.t", Seq("k"), 8)(t =>
        graft.ops.Cdc.apply(t, feed, Seq("k"), "v", "op"))
      val after = spark.table(s"$db.t")
      // deletes applied, inserts landed, untouched rows intact
      assert(after.filter($"k" === 19005L).count() === 0, "delete must land")
      assert(after.filter($"k" === 20001L).count() === 1, "insert must land")
      assert(after.filter($"k" === 100L).count() === 1)
      // and the table is STILL bucketed — the next batch is shuffle-free too
      val again = graft.ops.Cdc.apply(spark.table(s"$db.t"), feed, Seq("k"), "v", "op")
      assert(again.queryExecution.executedPlan.toString.contains("Bucketed: true"),
        "bucketing must survive the swap so every later batch stays shuffle-free")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
      ()
    }
  }

  test("bucketed upsert: recoverTable heals a crash inside the rename window") {
    val db = "bucketrec"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    try {
      (1 to 100).map(i => (i.toLong, s"t$i")).toDF("k", "s")
        .write.bucketBy(4, "k").saveAsTable(s"$db.t")
      // simulate the crash window: target staged out, staging never renamed
      spark.sql(s"ALTER TABLE $db.t RENAME TO $db.t_old")
      graft.ops.Upsert.recoverTable(spark, s"$db.t")
      assert(spark.catalog.tableExists(s"$db.t"))
      assert(!spark.catalog.tableExists(s"$db.t_old"))
      assert(spark.table(s"$db.t").count() === 100)
    } finally { spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE"); () }
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
