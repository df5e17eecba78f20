package graft

/** Plan-shape pins for the relational entries whose 100 TB story depends
  * on a specific physical plan: pushdown reaching the scan, broadcast
  * joins staying broadcast, WindowGroupLimit firing for per-group top-k,
  * column pruning, and the as-of join staying join-free. A regression
  * here (a lost filter, a join that starts shuffling) fails the suite
  * instead of waiting for a bench diff.
  *
  * Only construction-pure entries are planned (streaming/ops entries run
  * work when their DataFrame is BUILT, so they stay out of this suite).
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.executedPlan.toString
  }

  test("q1_pricing_summary: shipdate filter is pushed into the parquet scan") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("PushedFilters:") && p.contains("l_shipdate"),
      s"expected l_shipdate in PushedFilters:\n${p.take(2000)}")
  }

  test("q_minmax: column pruning — scan reads only the 3 referenced columns") {
    val p = plan("q_minmax")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_linestatus") && readSchema.contains("l_extendedprice"),
      readSchema)
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_orderkey"),
      s"unreferenced columns must be pruned from the scan: $readSchema")
    val nCols = readSchema.substring(readSchema.indexOf("struct<")).count(_ == ':')
    assert(nCols == 3, s"expected exactly 3 scanned columns, got $nCols: $readSchema")
  }

  test("q_join_broadcast_dims: dims broadcast, fact side never sort-merge-joins") {
    val p = plan("q_join_broadcast_dims")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"),
      "a hinted dim join must not degrade to sort-merge")
  }

  test("q_window_topk: per-group top-k pushes a WindowGroupLimit") {
    assert(plan("q_window_topk").contains("WindowGroupLimit"))
  }

  test("q_join_asof: the as-of join plans with NO join node at all") {
    val p = plan("q_join_asof")
    assert(!p.contains("Join"),
      s"as-of is a union + window, a join node means the rewrite regressed:\n${p.take(2000)}")
    assert(p.contains("Window"), "the carry-forward window must be present")
  }

  test("q_topn_orders: global sort+limit plans as TakeOrderedAndProject") {
    assert(plan("q_topn_orders").contains("TakeOrderedAndProject"))
  }

  test("q_sessionize: both session windows share ONE exchange on the user key") {
    // lag/sum windows + the session groupBy all hash-partition by user_id;
    // Spark must reuse the first shuffle for the rest — a second user-key
    // exchange means sessionization started paying per-window shuffles.
    val p = plan("q_sessionize")
    val exchanges = p.linesIterator.filter(_.contains("Exchange hashpartitioning"))
      .filter(_.contains("user_id")).toList
    assert(exchanges.size == 1,
      s"expected exactly 1 user_id exchange (windows must share it), got" +
        s" ${exchanges.size}:\n${exchanges.mkString("\n")}")
  }

  test("SHUFFLE_HASH hint is honored: hash join without the sort penalty") {
    // At 100 TB a fact-fact equi-join where one side fits a per-task
    // hash map is cheaper as ShuffledHashJoin than SortMergeJoin (no
    // sort of either side); Spark only picks it when hinted or when
    // stats allow. Pin that the hint survives planning — silently
    // degrading to SMJ re-introduces two O(n log n) sorts.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = spark.range(0, 10000).select($"id".as("k"), ($"id" * 2).as("va"))
      val b = spark.range(0, 1000).select($"id".as("k"), ($"id" * 3).as("vb"))
      val p = a.join(b.hint("SHUFFLE_HASH"), Seq("k"))
        .agg(count(lit(1))).queryExecution.executedPlan.toString
      assert(p.contains("ShuffledHashJoin") && !p.contains("SortMergeJoin"),
        s"SHUFFLE_HASH hint must plan a hash join:\n${p.take(2000)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q_repeated_spans: exactly two exchanges — span hash, then doc id") {
    // The repeated-span pass is TWO shuffles by design: occurrences
    // cluster once on the span md5 (corpus-wide count window), survivors
    // cluster once on doc id (both interval windows + both groupBys reuse
    // that Exchange via ClusteredDistribution-subset). A third exchange
    // means a window or groupBy stopped sharing — at 100 TB that is a
    // full extra pass over the occurrence relation.
    val p = plan("q_repeated_spans")
    val exchanges = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toList
    assert(exchanges.size == 2,
      s"expected 2 exchanges (__h, id), got ${exchanges.size}:\n${exchanges.mkString("\n")}")
  }

  test("q_join_null_safe: <=> keys stay an equi-join, never a nested loop") {
    val p = plan("q_join_null_safe")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"null-safe equality must plan as a hash/merge equi-join:\n${p.take(2000)}")
  }

  test("q_copurchase: pair join keys on the order — never a cartesian product") {
    val p = plan("q_copurchase")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"market-basket self-join must stay an equi-join on l_orderkey:\n${p.take(2000)}")
  }

  test("q_tfidf: per-doc top-k pushes a WindowGroupLimit") {
    assert(plan("q_tfidf").contains("WindowGroupLimit"))
  }

  test("q_histogram: scan reads only the bucketed column") {
    val p = plan("q_histogram")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_extendedprice") && !readSchema.contains("l_orderkey"),
      s"only l_extendedprice should be scanned: $readSchema")
  }

  test("q_dpp: the fact scan carries a DynamicPruningExpression partition filter") {
    // The claimed "free Catalyst win" (SURVEY §4) made real: the month
    // partitions to scan are only known after the dim's (yr, qtr) filter
    // runs, so the fact scan's PartitionFilters must hold a dynamic
    // pruning subquery — without it, a 100 TB partitioned fact is read
    // in full for a 3-partition query.
    val p = plan("q_dpp")
    val factScan = p.linesIterator
      .find(l => l.contains("FileScan") && l.contains("graft_dpp"))
      .getOrElse(fail(s"fact scan not found:\n$p"))
    assert(factScan.contains("dynamicpruning"),
      s"fact scan must be dynamically pruned on o_month:\n$factScan")
  }

  test("runtime bloom filter: selective dim filter injects might_contain on the fact side") {
    // q_runtime_filter executes eagerly inside its closure (so the
    // hashed result runs through the filtered plan), which keeps it out
    // of plan(); this pin rebuilds the same join under the same confs
    // and asserts the injection at the suite level. Without it, a
    // fact-fact join whose dim side carries a selective filter shuffles
    // 100% of the fact rows at 100 TB instead of ~3%.
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val prev = keys.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set(keys(0), "true")
      spark.conf.set(keys(1), "0")
      spark.conf.set(keys(2), "64MB")
      spark.conf.set(keys(3), "-1")
      import spark.implicits._
      val dim = Tables(spark, dir, "part").filter($"p_size" === 1).select($"p_partkey")
      val fact = Tables(spark, dir, "lineitem")
        .select($"l_partkey", $"l_quantity")
      val joined = fact.join(dim, $"l_partkey" === $"p_partkey")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
      val opt = joined.queryExecution.optimizedPlan.toString
      assert(opt.contains("might_contain"),
        s"expected a runtime bloom filter on the fact side:\n${opt.take(2000)}")
    } finally prev.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("q_profile_stats: two scans (stats + distincts), never an Expand") {
    // The profile is exactly two passes: a wide no-distinct agg and a
    // stack-unpivoted single count_distinct. A per-column loop would show
    // 6 scans; the one-agg multi-distinct form would show an Expand whose
    // full row-multiple hits the shuffle (measured 12x at sf0.1).
    val p = plan("q_profile_stats")
    val scans = p.linesIterator.filter(_.contains("FileScan parquet")).toList
    assert(scans.size == 2,
      s"expected exactly 2 lineitem scans, got ${scans.size}:\n${scans.mkString("\n")}")
    assert(!p.contains("Expand"),
      "multi-distinct Expand regression — distincts must go through the unpivot")
  }
}
