package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Aggregation surface (SURVEY.md §2 Tier C "Aggregations").
  *
  * Oracle-stability design: every floating-point aggregate is routed
  * through an exact `decimal` cast before SUM so the result is independent
  * of partial-aggregation order (Spark) vs single-threaded order (DuckDB).
  * All monetary/measure columns in the testdata carry <= 2 decimal digits,
  * so decimal(30,2)/(30,4)/(30,6) casts are lossless; precision 30 leaves
  * headroom so sums at sf0.1+ (and far beyond) cannot overflow 18 digits.
  * Final values are cast back to double (exact, both engines pick the
  * nearest double).
  */
object AggQueries extends graft.QueryModule {

  private def dsum(c: Column, scale: Int): Column =
    sum(c.cast(s"decimal(30,$scale)")).cast("double")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1-style pricing summary: scan -> filter -> partial+final agg
    // -> sort. Filter pushes to the parquet scan; aggregation is
    // map-side-partial then final (Catalyst does this automatically).
    "q1_pricing_summary" -> ((s, dir) => {
      import s.implicits._
      Tables(s, dir, "lineitem")
        .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          dsum($"l_quantity", 2).as("sum_qty"),
          dsum($"l_extendedprice", 2).as("sum_base_price"),
          dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4).as("sum_disc_price"),
          dsum($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax"), 6).as("sum_charge"),
          (dsum($"l_quantity", 2) / count(lit(1))).as("avg_qty"),
          (dsum($"l_extendedprice", 2) / count(lit(1))).as("avg_price"),
          (dsum($"l_discount", 2) / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }),

    // count(distinct) + plain counts per group.
    // NULL-semantics note (ADVICE r1): Spark's countDistinct(a, b) skips
    // rows where ANY column is null; DuckDB's COUNT(DISTINCT (a, b))
    // counts a struct with a null field. The testdata keys are non-null so
    // the two agree here; on nullable columns, add IS NOT NULL filters to
    // both sides before relying on multi-column distinct.
    "q_count_distinct" -> ((s, dir) => {
      import s.implicits._
      Tables(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          countDistinct($"l_partkey").as("n_parts"),
          countDistinct($"l_suppkey", $"l_partkey").as("n_supp_part"),
          count(lit(1)).as("n_rows"))
        .orderBy($"l_returnflag")
    }),

    // string_agg parity (SURVEY B1): deterministic via sort_array before
    // concat_ws — collect_list order is nondeterministic post-shuffle.
    "q_string_agg" -> ((s, dir) => {
      import s.implicits._
      Tables(s, dir, "nation")
        .groupBy($"n_regionkey")
        .agg(concat_ws(",", sort_array(collect_list($"n_name"))).as("nations"),
          count(lit(1)).as("n"))
        .orderBy($"n_regionkey")
    }),

    // ROLLUP over two group keys with exact decimal sums.
    "q_rollup" -> ((s, dir) => {
      import s.implicits._
      Tables(s, dir, "lineitem")
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(dsum($"l_quantity", 2).as("sum_qty"), count(lit(1)).as("n"))
        .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
    }),

    // CUBE over two group keys.
    "q_cube" -> ((s, dir) => {
      import s.implicits._
      Tables(s, dir, "orders")
        .cube($"o_orderstatus", $"o_orderpriority")
        .agg(dsum($"o_totalprice", 2).as("sum_price"), count(lit(1)).as("n"))
        .orderBy($"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
    }),

    // GROUPING SETS via SQL over the registered catalog (SURVEY B5's
    // named-SQL surface runs through spark.sql).
    "q_grouping_sets" -> ((s, dir) => {
      // Ad-hoc view under its own name — the bare table names belong to
      // QueryCatalog's registry (clobbering "orders" would poison the
      // catalog's session-dir memo with a view it didn't register).
      Tables(s, dir, "orders").createOrReplaceTempView("orders_gsets")
      s.sql(
        """SELECT o_orderstatus, o_orderpriority,
          |       CAST(SUM(CAST(o_totalprice AS decimal(30,2))) AS double) AS sum_price,
          |       COUNT(1) AS n
          |FROM orders_gsets
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
          |""".stripMargin)
    }),

    // HLL sketch count (C5 approx_count_distinct). Spark's HLL++ and
    // DuckDB's HLL produce different estimates by design, so the sketch
    // value itself cannot be oracle-compared — instead the query emits the
    // EXACT distinct count (oracle-reproducible) plus `within_tol`: the
    // sketch estimate is within ±5% of exact, checked in-query. The oracle
    // produces the exact values and literal TRUE, so an HLL accuracy
    // regression flips every group's hash red at the driver. At 100 TB the
    // sketch is the right answer for dashboard-class distinct counts:
    // fixed sketch memory per group vs the exact distinct's full
    // expansion; the exact anchor here is the verification harness, not
    // the production path.
    "q_approx_count_distinct" -> ((s, dir) => {
      import s.implicits._
      Tables(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(approx_count_distinct($"l_partkey").as("approx_parts"),
          countDistinct($"l_partkey").as("exact_parts"),
          count(lit(1)).as("n_rows"))
        .select($"l_returnflag", $"exact_parts", $"n_rows",
          (abs($"approx_parts" - $"exact_parts") <=
            $"exact_parts" * lit(0.05)).as("within_tol"))
        .orderBy($"l_returnflag")
    }),

    // Mergeable-sketch PARTITION-INVARIANCE law: l_partkey sketched
    // under two unrelated partitionings (by ship month ~84 groups, by
    // returnflag 3 groups), each unioned — the two union estimates must
    // be EXACTLY equal, because union register state is an order- and
    // partition-independent bucket-max over the same items. (A direct
    // single sketch is deliberately NOT the anchor: datasketches gives a
    // non-merged sketch the stream-order-dependent HIP estimator while
    // unions use the composite estimator, so sketch-vs-union equality
    // does not hold — union-vs-union is the invariant that matters for
    // persisted incremental state anyway.) This is what makes distinct
    // state maintainable at 100 TB: yesterday's per-partition sketches
    // persist; today unions one day's sketch instead of rescanning the
    // corpus — the sketch analog of ops/Incremental. The 5% anchor
    // against the exact count rides along like q_approx_count_distinct's.
    "q_hll_merge" -> ((s, dir) => {
      import s.implicits._
      val li = Tables(s, dir, "lineitem")
      val byMonth = li
        .groupBy(date_trunc("month", $"l_shipdate").as("m"))
        .agg(hll_sketch_agg($"l_partkey").as("sk"))
        .agg(count(lit(1)).as("n_months"),
          hll_sketch_estimate(hll_union_agg($"sk")).as("est_m"))
      val byFlag = li
        .groupBy($"l_returnflag")
        .agg(hll_sketch_agg($"l_partkey").as("sk"))
        .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("est_f"))
      val exact = li.agg(countDistinct($"l_partkey").as("exact_parts"))
      byMonth.crossJoin(byFlag).crossJoin(exact)
        .select($"n_months", $"exact_parts",
          ($"est_m" === $"est_f").as("merge_invariant"),
          (abs($"est_m" - $"exact_parts") <=
            $"exact_parts" * lit(0.05)).as("within_tol"))
    }),

    // Incremental aggregate maintenance (ops/Incremental): the rollup is
    // maintained by MERGING the delta batch's per-group state into the
    // base's — the base rows are never re-read. Split is 90/10 by key;
    // the oracle recomputes the whole table from scratch, so the entry
    // is green iff merge(state(base), state(delta)) == state(all) to the
    // last decimal digit.
    "q_incremental_agg" -> ((s, dir) => {
      import s.implicits._
      val orders = Tables(s, dir, "orders")
      val base = graft.ops.Incremental.state(
        orders.filter($"o_orderkey" % 10 =!= 0), Seq("o_orderstatus"), "o_totalprice")
      val delta = graft.ops.Incremental.state(
        orders.filter($"o_orderkey" % 10 === 0), Seq("o_orderstatus"), "o_totalprice")
      graft.ops.Incremental.merge(Seq(base, delta), Seq("o_orderstatus"))
        .select($"o_orderstatus", $"s_cnt".cast("bigint").as("n"),
          $"s_sum".cast("double").as("sum_price"),
          $"s_min".as("min_price"), $"s_max".as("max_price"))
        .orderBy($"o_orderstatus")
    }),

    // Pivot (C5 extension): event types to columns, counts + value sums
    // per user decade. Explicit pivot values keep it ONE aggregation pass
    // — omitting them costs an extra distinct-values job at scale and
    // makes the output schema data-dependent (a pipeline hazard).
    "q_pivot" -> ((s, dir) => {
      import s.implicits._
      // Counts coalesce to 0: Spark's pivot emits NULL for a (user_mod,
      // event_type) combo with no rows, the oracle's COUNT(1) FILTER
      // emits 0 — without the coalesce the entry only matches while every
      // combo happens to be populated (ADVICE r5). Sums stay NULL on both
      // sides (SUM over the empty set is NULL in Spark and DuckDB alike).
      val pv = Tables(s, dir, "events")
        .groupBy(($"user_id" % 10).as("user_mod"))
        .pivot("event_type", Seq("click", "purchase", "view"))
        .agg(count(lit(1)).as("n"),
          sum($"value".cast("decimal(30,6)")).cast("double").as("sv"))
      pv.select($"user_mod" +: pv.columns.filter(_ != "user_mod").map(c =>
          if (c.endsWith("_n")) coalesce(col(c), lit(0L)).as(c) else col(c)): _*)
        .orderBy($"user_mod")
    }),

    // Approximate percentiles (the GK sketch behind approx_percentile —
    // the third sketch class next to HLL and count-min): exact anchors
    // (n, min, max) plus in-query RANK checks. The sketch's contract is
    // rank error ≤ n/accuracy, so the check verifies the rank of each
    // approximate percentile (count of values ≤ it, over n), not its
    // value — a broken sketch shifts the rank far outside ±0.01 and
    // flips the driver row red; the oracle emits the anchors + TRUE.
    "q_quantile_sketch" -> ((s, dir) => {
      import s.implicits._
      val ap = Tables(s, dir, "events")
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          min($"value").as("v_min"), max($"value").as("v_max"),
          expr("approx_percentile(value, 0.5, 1000)").as("a50"),
          expr("approx_percentile(value, 0.95, 1000)").as("a95"))
      Tables(s, dir, "events")
        .join(broadcast(ap), Seq("event_type"))
        .groupBy($"event_type", $"n", $"v_min", $"v_max", $"a50", $"a95")
        .agg(
          (sum(when($"value" <= $"a50", 1L).otherwise(0L)).cast("double") / $"n").as("r50"),
          (sum(when($"value" <= $"a95", 1L).otherwise(0L)).cast("double") / $"n").as("r95"))
        .select($"event_type", $"n", $"v_min", $"v_max",
          ($"r50" >= 0.49 && $"r50" <= 0.51).as("p50_ok"),
          ($"r95" >= 0.94 && $"r95" <= 0.96).as("p95_ok"))
        .orderBy($"event_type")
    }),

    // Global sort + limit (C7): top-10 orders by price, key tie-break.
    // Spark plans this as TakeOrderedAndProject — per-partition top-k then
    // a driver-side merge of k-row heaps, never a full global sort.
    "q_topn_orders" -> ((s, dir) => {
      import s.implicits._
      Tables(s, dir, "orders")
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
        .limit(10)
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    }),

    // Per-group min/max/avg over a join-free scan: exercises pushdown —
    // only 3 of 11 lineitem columns should appear in ReadSchema.
    "q_minmax" -> ((s, dir) => {
      import s.implicits._
      Tables(s, dir, "lineitem")
        .groupBy($"l_linestatus")
        .agg(
          min($"l_extendedprice").as("min_price"),
          max($"l_extendedprice").as("max_price"),
          min($"l_shipdate").as("min_ship"),
          max($"l_shipdate").as("max_ship"))
        .orderBy($"l_linestatus")
    }),

    // Equal-width histogram of l_extendedprice: 22 buckets of 5000. The
    // bucket law is an explicit floor(x / width) in BOTH engines (no
    // engine-specific width_bucket): one double division + floor on
    // identical inputs is correctly rounded and engine-identical. Scale:
    // map-side combine collapses to 22 groups before the shuffle; the
    // grand total for n_pct is a 1-row broadcast, never a global window.
    "q_histogram" -> ((s, dir) => {
      import s.implicits._
      val li = Tables(s, dir, "lineitem").select($"l_extendedprice".as("x"))
      val agg = li
        .select(least(floor($"x" / 5000.0), lit(21)).cast("int").as("bucket"), $"x")
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n"),
          min($"x").as("min_price"), max($"x").as("max_price"))
      val total = li.agg(count(lit(1)).as("total"))
      agg.crossJoin(broadcast(total))
        .select($"bucket", ($"bucket" * 5000).as("lo"), $"n",
          ($"n".cast("double") / $"total".cast("double")).as("n_pct"),
          $"min_price", $"max_price")
        .orderBy($"bucket")
    }))

  def oracle: Map[String, String] = Map(
    // Sketch estimates are engine-specific, so the oracle pins the EXACT
    // counts and asserts the in-query ±5% tolerance check passed.
    "q_approx_count_distinct" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS exact_parts,
        |  COUNT(1) AS n_rows,
        |  TRUE AS within_tol
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_hll_merge" ->
      """SELECT CAST(COUNT(DISTINCT date_trunc('month', l_shipdate)) AS bigint)
        |    AS n_months,
        |  COUNT(DISTINCT l_partkey) AS exact_parts,
        |  TRUE AS merge_invariant, TRUE AS within_tol
        |FROM lineitem""".stripMargin,
    "q_incremental_agg" ->
      """SELECT o_orderstatus, COUNT(1) AS n,
        |  CAST(SUM(CAST(o_totalprice AS decimal(30,2))) AS double) AS sum_price,
        |  MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_pivot" ->
      """SELECT user_id % 10 AS user_mod,
        |  CAST(COUNT(1) FILTER (event_type = 'click') AS bigint) AS click_n,
        |  CAST(SUM(CAST(value AS decimal(30,6))) FILTER (event_type = 'click') AS double) AS click_sv,
        |  CAST(COUNT(1) FILTER (event_type = 'purchase') AS bigint) AS purchase_n,
        |  CAST(SUM(CAST(value AS decimal(30,6))) FILTER (event_type = 'purchase') AS double) AS purchase_sv,
        |  CAST(COUNT(1) FILTER (event_type = 'view') AS bigint) AS view_n,
        |  CAST(SUM(CAST(value AS decimal(30,6))) FILTER (event_type = 'view') AS double) AS view_sv
        |FROM events GROUP BY 1 ORDER BY user_mod""".stripMargin,
    "q_quantile_sketch" ->
      """SELECT event_type, COUNT(1) AS n,
        |  MIN(value) AS v_min, MAX(value) AS v_max,
        |  TRUE AS p50_ok, TRUE AS p95_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_topn_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC
        |LIMIT 10""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS decimal(30,2))) AS double) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS decimal(30,2))) AS double) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0::double - l_discount) AS decimal(30,4))) AS double) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0::double - l_discount) * (1.0::double + l_tax) AS decimal(30,6))) AS double) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS decimal(30,2))) AS double) / COUNT(1) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS decimal(30,2))) AS double) / COUNT(1) AS avg_price,
        |  CAST(SUM(CAST(l_discount AS decimal(30,2))) AS double) / COUNT(1) AS avg_disc,
        |  COUNT(1) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_count_distinct" ->
      // The CASE guard pins Spark's multi-column NULL semantics (a row with
      // ANY null key is skipped) instead of relying on null-free testdata:
      // DuckDB's bare (a, b) struct is non-null when one field is null and
      // would be counted.
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT CASE WHEN l_suppkey IS NOT NULL AND l_partkey IS NOT NULL
        |                      THEN (l_suppkey, l_partkey) END) AS n_supp_part,
        |  COUNT(1) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_string_agg" ->
      """SELECT n_regionkey,
        |  string_agg(n_name, ',' ORDER BY n_name) AS nations,
        |  COUNT(1) AS n
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS decimal(30,2))) AS double) AS sum_qty,
        |  COUNT(1) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(SUM(CAST(o_totalprice AS decimal(30,2))) AS double) AS sum_price,
        |  COUNT(1) AS n
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(SUM(CAST(o_totalprice AS decimal(30,2))) AS double) AS sum_price,
        |  COUNT(1) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q_minmax" ->
      """SELECT l_linestatus,
        |  MIN(l_extendedprice) AS min_price,
        |  MAX(l_extendedprice) AS max_price,
        |  MIN(l_shipdate) AS min_ship,
        |  MAX(l_shipdate) AS max_ship
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "q_histogram" ->
      """WITH b AS (
        |  SELECT least(CAST(floor(l_extendedprice / 5000.0::double) AS int), 21)
        |           AS bucket,
        |         l_extendedprice AS x
        |  FROM lineitem
        |),
        |agg AS (
        |  SELECT bucket, count(1) AS n, min(x) AS min_price, max(x) AS max_price
        |  FROM b GROUP BY bucket
        |),
        |t AS (SELECT count(1) AS total FROM lineitem)
        |SELECT bucket, bucket * 5000 AS lo, n,
        |  CAST(n AS double) / CAST(total AS double) AS n_pct,
        |  min_price, max_price
        |FROM agg CROSS JOIN t ORDER BY bucket""".stripMargin)
}
