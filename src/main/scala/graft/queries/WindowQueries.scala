package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function surface (SURVEY.md §2 Tier C "Window functions" +
  * "Sort / limit / top-k": row_number, rank, dense_rank, lag, lead,
  * running frames with rowsBetween / rangeBetween, per-group top-k).
  *
  * Oracle-stability: every window ORDER BY carries a unique tie-breaker
  * key (SURVEY §7 "nondeterministic orderings") so row_number/lag/lead are
  * deterministic in both engines.
  *
  * Scale design (100 TB): a window is one shuffle on its partition keys
  * and a per-partition sort — same cost class as a groupBy. The per-group
  * top-k pattern (row_number <= k) never materializes the global sort
  * that a naive orderBy().limit() of the raw fact table would; Spark
  * additionally pushes a per-partition rank limit (WindowGroupLimit) so
  * each task keeps only k rows per group before the shuffle.
  */
object WindowQueries extends graft.QueryModule {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Per-group top-k: top 3 customers by balance per market segment.
    "q_window_topk" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"c_mktsegment")
        .orderBy($"c_acctbal".desc, $"c_custkey".asc)
      Tables(s, dir, "customer")
        .withColumn("rk", row_number().over(w))
        .filter($"rk" <= 3)
        .select($"c_mktsegment", $"rk", $"c_custkey", $"c_acctbal")
        .orderBy($"c_mktsegment", $"rk")
    }),

    // rank vs dense_rank over part price within brand (ties collapse in
    // dense_rank, gap in rank — both deterministic under ties).
    "q_window_rank" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"p_brand").orderBy($"p_retailprice".desc)
      Tables(s, dir, "part")
        .withColumn("price_rank", rank().over(w))
        .withColumn("price_dense", dense_rank().over(w))
        .filter($"price_rank" <= 5)
        .select($"p_brand", $"p_partkey", $"p_retailprice", $"price_rank", $"price_dense")
        .orderBy($"p_brand", $"price_rank", $"p_partkey")
    }),

    // lag/lead over per-user event timelines (event_id tie-break).
    "q_window_lag_lead" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
      Tables(s, dir, "events")
        .withColumn("prev_value", lag($"value", 1).over(w))
        .withColumn("next_type", lead($"event_type", 1).over(w))
        .filter($"user_id" % 50 === 0)
        .select($"user_id", $"event_id", $"event_type", $"value", $"prev_value", $"next_type")
        .orderBy($"user_id", $"event_id")
    }),

    // Running frames: cumulative sum (rowsBetween unbounded→current) and a
    // sliding 30-day count (rangeBetween over epoch seconds) per customer.
    "q_window_running" -> ((s, dir) => {
      import s.implicits._
      val byDate = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate".asc, $"o_orderkey".asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val last30d = Window.partitionBy($"o_custkey")
        .orderBy(unix_timestamp($"o_orderdate").asc)
        .rangeBetween(-30L * 86400, 0)
      Tables(s, dir, "orders")
        .filter($"o_custkey" % 100 === 0)
        .withColumn("running_spend",
          sum($"o_totalprice".cast("decimal(30,2)")).over(byDate).cast("double"))
        .withColumn("n_last_30d", count(lit(1)).over(last30d))
        .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"running_spend", $"n_last_30d")
        .orderBy($"o_custkey", $"o_orderdate", $"o_orderkey")
    }),

    // first/last over an explicit whole-partition frame: each order next to
    // its customer's first and most recent order date (frame must be
    // unbounded-unbounded — last_value's default frame stops at CURRENT ROW
    // in both engines, a classic silent-wrong-answer without it).
    "q_window_first_last" -> ((s, dir) => {
      import s.implicits._
      val full = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate".asc, $"o_orderkey".asc)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables(s, dir, "orders")
        .filter($"o_custkey" % 100 === 0)
        .withColumn("first_date", first($"o_orderdate").over(full))
        .withColumn("last_date", last($"o_orderdate").over(full))
        .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"first_date", $"last_date")
        .orderBy($"o_custkey", $"o_orderkey")
    }),

    // Rolling 7-row median of daily per-user spend. Median is computed by
    // an EXPLICIT law — sort the frame, average the two middle elements
    // as (lo + hi) / 2.0 — written identically in both engines, because
    // built-in medians interpolate differently (quantile_cont's
    // a + 0.5*(b-a) is a different IEEE rounding than (a+b)/2). The
    // frame list is an intermediate only; the final projection stays flat
    // scalars per the driver contract.
    "q_rolling_median" -> ((s, dir) => {
      import s.implicits._
      val daily = Tables(s, dir, "events")
        .filter($"user_id" % 20 === 0)
        .groupBy($"user_id", to_date($"ts").as("d"))
        .agg(sum($"value".cast("decimal(18,2)")).cast("double").as("v"))
      val w = Window.partitionBy($"user_id").orderBy($"d".asc)
        .rowsBetween(-6, Window.currentRow)
      daily
        .withColumn("arr", sort_array(collect_list($"v").over(w)))
        .withColumn("n", size($"arr"))
        .select($"user_id", $"d".cast("string").as("day"), $"v", $"n",
          ((element_at($"arr", (($"n" + 1) / 2).cast("int")) +
            element_at($"arr", ($"n" / 2 + 1).cast("int"))) / 2.0)
            .as("med7"))
        .orderBy($"user_id", $"day")
    }),

    // Distribution functions: ntile / percent_rank / cume_dist over
    // customer balances per segment. The unique (acctbal, custkey) order
    // key makes all three engine-identical: percent_rank = (rank-1)/(n-1)
    // and cume_dist = row/n are exact double divisions of integers.
    "q_window_distribution" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"c_mktsegment")
        .orderBy($"c_acctbal".asc, $"c_custkey".asc)
      Tables(s, dir, "customer")
        .filter($"c_custkey" % 10 === 0)
        .select($"c_mktsegment", $"c_custkey",
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"))
        .orderBy($"c_mktsegment", $"c_custkey")
    }))

  def oracle: Map[String, String] = Map(
    "q_rolling_median" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS d,
        |    CAST(SUM(CAST(value AS decimal(18,2))) AS double) AS v
        |  FROM events WHERE user_id % 20 = 0 GROUP BY 1, 2
        |),
        |r AS (
        |  SELECT user_id, d, v,
        |    list_sort(list(v) OVER (PARTITION BY user_id ORDER BY d ASC
        |      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS arr
        |  FROM daily
        |)
        |SELECT user_id, CAST(d AS varchar) AS day, v,
        |  CAST(len(arr) AS int) AS n,
        |  (arr[(len(arr) + 1) // 2] + arr[len(arr) // 2 + 1]) / 2.0::double
        |    AS med7
        |FROM r ORDER BY user_id, day""".stripMargin,
    "q_window_distribution" ->
      """SELECT c_mktsegment, c_custkey,
        |  CAST(NTILE(4) OVER w AS int) AS quartile,
        |  PERCENT_RANK() OVER w AS pct_rank,
        |  CUME_DIST() OVER w AS cume
        |FROM customer WHERE c_custkey % 10 = 0
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal ASC, c_custkey ASC)
        |ORDER BY c_mktsegment, c_custkey""".stripMargin,
    "q_window_topk" ->
      """SELECT c_mktsegment, rk, c_custkey, c_acctbal
        |FROM (SELECT c_mktsegment, c_custkey, c_acctbal,
        |        ROW_NUMBER() OVER (PARTITION BY c_mktsegment
        |                           ORDER BY c_acctbal DESC, c_custkey ASC) AS rk
        |      FROM customer)
        |WHERE rk <= 3 ORDER BY c_mktsegment, rk""".stripMargin,
    "q_window_rank" ->
      """SELECT p_brand, p_partkey, p_retailprice, price_rank, price_dense
        |FROM (SELECT p_brand, p_partkey, p_retailprice,
        |        RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS price_rank,
        |        DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS price_dense
        |      FROM part)
        |WHERE price_rank <= 5 ORDER BY p_brand, price_rank, p_partkey""".stripMargin,
    "q_window_lag_lead" ->
      """SELECT user_id, event_id, event_type, value, prev_value, next_type
        |FROM (SELECT user_id, event_id, event_type, value,
        |        LAG(value, 1) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_value,
        |        LEAD(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS next_type
        |      FROM events)
        |WHERE user_id % 50 = 0 ORDER BY user_id, event_id""".stripMargin,
    "q_window_running" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  CAST(SUM(CAST(o_totalprice AS decimal(30,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS double) AS running_spend,
        |  COUNT(1) OVER (
        |    PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
        |    RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS n_last_30d
        |FROM orders WHERE o_custkey % 100 = 0
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
    "q_window_first_last" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  FIRST_VALUE(o_orderdate) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_date,
        |  LAST_VALUE(o_orderdate) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_date
        |FROM orders WHERE o_custkey % 100 = 0
        |ORDER BY o_custkey, o_orderkey""".stripMargin)
}
