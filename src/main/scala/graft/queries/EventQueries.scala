package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-stream batch analytics over the `events` table: sessionization
  * (gaps-and-islands), ordered funnel conversion, and cohort retention —
  * the warehouse-side queries the reference's event pipeline feeds (its
  * stored procedures stop at load; these are the questions the loaded
  * table exists to answer).
  *
  * Oracle-stability notes shared by all three entries:
  *  - time arithmetic runs on exact integers (`unix_micros`, day diffs of
  *    week-truncated dates), never float seconds;
  *  - double sums go through `decimal` so accumulation order cannot
  *    change the hash;
  *  - every window ordering has a unique tie-breaker.
  *
  * Scale design (100 TB): sessionize = ONE shuffle on user (see
  * [[graft.ops.Sessions]]); funnel = per-user min-aggregates (map-side
  * partial) joined user-to-user — the step frontiers are user-cardinality
  * relations, orders of magnitude under the fact table, and every join
  * key is the same `user_id` so AQE reuses one partitioning; cohort =
  * one aggregate to user grain, one fact-side shuffle for the distinct
  * count. Nothing collects to the driver.
  */
object EventQueries extends graft.QueryModule {

  private val GapSec = 1800L // 30 min session timeout

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Gaps-and-islands sessionization: per-user 30-min-timeout sessions,
    // aggregated to one row per session. unix_micros keeps the gap test
    // integer-exact; decimal sum keeps total_value order-independent.
    "q_sessionize" -> ((s, dir) => {
      import s.implicits._
      val sessions = graft.ops.Sessions.sessionize(
        Tables(s, dir, "events"), $"user_id", $"ts", $"event_id", GapSec)
      sessions
        .groupBy($"user_id", $"session_idx")
        .agg(
          // ntz: the INT64-micros parquet dump would otherwise read back
          // tz-AWARE in pandas while the DuckDB oracle is naive (r15)
          min($"ts").cast("timestamp_ntz").as("session_start"),
          max($"ts").cast("timestamp_ntz").as("session_end"),
          count(lit(1)).as("n_events"),
          sum($"value".cast("decimal(18,2)")).cast("double").as("total_value"))
        .filter($"user_id" % 10 === 0)
        .orderBy($"user_id", $"session_idx")
    }),

    // Ordered funnel with a conversion window: view -> click within 24h
    // of the first view -> purchase within 24h of that click, counted per
    // step. Each step frontier is a per-user MIN over the previous
    // frontier — the standard "first qualifying event" formulation, so a
    // user converts only if the steps happen in order AND in time (the
    // window is what makes the funnel non-vacuous: without it every user
    // in a dense month of events converts). Interval arithmetic is exact
    // integer microseconds in both engines.
    "q_funnel" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables(s, dir, "events").select($"user_id", $"event_type", $"ts")
      graft.ops.Funnel.counts(ev, "user_id", "ts",
        Seq("view" -> ($"event_type" === "view"),
          "view>click_24h" -> ($"event_type" === "click"),
          "view>click>purchase_24h" -> ($"event_type" === "purchase")),
        expr("INTERVAL 24 HOURS"))
    }),

    // CEP PATTERN MATCH (ops/Cep — MATCH_RECOGNIZE / Flink-CEP lite):
    // each user's event stream collapses MAP-SIDE to one symbol char
    // per event (c/v/p), one key shuffle builds the ordered sequence,
    // and the pattern `cv*p` ("click, any views, purchase") counts
    // non-overlapping occurrences per user. The oracle rebuilds the
    // identical sequences with DuckDB's ordered string_agg and the
    // same regex, so one hash pins ordering (ts then event_id
    // tiebreak), alphabet closure (unknown types dropped, not
    // wildcards), and the non-overlapping match rule. At 100 TB: a
    // billion-event day shuffles a gigabyte of symbols.
    "q_cep_pattern" -> ((s, dir) => {
      import s.implicits._
      graft.ops.Cep.matches(Tables(s, dir, "events"),
        "user_id", "ts", "event_id", "event_type",
        Map("click" -> "c", "view" -> "v", "purchase" -> "p"), "cv*p")
        .groupBy($"n_matches")
        .agg(count(lit(1)).as("n_users"),
          sum($"seq_len").cast("bigint").as("sum_len"))
        .orderBy($"n_matches")
    }),

    // CEP QUANTIFIERS + ABSENCE (Cep.matches over the full cross-engine
    // fragment): two MATCH_RECOGNIZE-shaped patterns per user —
    // `cv{1,2}p` ("click, one-or-two views, purchase", the bounded
    // quantifier) and `v[^c]*p` ("view then purchase with NO click
    // between", absence via a negated class over the closed alphabet;
    // RE2 has no lookahead so this IS the absence encoding) — joined
    // into one per-(count, count) histogram. The oracle runs the SAME
    // two regexes through DuckDB's RE2 over string_agg-rebuilt
    // sequences, so one hash pins the quantifier and negation semantics
    // across engines. Same 100 TB shape as q_cep_pattern: symbols
    // collapse map-side, one key shuffle, matching is per-group linear.
    "q_cep_quantified" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables(s, dir, "events")
      val syms = Map("click" -> "c", "view" -> "v", "purchase" -> "p")
      val quant = graft.ops.Cep.matches(ev, "user_id", "ts", "event_id",
        "event_type", syms, "cv{1,2}p")
        .select($"user_id", $"seq_len", $"n_matches".as("n_quant"))
      val absent = graft.ops.Cep.matches(ev, "user_id", "ts", "event_id",
        "event_type", syms, graft.ops.Cep.absencePattern('v', "c", 'p'))
        .select($"user_id", $"n_matches".as("n_absent"))
      quant.join(absent, "user_id")
        .groupBy($"n_quant", $"n_absent")
        .agg(count(lit(1)).as("n_users"),
          sum($"seq_len").cast("bigint").as("sum_len"))
        .orderBy($"n_quant", $"n_absent")
    }),

    // Cohort retention: users bucketed by the week of their FIRST
    // PURCHASE (first-any-event cohorts are degenerate here — every user
    // appears in week one); for each (cohort week, week offset) the
    // number of distinct users active — any event type — that week, from
    // the cohort week on. Week arithmetic is day-diff of two
    // week-truncated DATEs divided by 7 — an exact multiple, no float
    // time.
    "q_cohort_retention" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables(s, dir, "events")
      val firsts = ev.filter($"event_type" === "purchase")
        .groupBy($"user_id").agg(min($"ts").as("first_ts"))
        .select($"user_id", to_date(date_trunc("week", $"first_ts")).as("cohort_week"))
      ev.select($"user_id", $"ts", to_date(date_trunc("week", $"ts")).as("wk"))
        .join(firsts, "user_id")
        .filter($"ts" >= $"cohort_week".cast("timestamp"))
        .groupBy($"cohort_week",
          (datediff($"wk", $"cohort_week") / 7).cast("int").as("week_offset"))
        .agg(countDistinct($"user_id").as("n_users"))
        .orderBy($"cohort_week", $"week_offset")
    }))

  def oracle: Map[String, String] = Map(
    "q_cep_pattern" ->
      """WITH seqs AS (
        |  SELECT user_id,
        |    string_agg(CASE event_type WHEN 'click' THEN 'c'
        |               WHEN 'view' THEN 'v' WHEN 'purchase' THEN 'p' END,
        |               '' ORDER BY ts, event_id) AS seq
        |  FROM events
        |  WHERE event_type IN ('click', 'view', 'purchase')
        |  GROUP BY user_id
        |),
        |m AS (
        |  SELECT user_id, len(seq) AS seq_len,
        |    len(regexp_extract_all(seq, 'cv*p')) AS n_matches
        |  FROM seqs
        |)
        |SELECT n_matches, CAST(COUNT(1) AS bigint) AS n_users,
        |  CAST(SUM(seq_len) AS bigint) AS sum_len
        |FROM m GROUP BY n_matches ORDER BY n_matches""".stripMargin,
    "q_cep_quantified" ->
      """WITH seqs AS (
        |  SELECT user_id,
        |    string_agg(CASE event_type WHEN 'click' THEN 'c'
        |               WHEN 'view' THEN 'v' WHEN 'purchase' THEN 'p' END,
        |               '' ORDER BY ts, event_id) AS seq
        |  FROM events
        |  WHERE event_type IN ('click', 'view', 'purchase')
        |  GROUP BY user_id
        |),
        |m AS (
        |  SELECT user_id, len(seq) AS seq_len,
        |    len(regexp_extract_all(seq, 'cv{1,2}p')) AS n_quant,
        |    len(regexp_extract_all(seq, 'v[^c]*p')) AS n_absent
        |  FROM seqs
        |)
        |SELECT n_quant, n_absent, CAST(COUNT(1) AS bigint) AS n_users,
        |  CAST(SUM(seq_len) AS bigint) AS sum_len
        |FROM m GROUP BY n_quant, n_absent
        |ORDER BY n_quant, n_absent""".stripMargin,
    "q_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800 * 1000000
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        |),
        |sess AS (
        |  SELECT user_id, ts, value,
        |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        |  FROM flagged
        |)
        |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
        |  min(ts) AS session_start, max(ts) AS session_end,
        |  count(1) AS n_events,
        |  CAST(SUM(CAST(value AS decimal(18,2))) AS double) AS total_value
        |FROM sess
        |WHERE user_id % 10 = 0
        |GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin,
    "q_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
        |           WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |      JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts > v.t1
        |        AND e.ts <= v.t1 + INTERVAL 24 HOUR GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |      JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > c.t2
        |        AND e.ts <= c.t2 + INTERVAL 24 HOUR GROUP BY e.user_id)
        |SELECT * FROM (
        |  SELECT 1 AS step_ord, 'view' AS step, count(1) AS n_users FROM v
        |  UNION ALL
        |  SELECT 2, 'view>click_24h', count(1) FROM c
        |  UNION ALL
        |  SELECT 3, 'view>click>purchase_24h', count(1) FROM p
        |) ORDER BY step_ord""".stripMargin,
    "q_cohort_retention" ->
      """WITH firsts AS (
        |  SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id
        |)
        |SELECT f.cohort_week,
        |  CAST(date_diff('day', f.cohort_week,
        |       CAST(date_trunc('week', e.ts) AS DATE)) / 7 AS int) AS week_offset,
        |  count(DISTINCT e.user_id) AS n_users
        |FROM events e JOIN firsts f ON e.user_id = f.user_id
        |WHERE e.ts >= CAST(f.cohort_week AS TIMESTAMP)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
}
