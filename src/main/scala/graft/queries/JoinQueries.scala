package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join surface (SURVEY.md §2 Tier C "Joins"; reference idioms at
  * `/root/reference/SharedCode/PGHelperFunction.py:26-30` — the
  * left-join-where-null anti-join — and `:61` — multi-key equi predicate).
  *
  * Scale design (100 TB):
  *  - Dim tables (`region` 5 rows, `nation` 25, `supplier` small) are
  *    explicitly `broadcast()`-hinted: the fact side never shuffles for a
  *    dim lookup. At 100 TB this is the difference between a map-side
  *    hash join and a full sort-merge shuffle of the fact table.
  *  - Fact-fact joins (orders x lineitem, customer x orders) shuffle on
  *    the join key — unavoidable, but AQE (Engine.scala) coalesces and
  *    skew-splits at runtime. On a real cluster both sides would be
  *    bucketed by key to make this a zero-shuffle join.
  *  - Aggregate-then-join where possible: q_join_customer_orders reduces
  *    lineitem/orders to per-key partials BEFORE the join so the join
  *    input is the aggregated (small) side, not the raw fact table.
  *  - The range join (events self-join on time bounds) is banded: an
  *    equi-join on a coarse time bucket + user, then the exact range
  *    predicate. A naive theta join would be a cartesian product at scale;
  *    banding makes it an equi-shuffle with bounded per-bucket fan-out.
  */
object JoinQueries extends graft.QueryModule {

  private def dsum(c: Column, scale: Int): Column =
    sum(c.cast(s"decimal(30,$scale)")).cast("double")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Inner equi join fact-to-fact + group-agg: revenue per order status.
    // Aggregates lineitem to per-order partials before joining orders.
    // `revenue` stays decimal(30,4) END-TO-END through both aggregation
    // levels — a double round-trip between the two sums diverges from the
    // oracle on halfway values (Spark HALF_UP string-cast vs DuckDB exact
    // binary rounding) and loses precision for no benefit. Single cast to
    // double in the final projection only.
    "q_join_orders_lineitem" -> ((s, dir) => {
      import s.implicits._
      val li = Tables(s, dir, "lineitem")
        .groupBy($"l_orderkey")
        .agg(sum(($"l_extendedprice" * (lit(1.0) - $"l_discount")).cast("decimal(30,4)")).as("revenue"),
          count(lit(1)).as("n_lines"))
      Tables(s, dir, "orders")
        .join(li, $"o_orderkey" === $"l_orderkey")
        .groupBy($"o_orderstatus")
        .agg(sum($"revenue").cast("double").as("sum_revenue"),
          sum($"n_lines").as("n_lines"),
          count(lit(1)).as("n_orders"))
        .orderBy($"o_orderstatus")
    }),

    // Left outer join + null-aware agg: customers with their order counts,
    // including customers with no orders (count = 0).
    "q_join_left_customer_orders" -> ((s, dir) => {
      import s.implicits._
      val o = Tables(s, dir, "orders")
      Tables(s, dir, "customer")
        .join(o, $"c_custkey" === $"o_custkey", "left")
        .groupBy($"c_mktsegment")
        .agg(count($"o_orderkey").as("n_orders"),
          countDistinct($"c_custkey").as("n_cust"),
          count(lit(1)).as("n_rows"))
        .orderBy($"c_mktsegment")
    }),

    // Full outer join between two per-key aggregates with coalesce over
    // the null sides (classic reconciliation shape).
    "q_join_full_outer" -> ((s, dir) => {
      import s.implicits._
      val byCust = Tables(s, dir, "orders").groupBy($"o_custkey")
        .agg(count(lit(1)).as("n_orders"))
      val highBal = Tables(s, dir, "customer")
        .filter($"c_acctbal" > 9000.0)
        .select($"c_custkey", $"c_acctbal")
      byCust.join(highBal, $"o_custkey" === $"c_custkey", "full")
        .select(
          coalesce($"o_custkey", $"c_custkey").as("custkey"),
          coalesce($"n_orders", lit(0L)).as("n_orders"),
          $"c_acctbal")
        .orderBy($"custkey")
    }),

    // Left semi join: customers that HAVE at least one open order.
    // Semi = EXISTS — no row multiplication, output schema = left only.
    "q_join_semi" -> ((s, dir) => {
      import s.implicits._
      val open = Tables(s, dir, "orders").filter($"o_orderstatus" === "O")
      Tables(s, dir, "customer")
        .join(open, $"c_custkey" === $"o_custkey", "left_semi")
        .groupBy($"c_nationkey")
        .agg(count(lit(1)).as("n_cust"),
          dsum($"c_acctbal", 2).as("sum_bal"))
        .orderBy($"c_nationkey")
    }),

    // Bloom-filter join pruning (ops/Bloom): a 4-Kibit, 3-hash filter
    // over the dim keys (customers % 3) screens the fact keys (orders'
    // custkeys). The oracle REBUILDS the identical md5-derived bitset,
    // so n_false_pos is exact — and no_false_neg is computed on both
    // sides, not asserted as a literal.
    "q_bloom_filter" -> ((s, dir) => {
      import s.implicits._
      val dim = Tables(s, dir, "customer").filter($"c_custkey" % 3 === 0)
        .select($"c_custkey".as("k")).distinct()
      val bloom = graft.ops.Bloom.build(dim, "k", bits = 4096, hashes = 3)
      val factKeys = Tables(s, dir, "orders").select($"o_custkey".as("k")).distinct()
      val passed = graft.ops.Bloom.membership(factKeys, "k", bloom, 4096, 3)
      val truth = factKeys
        .join(dim.withColumn("__in_dim", lit(1)), Seq("k"), "left")
        .select($"k", coalesce($"__in_dim", lit(0)).as("is_member"))
      passed.join(truth, Seq("k"))
        .agg(count(lit(1)).as("n_keys"),
          sum($"bloom_pass").cast("bigint").as("n_pass"),
          sum($"is_member").cast("bigint").as("n_true"),
          (sum($"bloom_pass") - sum($"is_member")).cast("bigint").as("n_false_pos"),
          (min($"bloom_pass" - $"is_member") >= 0).as("no_false_neg"))
    }),

    // Runtime bloom-filter join pruning (Catalyst's InjectRuntimeFilter):
    // DPP's sibling for NON-partition join keys. A selective dim filter
    // (p_size = 1 keeps ~3% of part) is turned into a bloom filter built
    // on the dim side and pushed into the FACT scan as a
    // might_contain(...) predicate — at 100 TB this drops ~97% of
    // lineitem rows BEFORE the join shuffle, the single biggest
    // shuffle-volume lever on a fact-fact join that broadcast can't
    // take (both sides too big). The sf0.x thresholds are lowered inside
    // the closure ONLY (restored in finally): the 10 GB
    // applicationSideScanSizeThreshold default exists precisely so small
    // scans like these never pay bloom-build cost in production, and
    // autoBroadcastJoinThreshold=-1 forces the shuffle join that is the
    // 100 TB reality for this pattern. The aggregate is executed EAGERLY
    // while those confs are live, so the hashed result really ran
    // through the runtime-filtered plan; `runtime_filter_injected` is
    // pinned from the optimized plan (oracle expects TRUE — injection
    // regression = hash mismatch, same pattern as the IVF recall pins).
    "q_runtime_filter" -> ((s, dir) => {
      import s.implicits._
      val keys = Seq(
        "spark.sql.optimizer.runtime.bloomFilter.enabled",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        "spark.sql.autoBroadcastJoinThreshold")
      val prev = keys.map(k => k -> s.conf.getOption(k))
      try {
        s.conf.set(keys(0), "true")
        s.conf.set(keys(1), "0")
        s.conf.set(keys(2), "64MB")
        s.conf.set(keys(3), "-1")
        val dim = Tables(s, dir, "part").filter($"p_size" === 1)
          .select($"p_partkey")
        val fact = Tables(s, dir, "lineitem")
          .select($"l_partkey", $"l_quantity", $"l_extendedprice")
        val joined = fact.join(dim, $"l_partkey" === $"p_partkey")
          .agg(count(lit(1)).as("n_li"),
            sum($"l_quantity".cast("decimal(30,2)")).cast("double").as("sum_qty"),
            sum($"l_extendedprice".cast("decimal(30,2)")).cast("double").as("sum_price"))
        val injected =
          joined.queryExecution.optimizedPlan.toString.contains("might_contain")
        val r = joined.collect()(0)
        Seq((r.getLong(0), r.getDouble(1), r.getDouble(2), injected))
          .toDF("n_li", "sum_qty", "sum_price", "runtime_filter_injected")
      } finally prev.foreach { case (k, v) =>
        v.fold(s.conf.unset(k))(s.conf.set(k, _))
      }
    }),

    // As-of join (ops/AsOf): each purchase picks the most recent click
    // at-or-before its time per user — the union-and-carry-forward
    // window, ONE key shuffle, no range fan-out. Oracle: DuckDB's native
    // ASOF LEFT JOIN (an independent implementation of the semantics).
    "q_join_asof" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables(s, dir, "events")
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"ts", $"event_id".as("purchase_id"))
      val clicks = ev.filter($"event_type" === "click")
        .select($"user_id", $"ts", $"event_id".as("click_id"),
          $"ts".as("click_ts"))
      graft.ops.AsOf.join(purchases, clicks, Seq("user_id"), "ts", "ts",
          Seq("click_id", "click_ts"), rightTie = "click_id")
        .select($"purchase_id", $"user_id", $"click_id",
          (unix_micros($"ts") - unix_micros($"click_ts")).as("gap_us"))
        .orderBy($"purchase_id")
    }),

    // As-of with a staleness bound (AsOf.joinWithin): same purchase←click
    // attribution as q_join_asof, but a click older than 1 hour no longer
    // counts — the carry nulls out. Same join-free union+window plan; the
    // bound is exact integer microseconds. Oracle = native ASOF LEFT JOIN
    // with the staleness CASE applied on top.
    "q_join_asof_tolerance" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables(s, dir, "events")
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"ts", $"event_id".as("purchase_id"))
      val clicks = ev.filter($"event_type" === "click")
        .select($"user_id", $"ts", $"event_id".as("click_id"),
          $"ts".as("click_ts"))
      graft.ops.AsOf.joinWithin(purchases, clicks, Seq("user_id"), "ts", "ts",
          Seq("click_id", "click_ts"), rightTie = "click_id")(
          (l, r) => unix_micros(l) - unix_micros(r) <= 3600L * 1000000L)
        .select($"purchase_id", $"user_id", $"click_id",
          (unix_micros($"ts") - unix_micros($"click_ts")).as("gap_us"))
        .orderBy($"purchase_id")
    }),

    // Co-purchase pair mining (market-basket): parts appearing on the
    // same order, counted across orders, top-20 pairs. The self-join is
    // keyed on l_orderkey, so fan-out per key is C(basket, 2) — and the
    // basket is CAPPED at 100 distinct parts (an ENFORCED bound, not a
    // data assumption: one pathological 10k-part order would otherwise
    // fan 50M pairs out of a single key; production basket miners cap or
    // sample giant baskets because their pairs are association noise
    // anyway). The distinct-per-order projection first removes same-part
    // repeat lines so a multi-line part can't inflate its own pairs. One
    // shuffle on the order key + one on the pair for the count; the cap
    // is a pre-aggregated key count, same shuffle.
    "q_copurchase" -> ((s, dir) => {
      import s.implicits._
      val op = Tables(s, dir, "lineitem")
        .select($"l_orderkey".as("o"), $"l_partkey".as("p")).distinct()
      val small = op.groupBy($"o").agg(count(lit(1)).as("basket"))
        .filter($"basket" <= 100)
        .select($"o")
      val capped = op.join(small, "o")
      capped.join(capped.select($"o", $"p".as("p2")), "o")
        .filter($"p" < $"p2")
        .groupBy($"p".as("part_a"), $"p2".as("part_b"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy($"n_orders".desc, $"part_a".asc, $"part_b".asc)
        .limit(20)
    }),

    // Salted skew join (graft.ops.Skew): events (big, skewed user_id) ⋈
    // customer dim, salt=16. The oracle is the PLAIN join — salting is a
    // physical rewrite and must be result-identical; this entry proves it.
    "q_join_salted_skew" -> ((s, dir) => {
      import s.implicits._
      val dim = Tables(s, dir, "customer")
        .select($"c_custkey".as("user_id"), $"c_mktsegment")
      graft.ops.Skew.saltedJoin(Tables(s, dir, "events"), dim, "user_id", 16)
        .groupBy($"c_mktsegment", $"event_type")
        .agg(count(lit(1)).as("n"),
          sum($"value".cast("decimal(30,6)")).cast("double").as("sum_value"))
        .orderBy($"c_mktsegment", $"event_type")
    }),

    // HOT-KEY salted join (Skew.saltedJoinHot — saltedJoin refined with
    // detection): 60% of the fact collapses onto key 7, detected by the
    // combiner-pass count (REQUIRED in-query) and salted; the other 997
    // residue keys join unchanged, so the dim replicates ONLY its hot
    // row — |hot dim rows| × salt, not |dim| × salt. Exercised as a
    // LEFT join (the surface plain saltedJoin lacks); the oracle is the
    // plain join, pinning that salting is a physical rewrite with zero
    // semantic footprint. At 100 TB: the bot-user join that melts one
    // reducer runs at uniform speed, and the replicated side costs
    // kilobytes.
    "q_join_salted_hot" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables(s, dir, "events")
      val fact = ev.select(
        when($"event_id" % 100 < 60, lit(7L)).otherwise($"event_id" % 997).as("k"),
        $"value")
      val dim = ev.select(($"event_id" % 997).as("k")).distinct()
        .withColumn("grp", pmod($"k", lit(10L)))
      val n = fact.count()
      val (j, hot) = graft.ops.Skew.saltedJoinHot(fact, dim, "k",
        joinType = "left", salt = 16, hotThreshold = n / 10L)
      require(hot.contains(7L),
        s"the collapsed key must be detected hot, got $hot")
      j.groupBy($"grp")
        .agg(count(lit(1)).as("n"),
          sum($"value".cast("decimal(30,6)")).cast("double").as("sum_value"))
        .orderBy($"grp")
    }),

    // Right outer join: every customer kept from the right side, orders
    // (filtered to a status so some customers have no match) nulled out.
    // Catalyst canonicalizes right⟷left, so this pins the API surface and
    // the null-side semantics, not a distinct physical plan.
    "q_join_right" -> ((s, dir) => {
      import s.implicits._
      val finished = Tables(s, dir, "orders").filter($"o_orderstatus" === "F")
      finished
        .join(Tables(s, dir, "customer"), $"o_custkey" === $"c_custkey", "right")
        .groupBy($"c_mktsegment")
        .agg(count($"o_orderkey").as("n_finished_orders"),
          count(lit(1)).as("n_rows"))
        .orderBy($"c_mktsegment")
    }),

    // Left anti join — THE reference idiom (PGHelperFunction.py:26-30
    // models non-PK discovery as LEFT JOIN ... WHERE right IS NULL; its
    // upsert insert-branch at :54-56 is the same shape): customers with
    // no FINISHED ('F') order. Anti-joining against the filtered subset
    // (not all orders) guarantees a non-empty complement at sf0.01, so the
    // entry actually exercises anti-join semantics (ADVICE r2).
    "q_join_anti" -> ((s, dir) => {
      import s.implicits._
      val finished = Tables(s, dir, "orders").filter($"o_orderstatus" === "F")
      Tables(s, dir, "customer")
        .join(finished, $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_name", $"c_mktsegment")
        .orderBy($"c_custkey")
    }),

    // Null-safe equi-join (<=>): NULL keys MATCH each other instead of
    // disappearing — the semantics a CDC/reconciliation join needs when
    // the business key is nullable. Keys are nulled deterministically on
    // %97; the aggregate splits matched pairs by null-key vs real-key so
    // a regression to plain = (which drops every NULL pair) flips both
    // groups. Null-safe keys stay ordinary equi-join keys in the plan
    // (SMJ/SHJ on coalesced key), NOT a nested-loop — at 100 TB that is
    // the difference between a join and a cross product.
    "q_join_null_safe" -> ((s, dir) => {
      import s.implicits._
      val o = Tables(s, dir, "orders")
        .select(when($"o_orderkey" % 97 === 0, lit(null).cast("bigint"))
          .otherwise($"o_custkey").as("k"), $"o_orderkey")
      val a = o.filter($"o_orderkey" % 2 === 0)
        .select($"k".as("k_a"), $"o_orderkey".as("id_a"))
      val b = o.filter($"o_orderkey" % 2 === 1)
        .select($"k".as("k_b"), $"o_orderkey".as("id_b"))
      a.join(b, $"k_a" <=> $"k_b")
        .groupBy($"k_a".isNull.as("null_key"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(($"id_a" + $"id_b").cast("decimal(30,0)")).cast("bigint")
            .as("sum_ids"))
        .orderBy($"null_key")
    }),

    // Broadcast dim chain: lineitem -> supplier -> nation -> region.
    // Every dim is broadcast()-hinted; the 600k-row (→100 TB) fact side
    // is never shuffled for the lookups, only for the final group-agg.
    "q_join_broadcast_dims" -> ((s, dir) => {
      import s.implicits._
      val li = Tables(s, dir, "lineitem")
      val sup = broadcast(Tables(s, dir, "supplier"))
      val nat = broadcast(Tables(s, dir, "nation"))
      val reg = broadcast(Tables(s, dir, "region"))
      li.join(sup, $"l_suppkey" === $"s_suppkey")
        .join(nat, $"s_nationkey" === $"n_nationkey")
        .join(reg, $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name", $"n_name")
        .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4).as("revenue"),
          count(lit(1)).as("n"))
        .orderBy($"r_name", $"n_name")
    }),

    // Cross join (bounded!): region x orderstatus distinct values — a
    // dimension scaffold (5 x 3 rows). Cross joins are only ever legal on
    // provably tiny inputs; anything else must be banded (see range join).
    "q_join_cross" -> ((s, dir) => {
      import s.implicits._
      val statuses = Tables(s, dir, "orders").select($"o_orderstatus").distinct()
      Tables(s, dir, "region").select($"r_name")
        .crossJoin(statuses)
        .orderBy($"r_name", $"o_orderstatus")
    }),

    // Theta/range self-join on events, BANDED for scale: pairs of events
    // by the same user where the second follows the first by <= 10 minutes.
    // The equi key is (user, time-bucket), bucket width = the band width
    // (10 min), so any qualifying pair has bucket(b) in {bucket(a),
    // bucket(a)+1}. The left side is exploded to both candidate buckets
    // (distinct values — no pair dedup needed) and the exact range
    // predicate filters inside each bucket. One hot user (a bot at 100 TB)
    // now fans out across time buckets instead of producing a single
    // unbounded quadratic task; the worst task is O((rows in 10 min)^2)
    // per user, not O((rows ever)^2).
    "q_join_range_events" -> ((s, dir) => {
      import s.implicits._
      val bandMicros = 600000000L // 10 min in microseconds
      val e = Tables(s, dir, "events")
        .select($"event_id", $"ts", $"user_id", $"event_type",
          (unix_micros($"ts") / bandMicros).cast("long").as("bucket"))
      val a = e.select($"event_id".as("a_id"), $"ts".as("a_ts"), $"user_id".as("a_user"),
          explode(array($"bucket", $"bucket" + 1)).as("a_bucket"))
      val b = e.select($"event_id".as("b_id"), $"ts".as("b_ts"), $"user_id".as("b_user"),
        $"event_type".as("b_type"), $"bucket".as("b_bucket"))
      a.join(b,
          $"a_user" === $"b_user" &&
          $"a_bucket" === $"b_bucket" &&
          $"b_ts" > $"a_ts" &&
          $"b_ts" <= $"a_ts" + expr("INTERVAL 10 MINUTES"))
        .groupBy($"a_user")
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct($"b_type").as("n_follow_types"))
        .orderBy($"a_user")
    }))

  def oracle: Map[String, String] = Map(
    "q_join_orders_lineitem" ->
      """SELECT o_orderstatus,
        |  CAST(SUM(revenue) AS double) AS sum_revenue,
        |  CAST(SUM(n_lines) AS bigint) AS n_lines,
        |  COUNT(1) AS n_orders
        |FROM orders
        |JOIN (SELECT l_orderkey,
        |        SUM(CAST(l_extendedprice * (1.0::double - l_discount) AS decimal(30,4))) AS revenue,
        |        COUNT(1) AS n_lines
        |      FROM lineitem GROUP BY l_orderkey) li
        |  ON o_orderkey = l_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_join_left_customer_orders" ->
      """SELECT c_mktsegment,
        |  COUNT(o_orderkey) AS n_orders,
        |  COUNT(DISTINCT c_custkey) AS n_cust,
        |  COUNT(1) AS n_rows
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_join_full_outer" ->
      """SELECT COALESCE(o_custkey, c_custkey) AS custkey,
        |  COALESCE(n_orders, 0) AS n_orders,
        |  c_acctbal
        |FROM (SELECT o_custkey, COUNT(1) AS n_orders FROM orders GROUP BY o_custkey) o
        |FULL OUTER JOIN (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 9000.0) c
        |  ON o_custkey = c_custkey
        |ORDER BY custkey""".stripMargin,
    "q_join_semi" ->
      """SELECT c_nationkey,
        |  COUNT(1) AS n_cust,
        |  CAST(SUM(CAST(c_acctbal AS decimal(30,2))) AS double) AS sum_bal
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "q_runtime_filter" ->
      """SELECT CAST(COUNT(1) AS bigint) AS n_li,
        |  CAST(SUM(CAST(l_quantity AS decimal(30,2))) AS double) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS decimal(30,2))) AS double) AS sum_price,
        |  TRUE AS runtime_filter_injected
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_size = 1""".stripMargin,
    "q_bloom_filter" ->
      """WITH dim AS (
        |  SELECT DISTINCT c_custkey AS k FROM customer WHERE c_custkey % 3 = 0
        |),
        |hx AS (SELECT unnest([0, 1, 2]) AS i),
        |words AS (
        |  SELECT p // 32 AS word,
        |    bit_or(1::bigint << CAST(p % 32 AS int)) AS bm
        |  FROM (SELECT CAST(('0x' || substr(md5('bf' || i || ':' || k), 1, 8)) AS bigint) % 4096 AS p
        |        FROM dim, hx)
        |  GROUP BY 1
        |),
        |fact AS (SELECT DISTINCT o_custkey AS k FROM orders),
        |fpos AS (
        |  SELECT k, CAST(('0x' || substr(md5('bf' || i || ':' || k), 1, 8)) AS bigint) % 4096 AS p
        |  FROM fact, hx
        |),
        |hits AS (
        |  SELECT f.k,
        |    CASE WHEN w.bm IS NOT NULL
        |              AND (w.bm & (1::bigint << CAST(f.p % 32 AS int)))
        |                  = (1::bigint << CAST(f.p % 32 AS int))
        |         THEN 1 ELSE 0 END AS hit
        |  FROM fpos f LEFT JOIN words w ON f.p // 32 = w.word
        |),
        |passk AS (SELECT k, MIN(hit) AS bloom_pass FROM hits GROUP BY k),
        |truth AS (
        |  SELECT f.k, CASE WHEN d.k IS NOT NULL THEN 1 ELSE 0 END AS is_member
        |  FROM fact f LEFT JOIN dim d USING (k)
        |)
        |SELECT COUNT(1) AS n_keys,
        |  CAST(SUM(p.bloom_pass) AS bigint) AS n_pass,
        |  CAST(SUM(t.is_member) AS bigint) AS n_true,
        |  CAST(SUM(p.bloom_pass) - SUM(t.is_member) AS bigint) AS n_false_pos,
        |  MIN(p.bloom_pass - t.is_member) >= 0 AS no_false_neg
        |FROM passk p JOIN truth t USING (k)""".stripMargin,
    "q_join_asof" ->
      """SELECT p.event_id AS purchase_id, p.user_id, c.event_id AS click_id,
        |  epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY purchase_id""".stripMargin,
    "q_copurchase" ->
      """WITH op AS (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
        |),
        |capped AS (
        |  SELECT op.o, op.p FROM op
        |  JOIN (SELECT o FROM op GROUP BY o HAVING count(1) <= 100) s
        |    ON op.o = s.o
        |)
        |SELECT a.p AS part_a, b.p AS part_b, count(1) AS n_orders
        |FROM capped a JOIN capped b ON a.o = b.o AND a.p < b.p
        |GROUP BY 1, 2
        |ORDER BY n_orders DESC, part_a ASC, part_b ASC
        |LIMIT 20""".stripMargin,
    "q_join_asof_tolerance" ->
      """SELECT p.event_id AS purchase_id, p.user_id,
        |  CASE WHEN epoch_us(p.ts) - epoch_us(c.ts) <= 3600000000
        |       THEN c.event_id END AS click_id,
        |  CASE WHEN epoch_us(p.ts) - epoch_us(c.ts) <= 3600000000
        |       THEN epoch_us(p.ts) - epoch_us(c.ts) END AS gap_us
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY purchase_id""".stripMargin,
    "q_join_salted_skew" ->
      """SELECT c_mktsegment, event_type, COUNT(1) AS n,
        |  CAST(SUM(CAST(value AS decimal(30,6))) AS double) AS sum_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment, event_type
        |ORDER BY c_mktsegment, event_type""".stripMargin,
    "q_join_salted_hot" ->
      """WITH fact AS (
        |  SELECT CASE WHEN event_id % 100 < 60 THEN 7
        |              ELSE event_id % 997 END AS k, value
        |  FROM events
        |),
        |dim AS (
        |  SELECT k, k % 10 AS grp
        |  FROM (SELECT DISTINCT event_id % 997 AS k FROM events)
        |)
        |SELECT grp, COUNT(1) AS n,
        |  CAST(SUM(CAST(value AS decimal(30,6))) AS double) AS sum_value
        |FROM fact LEFT JOIN dim USING (k)
        |GROUP BY grp ORDER BY grp""".stripMargin,
    "q_join_right" ->
      """SELECT c_mktsegment,
        |  COUNT(o_orderkey) AS n_finished_orders,
        |  COUNT(1) AS n_rows
        |FROM (SELECT * FROM orders WHERE o_orderstatus = 'F') o
        |RIGHT JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_join_null_safe" ->
      """WITH o AS (
        |  SELECT CASE WHEN o_orderkey % 97 = 0 THEN NULL ELSE o_custkey END AS k,
        |    o_orderkey
        |  FROM orders
        |),
        |a AS (SELECT k AS k_a, o_orderkey AS id_a FROM o WHERE o_orderkey % 2 = 0),
        |b AS (SELECT k AS k_b, o_orderkey AS id_b FROM o WHERE o_orderkey % 2 = 1)
        |SELECT k_a IS NULL AS null_key, COUNT(1) AS n_pairs,
        |  CAST(SUM(CAST(id_a + id_b AS decimal(30,0))) AS bigint) AS sum_ids
        |FROM a JOIN b ON a.k_a IS NOT DISTINCT FROM b.k_b
        |GROUP BY 1 ORDER BY null_key""".stripMargin,
    "q_join_anti" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,
    "q_join_broadcast_dims" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1.0::double - l_discount) AS decimal(30,4))) AS double) AS revenue,
        |  COUNT(1) AS n
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q_join_cross" ->
      """SELECT r_name, o_orderstatus
        |FROM (SELECT r_name FROM region)
        |CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders)
        |ORDER BY r_name, o_orderstatus""".stripMargin,
    "q_join_range_events" ->
      """SELECT a.user_id AS a_user,
        |  COUNT(1) AS n_pairs,
        |  COUNT(DISTINCT b.event_type) AS n_follow_types
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id
        | AND b.ts > a.ts
        | AND b.ts <= a.ts + INTERVAL 10 MINUTE
        |GROUP BY a.user_id ORDER BY a_user""".stripMargin)
}
