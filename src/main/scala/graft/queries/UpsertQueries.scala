package graft.queries

import graft.Tables
import graft.ops.Upsert
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked entries for the upsert module (SURVEY.md B3/B4/B6/A11;
  * reference MERGE template `/root/reference/SharedCode/PGHelperFunction.py:44-57`).
  *
  * The source relation is derived from `orders` so DuckDB can reconstruct
  * it exactly: an UPDATE slice (keys % 10 = 0, status→'U', price doubled —
  * ×2 is exact in IEEE double), a deliberate DUPLICATE-key slice
  * (keys % 20 = 0, differing only in o_orderpriority='zz-dup', which the
  * deterministic dedup must lose), and an INSERT slice (fresh keys
  * o_orderkey+10,000,000, status 'N').
  */
object UpsertQueries extends graft.QueryModule {

  private def sourceFor(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    import s.implicits._
    val orders = Tables(s, dir, "orders")
    val updates = orders.filter($"o_orderkey" % 10 === 0)
      .withColumn("o_orderstatus", lit("U"))
      .withColumn("o_totalprice", $"o_totalprice" * 2)
    val dups = updates.filter($"o_orderkey" % 20 === 0)
      .withColumn("o_orderpriority", lit("zz-dup"))
    val inserts = orders.filter($"o_orderkey" % 100 === 0)
      .withColumn("o_orderkey", $"o_orderkey" + 10000000L)
      .withColumn("o_orderstatus", lit("N"))
    (orders, updates.unionByName(dups).unionByName(inserts))
  }

  private def project(df: DataFrame): DataFrame =
    df.select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        col("o_orderpriority"))
      .orderBy(col("o_orderkey"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Full MERGE: update + insert + source-dup collapse, row-level checked.
    "q_upsert" -> ((s, dir) => {
      val (target, source) = sourceFor(s, dir)
      project(Upsert.merge(target, source, Seq("o_orderkey")))
    }),

    // Idempotence law: merge(merge(t,s),s) == merge(t,s). Shares the
    // q_upsert oracle — a second application must be a no-op.
    "q_upsert_idempotent" -> ((s, dir) => {
      val (target, source) = sourceFor(s, dir)
      val once = Upsert.merge(target, source, Seq("o_orderkey"))
      project(Upsert.merge(once, source, Seq("o_orderkey")))
    }),

    // SCD2 dimension merge: changed keys (price doubled for % 60 = 0)
    // close their current version at the batch stamp and open a new one;
    // unchanged keys and closed history stay untouched; a brand-new key
    // opens at the stamp. Version buckets (eff_from, eff_to) are the
    // deterministic audit.
    "q_scd2" -> ((s, dir) => {
      import s.implicits._
      val part = Tables(s, dir, "part").filter($"p_partkey" % 20 === 0)
        .select($"p_partkey", $"p_brand", $"p_retailprice")
      val target = part
        .withColumn("eff_from", lit("2024-01-01"))
        .withColumn("eff_to", lit(null).cast("string"))
        .unionByName(Seq(
          (-5L, "hist-brand", 1.0, "2023-01-01", "2024-01-01"),
          (-5L, "cur-brand", 2.0, "2024-01-01", null: String))
          .toDF("p_partkey", "p_brand", "p_retailprice", "eff_from", "eff_to"))
      val updates = part
        // ×2 is exact in IEEE doubles — no cross-engine rounding drift
        .withColumn("p_retailprice",
          when($"p_partkey" % 60 === 0, $"p_retailprice" * 2)
            .otherwise($"p_retailprice"))
        .unionByName(Seq((-9L, "new-brand", 3.5))
          .toDF("p_partkey", "p_brand", "p_retailprice"))
      graft.ops.Scd2.merge(target, updates, Seq("p_partkey"),
          Seq("p_brand", "p_retailprice"), "2024-06-01")
        .groupBy($"eff_from", coalesce($"eff_to", lit("current")).as("eff_to_b"))
        .agg(count(lit(1)).as("n"),
          countDistinct($"p_partkey").as("n_keys"),
          sum($"p_retailprice".cast("decimal(30,2)")).cast("double").as("sum_price"),
          min($"p_partkey").as("min_key"), max($"p_partkey").as("max_key"))
        .orderBy($"eff_from", $"eff_to_b")
    }),

    // SCD2 FULL-SNAPSHOT merge (closeMissing = true): same fixture, but
    // the batch is a snapshot that DROPS every % 40 = 0 key (and the -5
    // current row) — their open versions must close at the stamp, the
    // delete-detection branch an incremental feed never exercises. The
    // % 60 = 0 price change and the brand-new -9 key ride along so one
    // entry covers close-by-change, close-by-absence, keep, and open.
    "q_scd2_snapshot" -> ((s, dir) => {
      import s.implicits._
      val part = Tables(s, dir, "part").filter($"p_partkey" % 20 === 0)
        .select($"p_partkey", $"p_brand", $"p_retailprice")
      val target = part
        .withColumn("eff_from", lit("2024-01-01"))
        .withColumn("eff_to", lit(null).cast("string"))
        .unionByName(Seq(
          (-5L, "hist-brand", 1.0, "2023-01-01", "2024-01-01"),
          (-5L, "cur-brand", 2.0, "2024-01-01", null: String))
          .toDF("p_partkey", "p_brand", "p_retailprice", "eff_from", "eff_to"))
      val snapshot = part
        .filter($"p_partkey" % 40 =!= 0) // vanished keys
        .withColumn("p_retailprice",
          when($"p_partkey" % 60 === 0, $"p_retailprice" * 2)
            .otherwise($"p_retailprice"))
        .unionByName(Seq((-9L, "new-brand", 3.5))
          .toDF("p_partkey", "p_brand", "p_retailprice"))
      graft.ops.Scd2.merge(target, snapshot, Seq("p_partkey"),
          Seq("p_brand", "p_retailprice"), "2024-06-01", closeMissing = true)
        .groupBy($"eff_from", coalesce($"eff_to", lit("current")).as("eff_to_b"))
        .agg(count(lit(1)).as("n"),
          countDistinct($"p_partkey").as("n_keys"),
          sum($"p_retailprice".cast("decimal(30,2)")).cast("double").as("sum_price"),
          min($"p_partkey").as("min_key"), max($"p_partkey").as("max_key"))
        .orderBy($"eff_from", $"eff_to_b")
    }),

    // Append sink semantics (A11): raw UNION ALL, duplicate keys retained.
    "q_insert_append" -> ((s, dir) => {
      import s.implicits._
      val orders = Tables(s, dir, "orders")
      val appended = orders.filter($"o_orderkey" % 10 === 0)
        .withColumn("o_orderstatus", lit("A"))
      orders.unionByName(appended)
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum($"o_totalprice".cast("decimal(30,2)")).cast("double").as("sum_price"))
        .orderBy($"o_orderstatus")
    }))

  private val mergeOracle =
    """WITH src AS (
      |  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
      |         o_totalprice * 2 AS o_totalprice, o_orderdate, o_orderpriority
      |  FROM orders WHERE o_orderkey % 10 = 0
      |  UNION ALL
      |  SELECT o_orderkey, o_custkey, 'U', o_totalprice * 2, o_orderdate, 'zz-dup'
      |  FROM orders WHERE o_orderkey % 20 = 0
      |  UNION ALL
      |  SELECT o_orderkey + 10000000, o_custkey, 'N', o_totalprice, o_orderdate, o_orderpriority
      |  FROM orders WHERE o_orderkey % 100 = 0
      |),
      |dedup AS (
      |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
      |  FROM (SELECT s.*, ROW_NUMBER() OVER (PARTITION BY o_orderkey
      |          ORDER BY o_custkey ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST,
      |                   o_totalprice ASC NULLS FIRST, o_orderdate ASC NULLS FIRST,
      |                   o_orderpriority ASC NULLS FIRST) AS rn
      |        FROM src s)
      |  WHERE rn = 1
      |),
      |merged AS (
      |  SELECT * FROM dedup
      |  UNION ALL
      |  SELECT t.* FROM orders t
      |  WHERE NOT EXISTS (SELECT 1 FROM dedup d WHERE d.o_orderkey = t.o_orderkey)
      |)
      |SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
      |FROM merged ORDER BY o_orderkey""".stripMargin

  def oracle: Map[String, String] = Map(
    "q_upsert" -> mergeOracle,
    "q_upsert_idempotent" -> mergeOracle,
    "q_scd2" ->
      """WITH p AS (
        |  SELECT p_partkey AS k, p_brand AS b, p_retailprice AS pr
        |  FROM part WHERE p_partkey % 20 = 0
        |),
        |rows AS (
        |  SELECT CAST(-5 AS bigint) AS k, 'hist-brand' AS b, 1.0::double AS pr,
        |         '2023-01-01' AS eff_from, '2024-01-01' AS eff_to
        |  UNION ALL
        |  SELECT k, b, pr, '2024-01-01', NULL FROM p WHERE k % 60 != 0
        |  UNION ALL
        |  SELECT CAST(-5 AS bigint), 'cur-brand', 2.0::double, '2024-01-01', NULL
        |  UNION ALL
        |  SELECT k, b, pr, '2024-01-01', '2024-06-01' FROM p WHERE k % 60 = 0
        |  UNION ALL
        |  SELECT k, b, pr * 2, '2024-06-01', NULL FROM p WHERE k % 60 = 0
        |  UNION ALL
        |  SELECT CAST(-9 AS bigint), 'new-brand', 3.5::double, '2024-06-01', NULL
        |)
        |SELECT eff_from, COALESCE(eff_to, 'current') AS eff_to_b, COUNT(1) AS n,
        |  COUNT(DISTINCT k) AS n_keys,
        |  CAST(SUM(CAST(pr AS decimal(30,2))) AS double) AS sum_price,
        |  MIN(k) AS min_key, MAX(k) AS max_key
        |FROM rows GROUP BY 1, 2 ORDER BY eff_from, eff_to_b""".stripMargin,
    "q_scd2_snapshot" ->
      """WITH p AS (
        |  SELECT p_partkey AS k, p_brand AS b, p_retailprice AS pr
        |  FROM part WHERE p_partkey % 20 = 0
        |),
        |rows AS (
        |  SELECT CAST(-5 AS bigint) AS k, 'hist-brand' AS b, 1.0::double AS pr,
        |         '2023-01-01' AS eff_from, '2024-01-01' AS eff_to
        |  UNION ALL
        |  SELECT CAST(-5 AS bigint), 'cur-brand', 2.0::double, '2024-01-01', '2024-06-01'
        |  UNION ALL
        |  SELECT k, b, pr, '2024-01-01', NULL FROM p WHERE k % 40 != 0 AND k % 60 != 0
        |  UNION ALL
        |  SELECT k, b, pr, '2024-01-01', '2024-06-01' FROM p WHERE k % 40 = 0
        |  UNION ALL
        |  SELECT k, b, pr, '2024-01-01', '2024-06-01' FROM p WHERE k % 40 != 0 AND k % 60 = 0
        |  UNION ALL
        |  SELECT k, b, pr * 2, '2024-06-01', NULL FROM p WHERE k % 40 != 0 AND k % 60 = 0
        |  UNION ALL
        |  SELECT CAST(-9 AS bigint), 'new-brand', 3.5::double, '2024-06-01', NULL
        |)
        |SELECT eff_from, COALESCE(eff_to, 'current') AS eff_to_b, COUNT(1) AS n,
        |  COUNT(DISTINCT k) AS n_keys,
        |  CAST(SUM(CAST(pr AS decimal(30,2))) AS double) AS sum_price,
        |  MIN(k) AS min_key, MAX(k) AS max_key
        |FROM rows GROUP BY 1, 2 ORDER BY eff_from, eff_to_b""".stripMargin,
    "q_insert_append" ->
      """SELECT o_orderstatus, COUNT(1) AS n,
        |  CAST(SUM(CAST(o_totalprice AS decimal(30,2))) AS double) AS sum_price
        |FROM (SELECT * FROM orders
        |      UNION ALL
        |      SELECT o_orderkey, o_custkey, 'A', o_totalprice, o_orderdate, o_orderpriority
        |      FROM orders WHERE o_orderkey % 10 = 0)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
}
