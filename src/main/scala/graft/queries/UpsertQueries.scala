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
    "q_insert_append" ->
      """SELECT o_orderstatus, COUNT(1) AS n,
        |  CAST(SUM(CAST(o_totalprice AS decimal(30,2))) AS double) AS sum_price
        |FROM (SELECT * FROM orders
        |      UNION ALL
        |      SELECT o_orderkey, o_custkey, 'A', o_totalprice, o_orderdate, o_orderpriority
        |      FROM orders WHERE o_orderkey % 10 = 0)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
}
