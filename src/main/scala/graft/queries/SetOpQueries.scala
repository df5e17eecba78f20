package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Set operations + rich filter predicates (SURVEY.md §2 Tier C "Set ops"
  * and the C3 predicate gap: IN / BETWEEN / LIKE / regex / null-tests).
  *
  * Scale design: intersect/except distinct-ify both sides and shuffle on
  * the full row — here both inputs are pre-projected to the key column
  * only, so the shuffle carries 8-byte rows, not whole tuples. DISTINCT
  * gets map-side partial dedup from Catalyst automatically.
  */
object SetOpQueries extends graft.QueryModule {

  private def custkeysWithStatus(s: SparkSession, dir: String, st: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "orders").filter($"o_orderstatus" === st).select($"o_custkey")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // INTERSECT: customers with both an open ('O') and a finished ('F') order.
    "q_set_intersect" -> ((s, dir) => {
      import s.implicits._
      custkeysWithStatus(s, dir, "O")
        .intersect(custkeysWithStatus(s, dir, "F"))
        .orderBy($"o_custkey")
    }),

    // EXCEPT: customers with an open order but no finished order.
    "q_set_except" -> ((s, dir) => {
      import s.implicits._
      custkeysWithStatus(s, dir, "O")
        .except(custkeysWithStatus(s, dir, "F"))
        .orderBy($"o_custkey")
    }),

    // UNION (bag → distinct) of two filtered projections + dropDuplicates.
    "q_set_union_distinct" -> ((s, dir) => {
      import s.implicits._
      val hi = Tables(s, dir, "customer").filter($"c_acctbal" > 9000.0)
        .select($"c_nationkey", $"c_mktsegment")
      val lo = Tables(s, dir, "customer").filter($"c_acctbal" < -500.0)
        .select($"c_nationkey", $"c_mktsegment")
      hi.unionByName(lo).dropDuplicates()
        .orderBy($"c_nationkey", $"c_mktsegment")
    }),

    // Predicate surface (C3): BETWEEN + IN + LIKE + regex + null-test in
    // one pushdown-friendly conjunction over `part`.
    "q_filter_predicates" -> ((s, dir) => {
      import s.implicits._
      Tables(s, dir, "part")
        .filter(
          $"p_size".between(10, 20) &&
          $"p_brand".isin("Brand#1", "Brand#7", "Brand#13", "Brand#19") &&
          $"p_name".like("%e%") &&
          $"p_name".rlike("^(red|blue|green|small|hot)") &&
          $"p_type".isNotNull)
        .select($"p_partkey", $"p_name", $"p_brand", $"p_type", $"p_size")
        .orderBy($"p_partkey")
    }))

  def oracle: Map[String, String] = Map(
    "q_set_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_custkey""".stripMargin,
    "q_set_except" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_custkey""".stripMargin,
    "q_set_union_distinct" ->
      """SELECT DISTINCT c_nationkey, c_mktsegment
        |FROM (SELECT c_nationkey, c_mktsegment FROM customer WHERE c_acctbal > 9000.0
        |      UNION ALL
        |      SELECT c_nationkey, c_mktsegment FROM customer WHERE c_acctbal < -500.0)
        |ORDER BY c_nationkey, c_mktsegment""".stripMargin,
    "q_filter_predicates" ->
      """SELECT p_partkey, p_name, p_brand, p_type, p_size
        |FROM part
        |WHERE p_size BETWEEN 10 AND 20
        |  AND p_brand IN ('Brand#1', 'Brand#7', 'Brand#13', 'Brand#19')
        |  AND p_name LIKE '%e%'
        |  AND regexp_matches(p_name, '^(red|blue|green|small|hot)')
        |  AND p_type IS NOT NULL
        |ORDER BY p_partkey""".stripMargin)
}
