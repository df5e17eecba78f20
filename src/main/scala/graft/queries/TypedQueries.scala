package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed `Dataset[T]` surface: case-class Encoders, typed lambda filter,
  * typed groupByKey + Aggregator.toColumn (no mapGroups — a typed
  * Aggregator still runs as a real partial+final hash aggregate with
  * map-side combine, where mapGroups would shuffle whole groups).
  *
  * Scale note, and why the engine's own operators stay Column-based:
  * typed lambdas are OPAQUE to Catalyst — the `filter(c => ...)` below
  * does NOT push down to the parquet scan and forces deserialization of
  * every row into the case class, where the equivalent Column predicate
  * prunes row groups at the scan. Type safety is a user-facing API
  * affordance; hot paths should keep predicates in Column form.
  */
object TypedQueries extends graft.QueryModule {

  case class Customer(c_custkey: Long, c_name: String, c_nationkey: Int,
      c_acctbal: Double, c_mktsegment: String)

  /** Typed sum-of-balance Aggregator over Customer. */
  object BalSum extends org.apache.spark.sql.expressions.Aggregator[Customer, Double, Double] {
    def zero: Double = 0.0
    def reduce(b: Double, c: Customer): Double = b + c.c_acctbal
    def merge(b1: Double, b2: Double): Double = b1 + b2
    def finish(r: Double): Double = r
    def bufferEncoder: org.apache.spark.sql.Encoder[Double] =
      org.apache.spark.sql.Encoders.scalaDouble
    def outputEncoder: org.apache.spark.sql.Encoder[Double] =
      org.apache.spark.sql.Encoders.scalaDouble
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Dataset[Customer]: typed filter + groupByKey + typed Aggregator.
    // Count is exact; the double balance sum is rounded to 2dp THROUGH a
    // decimal (order-insensitive at that precision for 2dp inputs) so the
    // typed fold's nondeterministic merge order cannot leak into the hash.
    "q_typed_dataset" -> ((s, dir) => {
      import s.implicits._
      Tables(s, dir, "customer").as[Customer]
        .filter(c => c.c_acctbal > 5000.0 && c.c_mktsegment != "MACHINERY")
        .groupByKey(_.c_nationkey)
        .agg(BalSum.toColumn.name("bal_sum"))
        .toDF("c_nationkey", "bal_sum")
        .select($"c_nationkey",
          round($"bal_sum".cast("decimal(30,4)"), 2).cast("double").as("bal_sum"))
        .orderBy($"c_nationkey")
    }))

  def oracle: Map[String, String] = Map(
    "q_typed_dataset" ->
      """SELECT c_nationkey,
        |  CAST(ROUND(CAST(SUM(CAST(c_acctbal AS decimal(30,4))) AS decimal(30,4)), 2) AS double) AS bal_sum
        |FROM customer
        |WHERE c_acctbal > 5000.0 AND c_mktsegment <> 'MACHINERY'
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)
}
