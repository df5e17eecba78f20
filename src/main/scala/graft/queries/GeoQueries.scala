package graft.queries

import graft.Tables
import graft.ops.Geo
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Geospatial entries: grid-blocked proximity join and geohash encoding.
  * Coordinates are synthesized DETERMINISTICALLY from the TPC-H keys with
  * pure integer arithmetic, so both engines construct the identical point
  * sets and every comparison stays in exact bigint — the hash match
  * proves the 3×3 neighborhood is complete (a missed boundary pair would
  * flip it).
  */
object GeoQueries extends graft.QueryModule {

  // 100 km × 100 km box, metres; multipliers are primes so the points
  // scatter; supplier offsets decorrelate the two sets.
  private def custPoints(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "customer").select($"c_custkey".as("pid"),
      ($"c_custkey" * 7919L % 100000L).as("x"),
      ($"c_custkey" * 104729L % 100000L).as("y"))
  }

  private def suppPoints(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "supplier").select($"s_suppkey".as("pid"),
      (($"s_suppkey" * 6271L + 13337L) % 100000L).as("x"),
      (($"s_suppkey" * 31337L + 71993L) % 100000L).as("y"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // All customer-supplier pairs within 5 km: one cell shuffle + a
    // bounded ×9 replication, never a cross join. Oracle is the full
    // cross product with the same integer predicate — the hash match IS
    // the neighborhood-completeness proof, boundary pairs included.
    "q_geo_join" -> ((s, dir) => {
      import s.implicits._
      Geo.proximityJoin(custPoints(s, dir), suppPoints(s, dir),
          "pid", "x", "y", radius = 5000L, cell = 5000L)
        .select($"id_a".as("custkey"), $"id_b".as("suppkey"), $"dist2")
        .orderBy($"custkey", $"suppkey")
    }),

    // Geohash-6 of synthetic micro-degree coordinates — the column
    // arithmetic must match the unrolled bit-twiddling SQL char-for-char.
    "q_geohash" -> ((s, dir) => {
      import s.implicits._
      Tables(s, dir, "customer")
        .select($"c_custkey".as("custkey"),
          ($"c_custkey" * 37L % 180000000L - 90000000L).as("lat_u"),
          ($"c_custkey" * 101L % 360000000L - 180000000L).as("lon_u"))
        .withColumn("gh6", Geo.geohash($"lat_u", $"lon_u", 6))
        .orderBy($"custkey")
    }))

  def oracle: Map[String, String] = Map(
    "q_geo_join" ->
      """WITH c AS (
        |  SELECT c_custkey AS custkey,
        |    c_custkey * 7919 % 100000 AS x,
        |    c_custkey * 104729 % 100000 AS y
        |  FROM customer
        |),
        |s AS (
        |  SELECT s_suppkey AS suppkey,
        |    (s_suppkey * 6271 + 13337) % 100000 AS x,
        |    (s_suppkey * 31337 + 71993) % 100000 AS y
        |  FROM supplier
        |)
        |SELECT c.custkey, s.suppkey,
        |  CAST((c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y) AS bigint) AS dist2
        |FROM c, s
        |WHERE (c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y) <= 25000000
        |ORDER BY custkey, suppkey""".stripMargin,
    "q_geohash" ->
      s"""SELECT c_custkey AS custkey,
         |  c_custkey * 37 % 180000000 - 90000000 AS lat_u,
         |  c_custkey * 101 % 360000000 - 180000000 AS lon_u,
         |  ${Geo.geohashSql("c_custkey * 37 % 180000000 - 90000000",
             "c_custkey * 101 % 360000000 - 180000000", 6)} AS gh6
         |FROM customer ORDER BY custkey""".stripMargin)
}
