package graft

import graft.ops.Geo
import org.apache.spark.sql.functions._

/** Laws of the geo operators: proximity join vs brute force (incl. exact
  * boundary and negative coordinates), neighborhood-completeness
  * precondition, and geohash vs the classic binary-subdivision algorithm.
  */
class GeoSpec extends SparkSpec {

  /** Reference geohash: textbook interval-halving over double degrees. */
  private def refGeohash(lat: Double, lon: Double, chars: Int): String = {
    val alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"
    var (latLo, latHi, lonLo, lonHi) = (-90.0, 90.0, -180.0, 180.0)
    val bits = new StringBuilder
    var even = true
    while (bits.length < 5 * chars) {
      if (even) {
        val mid = (lonLo + lonHi) / 2
        if (lon >= mid) { bits += '1'; lonLo = mid } else { bits += '0'; lonHi = mid }
      } else {
        val mid = (latLo + latHi) / 2
        if (lat >= mid) { bits += '1'; latLo = mid } else { bits += '0'; latHi = mid }
      }
      even = !even
    }
    bits.toString.grouped(5)
      .map(b => alphabet(Integer.parseInt(b, 2))).mkString
  }

  test("geohash column matches the binary-subdivision reference") {
    import spark.implicits._
    // micro-degree points chosen OFF subdivision boundaries (the integer
    // quantizer and the double reference agree everywhere except inputs
    // that are exact binary-subdivision midpoints of the double walk,
    // where micro-degree rounding is the truth)
    val pts = Seq(
      (1L, 51507400L, -127800L),     // London
      (2L, -33868800L, 151209300L),  // Sydney
      (3L, 40712800L, -74006000L),   // NYC
      (4L, -1286400L, 36817200L),    // Nairobi
      (5L, 35689500L, 139691700L),   // Tokyo
      (6L, 1352083L, 103819836L))    // Singapore
    val got = pts.toDF("id", "lat_u", "lon_u")
      .withColumn("gh", Geo.geohash(col("lat_u"), col("lon_u"), 8))
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    for ((id, latU, lonU) <- pts) {
      val want = refGeohash(latU / 1e6, lonU / 1e6, 8)
      assert(got(id) == want, s"id $id: got ${got(id)}, want $want")
    }
  }

  test("geohash of (0,0) starts with s and zeros (quantizer edge)") {
    import spark.implicits._
    val gh = Seq((0L, 0L)).toDF("lat_u", "lon_u")
      .select(Geo.geohash(col("lat_u"), col("lon_u"), 6)).head.getString(0)
    assert(gh == "s00000")
  }

  test("proximity join == brute force, boundary pair included") {
    import spark.implicits._
    // 3-4-5 pair at EXACTLY radius 5000: (0,0) vs (3000,4000)
    val a = Seq((1L, 0L, 0L), (2L, 50000L, 50000L), (3L, -7000L, -7000L))
      .toDF("pid", "x", "y")
    val b = Seq((10L, 3000L, 4000L), (11L, 50001L, 50001L),
      (12L, -7001L, -7001L), (13L, 90000L, 90000L)).toDF("pid", "x", "y")
    val got = Geo.proximityJoin(a, b, "pid", "x", "y", 5000L, 5000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = a.toDF("ida", "xa", "ya").crossJoin(b.toDF("idb", "xb", "yb"))
      .select(col("ida"), col("idb"),
        ((col("xa") - col("xb")) * (col("xa") - col("xb")) +
          (col("ya") - col("yb")) * (col("ya") - col("yb"))).as("d2"))
      .filter(col("d2") <= 25000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == brute)
    assert(got.contains((1L, 10L, 25000000L)), "exact-radius pair kept")
    assert(got.contains((3L, 12L, 2L)), "negative-coordinate pair kept")
  }

  test("cell smaller than radius is rejected") {
    import spark.implicits._
    val d = Seq((1L, 0L, 0L)).toDF("pid", "x", "y")
    intercept[IllegalArgumentException] {
      Geo.proximityJoin(d, d, "pid", "x", "y", 5000L, 4999L)
    }
  }
}
