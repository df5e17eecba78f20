package graft

import graft.ops.Skew
import org.apache.spark.sql.functions._

/** Salted skew join: result-identical to the plain join, and the salt
  * actually spreads a hot key across buckets.
  */
class SkewSpec extends SparkSpec {

  import spark.implicits._

  test("saltedJoin equals the plain inner join, including duplicate rows") {
    // hot key 1 dominates; duplicates present on both sides of the data
    val big = (Seq.fill(500)((1L, "a")) ++ Seq((2L, "b"), (2L, "b"), (3L, "c")))
      .toDF("k", "payload")
    val dim = Seq((1L, "one"), (2L, "two"), (4L, "four")).toDF("k", "name")
    val salted = Skew.saltedJoin(big, dim, "k", 8)
      .groupBy($"k", $"payload", $"name").count()
    val plain = big.join(dim, Seq("k"))
      .groupBy($"k", $"payload", $"name").count()
    assert(salted.except(plain).count() === 0)
    assert(plain.except(salted).count() === 0)
  }

  test("a hot key's rows land in multiple salt buckets") {
    val big = (1 to 1000).map(i => (1L, s"row$i")).toDF("k", "payload")
    val buckets = big
      .withColumn("__salt", pmod(xxhash64(big.columns.map(col): _*), lit(8L)).cast("int"))
      .select("__salt").distinct().count()
    assert(buckets > 4, s"expected the hot key spread over >4 of 8 buckets, got $buckets")
  }
}
