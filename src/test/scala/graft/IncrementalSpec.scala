package graft

import graft.ops.Incremental
import org.apache.spark.sql.DataFrame

/** Incremental-aggregate laws: merge(state(A), state(B)) == state(A∪B),
  * batch-order independence, and multi-way merge associativity.
  */
class IncrementalSpec extends SparkSpec {

  private def rows(df: DataFrame) =
    df.orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2), r.getDouble(3), r.getDouble(4)))
      .toSeq

  private def fixture = {
    import spark.implicits._
    Seq(("a", 1.5), ("a", -2.25), ("b", 10.0), ("a", 7.0), ("b", 0.5), ("c", 3.125))
      .toDF("k", "v")
  }

  test("merge of split states equals the state of the union, any split or order") {
    import spark.implicits._
    val full = Incremental.state(fixture, Seq("k"), "v")
    for (m <- Seq(2, 3)) {
      val parts = (0 until m).map(i =>
        Incremental.state(fixture.filter(monotonicallyIncreasingIdFree(i, m)), Seq("k"), "v"))
      assert(rows(Incremental.merge(parts, Seq("k"))) == rows(full), s"split m=$m")
      assert(rows(Incremental.merge(parts.reverse, Seq("k"))) == rows(full),
        s"reversed batch order m=$m")
    }
  }

  // deterministic row split without relying on row ids: hash of the value
  private def monotonicallyIncreasingIdFree(i: Int, m: Int) = {
    import org.apache.spark.sql.functions._
    pmod(xxhash64(col("v")), lit(m.toLong)) === i.toLong
  }

  test("merging an empty state is the identity") {
    import org.apache.spark.sql.functions.lit
    val full = Incremental.state(fixture, Seq("k"), "v")
    val empty = Incremental.state(fixture.filter(lit(false)), Seq("k"), "v")
    assert(rows(Incremental.merge(Seq(full, empty), Seq("k"))) == rows(full))
  }
}
