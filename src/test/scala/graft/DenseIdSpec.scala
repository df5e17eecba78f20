package graft

import graft.ops.DenseId
import org.apache.spark.sql.functions._

/** Dense-id laws: exact ROW_NUMBER semantics on a total order,
  * density/uniqueness, start offset, and partitioning invariance.
  */
class DenseIdSpec extends SparkSpec {

  import spark.implicits._

  test("ids are dense, unique, and follow the order — equal to ROW_NUMBER") {
    val df = spark.range(0, 10000).select(
      (($"id" * 2654435761L) % 99991L).as("k"), $"id".as("orig"))
    val got = DenseId.assign(df, Seq($"k", $"orig"), "rid", start = 1L)
    val n = got.count()
    assert(n == 10000L)
    // dense 1..n and unique
    val agg = got.agg(min($"rid"), max($"rid"), countDistinct($"rid")).head()
    assert((agg.getLong(0), agg.getLong(1), agg.getLong(2)) == (1L, 10000L, 10000L))
    // order law: rid order == (k, orig) order (spot-check via full sort)
    val byRid = got.orderBy($"rid").select($"k", $"orig")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byKey = got.orderBy($"k", $"orig").select($"k", $"orig")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(byRid.sameElements(byKey))
  }

  test("assignment is invariant under input partitioning and explicit part counts") {
    val df = spark.range(0, 5000).select($"id".as("k"))
    def ids(d: org.apache.spark.sql.DataFrame, p: Option[Int]) =
      DenseId.assign(d, Seq($"k"), "rid", numPartitions = p)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = ids(df.repartition(13), None)
    val b = ids(df.coalesce(1), Some(7))
    assert(a == b, "a total order must yield the same assignment regardless of layout")
  }
}
