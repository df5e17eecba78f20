package graft

import graft.ops.Linkage
import org.apache.spark.sql.functions._

/** Record-linkage laws: threshold match, blocking contract (cross-block
  * pairs never compared), transitive entity closure, singleton identity,
  * and an equi-join-only plan (blocking must never degrade to a
  * cartesian compare).
  */
class LinkageSpec extends SparkSpec {

  import spark.implicits._

  private def recs(rows: (Long, String)*) = rows.toDF("id", "name")

  private val prefix3 = substring(col("name"), 1, 3)

  test("typos within maxDist link; beyond maxDist stay separate") {
    val r = recs(1L -> "abcdef", 2L -> "abcdxf", 3L -> "abczzz")
    val out = Linkage.resolve(r, "id", "name", prefix3, 1)
      .orderBy("record_id").as[(Long, Long)].collect().toSeq
    // 1~2 differ by one substitution; 3 is distance 3 from both
    assert(out === Seq((1L, 1L), (2L, 1L), (3L, 3L)))
  }

  test("cross-block pairs are never compared, even when names would match") {
    val r = recs(1L -> "aaa same", 2L -> "bbb same")
    // distance 3 ≤ maxDist 5 — they would link if ever compared, but the
    // prefix blocks differ, so both stay singleton entities
    val out = Linkage.resolve(r, "id", "name", prefix3, 5)
      .orderBy("record_id").as[(Long, Long)].collect().toSeq
    assert(out === Seq((1L, 1L), (2L, 2L)))
  }

  test("entities close transitively beyond the pairwise bound") {
    // A~B and B~C at distance 1 each, but dist(A, C) = 2 > maxDist 1:
    // one entity regardless — linkage is transitive, edit distance isn't
    val r = recs(1L -> "aaaaaa", 2L -> "aaaaax", 3L -> "aaaaxx")
    val out = Linkage.resolve(r, "id", "name", prefix3, 1)
      .orderBy("record_id").as[(Long, Long)].collect().toSeq
    assert(out === Seq((1L, 1L), (2L, 1L), (3L, 1L)))
  }

  test("matches emits exactly the bounded within-block pairs") {
    val r = recs(1L -> "abcdef", 2L -> "abcdex", 3L -> "abcxyz",
      4L -> "zzzdef")
    val pairs = Linkage.matches(r, "id", "name", prefix3, 2)
      .orderBy("id_a", "id_b").as[(Long, Long)].collect().toSeq
    // (1,2) dist 1; (1,3)/(2,3) dist 3 > 2; 4 in another block
    assert(pairs === Seq((1L, 2L)))
  }

  test("match plan is equi-join only — no cartesian, no BNLJ") {
    val r = recs(1L -> "abcdef", 2L -> "abcdex", 3L -> "zzzdef")
    val p = Linkage.matches(r, "id", "name", prefix3, 2)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"blocked match must stay an equi-join:\n$p")
  }

  private def asg(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
    df.orderBy("record_id").as[(Long, Long)].collect().toSeq

  test("incremental: batch(A then B) equals full(A ∪ B), including a cross-batch entity MERGE") {
    import graft.ops.IncrementalLinkage
    val st = tmpDir("inc-linkage")
    // batch 1: two DISTINCT entities in one block ("aaaaaa" vs "aaaaxx",
    // dist 2 > maxDist 1) plus a singleton in another block
    val b1 = recs(1L -> "aaaaaa", 2L -> "aaaaxx", 7L -> "zzzzzz")
    // batch 2: "aaaaax" bridges BOTH prior entities (dist 1 to each) —
    // the cross-batch merge case: two stored entities must collapse
    val b2 = recs(3L -> "aaaaax", 8L -> "zzzzzx")
    IncrementalLinkage.addBatch(spark, st, b1, "id", "name", prefix3, 1)
    val inc = asg(IncrementalLinkage.addBatch(spark, st, b2, "id", "name", prefix3, 1))
    val full = asg(Linkage.resolve(
      b1.unionByName(b2), "id", "name", prefix3, 1))
    assert(inc === full, s"incremental $inc must equal full $full")
    // and the merge really happened: 1, 2, 3 share one entity
    val byId = inc.toMap
    assert(byId(1L) == byId(2L) && byId(2L) == byId(3L) && byId(1L) == 1L)
    assert(byId(7L) == byId(8L) && byId(7L) == 7L)
  }

  test("incremental probe plan is equi-join only — no cartesian, no BNLJ") {
    val keyed = recs(1L -> "abcdef", 2L -> "abcdex")
      .select($"id", $"name", substring($"name", 1, 3).as("blk"))
    val index = recs(3L -> "abcdez", 4L -> "zzzdef")
      .select($"id", $"name", substring($"name", 1, 3).as("blk"))
    val p = graft.ops.IncrementalLinkage.probePairs(keyed, index, 2)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"the incremental probe must stay a blocking-key equi-join:\n$p")
  }

  test("incremental: a replayed batch is a state no-op") {
    import graft.ops.IncrementalLinkage
    val st = tmpDir("inc-linkage-replay")
    val b1 = recs(1L -> "abcdef", 2L -> "abcdex")
    val first = asg(IncrementalLinkage.addBatch(spark, st, b1, "id", "name", prefix3, 2))
    val replay = asg(IncrementalLinkage.addBatch(spark, st, b1, "id", "name", prefix3, 2))
    assert(replay === first, "replaying the same batch must not change the assignment")
    assert(spark.read.parquet(s"$st/recs").count() == 2,
      "the index must not double-hold replayed records")
  }
}
