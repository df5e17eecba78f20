package graft

import graft.llm.Decontaminate
import org.apache.spark.sql.functions._

/** Decontamination laws: token-boundary exactness, distinct-hit
  * counting, normalization parity, and the clean() complement.
  */
class DecontaminateSpec extends SparkSpec {

  import spark.implicits._

  test("token-boundary n-gram hits, distinct counting, clean complement") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "quick brown fox somewhere else entirely today"),  // shares gram
      (3L, "a quickbrown fox mash up with no boundary"),      // no token match
      (4L, "the quick brown fox and again the quick brown fox"), // repeat: 1 hit
      (5L, "totally unrelated text about nothing at all")
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "THE   Quick Brown\tFox")).toDF("doc_id", "text")
    val f = Decontaminate.flag(corpus, bench, "text", "doc_id", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // bench grams (n=3): "the quick brown", "quick brown fox"
    assert(f == Map(1L -> 2L, 2L -> 1L, 4L -> 2L),
      s"got $f — 3 must not match inside 'quickbrown', repeats count once")
    val kept = Decontaminate.clean(corpus, bench, "text", "doc_id", 3)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L, 5L))
  }

  test("docs shorter than n produce no grams and never match") {
    val corpus = Seq((1L, "short doc"), (2L, "a b c d")).toDF("doc_id", "text")
    val bench = Seq((9L, "short doc")).toDF("doc_id", "text")
    assert(Decontaminate.flag(corpus, bench, "text", "doc_id", 3).count() == 0)
    // and a doc of exactly n tokens yields exactly one gram
    val one = Decontaminate.flag(
      Seq((1L, "a b c")).toDF("doc_id", "text"),
      Seq((9L, "x a b c y")).toDF("doc_id", "text"), "text", "doc_id", 3)
      .collect()
    assert(one.length == 1 && one.head.getLong(1) == 1L)
  }

  test("incremental gram index: addBench(A);addBench(B) == one-shot flag(A∪B); replay no-op") {
    val st = tmpDir("decon-inc") + "/grams"
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "one two three four five"),
      (3L, "nothing shared here at all")
    ).toDF("doc_id", "text")
    val benchA = Seq((10L, "alpha beta gamma")).toDF("doc_id", "text")
    val benchB = Seq((11L, "two three four")).toDF("doc_id", "text")
    val n1 = graft.llm.IncrementalDecontaminate.addBench(spark, benchA, "text", 3, st)
    val n2 = graft.llm.IncrementalDecontaminate.addBench(spark, benchB, "text", 3, st)
    assert(n2 > n1)
    val inc = graft.llm.IncrementalDecontaminate
      .flag(spark, corpus, "text", "doc_id", 3, st)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val full = Decontaminate.flag(corpus, benchA.unionByName(benchB),
      "text", "doc_id", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(inc == full && inc.keySet == Set(1L, 2L))
    // replayed batch is a state no-op
    val n3 = graft.llm.IncrementalDecontaminate.addBench(spark, benchA, "text", 3, st)
    assert(n3 == n2, s"replay must not grow the index: $n3 vs $n2")
    // n mismatch fails loudly
    val e = intercept[IllegalArgumentException] {
      graft.llm.IncrementalDecontaminate.flag(spark, corpus, "text", "doc_id", 4, st)
    }
    assert(e.getMessage.contains("n="))
  }

  test("the broadcast probe plan: corpus side joins map-side") {
    val corpus = spark.range(0, 200).select($"id".as("doc_id"),
      concat(lit("w"), $"id", lit(" common phrase here padding tokens")).as("text"))
    val bench = Seq((0L, "common phrase here")).toDF("doc_id", "text")
    val plan = Decontaminate.flag(corpus, bench, "text", "doc_id", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"the bench gram set must broadcast into a semi-join:\n${plan.take(2000)}")
  }
}
