package graft

import graft.llm.{SetJoin, TextOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Laws of the exact prefix-filter similarity join: no-miss vs brute
  * force (the defining guarantee), exact behavior AT the threshold
  * boundary, candidate-superset containment, and degenerate inputs.
  */
class SetJoinSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "a completely different document about spark query engines and shuffles"),
      (3L, "numbers and tables and columns and rows and joins and aggregates here"),
      (101L, "the quick brown fox jumps over the lazy cat near the river bank"),
      (102L, "a completely different document about flink query engines and shuffles"),
      (201L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (301L, "solo outlier text sharing nothing with anyone else whatsoever today"),
      // exact-boundary pair: sets {a b c d} vs {a b c e} → J = 3/5 = 0.6
      (401L, "alpha beta gamma delta"),
      (402L, "alpha beta gamma epsilon")).toDF("doc_id", "text")
  }

  /** Brute-force all-pairs token Jaccard ≥ t — the ground truth. */
  private def bruteForce(d: DataFrame, t: Double): Set[(Long, Long, Double)] = {
    val sets = d.select(col("doc_id").as("id"),
      array_distinct(TextOps.tokens(col("text"))).as("toks"))
    val a = sets.toDF("id_a", "toks_a")
    val b = sets.toDF("id_b", "toks_b")
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("toks_a"), col("toks_b"))).cast("double") /
          size(array_union(col("toks_a"), col("toks_b"))).cast("double")).as("j"))
      .filter(col("j") >= lit(t))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
  }

  test("similarityJoin reproduces brute force exactly, jaccard included") {
    for (t <- Seq(0.5, 0.6, 0.8)) {
      val got = SetJoin.similarityJoin(docs, "text", "doc_id", t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(5))).toSet
      assert(got == bruteForce(docs, t), s"mismatch vs brute force at t=$t")
    }
  }

  test("a pair sitting exactly AT the threshold is found (401, 402 at 0.6)") {
    val got = SetJoin.similarityJoin(docs, "text", "doc_id", 0.6)
      .filter(col("id_a") === 401L && col("id_b") === 402L).collect()
    assert(got.length == 1, "J = 3/5 = 0.6 must satisfy >= 0.6")
    assert(got.head.getLong(2) == 3L && got.head.getLong(3) == 4L)
  }

  test("exact copy scores jaccard 1.0; outlier pairs with nobody") {
    val rows = SetJoin.similarityJoin(docs, "text", "doc_id", 0.6).collect()
    val exact = rows.find(r => r.getLong(0) == 1L && r.getLong(1) == 201L)
    assert(exact.exists(_.getDouble(5) == 1.0))
    assert(!rows.exists(r => r.getLong(0) == 301L || r.getLong(1) == 301L))
  }

  test("prefix candidates are a superset of every qualifying pair") {
    import spark.implicits._
    val sets = docs.select($"doc_id".as("id"),
      array_distinct(TextOps.tokens($"text")).as("toks"))
    val cands = SetJoin.prefixCandidates(sets, 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = bruteForce(docs, 0.6).map(p => (p._1, p._2))
    assert(truth.subsetOf(cands),
      s"prefix filter missed ${truth.diff(cands)}")
  }

  test("single-doc and identical-singleton corpora behave") {
    import spark.implicits._
    val one = Seq((1L, "only doc")).toDF("doc_id", "text")
    assert(SetJoin.similarityJoin(one, "text", "doc_id", 0.5).count() == 0)
    val twins = Seq((1L, "same"), (2L, "same")).toDF("doc_id", "text")
    val got = SetJoin.similarityJoin(twins, "text", "doc_id", 0.99).collect()
    assert(got.length == 1 && got.head.getDouble(5) == 1.0)
  }

  // --- IncrementalSetJoin (persisted frozen-order prefix index) ---

  import graft.llm.IncrementalSetJoin

  private def pairs(df: DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(5))).toSet

  test("init(A) + addBatch(B) equals the full join restricted to pairs touching B") {
    import spark.implicits._
    val all = docs.collect().map(r => (r.getLong(0), r.getString(1)))
    // B gets the near-dup twins AND the boundary pair — plus tokens A
    // never saw (the frozen order's unseen-token path must stay exact)
    val bIds = Set(101L, 102L, 201L, 401L, 402L)
    val a = all.filterNot(p => bIds(p._1)).toSeq.toDF("doc_id", "text")
    val b = all.filter(p => bIds(p._1)).toSeq.toDF("doc_id", "text")
    val state = tmpDir("inc-setjoin") + "/state"
    IncrementalSetJoin.init(spark, state, a, "text", "doc_id", 0.6)
    val got = pairs(IncrementalSetJoin.addBatch(spark, state, b, "text", "doc_id", 0.6))
    val expect = bruteForce(docs, 0.6)
      .filter(p => bIds(p._1) || bIds(p._2))
    assert(got == expect, s"got-only=${got -- expect} missing=${expect -- got}")
    assert(expect.exists(p => p._1 == 401L && p._2 == 402L),
      "fixture must include a batch-internal pair at the exact boundary")
  }

  test("the incremental probe plans equi-joins only — no cartesian, no nested loop") {
    import spark.implicits._
    val state = tmpDir("inc-setjoin-plan") + "/state"
    IncrementalSetJoin.init(spark, state,
      Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text"),
      "text", "doc_id", 0.6)
    val plan = IncrementalSetJoin.addBatch(spark, state,
        Seq((2L, "alpha beta gamma epsilon")).toDF("doc_id", "text"),
        "text", "doc_id", 0.6)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      s"probe must stay equi-join shaped:\n$plan")
  }

  test("batches accumulate: a later batch pairs against every earlier batch") {
    import spark.implicits._
    val state = tmpDir("inc-setjoin-acc") + "/state"
    IncrementalSetJoin.init(spark, state,
      Seq((1L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text"),
      "text", "doc_id", 0.6)
    // batch 1 shares nothing with A
    val g1 = pairs(IncrementalSetJoin.addBatch(spark, state,
      Seq((10L, "totally novel vocabulary cluster one two three")).toDF("doc_id", "text"),
      "text", "doc_id", 0.6))
    assert(g1.isEmpty)
    // batch 2 near-dups BATCH 1 (tokens entirely unseen at init — the
    // pair exists only through the frozen-order df=0 path) and A
    val g2 = pairs(IncrementalSetJoin.addBatch(spark, state,
      Seq((20L, "totally novel vocabulary cluster one two four"),
        (21L, "the quick brown fox jumps over the lazy cat")).toDF("doc_id", "text"),
      "text", "doc_id", 0.6))
    assert(g2.map(p => (p._1, p._2)) == Set((10L, 20L), (1L, 21L)),
      s"batch must pair against earlier batches AND init corpus: $g2")
  }

  test("maintain: in-distribution batch takes the cheap path; a drifted " +
      "batch re-freezes the token order — exactness holds, cost recovers") {
    import spark.implicits._
    val state = tmpDir("inc-setjoin-maint") + "/state"
    val all = docs.collect().map(r => (r.getLong(0), r.getString(1)))
    IncrementalSetJoin.init(spark, state,
      all.toSeq.toDF("doc_id", "text"), "text", "doc_id", 0.6)
    val dfordBefore = IncrementalSetJoin.dford(spark, state)
      .collect().map(_.toSeq).toSet
    // in-distribution: one more doc drawn from the same vocabulary
    val (r1, tv1, p1) = IncrementalSetJoin.maintain(spark, state,
      Seq((501L, "the quick brown fox jumps over the lazy dog near a river"))
        .toDF("doc_id", "text"), "text", "doc_id", 0.6)
    assert(!r1 && tv1 == 0.0,
      s"in-distribution batch must not re-freeze (flood share 0): $tv1")
    assert(IncrementalSetJoin.dford(spark, state)
      .collect().map(_.toSeq).toSet == dfordBefore,
      "cheap path must not touch the frozen order")
    assert(p1.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      .contains((1L, 501L)))
    // drifted batch: a flooding token ('spam') in every doc + novel
    // vocabulary — the frozen order has never seen most of it
    val drifted = (600L to 619L).map(i =>
      (i, s"spam filler$i payload$i content$i body$i tail$i")).toDF("doc_id", "text")
    val (r2, tv2, p2) = IncrementalSetJoin.maintain(spark, state,
      drifted, "text", "doc_id", 0.6)
    assert(r2 && tv2 > 0.1, s"drifted batch must re-freeze: $tv2")
    assert(IncrementalSetJoin.dford(spark, state)
      .collect().map(_.toSeq).toSet != dfordBefore,
      "re-freeze must recount the frozen order")
    // the re-frozen order ranks the flooded token LAST among batch
    // tokens (df=20 beats every filler's df=1), so it leaves the
    // prefixes: no 'spam'-keyed candidate bucket survives
    val prefixToks = IncrementalSetJoin.prefix(spark, state)
      .select("tok").as[String].collect().toSet
    assert(!prefixToks.contains("spam"),
      "the flooding token must rank out of every prefix after re-freeze")
    // exactness: batch pairs == brute force restricted to batch
    assert(p2.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      bruteForce(all.toSeq.toDF("doc_id", "text")
        .unionByName(Seq((501L, "the quick brown fox jumps over the lazy " +
          "dog near a river")).toDF("doc_id", "text"))
        .unionByName(drifted), 0.6)
        .filter(p => p._1 >= 600L || p._2 >= 600L).map(p => (p._1, p._2)),
      "re-frozen index must stay exact on the batch's pairs")
  }

  test("a crash between staging and publish leaves the old (order, prefix) " +
      "pair live and CONSISTENT; the retried maintain completes") {
    import spark.implicits._
    val state = tmpDir("inc-setjoin-crash") + "/state"
    val all = docs.collect().map(r => (r.getLong(0), r.getString(1)))
    IncrementalSetJoin.init(spark, state,
      all.toSeq.toDF("doc_id", "text"), "text", "doc_id", 0.6)
    val dfordBefore = IncrementalSetJoin.dford(spark, state)
      .collect().map(_.toSeq).toSet
    val prefixBefore = IncrementalSetJoin.prefix(spark, state)
      .collect().map(_.toSeq).toSet
    val genBefore = graft.ops.StateSwap.currentGen(spark, state)

    // CRASH SIMULATION: stage the whole re-freeze but die before publish —
    // the old two-rename swap could crash with the NEW order live against
    // the OLD prefixes, which silently breaks the no-miss lemma.
    val drifted = (600L to 619L).map(i =>
      (i, s"spam filler$i payload$i content$i body$i tail$i")).toDF("doc_id", "text")
    IncrementalSetJoin.stageRefreeze(spark, state, drifted, "text", "doc_id", 0.6)
    assert(graft.ops.StateSwap.currentGen(spark, state) === genBefore)
    assert(IncrementalSetJoin.dford(spark, state)
      .collect().map(_.toSeq).toSet === dfordBefore,
      "the live order must be untouched by a crashed staging")
    assert(IncrementalSetJoin.prefix(spark, state)
      .collect().map(_.toSeq).toSet === prefixBefore,
      "the live prefixes must be untouched by a crashed staging")
    // the crashed state still answers probes exactly (old order+prefix pair)
    val probe = pairs(IncrementalSetJoin.addBatch(spark, state,
      Seq((700L, "the quick brown fox jumps over the lazy dog"))
        .toDF("doc_id", "text"), "text", "doc_id", 0.6))
    assert(probe.map(p => (p._1, p._2)).contains((1L, 700L)),
      s"probes against the crashed state must still find pairs: $probe")

    // THE RETRY heals the orphaned staging and publishes once.
    val (refrozen, _, p2) = IncrementalSetJoin.maintain(spark, state,
      drifted, "text", "doc_id", 0.6)
    assert(refrozen, "the retried drifted batch must re-freeze")
    assert(graft.ops.StateSwap.currentGen(spark, state) === genBefore + 1)
    assert(p2.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      bruteForce(all.toSeq.toDF("doc_id", "text")
        .unionByName(Seq((700L, "the quick brown fox jumps over the lazy dog"))
          .toDF("doc_id", "text"))
        .unionByName(drifted), 0.6)
        .filter(p => p._1 >= 600L && p._2 >= 600L).map(p => (p._1, p._2)),
      "the retried re-freeze must stay exact on the batch's pairs")
  }
}
