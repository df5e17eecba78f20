package graft

import graft.llm.Retrieval
import org.apache.spark.sql.functions._

/** Retrieval scoring laws: token normalization, TF-IDF ranking on a
  * hand-computed corpus, BM25 ordering properties, and chunk boundary
  * arithmetic (overlap, final-partial-chunk, empty-doc).
  */
class RetrievalSpec extends SparkSpec {

  test("tokens: lowercases, splits on non-alphanumerics, drops empties") {
    import spark.implicits._
    val out = Seq("Hello, WORLD!  a1-b2 --", "", "...").toDF("t")
      .select(Retrieval.tokens($"t").as("tk"))
      .collect().map(_.getSeq[String](0))
    assert(out(0) == Seq("hello", "world", "a1", "b2"))
    assert(out(1) == Seq.empty && out(2) == Seq.empty)
  }

  test("tfidf: corpus-wide terms score zero; rarer terms outrank common ones") {
    import spark.implicits._
    // "common" in all 4 docs (idf=ln(1)=0), "half" in 2 (ln 2), "rare" in 1 (ln 4).
    val docs = Seq(
      (1L, "common half rare"), (2L, "common half"),
      (3L, "common common common"), (4L, "common")).toDF("id", "text")
    val top = Retrieval.tfidfTopK(docs, "id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getString(2), r.getDouble(5))).toMap
    // doc 1: rare (1*ln4=1.386294) > half (1*ln2=0.693147) > common (0)
    assert(top((1L, 1))._1 == "rare")
    assert(top((1L, 2))._1 == "half")
    assert(top((1L, 3)) == ("common", 0.0), "idf of an everywhere-term is 0")
    assert(math.abs(top((1L, 1))._2 - 1.386294) < 1e-6)
    // doc 3: tf=3 but idf=0 -> score still 0
    assert(top((3L, 1)) == ("common", 0.0))
  }

  test("bm25: higher tf wins at equal length; longer doc loses at equal tf") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark spark filler filler"),   // tf=2, dl=4
      (2L, "spark filler filler filler"),  // tf=1, dl=4
      (3L, "spark filler filler filler filler filler filler filler")) // tf=1, dl=8
      .toDF("id", "text")
    val out = Retrieval.bm25(docs, "id", "text", Seq("spark"), 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(2))
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L),
      s"expected tf/length ordering 1,2,3, got ${out.toSeq}")
    assert(out.forall(_._2 > 0),
      s"Lucene idf must stay positive even at df=N (got ${out.toSeq})")
  }

  test("chunk: stride/size boundary arithmetic and overlap") {
    import spark.implicits._
    // 10 tokens, size 4, stride 3 -> starts 0,3,6,9; last chunk 1 token.
    val docs = Seq((1L, (0 until 10).map(i => s"t$i").mkString(" "))).toDF("id", "text")
    val ch = Retrieval.chunk(docs, "id", "text", size = 4, stride = 3)
      .orderBy($"chunk_idx")
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getInt(3),
        r.getString(4), r.getString(5)))
    assert(ch.length == 4)
    assert(ch(0) == (0, 0, 4, "t0", "t3"))
    assert(ch(1) == (1, 3, 4, "t3", "t6"), "overlap: chunk 1 re-reads t3")
    assert(ch(3) == (3, 9, 1, "t9", "t9"), "final partial chunk keeps the tail")
  }

  test("chunk: empty document yields one empty chunk with null tokens") {
    import spark.implicits._
    val ch = Retrieval.chunk(Seq((1L, "--- !!!")).toDF("id", "text"),
        "id", "text", 64, 48).collect()
    assert(ch.length == 1)
    val r = ch.head
    assert(r.getInt(3) == 0 && r.isNullAt(4) && r.isNullAt(5))
    // md5 of the empty string — the well-known constant.
    assert(r.getString(6) == "d41d8cd98f00b204e9800998ecf8427e")
  }

  test("IncrementalRetrieval: ranking laws over the persisted index, deterministic probes") {
    import spark.implicits._
    import graft.llm.IncrementalRetrieval
    val corpus = Seq(
      (1L, "spark shuffles data across executors spark spark"),
      (2L, "spark also appears here once among many many other words here"),
      (3L, "vectors and embeddings never mention the engine"),
      (4L, "merge statements upsert rows")).toDF("doc_id", "text")
    val state = tmpDir("bm25-inc") + "/state"
    IncrementalRetrieval.init(spark, state, corpus, "doc_id", "text")
    def run() = IncrementalRetrieval.probe(spark, state,
        Seq((10L, Seq("spark", "merge")), (11L, Seq("zzz_absent")))
          .toDF("qid", "terms"), "qid", "terms", 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSeq.sortBy(r => (r._1, r._2))
    val got = run()
    // absent-term query matches nothing; matching docs are 1, 2, 4
    assert(got.map(_._1).toSet == Set(10L))
    assert(got.map(_._3).toSet == Set(1L, 2L, 4L))
    // tf dominance: doc 1 (3x spark, short) outranks doc 2 (1x spark, long)
    val rankOf = got.map(r => r._3 -> r._2).toMap
    assert(rankOf(1L) < rankOf(2L), s"tf+length norm must rank doc1 first: $got")
    // the doc matching 'merge' reports n_terms=1, the spark docs too
    assert(got.forall(_._4 == 1L))
    assert(run() == got, "probe must be deterministic run to run")

    // plan shape: the probe is term/doc-keyed equi-joins; the only
    // nested-loop is the 1-row corpus-stats attach (bounded by
    // construction), and there is no cartesian anywhere
    val plan = IncrementalRetrieval.probe(spark, state,
        Seq((10L, Seq("spark"))).toDF("qid", "terms"), "qid", "terms", 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"no cartesian allowed:\n$plan")
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(bnlj <= 1, s"only the 1-row stats attach may nested-loop, saw $bnlj:\n$plan")
  }
}
