package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Term-statistics retrieval scoring over the `documents` corpus: TF-IDF
  * keyword extraction, BM25 ranking, and sliding-window token chunking —
  * the text-side operators a training-data pipeline runs between raw
  * ingestion (TextOps) and embedding (Similarity).
  *
  * DETERMINISTIC FIXED-POINT SCORING (the design constraint every entry
  * here shares): `ln` is the one non-IEEE-portable operation in these
  * formulas — two correct libm implementations may differ in the last
  * ulp for the SAME input, which is enough to flip a ranking tie and the
  * driver's hash. So the logarithm is quantized ONCE per distinct
  * df-value into an integer micro-idf (`round(ln(...) * 1e6)` as BIGINT),
  * and every downstream comparison/score is exact integer math or
  * correctly-rounded IEEE double division of exact integers — bit-identical
  * in any engine. The quantization error (≤ 5e-7 relative on idf) is far
  * below any retrieval-quality signal; the determinism it buys is what
  * lets a DuckDB oracle hash-check a ranking function at all.
  *
  * Scale design (100 TB): tokenization is a codegen'd Column expression
  * (no UDF); `tf` is one shuffle of (doc, term) with map-side combine;
  * `df`/vocabulary relations are term-cardinality (broadcast side of
  * every join); per-doc top-k uses a rank window per doc (WindowGroupLimit
  * prunes to k per partition before the shuffle). Nothing collects to
  * the driver.
  */
object Retrieval {

  /** Lowercased alphanumeric tokens of `text` — empty strings dropped.
    * Same token law as the DuckDB oracle's
    * `list_filter(string_split_regex(lower(text),'[^a-z0-9]+'), ...)`.
    */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= "")

  /** (doc_id, term, tf) — one shuffle with map-side partial counts. */
  def termFreq(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** Micro-quantized idf: `round(ln(nDocs/df) * 1e6)` as BIGINT. `nDocs`
    * arrives as a 1-row broadcast relation, never a driver collect.
    */
  private def idfFp(nDocs: Column, df: Column): Column =
    round(log(nDocs.cast("double") / df) * lit(1000000d)).cast("long")

  /** Top-`k` terms per document by TF-IDF. Output columns: idCol, rk,
    * term, tf, df, score (= tf * idf, micro-precision double).
    */
  def tfidfTopK(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val tf = termFreq(docs, idCol, textCol)
    val dfRel = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(broadcast(dfRel), "term")
      .crossJoin(broadcast(n))
      .withColumn("score_fp", col("tf") * idfFp(col("n_docs"), col("df")))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score_fp").desc, col("term").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(idCol), col("rk"), col("term"), col("tf"), col("df"),
        (col("score_fp").cast("double") / lit(1000000)).as("score"))
  }

  /** BM25 (k1 = 1.2, b = 0.75) of each document against a bag of query
    * terms; returns (idCol, n_terms, score) for every doc matching at
    * least one term.
    *
    * Exact-arithmetic form: with k1 = 6/5, b = 3/4, avgdl = T/N (T =
    * corpus token count, N = doc count) the per-term weight
    *     tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
    * multiplies out to the integer ratio
    *     22*tf*T / (10*T*tf + 3*T + 9*dl*N)
    * — both sides exact BIGINTs (< 2^53), so the double division is
    * correctly rounded and engine-identical. idf uses the Lucene form
    * ln(1 + (N - df + 0.5)/(df + 0.5)) = ln((2N+2)/(2df+1)) — positive
    * for every df (the classic unsmoothed idf goes NEGATIVE once a term
    * appears in over half the corpus, which inverts the tf ordering) —
    * again an integer ratio, micro-quantized through `ln`. The per-term
    * scores are summed
    * in FIXED ORDER (one conditional-agg column per query term, added
    * left-to-right) — never a SUM() whose accumulation order could
    * reassociate floating-point addition.
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int): DataFrame = {
    require(queryTerms.nonEmpty && queryTerms == queryTerms.distinct,
      "query terms must be non-empty and distinct")
    val tf = termFreq(docs, idCol, textCol)
    val dl = docs.select(col(idCol), size(tokens(col(textCol))).cast("long").as("dl"))
    val corpus = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("t_tokens"))
    val dfRel = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = dfRel
      .filter(col("term").isin(queryTerms: _*))
      .crossJoin(broadcast(corpus))
      .select(col("term"), col("df"),
        round(log((lit(2) * col("n_docs") + lit(2)).cast("double")
            / (lit(2) * col("df") + lit(1))) * lit(1000000d))
          .cast("long").as("idf_fp"),
        col("n_docs"), col("t_tokens"))
    val termScore = tf
      .filter(col("term").isin(queryTerms: _*))
      .join(broadcast(idf), Seq("term"))
      .join(dl, Seq(idCol))
      .withColumn("w",
        col("idf_fp").cast("double") *
          ((lit(22) * col("tf") * col("t_tokens")).cast("double") /
            (lit(10) * col("t_tokens") * col("tf") + lit(3) * col("t_tokens") +
              lit(9) * col("dl") * col("n_docs")).cast("double")) /
          lit(1000000))
    // Fixed-order sum: one column per query term, added left to right.
    val perTerm = termScore.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_terms"),
        queryTerms.map(t =>
          max(when(col("term") === t, col("w"))).as(s"w_$t")): _*)
    val total = queryTerms.map(t => coalesce(col(s"w_$t"), lit(0d)))
      .reduceLeft(_ + _)
    perTerm.select(col(idCol), col("n_terms"), total.as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** RECIPROCAL-RANK FUSION — the standard hybrid-retrieval combiner
    * (fuse a lexical and a semantic ranking, or any N rankings, without
    * calibrating their incomparable scores): `RRF(d) = Σ_lists
    * 1/(k + rank_list(d))`. Scores are fixed-pointed as
    * `floor(scale / (k + rank))` — pure integer arithmetic after the
    * ranks, so fused scores hash exactly cross-engine (the Retrieval
    * discipline; float RRF sums would drift in the last ulp). Inputs
    * are (id, rank) relations; a doc missing from a list simply
    * contributes nothing. Cost: one union + one keyed agg over the
    * top-k lists themselves — independent of corpus size.
    */
  def rrfFuse(lists: Seq[DataFrame], idCol: String, rankCol: String,
      kConst: Int = 60, scale: Long = 1000000000000L): DataFrame = {
    require(lists.nonEmpty, "need at least one ranked list")
    lists.map(df => df.select(col(idCol),
        floor(lit(scale) / (lit(kConst.toLong) + col(rankCol)))
          .cast("long").as("contrib")))
      .reduce(_.unionByName(_))
      .groupBy(col(idCol))
      .agg(sum(col("contrib")).as("rrf_fp"), count(lit(1)).as("n_lists"))
  }

  /** Sliding-window token chunks: windows of `size` tokens every `stride`
    * tokens (the LLM-context chunking law: consecutive chunks overlap by
    * `size - stride`). One row per chunk with an md5 fingerprint of the
    * joined tokens — the fingerprint is what the oracle hash-checks, so a
    * boundary off-by-one anywhere flips the entry red.
    */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
      size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      s"need 0 < stride <= size, got size=$size stride=$stride")
    docs
      .select(col(idCol), tokens(col(textCol)).as("tk"))
      .withColumn("n", org.apache.spark.sql.functions.size(col("tk")))
      // starts: 0, stride, 2*stride, ... < max(n, 1) — empty docs still
      // yield one (empty) chunk, same law as the oracle's range().
      .select(col(idCol), col("tk"), col("n"),
        posexplode(sequence(lit(0), greatest(col("n") - 1, lit(0)), lit(stride)))
          .as(Seq("chunk_idx", "start_tok")))
      .withColumn("chunk", slice(col("tk"), col("start_tok") + lit(1), lit(size)))
      .select(col(idCol), col("chunk_idx"), col("start_tok"),
        org.apache.spark.sql.functions.size(col("chunk")).as("n_tok"),
        // try_element_at: the empty-doc chunk has no tokens — NULL, not
        // an ANSI out-of-bounds error.
        try_element_at(col("chunk"), lit(1)).as("first_tok"),
        try_element_at(col("chunk"), lit(-1)).as("last_tok"),
        md5(concat_ws(" ", col("chunk"))).as("fp"))
  }
}
