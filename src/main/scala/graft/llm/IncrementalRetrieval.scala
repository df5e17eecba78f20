package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted BM25 search index probed by QUERY batches — the retrieval
  * member of the incremental family (dedup → `IncrementalDedup`, ANN →
  * `IncrementalAnn`, set-similarity → `IncrementalSetJoin`): the corpus
  * is tokenized, counted, and weighted ONCE at `init`, and each arriving
  * query batch scores against the stored postings at batch cost. Unlike
  * the document-side incrementals there is NO staleness trade here at
  * all: queries do not change corpus statistics, so a probe is exactly
  * the scores a full recompute would produce — the oracle law is plain
  * equality, not restricted equality.
  *
  * Exactness design (the repo's fixed-point discipline): idf is stored
  * micro-quantized (`round(ln((2N+2)/(2df+1)) · 1e6)` BIGINT, the Lucene
  * positive-idf form), and the per-(query,doc,term) weight is quantized
  * to BIGINT micro-units BEFORE the per-document sum — integer addition
  * is order-independent, so shuffle/merge order cannot move a score by
  * an ulp, and DuckDB reproduces every score bit-for-bit (the exact-
  * BIGINT ratio trick of `Retrieval.bm25`: every operand < 2^53, each
  * double step correctly rounded).
  *
  * State layout:
  * {{{
  *   <stateDir>/postings   (term, id, tf, dl)   — dl denormalized: the
  *                          probe is ONE term-keyed join, no doc join
  *   <stateDir>/termstats  (term, df, idf_fp)   — frozen at init
  *   <stateDir>/stats      (n_docs, t_tokens)   — one row
  * }}}
  *
  * 100 TB shape: the probe shuffles only query terms (tiny) against
  * postings keyed by term — a hot term has one termstats row and its
  * postings list, never a pair blow-up; per-(query,doc) aggregation is
  * keyed by (qid, id); top-k per query is a window group limit. At scale
  * the postings table is bucketed by term (the IncrementalDedup bands
  * pattern) and the probe never re-shuffles the corpus.
  */
object IncrementalRetrieval {

  def init(spark: SparkSession, stateDir: String, corpus: DataFrame,
      idCol: String, textCol: String): Unit = {
    val toks = corpus.select(col(idCol).as("id"),
      Retrieval.tokens(col(textCol)).as("tk"))
      .localCheckpoint(true)
    val tf = toks.select(col("id"), size(col("tk")).cast("long").as("dl"),
        explode(col("tk")).as("term"))
      .groupBy(col("term"), col("id"), col("dl"))
      .agg(count(lit(1)).as("tf"))
    tf.select(col("term"), col("id"), col("tf"), col("dl"))
      .write.mode("overwrite").parquet(s"$stateDir/postings")
    val stats = toks.select(size(col("tk")).cast("long").as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("t_tokens"))
    stats.write.mode("overwrite").parquet(s"$stateDir/stats")
    val st = spark.read.parquet(s"$stateDir/stats")
    spark.read.parquet(s"$stateDir/postings")
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(st))
      .select(col("term"), col("df"),
        round(log((lit(2) * col("n_docs") + lit(2)).cast("double")
            / (lit(2) * col("df") + lit(1))) * lit(1000000d))
          .cast("long").as("idf_fp"))
      .write.mode("overwrite").parquet(s"$stateDir/termstats")
  }

  /** Score a query batch against the stored index: top-`k` docs per
    * query by BM25 (k1=1.2, b=0.75). `queries` carries (`qidCol`,
    * `termsCol`: array<string> of DISTINCT query terms). Output:
    * (qid, rk, id, n_terms, score); queries matching nothing are absent.
    */
  def probe(spark: SparkSession, stateDir: String, queries: DataFrame,
      qidCol: String, termsCol: String, k: Int): DataFrame = {
    val postings = spark.read.parquet(s"$stateDir/postings")
    val termstats = spark.read.parquet(s"$stateDir/termstats")
    val stats = spark.read.parquet(s"$stateDir/stats")
    val qterms = queries.select(col(qidCol).as("qid"),
      explode(col(termsCol)).as("term"))
    val w = qterms
      .join(postings, Seq("term"))
      .join(broadcast(termstats.select(col("term"), col("idf_fp"))), Seq("term"))
      .crossJoin(broadcast(stats))
      // micro-quantized weight: integer-summable, engine-exact
      .withColumn("w_fp",
        round(col("idf_fp").cast("double") *
          ((lit(22) * col("tf") * col("t_tokens")).cast("double") /
            (lit(10) * col("t_tokens") * col("tf") + lit(3) * col("t_tokens") +
              lit(9) * col("dl") * col("n_docs")).cast("double"))).cast("long"))
    val agg = w.groupBy(col("qid"), col("id"))
      .agg(count(lit(1)).as("n_terms"), sum(col("w_fp")).as("score_fp"))
    val win = Window.partitionBy(col("qid"))
      .orderBy(col("score_fp").desc, col("id").asc)
    agg.withColumn("rk", row_number().over(win))
      .filter(col("rk") <= k)
      .select(col("qid"), col("rk"), col("id"), col("n_terms"),
        (col("score_fp").cast("double") / lit(1000000)).as("score"))
  }
}
