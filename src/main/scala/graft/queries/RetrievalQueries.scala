package graft.queries

import graft.Tables
import graft.llm.Retrieval
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle entries for [[graft.llm.Retrieval]]: TF-IDF keyword
  * extraction, BM25 ranking, and sliding-window chunking over the
  * `documents` table. All three are EXACT hash checks — the fixed-point
  * scoring design (see Retrieval's scaladoc) is what makes a ranking
  * function reproducible enough for DuckDB to recompute bit-for-bit.
  */
object RetrievalQueries extends graft.QueryModule {

  private val Bm25Terms = Seq("spark", "vector", "merge")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Top-3 TF-IDF terms per document. score_fp = tf * round(ln(N/df)*1e6)
    // is exact integer math; ties break on the term string.
    "q_tfidf" -> ((s, dir) => {
      import s.implicits._
      Retrieval.tfidfTopK(Tables(s, dir, "documents"), "doc_id", "text", 3)
        .filter($"doc_id" % 5 === 0)
        .orderBy($"doc_id", $"rk")
    }),

    // Bigram-LM quality score (llm/Lm): the KenLM-shaped statistical
    // filter — model trained on the %5 slice, a DISJOINT %7 slice scored
    // by mean fixed-point add-one bigram logprob. The oracle retrains
    // the same model in SQL, so every per-doc score matches to the last
    // integer.
    "q_lm_score" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents")
      graft.llm.Lm.score(docs.filter($"doc_id" % 5 === 0),
          docs.filter($"doc_id" % 7 === 3), "doc_id", "text")
        .orderBy($"doc_id")
    }),

    // BM25 top-20 docs for a fixed 3-term query.
    "q_bm25" -> ((s, dir) => {
      import s.implicits._
      Retrieval.bm25(Tables(s, dir, "documents"), "doc_id", "text",
        Bm25Terms, 20)
    }),

    // HYBRID-RETRIEVAL FUSION (Retrieval.rrfFuse — reciprocal-rank
    // fusion, the combiner that merges incomparably-scored rankings
    // without calibration): the BM25 top-20 (tf saturation + length
    // normalization) fuses with the raw term-frequency top-20 (no
    // saturation — a genuinely different ordering over the same query
    // terms). RRF contributions are floor(1e12/(60+rank)) — integer
    // after the ranks, so the fused scores hash exactly. The per-list
    // rank windows run over 20-row relations (post-limit), never the
    // corpus; fusion cost is independent of corpus size.
    "q_rrf_fusion" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents")
      val wBm = org.apache.spark.sql.expressions.Window
        .orderBy($"score".desc, $"doc_id".asc)
      val bm = Retrieval.bm25(docs, "doc_id", "text", Bm25Terms, 20)
        .withColumn("rk", row_number().over(wBm))
        .select($"doc_id", $"rk")
      val wTf = org.apache.spark.sql.expressions.Window
        .orderBy($"tfsum".desc, $"doc_id".asc)
      val tfl = Retrieval.termFreq(docs, "doc_id", "text")
        .filter($"term".isin(Bm25Terms: _*))
        .groupBy($"doc_id").agg(sum($"tf").as("tfsum"))
        .orderBy($"tfsum".desc, $"doc_id".asc).limit(20)
        .withColumn("rk", row_number().over(wTf))
        .select($"doc_id", $"rk")
      Retrieval.rrfFuse(Seq(bm, tfl), "doc_id", "rk")
        .orderBy($"rrf_fp".desc, $"doc_id".asc).limit(10)
    }),

    // PERSISTED BM25 search index probed by a query batch
    // (llm/IncrementalRetrieval — the retrieval member of the
    // incremental family): the %5 document slice is indexed once
    // (postings + frozen micro-quantized idf + corpus stats on disk);
    // the %7 slice arrives as QUERIES (first 3 tokens each) and scores
    // at batch cost. No staleness trade — queries don't move corpus
    // stats, so the oracle law is PLAIN equality with a full DuckDB
    // recompute: per-term weights quantize to BIGINT micro-units before
    // the per-doc sum, making the score order-independent and
    // engine-exact, top-5 per query tie-broken on doc id.
    "q_bm25_incremental" -> ((s, dir) => {
      import s.implicits._
      val state = sys.props("java.io.tmpdir") +
        s"/graft_bm25inc_${ProcessHandle.current().pid()}/state"
      graft.ops.FileOps.resetWorkDirs(s, Seq(state))
      graft.llm.IncrementalRetrieval.init(s, state,
        Tables(s, dir, "documents").filter($"doc_id" % 5 === 0),
        "doc_id", "text")
      val queries = Tables(s, dir, "documents").filter($"doc_id" % 7 === 0)
        .select($"doc_id".as("qid"),
          array_distinct(slice(Retrieval.tokens($"text"), 1, 3)).as("terms"))
      graft.llm.IncrementalRetrieval.probe(s, state, queries, "qid", "terms", 5)
        .orderBy($"qid", $"rk")
    }),

    // Token-distribution entropy per document (nats) — the Shannon
    // quality signal (low entropy = repetitive/templated text, a
    // standard training-data filter). H = Σ (c/n)·ln(n/c) computed
    // fixed-point: the per-(c,n) log quantizes to an integer micro-nat
    // once, the per-doc sum is exact BIGINT math, and the final
    // division of exact integers is correctly rounded — hash-identical
    // in DuckDB like the other Retrieval entries.
    "q_token_entropy" -> ((s, dir) => {
      import s.implicits._
      val tf = Retrieval.termFreq(
        Tables(s, dir, "documents").filter($"doc_id" % 5 === 0),
        "doc_id", "text")
      val n = tf.groupBy($"doc_id")
        .agg(sum($"tf").as("n_tokens"), count(lit(1)).as("n_unique"))
      tf.join(n, "doc_id")
        .groupBy($"doc_id", $"n_tokens", $"n_unique")
        .agg(sum($"tf" *
            round(log($"n_tokens".cast("double") / $"tf") * lit(1000000d))
              .cast("long")).as("h_fp"))
        .select($"doc_id", $"n_tokens", $"n_unique",
          ($"h_fp".cast("double") /
            ($"n_tokens" * lit(1000000L)).cast("double")).as("entropy"))
        .orderBy($"doc_id")
    }),

    // 64-token chunks, stride 48 (16-token overlap); md5 fingerprint of
    // every chunk is the oracle anchor, so any boundary error flips the
    // hash.
    "q_chunk_text" -> ((s, dir) => {
      import s.implicits._
      Retrieval.chunk(
        Tables(s, dir, "documents").filter($"doc_id" % 5 === 0),
        "doc_id", "text", 64, 48)
        .orderBy($"doc_id", $"chunk_idx")
    }))

  def oracle: Map[String, String] = Map(
    "q_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |           x -> x != '')) AS term
        |  FROM documents
        |),
        |tf AS (SELECT doc_id, term, count(1) AS tf FROM toks GROUP BY 1, 2),
        |dfr AS (SELECT term, count(1) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(1) AS n_docs FROM documents),
        |sc AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, dfr.df,
        |    tf.tf * CAST(round(ln(CAST(n.n_docs AS double) / dfr.df) * 1000000)
        |                 AS BIGINT) AS score_fp
        |  FROM tf JOIN dfr USING (term) CROSS JOIN n
        |),
        |rk AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
        |            ORDER BY score_fp DESC, term ASC) AS rk
        |  FROM sc
        |)
        |SELECT doc_id, rk, term, tf, df,
        |  CAST(score_fp AS double) / 1000000 AS score
        |FROM rk WHERE rk <= 3 AND doc_id % 5 = 0
        |ORDER BY doc_id, rk""".stripMargin,
    "q_bm25" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                x -> x != '') AS tk
        |  FROM documents
        |),
        |terms AS (SELECT doc_id, unnest(tk) AS term FROM toks),
        |tf AS (SELECT doc_id, term, count(1) AS tf FROM terms GROUP BY 1, 2),
        |dl AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl FROM toks),
        |corpus AS (SELECT count(1) AS n_docs, sum(dl) AS t_tokens FROM dl),
        |dfr AS (SELECT term, count(1) AS df FROM tf GROUP BY 1),
        |idf AS (
        |  SELECT term, df,
        |    CAST(round(ln(CAST(2 * c.n_docs + 2 AS double)
        |                  / (2 * df + 1)) * 1000000) AS BIGINT) AS idf_fp,
        |    c.n_docs, c.t_tokens
        |  FROM dfr CROSS JOIN corpus c
        |  WHERE term IN ('spark', 'vector', 'merge')
        |),
        |w AS (
        |  SELECT tf.doc_id, tf.term,
        |    CAST(idf.idf_fp AS double) *
        |      (CAST(22 * tf.tf * idf.t_tokens AS double) /
        |       CAST(10 * idf.t_tokens * tf.tf + 3 * idf.t_tokens
        |            + 9 * dl.dl * idf.n_docs AS double)) / 1000000 AS w
        |  FROM tf JOIN idf USING (term) JOIN dl USING (doc_id)
        |),
        |agg AS (
        |  SELECT doc_id, count(1) AS n_terms,
        |    max(CASE WHEN term = 'spark' THEN w END) AS w_spark,
        |    max(CASE WHEN term = 'vector' THEN w END) AS w_vector,
        |    max(CASE WHEN term = 'merge' THEN w END) AS w_merge
        |  FROM w GROUP BY doc_id
        |)
        |SELECT doc_id, n_terms,
        |  ((coalesce(w_spark, 0) + coalesce(w_vector, 0)) + coalesce(w_merge, 0))
        |    AS score
        |FROM agg
        |ORDER BY score DESC, doc_id ASC LIMIT 20""".stripMargin,
    "q_rrf_fusion" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                x -> x != '') AS tk
        |  FROM documents
        |),
        |terms AS (SELECT doc_id, unnest(tk) AS term FROM toks),
        |tf AS (SELECT doc_id, term, count(1) AS tf FROM terms GROUP BY 1, 2),
        |dl AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl FROM toks),
        |corpus AS (SELECT count(1) AS n_docs, sum(dl) AS t_tokens FROM dl),
        |dfr AS (SELECT term, count(1) AS df FROM tf GROUP BY 1),
        |idf AS (
        |  SELECT term, df,
        |    CAST(round(ln(CAST(2 * c.n_docs + 2 AS double)
        |                  / (2 * df + 1)) * 1000000) AS BIGINT) AS idf_fp,
        |    c.n_docs, c.t_tokens
        |  FROM dfr CROSS JOIN corpus c
        |  WHERE term IN ('spark', 'vector', 'merge')
        |),
        |w AS (
        |  SELECT tf.doc_id, tf.term,
        |    CAST(idf.idf_fp AS double) *
        |      (CAST(22 * tf.tf * idf.t_tokens AS double) /
        |       CAST(10 * idf.t_tokens * tf.tf + 3 * idf.t_tokens
        |            + 9 * dl.dl * idf.n_docs AS double)) / 1000000 AS w
        |  FROM tf JOIN idf USING (term) JOIN dl USING (doc_id)
        |),
        |agg AS (
        |  SELECT doc_id,
        |    max(CASE WHEN term = 'spark' THEN w END) AS w_spark,
        |    max(CASE WHEN term = 'vector' THEN w END) AS w_vector,
        |    max(CASE WHEN term = 'merge' THEN w END) AS w_merge
        |  FROM w GROUP BY doc_id
        |),
        |bm AS (
        |  SELECT doc_id,
        |    ((coalesce(w_spark, 0) + coalesce(w_vector, 0)) + coalesce(w_merge, 0))
        |      AS score
        |  FROM agg ORDER BY score DESC, doc_id ASC LIMIT 20
        |),
        |bmr AS (
        |  SELECT doc_id,
        |    ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS rk
        |  FROM bm
        |),
        |tfl AS (
        |  SELECT doc_id, SUM(tf) AS tfsum FROM tf
        |  WHERE term IN ('spark', 'vector', 'merge')
        |  GROUP BY doc_id ORDER BY tfsum DESC, doc_id ASC LIMIT 20
        |),
        |tflr AS (
        |  SELECT doc_id,
        |    ROW_NUMBER() OVER (ORDER BY tfsum DESC, doc_id ASC) AS rk
        |  FROM tfl
        |),
        |u AS (
        |  SELECT doc_id, 1000000000000 // (60 + rk) AS c FROM bmr
        |  UNION ALL
        |  SELECT doc_id, 1000000000000 // (60 + rk) FROM tflr
        |)
        |SELECT doc_id, CAST(SUM(c) AS bigint) AS rrf_fp,
        |  CAST(COUNT(1) AS bigint) AS n_lists
        |FROM u GROUP BY doc_id
        |ORDER BY rrf_fp DESC, doc_id ASC LIMIT 10""".stripMargin,
    "q_bm25_incremental" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0
        |),
        |toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                x -> x != '') AS tk
        |  FROM corpus
        |),
        |terms AS (SELECT doc_id, unnest(tk) AS term FROM toks),
        |tf AS (SELECT doc_id, term, count(1) AS tf FROM terms GROUP BY 1, 2),
        |dl AS (SELECT doc_id, CAST(len(tk) AS bigint) AS dl FROM toks),
        |cstats AS (SELECT count(1) AS n_docs, sum(dl) AS t_tokens FROM dl),
        |dfr AS (SELECT term, count(1) AS df FROM tf GROUP BY 1),
        |idf AS (
        |  SELECT term,
        |    CAST(round(ln(CAST(2 * c.n_docs + 2 AS double)
        |                  / (2 * df + 1)) * 1000000) AS bigint) AS idf_fp
        |  FROM dfr CROSS JOIN cstats c
        |),
        |q AS (
        |  SELECT doc_id AS qid,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                x -> x != '') AS tk
        |  FROM documents WHERE doc_id % 7 = 0
        |),
        |qterms AS (SELECT DISTINCT qid, unnest(tk[1:3]) AS term FROM q),
        |w AS (
        |  SELECT qt.qid, tf.doc_id,
        |    CAST(round(CAST(i.idf_fp AS double) *
        |      (CAST(22 * tf.tf * c.t_tokens AS double) /
        |       CAST(10 * c.t_tokens * tf.tf + 3 * c.t_tokens
        |            + 9 * dl.dl * c.n_docs AS double))) AS bigint) AS w_fp
        |  FROM qterms qt
        |  JOIN tf ON tf.term = qt.term
        |  JOIN idf i ON i.term = qt.term
        |  JOIN dl ON dl.doc_id = tf.doc_id
        |  CROSS JOIN cstats c
        |),
        |agg AS (
        |  SELECT qid, doc_id, CAST(count(1) AS bigint) AS n_terms,
        |    CAST(SUM(w_fp) AS bigint) AS score_fp
        |  FROM w GROUP BY 1, 2
        |),
        |rk AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
        |    ORDER BY score_fp DESC, doc_id ASC) AS rk
        |  FROM agg
        |)
        |SELECT qid, CAST(rk AS int) AS rk, doc_id AS id, n_terms,
        |  CAST(score_fp AS double) / 1000000 AS score
        |FROM rk WHERE rk <= 5 ORDER BY qid, rk""".stripMargin,
    "q_lm_score" ->
      """WITH nrm AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
        |  FROM documents
        |),
        |trb AS (
        |  SELECT unnest(list_transform(range(1, greatest(len(t), 1)), i -> t[i])) AS w1,
        |    unnest(list_transform(range(1, greatest(len(t), 1)), i -> t[i + 1])) AS w2
        |  FROM nrm WHERE doc_id % 5 = 0
        |),
        |big AS (SELECT w1, w2, COUNT(1) AS c2 FROM trb GROUP BY 1, 2),
        |uni AS (SELECT w1, COUNT(1) AS c1 FROM trb GROUP BY 1),
        |v AS (
        |  SELECT COUNT(DISTINCT w) AS vocab
        |  FROM (SELECT unnest(t) AS w FROM nrm WHERE doc_id % 5 = 0)
        |),
        |sc AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, greatest(len(t), 1)), i -> t[i])) AS w1,
        |    unnest(list_transform(range(1, greatest(len(t), 1)), i -> t[i + 1])) AS w2
        |  FROM nrm WHERE doc_id % 7 = 3
        |),
        |lp AS (
        |  SELECT doc_id,
        |    CAST(round(ln(CAST(COALESCE(c2, 0) + 1 AS double) /
        |      CAST(COALESCE(c1, 0) + vocab AS double)) * 1000000) AS bigint) AS l
        |  FROM sc LEFT JOIN big USING (w1, w2) LEFT JOIN uni USING (w1), v
        |)
        |SELECT doc_id, COUNT(1) AS n_bigrams, CAST(SUM(l) AS bigint) AS sum_lp,
        |  CAST(SUM(l) AS double) / CAST(COUNT(1) AS double) AS mean_lp
        |FROM lp GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_token_entropy" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |           x -> x != '')) AS term
        |  FROM documents WHERE doc_id % 5 = 0
        |),
        |tf AS (SELECT doc_id, term, count(1) AS tf FROM toks GROUP BY 1, 2),
        |n AS (
        |  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
        |    count(1) AS n_unique
        |  FROM tf GROUP BY 1
        |)
        |SELECT tf.doc_id, n.n_tokens, n.n_unique,
        |  CAST(SUM(tf.tf * CAST(round(ln(CAST(n.n_tokens AS double) / tf.tf)
        |         * 1000000) AS BIGINT)) AS double)
        |    / CAST(n.n_tokens * 1000000 AS double) AS entropy
        |FROM tf JOIN n USING (doc_id)
        |GROUP BY tf.doc_id, n.n_tokens, n.n_unique
        |ORDER BY tf.doc_id""".stripMargin,
    "q_chunk_text" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                x -> x != '') AS tk
        |  FROM documents WHERE doc_id % 5 = 0
        |),
        |st AS (
        |  SELECT doc_id, tk, len(tk) AS n,
        |    unnest(range(0, greatest(len(tk), 1), 48)) AS s
        |  FROM toks
        |),
        |ch AS (
        |  SELECT doc_id, CAST(s // 48 AS int) AS chunk_idx,
        |    CAST(s AS int) AS start_tok,
        |    tk[s + 1 : least(s + 64, n)] AS chunk
        |  FROM st
        |)
        |SELECT doc_id, chunk_idx, start_tok,
        |  CAST(len(chunk) AS int) AS n_tok,
        |  chunk[1] AS first_tok,
        |  chunk[len(chunk)] AS last_tok,
        |  md5(array_to_string(chunk, ' ')) AS fp
        |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin)
}
