package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bigram statistical language model for corpus quality filtering — the
  * KenLM-shaped gate of a training-data pipeline (score documents by an
  * n-gram LM trained on trusted text; drop the tail). Counts are plain
  * integers and each bigram's add-one-smoothed conditional
  * log-probability `ln((c(w1,w2)+1) / (c(w1)+V))` is micro-quantized to
  * a BIGINT (`round(·×1e6)` — Retrieval's fixed-point-ln trick), so
  * scores are engine-exact: the DuckDB oracle retrains the same model
  * and reproduces every score to the last integer.
  *
  * Scale (100 TB): the trained relations are VOCAB-bounded, not
  * corpus-bounded — bigram counts decay Zipf-fast and the unigram/V
  * tables are tiny. Scoring therefore joins the corpus's exploded
  * bigrams against broadcast-sized model tables (map-side at any scale;
  * the bigram table is the largest and still fits the classic
  * broadcast-dim regime) and pays exactly ONE shuffle: the per-doc
  * aggregation. Training is two aggregations over the exploded training
  * slice — the same shape as word counting.
  */
object Lm {

  /** (id, w1, w2) bigram occurrences of each document. */
  def bigrams(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), TextOps.tokens(col(textCol)).as("__t"))
      .select(col(idCol), explode(when(size(col("__t")) >= 2,
        transform(sequence(lit(1), size(col("__t")) - 1), i =>
          struct(element_at(col("__t"), i).as("w1"),
            element_at(col("__t"), i + 1).as("w2"))))
        .otherwise(array().cast("array<struct<w1:string,w2:string>>"))).as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))

  /** Score `scoreDocs` with a bigram model trained on `trainDocs`:
    * per doc, the count, sum and mean of fixed-point bigram logprobs.
    * Docs with < 2 tokens have no bigrams and produce no row.
    * Context count c(w1) counts w1's occurrences as a bigram context
    * (all positions except document-final), V = distinct training
    * tokens; unseen contexts degrade to ln(1/V).
    */
  def score(trainDocs: DataFrame, scoreDocs: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val tb = bigrams(trainDocs, idCol, textCol)
    val big = tb.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val uni = tb.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val v = trainDocs
      .select(explode(TextOps.tokens(col(textCol))).as("w"))
      .agg(countDistinct(col("w")).as("vocab"))
    bigrams(scoreDocs, idCol, textCol)
      .join(broadcast(big), Seq("w1", "w2"), "left")
      .join(broadcast(uni), Seq("w1"), "left")
      .crossJoin(broadcast(v))
      .withColumn("__lp", round(log(
        (coalesce(col("c2"), lit(0L)) + 1).cast("double") /
          (coalesce(col("c1"), lit(0L)) + col("vocab")).cast("double"))
        * lit(1000000d)).cast("long"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("__lp")).cast("long").as("sum_lp"))
      .withColumn("mean_lp",
        col("sum_lp").cast("double") / col("n_bigrams").cast("double"))
  }
}
