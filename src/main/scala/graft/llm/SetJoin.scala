package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT set-similarity join via prefix filtering (the AllPairs / PPJoin
  * family: Bayardo et al. WWW'07, Xiao et al. WWW'08) — finds EVERY pair
  * of documents whose token-set Jaccard meets a threshold, with a
  * provable no-miss guarantee. The deterministic complement to
  * MinHash-LSH (`Dedup.minhashCandidates`): LSH trades recall for speed
  * on the banding s-curve near the threshold; prefix filtering prunes the
  * corpus² space with zero recall loss, so it is the tool when the
  * pipeline contract is "ALL pairs ≥ t", e.g. eval-set contamination
  * sweeps or legal-grade dedup audits.
  *
  * Prefix-filter lemma: fix a total order on tokens and sort every set by
  * it. If |x∩y| ≥ α, then the first |x|−α+1 tokens of x and the first
  * |y|−α+1 tokens of y share at least one token (else the smallest common
  * token c sits in the last α−1 of one side, and since every common token
  * ≥ c there could be at most α−1 of them). J(x,y) ≥ t implies
  * |x∩y| ≥ ⌈t·max(|x|,|y|)⌉ ≥ ⌈t·|x|⌉, so emitting each set's first
  * |x|−⌈t·|x|⌉+1 tokens and equi-joining on the emitted token finds every
  * qualifying pair. Verification then computes the exact Jaccard per
  * candidate — output correctness never depends on the pruning.
  *
  * The order is CHOSEN, and that choice is the whole cost model: tokens
  * are ranked by ascending document frequency (ties by value), so each
  * doc's prefix holds its RAREST tokens. A token with df=k contributes at
  * most k²/2 candidate pairs, and high-df tokens (stopwords — exactly the
  * ones whose buckets would square) are pushed to the suffixes where they
  * are never join keys. Candidate volume is Σ prefix-bucket², the same
  * bounded-bucket shape as the MinHash band join, but with exactness.
  *
  * 100 TB shuffle inventory: (1) df = explode + groupBy(token) with
  * map-side partial agg; (2) df attach = equi-join keyed by token — a hot
  * token has millions of LEFT rows but exactly ONE right row, so it
  * cannot square; (3) per-doc rank = one window shuffle keyed by id;
  * (4) the prefix self-join keyed by (rare) token; (5) verification =
  * two id-keyed joins carrying the token arrays. No all-pairs product
  * anywhere; float slop in the prefix-length arithmetic is taken on the
  * SAFE side (a one-too-long prefix only adds candidates).
  */
object SetJoin {

  /** Candidate pairs (id_a < id_b) that can possibly reach `threshold`
    * Jaccard: prefix-token equi-join + the symmetric length filter
    * t·max(|x|,|y|) ≤ min(|x|,|y|). Input `sets` must carry (id, toks)
    * with toks DISTINCT. Superset of the true answer by the lemma above.
    */
  def prefixCandidates(sets: DataFrame, threshold: Double): DataFrame = {
    val tok = sets.select(col("id"), size(col("toks")).cast("bigint").as("n"),
      explode(col("toks")).as("tok"))
    val dfreq = tok.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val ranked = tok.join(dfreq, Seq("tok"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("df"), col("tok"))))
    // prefix length |x| − ⌈t|x|⌉ + 1; the −1e-9 guards against t·n landing
    // one ulp ABOVE an exact integer (⌈⌉ would overshoot and the prefix
    // would be one too SHORT — the unsafe direction). One ulp below an
    // integer lengthens the prefix by one: extra candidates, still exact.
    val prefix = ranked
      .filter(col("rk") <= col("n") - ceil(lit(threshold) * col("n") - lit(1e-9)) + 1)
      .select(col("tok"), col("id"), col("n"))
    val a = prefix.toDF("tok", "id_a", "n_a")
    val b = prefix.toDF("tok", "id_b", "n_b")
    a.join(b, Seq("tok"))
      .filter(col("id_a") < col("id_b"))
      .filter(least(col("n_a"), col("n_b")).cast("double") >=
        lit(threshold) * greatest(col("n_a"), col("n_b")).cast("double") - lit(1e-9))
      .select(col("id_a"), col("id_b"))
      .distinct()
  }

  /** All pairs with token-set Jaccard ≥ threshold — exact, both in recall
    * and in the reported similarity. Output: (id_a, id_b, n_inter, n_a,
    * n_b, jaccard) with id_a < id_b. The final `jaccard >= threshold`
    * compare runs on the verified exact value, so prefix pruning can only
    * ever remove work, never answers.
    */
  def similarityJoin(docs: DataFrame, textCol: String, idCol: String,
      threshold: Double): DataFrame = {
    val sets = docs.select(col(idCol).as("id"),
      array_distinct(TextOps.tokens(col(textCol))).as("toks"))
    val cands = prefixCandidates(sets, threshold)
    cands
      .join(sets.select(col("id").as("id_a"), col("toks").as("toks_a")), Seq("id_a"))
      .join(sets.select(col("id").as("id_b"), col("toks").as("toks_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("toks_a"), col("toks_b"))).cast("bigint").as("n_inter"),
        size(col("toks_a")).cast("bigint").as("n_a"),
        size(col("toks_b")).cast("bigint").as("n_b"))
      .withColumn("jaccard",
        col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter")).cast("double"))
      .filter(col("jaccard") >= lit(threshold))
  }
}
