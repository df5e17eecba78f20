package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-mix construction. Membership is a
  * pure function of (salt, id) — a hash bucket compared to a per-class
  * keep rate — so it is content-stable (re-runs, re-shards, and cluster
  * resizes never move a row in or out of the sample), needs no RNG state,
  * and is a map-side filter: zero shuffle at any scale. Different salts
  * give independent samples; the same salt composes consistently across
  * tables (the q_hash_split property, extended per-class).
  */
object Sample {

  /** Keep each row of class c with probability `ratesPerMille(c)`/1000
    * (classes not listed keep everything). The hash is md5-derived
    * (TextOps.hash32) so the DuckDB oracle reproduces membership
    * bit-for-bit; swap a faster engine-local hash behind the same API at
    * deploy time if md5 ever shows up in a profile.
    */
  def stratified(df: DataFrame, idCol: String, classCol: String,
      ratesPerMille: Map[String, Long], salt: String): DataFrame = {
    require(ratesPerMille.values.forall(r => r >= 0 && r <= 1000),
      s"rates are per-mille, must be in [0,1000]: $ratesPerMille")
    val bucket = pmod(
      TextOps.hash32(concat(lit(s"$salt:"), col(idCol).cast("string"))), lit(1000L))
    val rate = ratesPerMille.toSeq.sortBy(_._1).foldLeft(lit(1000L)) {
      case (acc, (cls, r)) => when(col(classCol) === cls, lit(r)).otherwise(acc)
    }
    df.filter(bucket < rate)
  }

  /** Temperature-resampled mixture (the mT5/XLM-R multilingual recipe,
    * alpha = 0.5): class keep-rates are chosen so the SAMPLED mixture
    * follows p_c ∝ n_c^0.5 — rare classes keep everything (the smallest
    * class's rate is exactly 1 by construction; upsampling past 1 means
    * replication, out of scope), dominant classes are squashed. Every
    * floating step is IEEE-exact-reproducible (sqrt/divide/multiply are
    * correctly rounded, and both engines evaluate the identical operand
    * tree), so the per-mille floor is deterministic and the hash-bucket
    * membership is content-stable like [[stratified]] — the oracle
    * reproduces the kept set bit-for-bit. One tiny aggregation for the
    * rates; the sampling itself is a broadcast-rate map-side filter.
    */
  def temperatureSample(df: DataFrame, idCol: String, classCol: String,
      salt: String): DataFrame = {
    val counts = df.groupBy(col(classCol)).agg(count(lit(1)).as("__n"))
    val withW = counts
      .withColumn("__w", sqrt(col("__n").cast("double")))
      .withColumn("__ratio", col("__n").cast("double") / col("__w"))
    val m = withW.agg(min(col("__ratio")).as("__m"))
    val rates = withW.crossJoin(broadcast(m))
      .withColumn("rate_pm",
        floor(col("__m") * col("__w") / col("__n").cast("double") * 1000)
          .cast("long"))
      .select(col(classCol), col("rate_pm"))
    val bucket = pmod(
      TextOps.hash32(concat(lit(s"$salt:"), col(idCol).cast("string"))), lit(1000L))
    df.join(broadcast(rates), Seq(classCol)).filter(bucket < col("rate_pm"))
  }

  /** Weight-proportional top-k per stratum WITHOUT replacement —
    * Efraimidis–Spirakis A-Res with a DETERMINISTIC uniform: each row's
    * u ∈ (0,1) derives from md5(id) (content-stable like [[stratified]]
    * — no RNG state, reruns pick the same sample), and its priority is
    * ln(u)/w (monotone with the classic u^(1/w)); the k largest
    * priorities per stratum are the sample, so a row's inclusion odds
    * scale with its weight. The priority is micro-quantized to a BIGINT
    * (`round(·×1e6)`) — the [[Retrieval]] fixed-point-ln trick — so the
    * DuckDB oracle reproduces the ORDER bit-for-bit (raw IEEE `ln`/`pow`
    * may differ by an ulp across libms; a quantized key with an id
    * tie-break cannot flip). One shuffle on the strata; per-stratum
    * top-k plans as WindowGroupLimit, never a full sort of the corpus.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      strata: Seq[String], k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val u = (TextOps.hash32(col(idCol).cast("string")).cast("double") + 0.5) /
      lit(4294967296.0)
    val key = round(log(u) /
      greatest(col(weightCol).cast("double"), lit(1e-9)) * lit(1000000d))
      .cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strata.map(col): _*)
      .orderBy(col("__key").desc, col(idCol).asc)
    df.withColumn("__key", key)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .drop("__key")
  }
}
