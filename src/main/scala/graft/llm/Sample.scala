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
}
