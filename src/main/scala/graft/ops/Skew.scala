package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual skew-handling for equi-joins: salt the skewed (big) side,
  * replicate the other side across the salt space, join on (key, salt).
  *
  * When to reach for this instead of AQE's skew-join split
  * (`spark.sql.adaptive.skewJoin.enabled`, on in `Engine.builder`): AQE
  * only splits skewed partitions of *sort-merge* joins after a shuffle has
  * already materialized, and cannot help when the skew sits under a
  * streaming stateful operator, a cached exchange reused by several
  * consumers, or a non-SMJ plan. Salting rewrites the key space ahead of
  * the shuffle: one hot key ("the bot user" — guaranteed in 100 TB of
  * events) becomes `salt` distinct keys, bounding any single task at
  * roughly hot-key-volume / salt.
  *
  * The salt on the big side is DETERMINISTIC — a hash of the full row,
  * not `rand()` — so task retries and speculative attempts reproduce the
  * same assignment (a nondeterministic salt can duplicate or drop rows on
  * stage retry under shuffle-fetch failure). Identical duplicate rows
  * share a salt value: acceptable, since they carry no more volume than
  * the row itself repeated.
  *
  * Cost model: the replicated side is multiplied by `salt` — use the
  * dimension/smaller side there and keep `salt` small (8-32). The join
  * RESULT is identical to the unsalted join (verified by the oracle entry
  * `q_join_salted_skew`): salting is a physical rewrite, not a semantic
  * one.
  */
object Skew {

  /** Inner equi-join of `big` (skewed) with `small` on `key`, salted with
    * `salt` buckets. Column sets must be disjoint apart from `key`.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salt: Int): DataFrame = {
    require(salt > 0, s"salt must be positive, got $salt")
    val salted = big.withColumn(
      "__salt", pmod(xxhash64(big.columns.toIndexedSeq.map(col): _*), lit(salt.toLong)).cast("int"))
    val replicated = small.withColumn(
      "__salt", explode(sequence(lit(0), lit(salt - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
