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

  /** [[saltedJoin]] refined with HOT-KEY DETECTION: only keys whose fact
    * row count exceeds `hotThreshold` are salted; the rest join
    * unchanged under salt 0. Replication cost drops from
    * `|small| × salt` to `|hot small rows| × salt` — on a dim of 10⁸
    * rows with three hot keys that is the difference between tripling
    * the dim shuffle and three extra kilobytes. Detection is one
    * combiner-friendly per-key count over the fact (output O(distinct
    * keys)); the hot set collects to the driver, bounded by
    * `maxHotKeys` — a "hot set" approaching the key space is not skew,
    * it's volume, and salting cannot help it.
    *
    * Also extends the join surface to LEFT-outer (unmatched fact rows
    * carry exactly one salt, so they emit exactly once); right/full
    * outer are rejected loudly — a replicated dim row would null-emit
    * once per salt. Returns (joined frame, detected hot keys).
    */
  def saltedJoinHot(fact: DataFrame, dim: DataFrame, key: String,
      joinType: String = "inner", salt: Int = 16,
      hotThreshold: Long = 1000000L, maxHotKeys: Int = 10000)
      : (DataFrame, Seq[Any]) = {
    require(salt >= 2, s"salt must be >= 2, got $salt")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"salting supports inner/left joins only, got $joinType " +
        "(an outer dim side would null-emit once per salt)")
    val hot = fact.groupBy(col(key)).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > hotThreshold && col(key).isNotNull)
      .select(col(key)).collect().map(_.get(0)).toSeq
    require(hot.length <= maxHotKeys,
      s"${hot.length} keys exceed hotThreshold=$hotThreshold — " +
        "that is volume, not skew; bucket the join instead")
    if (hot.isEmpty) (fact.join(dim, Seq(key), joinType), hot)
    else {
      val isHot = col(key).isin(hot: _*)
      // deterministic salt (same stage-retry argument as saltedJoin)
      val factS = fact.withColumn("__salt",
        when(isHot, pmod(xxhash64(fact.columns.toIndexedSeq.map(col): _*),
          lit(salt.toLong)).cast("int")).otherwise(lit(0)))
      val dimS = dim.withColumn("__salt",
          when(isHot, sequence(lit(0), lit(salt - 1)))
            .otherwise(array(lit(0))))
        .withColumn("__salt", explode(col("__salt")))
      (factS.join(dimS, Seq(key, "__salt"), joinType).drop("__salt"), hot)
    }
  }
}
