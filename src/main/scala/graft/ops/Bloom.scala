package graft.ops

import graft.llm.TextOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter join pruning — the pre-join lever for the case between
  * "dim broadcasts as a hash set" and "full shuffle join": the dim side
  * compresses to a fixed bitset (bits/8 bytes however many keys), the
  * fact side drops non-members map-side, and only survivors (true
  * matches + a bounded false-positive leak) pay the shuffle. Spark's AQE
  * injects runtime bloom filters for exactly this reason; this is the
  * explicit, oracle-checkable form.
  *
  * The bitset is md5-derived (TextOps.hash32, one salt per hash
  * function) and stored as 32-bit words in BIGINT columns (shifts stay
  * below the sign bit, so the words are identical integers in any
  * engine) — the DuckDB oracle rebuilds the IDENTICAL filter, so even
  * the false-positive count hash-matches, not just the true members.
  *
  * Scale shape: build = one map-side explode of `hashes` positions per
  * dim key + a groupBy over at most bits/32 word rows; membership = a
  * broadcast join of the word table (bits/32 rows — 128 for 4 Kibit)
  * against the fact side's positions, all map-side. No false negatives
  * ever (every bit of a member key is set by construction).
  */
object Bloom {

  /** Bit position of `key` under hash function `i` (non-negative). */
  def bitPos(key: Column, i: Int, bits: Int): Column =
    pmod(TextOps.hash32(concat(lit(s"bf$i:"), key.cast("string"))), lit(bits.toLong))

  private def posCol(key: Column, bits: Int, hashes: Int): Column =
    explode(array((0 until hashes).map(i => bitPos(key, i, bits)): _*))

  /** Build the filter: one row per 32-bit word actually hit,
    * `word` (index) + `bm` (OR of member masks).
    */
  def build(dim: DataFrame, keyCol: String, bits: Int, hashes: Int): DataFrame =
    dim.select(posCol(col(keyCol), bits, hashes).as("pos"))
      .select(expr("pos div 32").as("word"),
        expr("shiftleft(1L, cast(pos % 32 as int))").as("mask"))
      .groupBy(col("word")).agg(bit_or(col("mask")).as("bm"))

  /** Membership per distinct fact key: `bloom_pass` = 1 iff EVERY hash
    * position's bit is set (min over the per-position hits).
    */
  def membership(factKeys: DataFrame, keyCol: String, bloom: DataFrame,
      bits: Int, hashes: Int): DataFrame = {
    val withPos = factKeys
      .withColumn("__pos", posCol(col(keyCol), bits, hashes))
      .withColumn("__word", expr("__pos div 32"))
      .withColumn("__mask", expr("shiftleft(1L, cast(__pos % 32 as int))"))
    withPos.join(broadcast(bloom), col("__word") === bloom("word"), "left")
      .withColumn("__hit",
        coalesce((col("bm").bitwiseAND(col("__mask")) === col("__mask")).cast("int"), lit(0)))
      .groupBy(col(keyCol))
      .agg(min(col("__hit")).as("bloom_pass"))
  }
}
