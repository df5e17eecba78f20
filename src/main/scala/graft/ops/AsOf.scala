package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — the time-series operator Spark has no built-in for: each
  * left row picks the single most recent right row with `right.time <=
  * left.time` in its key group (left rows with no prior right row keep
  * nulls — LEFT OUTER as-of semantics, matching DuckDB's `ASOF LEFT
  * JOIN`, which is the oracle for `q_join_asof`).
  *
  * Implementation is the union-and-carry-forward window, NOT a range
  * join: both sides are unioned with a side tag, sorted per key by
  * (time, side, tie), and the right-side payload is carried forward with
  * `last(ignoreNulls)` — so a right row at exactly the left row's time IS
  * visible (<= semantics: right tag sorts before left on ties).
  *
  * The carry columns travel as ONE struct, not as independent columns: a
  * `last(ignoreNulls)` per column would fill a legitimately-NULL carry
  * value from an OLDER right row, mixing columns across rows. The struct
  * on a right row is never null (even when every field is), so the window
  * always lands on the single most recent right row and NULL fields
  * inside it survive — exactly DuckDB's ASOF LEFT JOIN row semantics.
  *
  * Scale shape: ONE shuffle on the keys and a per-key sort — cost is
  * |left| + |right| log-sorted, with no possibility of the quadratic
  * blow-up a range-condition join has when a key's history is long (every
  * left row would pair with its whole past before taking the max). The
  * window never crosses keys, so parallelism is |keys|; a single hot key
  * serializes only its own timeline (inherent to the semantics).
  */
object AsOf {

  /** @param carry    right-side columns to attach to each left row
    * @param rightTie right-side column breaking exact-time ties
    *                 deterministically (the LARGEST value wins, being
    *                 last in sort order)
    */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, carry: Seq[String],
      rightTie: String): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!leftCols.exists(carry.contains),
      s"carry columns ${carry.filter(leftCols.contains)} collide with left side")
    val carryType = org.apache.spark.sql.types.StructType(carry.map(right.schema(_)))
    val lSide = left.select(
      keys.map(col) ++
        Seq(col(leftTime).as("__t"), lit(1).as("__side"),
          lit(null).cast(right.schema(rightTie).dataType).as("__tie"),
          lit(null).cast(carryType).as("__carry")) ++
        leftCols.filterNot(keys.contains).map(col): _*)
    val rSide = right.select(
      keys.map(col) ++
        Seq(col(rightTime).as("__t"), lit(0).as("__side"),
          col(rightTie).as("__tie"),
          struct(carry.map(col): _*).as("__carry")) ++
        leftCols.filterNot(keys.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lSide.unionByName(rSide)
      .select(
        (keys.map(col) ++ Seq(col("__t"), col("__side")) ++
          leftCols.filterNot(keys.contains).map(col) :+
          last(col("__carry"), ignoreNulls = true).over(w).as("__carry")): _*)
    carried.filter(col("__side") === 1)
      .select(keys.map(col) ++ leftCols.filterNot(keys.contains).map(col) ++
        carry.map(c => col("__carry").getField(c).as(c)): _*)
  }

  /** As-of join with a STALENESS BOUND: carry columns are nulled when the
    * matched right row fails `within(leftTime, rightTime)` — "most recent
    * right row at or before t, but no staler than X", the market-data /
    * feature-store-TTL variant. The caller supplies the bound predicate
    * so the time algebra stays theirs (epoch longs, `unix_micros` of
    * timestamps, ...).
    *
    * Plan shape: identical ONE-shuffle union+window as [[join]] — the
    * matched right time rides along as one extra carry field and the
    * bound is a post-projection. Never a range join, so no fan-out on
    * long histories.
    */
  def joinWithin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, carry: Seq[String],
      rightTie: String)(within: (Column, Column) => Column): DataFrame = {
    val joined = join(left, right.withColumn("__rt", col(rightTime)),
      keys, leftTime, rightTime, carry :+ "__rt", rightTie)
    val ok = col("__rt").isNotNull && within(col(leftTime), col("__rt"))
    carry.foldLeft(joined) { (df, c) =>
      df.withColumn(c, when(ok, col(c)))
    }.drop("__rt")
  }
}
