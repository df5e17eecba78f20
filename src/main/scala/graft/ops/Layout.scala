package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering — the multi-dimensional data-skipping
  * layout (Delta/Iceberg `ZORDER BY`): interleaving the bits of two sort
  * dimensions makes rows close in EITHER dimension land in the same file,
  * so per-file min/max stats prune scans on both predicates. A
  * single-column sort gives perfect pruning on that column and none on
  * the other; the z-curve trades a little of each for usable pruning on
  * both (`q_zorder` measures it: per-file ranges of both dims).
  *
  * At scale the layout step is `repartitionByRange(zValue)` + local sort
  * before the write — a range shuffle, no global window. The oracle entry
  * uses ntile over the z order instead so the 16 "files" are
  * deterministic row-for-row across engines.
  */
object Layout {

  /** Interleave the low `bits` bits of two non-negative columns:
    * bit i of `a` lands at position 2i, bit i of `b` at 2i+1. Pure
    * integer Column arithmetic, engine-portable (no sign-bit use for
    * bits ≤ 31).
    */
  def zValue(a: Column, b: Column, bits: Int): Column =
    zValueN(Seq(a, b), bits)

  /** N-dimensional Morton interleave — real lakehouse clustering wants
    * 3-4 columns, not 2: bit i of dimension j lands at position
    * `i * n + j` (dimension 0 in the LOW bit of each group, matching the
    * 2-column layout's (a, b) order). Pure integer Column arithmetic;
    * `n * bits` must fit a non-negative long.
    */
  def zValueN(cols: Seq[Column], bits: Int): Column = {
    val n = cols.length
    require(n >= 2, s"z-order needs at least 2 dimensions, got $n")
    require(bits >= 1 && n * bits <= 63,
      s"$n dims x $bits bits must fit 63 bits: ${n * bits}")
    (for {
      i <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield shiftright(c, i).bitwiseAND(lit(1L)) * lit(1L << (i * n + j)))
      .reduce(_ + _)
  }
}
