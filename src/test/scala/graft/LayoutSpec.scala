package graft

import graft.ops.Layout
import org.apache.spark.sql.functions._

/** Morton-interleave laws + the data-skipping evidence the layout buys. */
class LayoutSpec extends SparkSpec {

  import spark.implicits._

  private def mortonRef(vals: Seq[Long], bits: Int): Long =
    (for {
      i <- 0 until bits
      (v, j) <- vals.zipWithIndex
    } yield ((v >> i) & 1L) << (i * vals.length + j)).sum

  test("zValueN matches the reference interleave; 2-dim case equals zValue") {
    val rows = Seq((0L, 0L, 0L), (255L, 0L, 0L), (0L, 255L, 0L), (0L, 0L, 255L),
      (170L, 85L, 204L), (1L, 2L, 4L), (255L, 255L, 255L))
    val df = rows.toDF("a", "b", "c")
      .withColumn("z3", Layout.zValueN(Seq($"a", $"b", $"c"), 8))
      .withColumn("z2n", Layout.zValueN(Seq($"a", $"b"), 8))
      .withColumn("z2", Layout.zValue($"a", $"b", 8))
    df.collect().foreach { r =>
      val (a, b, c) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(r.getLong(3) == mortonRef(Seq(a, b, c), 8), s"z3($a,$b,$c)")
      assert(r.getLong(4) == mortonRef(Seq(a, b), 8), s"z2n($a,$b)")
      assert(r.getLong(4) == r.getLong(5), "zValue must be zValueN's 2-dim case")
    }
    // dimension-count and width guards
    intercept[IllegalArgumentException](Layout.zValueN(Seq($"a"), 8))
    intercept[IllegalArgumentException](Layout.zValueN(Seq($"a", $"b", $"c"), 22))
  }

  test("3-dim z-layout bounds every dim's per-file range; a single sort leaves two dims full-range") {
    // 4096 rows over a 16x16x16 grid (8 rows per cell, distinct ids).
    val n = 4096
    val rows = (0 until n).map { i =>
      (i.toLong, (i % 16).toLong, (i / 16 % 16).toLong, (i / 256 % 16).toLong)
    }
    val df = rows.toDF("id", "a", "b", "c")
    def fileRanges(ordered: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] = {
      val w = org.apache.spark.sql.expressions.Window.orderBy($"sk", $"id")
      ordered.withColumn("file", ntile(16).over(w))
        .groupBy($"file")
        .agg((max($"a") - min($"a")).as("ra"), (max($"b") - min($"b")).as("rb"),
          (max($"c") - min($"c")).as("rc"))
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    }
    val z = fileRanges(df.withColumn("sk", Layout.zValueN(Seq($"a", $"b", $"c"), 4)))
    val single = fileRanges(df.withColumn("sk", $"a"))
    def avg(xs: Seq[Long]): Double = xs.sum.toDouble / xs.length
    // single-column sort: perfect on a, FULL range (15) on b and c
    assert(avg(single.map(_._1)) <= 1.0 && avg(single.map(_._2)) >= 14.0 &&
      avg(single.map(_._3)) >= 14.0)
    // z-layout: EVERY dim's average per-file range strictly bounded away
    // from full — that is the skip-range evidence on all three predicates
    Seq(z.map(_._1), z.map(_._2), z.map(_._3)).foreach { dim =>
      assert(avg(dim) <= 10.0, s"z-order should bound each dim, got avg ${avg(dim)}")
    }
  }
}
