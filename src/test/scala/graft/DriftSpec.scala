package graft

import graft.ops.Drift
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** KS-drift laws: exact hand ECDF, equivalence with the naive global
  * window at several bucket widths (the distributed prefix sum is an
  * implementation detail, never a semantics change), and the
  * zero-distance identity.
  */
class DriftSpec extends SparkSpec {

  import spark.implicits._

  test("hand ECDF: ks numerator and argmax are exact") {
    val a = Seq(1L, 2L, 2L, 5L).toDF("v")
    val b = Seq(2L, 3L).toDF("v")
    val r = Drift.ksStatistic(a, b, "v").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((4L, 2L, 2L, 1L)),
      s"expected (4,2,2,1), got $r") // KS = 2/8 = 0.25 first attained at v=1
  }

  test("identical samples have zero distance") {
    val a = (1 to 100).map(_.toLong % 7).toDF("v")
    val r = Drift.ksStatistic(a, a, "v").collect()(0)
    assert(r.getLong(2) == 0L)
  }

  test("tv distance: hand counts, disjoint supports, identity") {
    val a = Seq("x", "x", "y").toDF("c")
    val b = Seq("y", "z").toDF("c")
    val r = graft.ops.Drift.tvDistance(a, b, "c").collect()(0)
    // pa=(2/3,1/3,0), pb=(0,1/2,1/2) → TV = 8/12; largest gap at 'x'
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)) ==
      ((3L, 2L, 8L, "x")), s"got $r")
    // disjoint supports → maximal distance: tv_num = 2·n_a·n_b
    val d = graft.ops.Drift.tvDistance(
      Seq("p", "q").toDF("c"), Seq("r").toDF("c"), "c").collect()(0)
    assert(d.getLong(2) == 2L * 2L * 1L)
    // identical samples → zero
    val z = graft.ops.Drift.tvDistance(a, a, "c").collect()(0)
    assert(z.getLong(2) == 0L)
  }

  test("bucketed prefix sum equals the naive global window at any width") {
    val a = (1 to 4000).map(i =>
      java.lang.Long.parseLong(org.apache.commons.codec.digest.DigestUtils
        .md5Hex(s"a$i").take(6), 16)).toDF("v")
    val b = (1 to 3000).map(i =>
      java.lang.Long.parseLong(org.apache.commons.codec.digest.DigestUtils
        .md5Hex(s"b$i").take(6), 16)).toDF("v")
    // naive single-window reference
    val pts = a.groupBy($"v").agg(count(lit(1)).as("ca")).withColumn("cb", lit(0L))
      .unionByName(b.groupBy($"v").agg(count(lit(1)).as("cb")).withColumn("ca", lit(0L)))
      .groupBy($"v").agg(sum($"ca").as("ca"), sum($"cb").as("cb"))
    val w = Window.orderBy($"v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val na = a.count(); val nb = b.count()
    val naive = pts.withColumn("ra", sum($"ca").over(w))
      .withColumn("rb", sum($"cb").over(w))
      .select(abs($"ra" * nb - $"rb" * na).as("diff"))
      .agg(max($"diff")).collect()(0).getLong(0)
    Seq(1L, 1000L, 1L << 20, Long.MaxValue / 4).foreach { width =>
      val r = Drift.ksStatistic(a, b, "v", bucketWidth = width).collect()(0)
      assert(r.getLong(2) == naive,
        s"width $width must not change the statistic: ${r.getLong(2)} vs $naive")
      assert(r.getLong(0) == na && r.getLong(1) == nb)
    }
  }

  test("incremental KS state: init+addBatch equals init on the union; monitor equals recompute") {
    import graft.ops.IncrementalDrift
    val a1 = (1 to 500).map(i => (i * 37L) % 211L).toDF("v")
    val a2 = (1 to 300).map(i => (i * 91L) % 191L).toDF("v")
    val b = (1 to 400).map(i => (i * 53L) % 199L).toDF("v")
    val st = tmpDir("drift-inc") + "/ks"
    IncrementalDrift.init(spark, a1, "v", st)
    IncrementalDrift.addBatch(spark, a2, "v", st)
    val inc = IncrementalDrift.monitor(spark, b, "v", st).collect()(0)
    val full = Drift.ksStatistic(a1.unionByName(a2), b, "v").collect()(0)
    assert(inc.toSeq == full.toSeq,
      s"incremental monitor must equal the two-sample recompute: $inc vs $full")
    // a fresh init on the union lands the identical state
    val st2 = tmpDir("drift-inc2") + "/ks"
    IncrementalDrift.init(spark, a1.unionByName(a2), "v", st2)
    val viaInit = spark.read.parquet(st2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaFold = spark.read.parquet(st).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaInit == viaFold, "counts are additive: fold == union init")
  }

  test("incremental TV state matches the categorical recompute") {
    import graft.ops.IncrementalDrift
    val a1 = (1 to 200).map(i => s"c${i % 5}").toDF("cat")
    val a2 = (1 to 100).map(i => s"c${i % 7}").toDF("cat")
    val b = (1 to 150).map(i => s"c${i % 4}").toDF("cat")
    val st = tmpDir("drift-inc-tv") + "/tv"
    IncrementalDrift.initCat(spark, a1, "cat", st)
    IncrementalDrift.addBatchCat(spark, a2, "cat", st)
    val inc = IncrementalDrift.monitorCat(spark, b, "cat", st).collect()(0)
    val full = Drift.tvDistance(a1.unionByName(a2), b, "cat").collect()(0)
    assert(inc.toSeq == full.toSeq, s"$inc vs $full")
  }
}
