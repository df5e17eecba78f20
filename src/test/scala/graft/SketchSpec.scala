package graft

import graft.llm.Sketch
import org.apache.spark.sql.functions._

/** Count-min sketch laws: never undercounts, overcounts by at most ε·N
  * (ε = e/width) on this fixture, and the sketch stays bounded.
  */
class SketchSpec extends SparkSpec {

  private val depth = 3
  private val width = 64

  private def toks = {
    import spark.implicits._
    // Zipf-ish fixture: token t_k appears ~200/k times, k = 1..50.
    (1 to 50).flatMap(k => Seq.fill(200 / k)(s"t$k")).toDF("tok").repartition(4)
  }

  test("estimates never undercount, and overcount by at most eps*N") {
    import spark.implicits._
    val exact = toks.groupBy($"tok").agg(count(lit(1)).as("n"))
    val sketch = Sketch.countMin(toks, "tok", depth, width)
    val n = toks.count()
    val epsN = math.ceil(math.E / width * n).toLong
    val joined = exact.join(
      Sketch.estimate(sketch, exact.select($"tok"), "tok", depth, width), Seq("tok"))
      .select($"tok", $"n", $"cms_est").collect()
    assert(joined.length == 50)
    joined.foreach { r =>
      val (t, ex, est) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(est >= ex, s"$t: CMS must never undercount ($est < $ex)")
      assert(est <= ex + epsN, s"$t: overcount ${est - ex} exceeds eps*N=$epsN")
    }
  }

  test("unseen tokens estimate 0 when any of their counters is empty") {
    import spark.implicits._
    // tiny stream, huge width: most counters stay empty, so a token the
    // corpus never saw almost surely maps to at least one empty counter —
    // the estimate must be 0 (not dropped, not inflated by a collision on
    // a different row of the sketch)
    val tiny = Seq("a", "a", "b").toDF("tok")
    val sketch = Sketch.countMin(tiny, "tok", depth, width = 4096)
    val unseen = (1 to 20).map(i => s"ghost$i").toDF("tok")
    val est = Sketch.estimate(sketch, unseen, "tok", depth, width = 4096)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.size == 20, "unseen tokens must not vanish from the output")
    assert(est.values.forall(_ == 0L),
      s"all-empty or partially-empty counters must floor the min at 0: $est")
  }

  test("sketch is bounded by depth*width counters and conserves mass per row") {
    import spark.implicits._
    val sketch = Sketch.countMin(toks, "tok", depth, width)
    assert(sketch.count() <= depth.toLong * width)
    val n = toks.count()
    // each sketch row partitions the full stream: its counters sum to N
    val perRow = sketch.groupBy($"i").agg(sum($"c").as("mass"))
      .collect().map(r => r.getLong(1))
    assert(perRow.length == depth && perRow.forall(_ == n))
  }
}
