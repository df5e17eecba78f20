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
