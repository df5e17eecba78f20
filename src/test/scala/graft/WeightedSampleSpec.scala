package graft

import graft.llm.Sample
import org.apache.spark.sql.functions._

/** A-Res weighted sampling: weight-proportional selection, determinism,
  * and the per-stratum top-k plan shape.
  */
class WeightedSampleSpec extends SparkSpec {

  import spark.implicits._

  test("selection odds scale with weight: the 100x doc wins nearly every stratum") {
    // 200 strata, each holding a weight-1 and a weight-100 doc. With
    // priority ln(u)/w, P(heavy wins) = 100/101 per stratum; 200 strata
    // make <150 heavy wins astronomically unlikely — and the md5-u makes
    // the outcome reproducible, so this is a fixed fact, not a flake.
    val rows = (0 until 200).flatMap { s =>
      Seq((s.toLong * 2, s, 1L), (s.toLong * 2 + 1, s, 100L))
    }.toDF("id", "stratum", "w")
    val picked = Sample.weightedSample(rows, "id", "w", Seq("stratum"), 1)
    val heavyWins = picked.filter($"w" === 100L).count()
    assert(picked.count() == 200)
    assert(heavyWins >= 150, s"heavy doc won only $heavyWins/200 strata")
  }

  test("deterministic: the same call picks the same rows in the same order") {
    val rows = (0 until 500).map(i => (i.toLong, i % 7, (i % 13 + 1).toLong))
      .toDF("id", "stratum", "w")
    def run() = Sample.weightedSample(rows, "id", "w", Seq("stratum"), 3)
      .select($"stratum", $"rk", $"id").collect().map(r =>
        (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    assert(run() == run())
  }

  test("per-stratum top-k plans as WindowGroupLimit, not a full sort") {
    val rows = (0 until 1000).map(i => (i.toLong, i % 7, 1L))
      .toDF("id", "stratum", "w")
    val plan = Sample.weightedSample(rows, "id", "w", Seq("stratum"), 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank filter must push a group limit:\n${plan.take(2000)}")
  }
}
