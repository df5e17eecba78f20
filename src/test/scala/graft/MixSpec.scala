package graft

import graft.llm.Mix
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-mix laws: the two-pass distributed prefix sum equals the
  * naive per-source window, budget-edge semantics, and determinism
  * under re-partitioning.
  */
class MixSpec extends SparkSpec {

  import spark.implicits._

  private def corpus = spark.range(0, 150).select(
    $"id".as("doc_id"),
    concat(lit("src"), ($"id" % 3).cast("string")).as("source"),
    // token count varies 1..20 with the id
    concat_ws(" ", array_repeat(lit("tok"), ($"id" % 20 + 1).cast("int")))
      .as("text"))

  private def budgets = Seq(("src0", 120L), ("src1", 60L), ("src2", 500L))
    .toDF("source", "__budget")

  test("two-pass selection equals the naive single-window law") {
    val got = Mix.sampleToBudget(corpus, budgets, "source", "text", "doc_id")
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val naive = corpus
      .withColumn("__tokens", size(split($"text", " ")).cast("long"))
      .withColumn("__h", md5($"doc_id".cast("string")))
      .withColumn("__cum", sum($"__tokens").over(
        Window.partitionBy($"source").orderBy($"__h")))
      .join(budgets, Seq("source"))
      .filter($"__cum" <= $"__budget")
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(got == naive && got.nonEmpty,
      s"distributed ${got.size} docs vs naive ${naive.size}")
  }

  test("budget edges: zero selects none, straddler excluded, total selects all") {
    val ten = spark.range(0, 5).select($"id".as("doc_id"), lit("s").as("source"),
      concat_ws(" ", array_repeat(lit("w"), 10)).as("text"))
    def sel(b: Long) = Mix.sampleToBudget(ten,
      Seq(("s", b)).toDF("source", "__budget"), "source", "text", "doc_id")
    assert(sel(0L).count() == 0)
    assert(sel(25L).count() == 2, "10+10=20 fits, 30 > 25 — the straddler is out")
    assert(sel(50L).count() == 5)
    // inclusive-sum law: the selected token total never exceeds budget
    val tot = sel(35L).agg(sum($"__tokens")).head().getLong(0)
    assert(tot == 30L)
  }

  test("selection is invariant under input partitioning") {
    val a = Mix.sampleToBudget(corpus.repartition(17), budgets,
      "source", "text", "doc_id").select($"doc_id").collect().map(_.getLong(0)).toSet
    val b = Mix.sampleToBudget(corpus.coalesce(1), budgets,
      "source", "text", "doc_id").select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }
}
