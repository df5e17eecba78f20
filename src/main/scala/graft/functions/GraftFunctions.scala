package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator

/** UDF surface (SURVEY §2 Tier C "UDF surface"): a typed custom
  * `Aggregator`, a scalar UDF, and an array-returning UDF used as a
  * generator via `explode`.
  *
  * These exist for CONTRACT parity: the reference's world delegates
  * arbitrary logic to stored procedures, and a real engine must let users
  * register theirs. The engine's own operators deliberately avoid UDFs
  * (black-box to Catalyst: no codegen fusion, no pushdown through them) —
  * everything in graft.llm / graft.ops is built-in expressions; this
  * module is the escape hatch, not the default.
  */
object GraftFunctions {

  /** Deterministic string_agg: collects, sorts, joins — the order-stable
    * equivalent of `string_agg(x, ',' ORDER BY x)` (SURVEY B1) as a typed
    * `Aggregator` (buffer = sorted-later list; merge is list concat).
    */
  object SortedConcat extends Aggregator[String, List[String], String] {
    def zero: List[String] = Nil
    def reduce(b: List[String], a: String): List[String] = if (a == null) b else a :: b
    def merge(b1: List[String], b2: List[String]): List[String] = b1 ::: b2
    def finish(r: List[String]): String = r.sorted.mkString(",")
    def bufferEncoder: Encoder[List[String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[String]]()
    def outputEncoder: Encoder[String] = Encoders.STRING
  }

  /** Word bigrams — array-returning UDF used as a generator via explode.
    * Null-safe: Spark passes NULL through to reference-typed UDF inputs.
    */
  val bigrams: String => Seq[String] = s => {
    if (s == null) Seq.empty
    else {
      val toks = s.trim.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)
      if (toks.length < 2) Seq.empty else toks.sliding(2).map(_.mkString(" ")).toSeq
    }
  }

  /** Scalar UDF: strip vowels (example custom logic). */
  val stripVowels: String => String = s => if (s == null) null else s.replaceAll("[aeiou]", "")

  /** Register everything on a session (the user-facing entry point). */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("graft_bigrams", bigrams)
    spark.udf.register("graft_strip_vowels", stripVowels)
    spark.udf.register("graft_sorted_concat",
      org.apache.spark.sql.functions.udaf(SortedConcat))
  }
}
