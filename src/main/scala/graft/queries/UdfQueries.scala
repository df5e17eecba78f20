package graft.queries

import graft.Tables
import graft.functions.GraftFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** UDF-surface entries (C14): the custom Aggregator and the generator
  * UDF, oracle-checked against built-in SQL equivalents.
  */
object UdfQueries extends graft.QueryModule {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Typed Aggregator: deterministic sorted string_agg per region.
    "q_udaf_sorted_concat" -> ((s, dir) => {
      import s.implicits._
      GraftFunctions.register(s)
      Tables(s, dir, "nation").createOrReplaceTempView("nation_udaf")
      s.sql(
        """SELECT n_regionkey, graft_sorted_concat(n_name) AS nations,
          |       COUNT(1) AS n
          |FROM nation_udaf GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin)
    }),

    // Native codegen Expression #2 (graft_nfc — functions/NfcNormalize):
    // Unicode NFC canonicalization, the dedup-key prerequisite Spark has
    // no built-in for. Each document gets a decomposed-spelling suffix
    // appended (combining marks via \u escapes), and the entry hashes
    // the NORMALIZED text — DuckDB's nfc_normalize implements the same
    // canonical composition, so md5 agreement is byte-level proof across
    // engines, while n_raw > n_nfc pins that composition really fired.
    "q_unicode_nfc" -> ((s, dir) => {
      import s.implicits._
      Tables(s, dir, "documents")
        .filter($"doc_id" % 25 === 0)
        .select($"doc_id",
          concat($"text", lit(" cafe\u0301 A\u030a")).as("raw"))
        .select($"doc_id", length($"raw").as("n_raw"),
          length(call_function("graft_nfc", $"raw")).as("n_nfc"),
          md5(call_function("graft_nfc", $"raw")).as("h"))
        .orderBy($"doc_id")
    }),

    // Generator: explode over an array-returning UDF (word bigrams),
    // plus the scalar UDF in the same projection.
    "q_udf_generator" -> ((s, dir) => {
      import s.implicits._
      GraftFunctions.register(s)
      Tables(s, dir, "part")
        .filter($"p_partkey" % 100 === 0)
        .select($"p_partkey",
          explode(expr("graft_bigrams(p_name)")).as("bigram"))
        .withColumn("bigram_novowel", expr("graft_strip_vowels(bigram)"))
        .groupBy($"bigram", $"bigram_novowel")
        .agg(count(lit(1)).as("n"))
        .orderBy($"bigram")
    }))

  def oracle: Map[String, String] = Map(
    "q_unicode_nfc" ->
      """WITH raw AS (
        |  SELECT doc_id, text || ' cafe' || chr(769) || ' A' || chr(778) AS r
        |  FROM documents WHERE doc_id % 25 = 0
        |)
        |SELECT doc_id, length(r) AS n_raw,
        |  length(nfc_normalize(r)) AS n_nfc,
        |  md5(nfc_normalize(r)) AS h
        |FROM raw ORDER BY doc_id""".stripMargin,
    "q_udaf_sorted_concat" ->
      """SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations,
        |  COUNT(1) AS n
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,
    "q_udf_generator" ->
      """WITH toks AS (
        |  SELECT p_partkey,
        |    string_split(trim(regexp_replace(lower(p_name), '\s+', ' ', 'g')), ' ') AS tk
        |  FROM part WHERE p_partkey % 100 = 0
        |),
        |bg AS (
        |  SELECT p_partkey,
        |    unnest(list_transform(range(1, greatest(len(tk), 1)),
        |      i -> tk[i] || ' ' || tk[i+1])) AS bigram
        |  FROM toks WHERE len(tk) >= 2
        |)
        |SELECT bigram, regexp_replace(bigram, '[aeiou]', '', 'g') AS bigram_novowel,
        |  COUNT(1) AS n
        |FROM bg GROUP BY bigram ORDER BY bigram""".stripMargin)
}
