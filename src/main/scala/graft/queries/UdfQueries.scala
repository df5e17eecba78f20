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
