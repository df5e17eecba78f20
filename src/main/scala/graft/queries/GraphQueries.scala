package graft.queries

import graft.Tables
import graft.ops.PageRank
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over relations derived from the TPC-H-ish tables.
  *
  * `q_pagerank` runs [[graft.ops.PageRank]] on the symmetric co-purchase
  * part graph (parts sharing an order, both directions — the same
  * basket-capped derivation as `q_copurchase`). Because every step of
  * the operator is integer arithmetic on a 1e12 fixed-point scale, the
  * DuckDB oracle UNROLLS the same five iterations and every rank
  * matches to the last unit — an exact-hash check on an iterative
  * graph algorithm, same bar as the BPE-training and bigram-LM oracles.
  */
object GraphQueries extends graft.QueryModule {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Top-25 parts by PageRank in the co-purchase graph (damping 17/20,
    // 5 iterations). Rank ties break on part id.
    "q_pagerank" -> ((s, dir) => {
      import s.implicits._
      val op = Tables(s, dir, "lineitem")
        .select($"l_orderkey".as("o"), $"l_partkey".as("p")).distinct()
      // the q_copurchase basket cap: bounds the per-order fan-out at
      // C(100,2) so one pathological order cannot go quadratic
      val small = op.groupBy($"o").agg(count(lit(1)).as("basket"))
        .filter($"basket" <= 100)
        .select($"o")
      val capped = op.join(small, "o")
      val edges = capped.join(capped.select($"o", $"p".as("p2")), "o")
        .filter($"p" =!= $"p2")
        .select($"p".as("src"), $"p2".as("dst"))
        .distinct()
      PageRank.ranks(edges, 5)
        .select($"id".as("part"), $"rank_fp",
          ($"rank_fp".cast("double") / lit(1e12)).as("rank"))
        .orderBy($"rank_fp".desc, $"part".asc)
        .limit(25)
    }))

  def oracle: Map[String, String] = Map(
    "q_pagerank" ->
      """WITH op AS (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
        |),
        |capped AS (
        |  SELECT op.o, op.p FROM op
        |  JOIN (SELECT o FROM op GROUP BY o HAVING count(1) <= 100) s
        |    ON op.o = s.o
        |),
        |edges AS (
        |  SELECT DISTINCT a.p AS src, b.p AS dst
        |  FROM capped a JOIN capped b ON a.o = b.o AND a.p <> b.p
        |),
        |nodes AS (
        |  SELECT src AS id FROM edges UNION SELECT dst AS id FROM edges
        |),
        |c AS (SELECT CAST(count(1) AS bigint) AS n FROM nodes),
        |deg AS (
        |  SELECT src AS id, CAST(count(1) AS bigint) AS deg
        |  FROM edges GROUP BY 1
        |),
        |r0 AS (SELECT id, 1000000000000 // n AS r FROM nodes CROSS JOIN c),
        |s1 AS (
        |  SELECT e.dst AS id, CAST(SUM(r.r // d.deg) AS bigint) AS s
        |  FROM edges e JOIN r0 r ON e.src = r.id JOIN deg d ON e.src = d.id
        |  GROUP BY 1),
        |r1 AS (
        |  SELECT n.id, (3000000000000 // (20 * c.n))
        |    + (17 * COALESCE(s.s, 0)) // 20 AS r
        |  FROM nodes n CROSS JOIN c LEFT JOIN s1 s ON n.id = s.id),
        |s2 AS (
        |  SELECT e.dst AS id, CAST(SUM(r.r // d.deg) AS bigint) AS s
        |  FROM edges e JOIN r1 r ON e.src = r.id JOIN deg d ON e.src = d.id
        |  GROUP BY 1),
        |r2 AS (
        |  SELECT n.id, (3000000000000 // (20 * c.n))
        |    + (17 * COALESCE(s.s, 0)) // 20 AS r
        |  FROM nodes n CROSS JOIN c LEFT JOIN s2 s ON n.id = s.id),
        |s3 AS (
        |  SELECT e.dst AS id, CAST(SUM(r.r // d.deg) AS bigint) AS s
        |  FROM edges e JOIN r2 r ON e.src = r.id JOIN deg d ON e.src = d.id
        |  GROUP BY 1),
        |r3 AS (
        |  SELECT n.id, (3000000000000 // (20 * c.n))
        |    + (17 * COALESCE(s.s, 0)) // 20 AS r
        |  FROM nodes n CROSS JOIN c LEFT JOIN s3 s ON n.id = s.id),
        |s4 AS (
        |  SELECT e.dst AS id, CAST(SUM(r.r // d.deg) AS bigint) AS s
        |  FROM edges e JOIN r3 r ON e.src = r.id JOIN deg d ON e.src = d.id
        |  GROUP BY 1),
        |r4 AS (
        |  SELECT n.id, (3000000000000 // (20 * c.n))
        |    + (17 * COALESCE(s.s, 0)) // 20 AS r
        |  FROM nodes n CROSS JOIN c LEFT JOIN s4 s ON n.id = s.id),
        |s5 AS (
        |  SELECT e.dst AS id, CAST(SUM(r.r // d.deg) AS bigint) AS s
        |  FROM edges e JOIN r4 r ON e.src = r.id JOIN deg d ON e.src = d.id
        |  GROUP BY 1),
        |r5 AS (
        |  SELECT n.id, (3000000000000 // (20 * c.n))
        |    + (17 * COALESCE(s.s, 0)) // 20 AS r
        |  FROM nodes n CROSS JOIN c LEFT JOIN s5 s ON n.id = s.id)
        |SELECT id AS part, r AS rank_fp, r / 1000000000000.0::double AS rank
        |FROM r5
        |ORDER BY rank_fp DESC, part ASC
        |LIMIT 25""".stripMargin)
}
