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
    }),

    // Top-25 parts by exact triangle count in the co-purchase graph —
    // degree-oriented wedge counting (PageRank.triangleCounts), every
    // join an equi-join. The oracle enumerates each a<b<c triangle once
    // via the canonical-edge 3-way self-join. The graph is the p%3=0
    // part slice: the co-purchase graph is deliberately dense (popular
    // parts co-occur constantly), and triangle counting is cubic-ish in
    // density — the full sf0.1 graph is a 29 s entry for zero extra
    // correctness signal, the slice checks the identical code path in
    // ~1/9 the edges (the at-scale cost argument lives in the
    // degree-orientation bound, spec-pinned, not in this fixture).
    "q_triangles" -> ((s, dir) => {
      import s.implicits._
      val op = Tables(s, dir, "lineitem")
        .select($"l_orderkey".as("o"), $"l_partkey".as("p")).distinct()
        .filter($"p" % 3 === 0)
      val small = op.groupBy($"o").agg(count(lit(1)).as("basket"))
        .filter($"basket" <= 100)
        .select($"o")
      val capped = op.join(small, "o")
      val pairs = capped.join(capped.select($"o", $"p".as("p2")), "o")
        .filter($"p" < $"p2")
        .select($"p".as("u"), $"p2".as("v"))
        .distinct()
      PageRank.triangleCounts(pairs)
        .filter($"n_tri" > 0)
        .orderBy($"n_tri".desc, $"id".asc)
        .limit(25)
        .select($"id".as("part"), $"n_tri")
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
        |LIMIT 25""".stripMargin,

    "q_triangles" ->
      """WITH op AS (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
        |  WHERE l_partkey % 3 = 0
        |),
        |capped AS (
        |  SELECT op.o, op.p FROM op
        |  JOIN (SELECT o FROM op GROUP BY o HAVING count(1) <= 100) s
        |    ON op.o = s.o
        |),
        |edges AS (
        |  SELECT DISTINCT a.p AS x, b.p AS y
        |  FROM capped a JOIN capped b ON a.o = b.o AND a.p < b.p
        |),
        |tri AS (
        |  SELECT e1.x AS a, e1.y AS b, e2.y AS c
        |  FROM edges e1
        |  JOIN edges e2 ON e2.x = e1.y
        |  JOIN edges e3 ON e3.x = e1.x AND e3.y = e2.y
        |),
        |corners AS (
        |  SELECT a AS id FROM tri
        |  UNION ALL SELECT b FROM tri
        |  UNION ALL SELECT c FROM tri
        |)
        |SELECT id AS part, CAST(count(1) AS bigint) AS n_tri
        |FROM corners GROUP BY id
        |ORDER BY n_tri DESC, part ASC
        |LIMIT 25""".stripMargin)
}
