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

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    baseQueries ++ hierarchyQueries

  private def baseQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
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

    // INCREMENTAL PageRank (the graph sibling of q_dedup_incremental /
    // q_ann_incremental, same staged-swap shape): ranks of the BASE
    // co-purchase graph (orders with o%4<>0, 5 iterations) are persisted
    // to parquet — the "nightly" state; the delta orders (o%4=0) then
    // arrive, and the updated ranks are 3 WARM-START iterations over the
    // full graph seeded from the persisted vector (new nodes at the
    // uniform prior of the new node count). The per-iteration edge scan
    // is irreducible for PageRank; the incremental win is the iteration
    // budget — 3 warm rounds instead of a full cold restart. All integer
    // fixed-point, so the oracle unrolls all 8 rounds and every rank
    // matches to the last unit — through a disk round-trip of the state.
    "q_pagerank_incremental" -> ((s, dir) => {
      import s.implicits._
      val op = Tables(s, dir, "lineitem")
        .select($"l_orderkey".as("o"), $"l_partkey".as("p")).distinct()
      val small = op.groupBy($"o").agg(count(lit(1)).as("basket"))
        .filter($"basket" <= 100)
        .select($"o")
      // both edge derivations (base and full) self-join this relation —
      // materialize it once instead of re-running the scan + basket agg
      val capped = op.join(small, "o").localCheckpoint(true)
      def copurchase(rel: org.apache.spark.sql.DataFrame) =
        rel.join(rel.select($"o", $"p".as("p2")), "o")
          .filter($"p" =!= $"p2")
          .select($"p".as("src"), $"p2".as("dst"))
          .distinct()
      val edgesBase = copurchase(capped.filter($"o" % 4 =!= 0))
      val edgesFull = copurchase(capped)
      val state = sys.props("java.io.tmpdir") +
        s"/graft_princ_${ProcessHandle.current().pid()}/ranks"
      PageRank.ranks(edgesBase, 5)
        .write.mode("overwrite").parquet(state)
      val prior = s.read.parquet(state)
      PageRank.ranksFrom(edgesFull, prior, 3)
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

  /** One unrolled fixed-point PageRank round chain (DuckDB CTE bodies):
    * `prefix`s_i / `prefix`r_i for i in 1..iters, starting from rank
    * relation `from`, over edge relation `edges` with node set `nodes`,
    * count `cnt`, out-degrees `deg` — the same generator discipline as
    * `Layout.hilbertSql` (oracle SQL produced by the code under test's
    * own algebra, never hand-drifted).
    */
  private def prChain(edges: String, nodes: String, cnt: String, deg: String,
      from: String, prefix: String, iters: Int): String =
    (1 to iters).map { i =>
      val prev = if (i == 1) from else s"${prefix}r${i - 1}"
      s"""${prefix}s$i AS (
         |  SELECT e.dst AS id, CAST(SUM(r.r // d.deg) AS bigint) AS s
         |  FROM $edges e JOIN $prev r ON e.src = r.id JOIN $deg d ON e.src = d.id
         |  GROUP BY 1),
         |${prefix}r$i AS (
         |  SELECT n.id, (3000000000000 // (20 * c.n))
         |    + (17 * COALESCE(s.s, 0)) // 20 AS r
         |  FROM $nodes n CROSS JOIN $cnt c LEFT JOIN ${prefix}s$i s ON n.id = s.id)"""
        .stripMargin
    }.mkString(",\n")

  private def partEdges(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "part").select($"p_partkey")
      .filter($"p_partkey" >= 2)
      .select($"p_partkey".as("child"),
        expr("p_partkey div 2").as("parent"))
  }

  def hierarchyQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // RECURSIVE-CTE capability (Spark has no WITH RECURSIVE): full
    // ancestor closure of the binary-heap forest over part keys
    // (parent = key div 2 — depth ~log2 |part|, every key's root is 1)
    // via PATH DOUBLING: ⌈log2 depth⌉+1 rounds of id-keyed self-joins,
    // not depth sequential joins (HierarchySpec pins the round count).
    // The oracle runs DuckDB's real WITH RECURSIVE over the same edges;
    // per-depth pair counts, distinct ancestors, and exact bigint node
    // sums hash the entire closure.
    "q_hierarchy_closure" -> ((s, dir) => {
      import s.implicits._
      graft.ops.Hierarchy.ancestorClosure(partEdges(s, dir), "child", "parent")
        .groupBy($"dist")
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct($"anc").as("n_ancestors"),
          sum($"node").as("sum_node"))
        .orderBy($"dist")
    }),

    // INCREMENTAL hierarchy closure (ops/IncrementalHierarchy — the
    // persisted-index discipline over the recursive closure): the heap
    // forest is split at maxkey/2 — the store seeds with the top half
    // of the tree, then ONE batch grafts the bottom half, whose chains
    // attach both to stored nodes and to each other, so every crossing
    // path exercises the attachment join. The oracle is the SAME
    // recursive CTE as q_hierarchy_closure: the incremental protocol
    // must land the exact closure the one-shot computes — per-dist
    // pair counts, distinct ancestors, and node sums hash it all.
    // Batch cost = closure of the NEW subtrees + one id-keyed join;
    // the stored closure is never recomputed (HierarchySpec pins the
    // three-batch composition, replay no-op, and reparent rejection).
    "q_hierarchy_incremental" -> ((s, dir) => {
      import s.implicits._
      val st = sys.props("java.io.tmpdir") +
        s"/graft_inchier_${ProcessHandle.current().pid()}"
      graft.ops.FileOps.resetWorkDirs(s, Seq(st))
      val e = partEdges(s, dir)
      val cut = Tables(s, dir, "part")
        .agg(max($"p_partkey")).head().getLong(0) / 2L
      graft.ops.IncrementalHierarchy.init(s, st,
        e.filter($"child" <= cut), "child", "parent")
      graft.ops.IncrementalHierarchy.addBatch(s, st,
        e.filter($"child" > cut), "child", "parent")
      graft.ops.IncrementalHierarchy.closure(s, st)
        .groupBy($"dist")
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct($"anc").as("n_ancestors"),
          sum($"node").as("sum_node"))
        .orderBy($"dist")
    }),

    // BOM-style SUBTREE ROLLUP over the same forest: every node's
    // retail-price sum over itself + all descendants (one closure join
    // + one keyed agg — the org-headcount/BOM-cost query). Checked for
    // the 8 top-of-tree nodes; decimal-exact sums.
    "q_hierarchy_rollup" -> ((s, dir) => {
      import s.implicits._
      val part = Tables(s, dir, "part")
      val closure = graft.ops.Hierarchy
        .ancestorClosure(partEdges(s, dir), "child", "parent")
      graft.ops.Hierarchy
        .subtreeSum(part, "p_partkey", "p_retailprice", closure)
        .filter($"id" <= 8)
        .select($"id", $"n_subtree",
          $"subtree_sum".cast("double").as("subtree_sum"))
        .orderBy($"id")
    }))

  // shared by q_hierarchy_closure and q_hierarchy_incremental: the
  // incremental graft protocol must land the EXACT closure the one-shot
  // computes — same oracle, same hash
  private lazy val closureSql: String =
      """WITH RECURSIVE e AS (
        |  SELECT p_partkey AS child, p_partkey // 2 AS parent
        |  FROM part WHERE p_partkey >= 2
        |),
        |clo(node, anc, dist) AS (
        |  SELECT child, parent, 1 FROM e
        |  UNION ALL
        |  SELECT c.node, e.parent, c.dist + 1
        |  FROM clo c JOIN e ON c.anc = e.child
        |)
        |SELECT CAST(dist AS bigint) AS dist,
        |  CAST(COUNT(1) AS bigint) AS n_pairs,
        |  CAST(COUNT(DISTINCT anc) AS bigint) AS n_ancestors,
        |  CAST(SUM(node) AS bigint) AS sum_node
        |FROM clo GROUP BY dist ORDER BY dist""".stripMargin

  def oracle: Map[String, String] = Map(
    "q_hierarchy_closure" -> closureSql,
    "q_hierarchy_incremental" -> closureSql,
    "q_hierarchy_rollup" ->
      """WITH RECURSIVE e AS (
        |  SELECT p_partkey AS child, p_partkey // 2 AS parent
        |  FROM part WHERE p_partkey >= 2
        |),
        |clo(node, anc) AS (
        |  SELECT child, parent FROM e
        |  UNION ALL
        |  SELECT c.node, e.parent FROM clo c JOIN e ON c.anc = e.child
        |),
        |contrib AS (
        |  SELECT clo.anc AS id, CAST(p.p_retailprice AS decimal(30,2)) AS v
        |  FROM clo JOIN part p ON p.p_partkey = clo.node
        |  UNION ALL
        |  SELECT p_partkey, CAST(p_retailprice AS decimal(30,2)) FROM part
        |)
        |SELECT id, CAST(COUNT(1) AS bigint) AS n_subtree,
        |  CAST(SUM(v) AS double) AS subtree_sum
        |FROM contrib WHERE id <= 8 GROUP BY id ORDER BY id""".stripMargin) ++ Map(
    "q_pagerank_incremental" ->
      s"""WITH op AS (
         |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
         |),
         |capped AS (
         |  SELECT op.o, op.p FROM op
         |  JOIN (SELECT o FROM op GROUP BY o HAVING count(1) <= 100) s
         |    ON op.o = s.o
         |),
         |bcap AS (SELECT * FROM capped WHERE o % 4 <> 0),
         |eb AS (
         |  SELECT DISTINCT a.p AS src, b.p AS dst
         |  FROM bcap a JOIN bcap b ON a.o = b.o AND a.p <> b.p
         |),
         |ef AS (
         |  SELECT DISTINCT a.p AS src, b.p AS dst
         |  FROM capped a JOIN capped b ON a.o = b.o AND a.p <> b.p
         |),
         |nb AS (SELECT src AS id FROM eb UNION SELECT dst AS id FROM eb),
         |cb AS (SELECT CAST(count(1) AS bigint) AS n FROM nb),
         |db AS (SELECT src AS id, CAST(count(1) AS bigint) AS deg FROM eb GROUP BY 1),
         |br0 AS (SELECT id, 1000000000000 // n AS r FROM nb CROSS JOIN cb),
         |${prChain("eb", "nb", "cb", "db", "br0", "b", 5)},
         |nf AS (SELECT src AS id FROM ef UNION SELECT dst AS id FROM ef),
         |cf AS (SELECT CAST(count(1) AS bigint) AS n FROM nf),
         |df AS (SELECT src AS id, CAST(count(1) AS bigint) AS deg FROM ef GROUP BY 1),
         |fw0 AS (
         |  SELECT n.id, COALESCE(p.r, 1000000000000 // c.n) AS r
         |  FROM nf n CROSS JOIN cf c LEFT JOIN br5 p ON n.id = p.id),
         |${prChain("ef", "nf", "cf", "df", "fw0", "f", 3)}
         |SELECT id AS part, r AS rank_fp, r / 1000000000000.0::double AS rank
         |FROM fr3
         |ORDER BY rank_fp DESC, part ASC
         |LIMIT 25""".stripMargin,
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
