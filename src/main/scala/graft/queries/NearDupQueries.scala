package graft.queries

import graft.Tables
import graft.llm.{Dedup, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Near-duplicate detection entries: MinHash-LSH candidates, SimHash
  * values, exact n-gram Jaccard verification. Near-dups are synthesized
  * deterministically (each sampled doc unions a copy with its first token
  * dropped — high but non-trivial shingle overlap) so the operators have
  * real positives to find and the oracle can rebuild the same corpus.
  */
object NearDupQueries extends graft.QueryModule {

  /** Sampled docs + first-token-dropped near-copies (ids +100000).
    * `mod` sets the sampling rate; the exact similarity join uses 25 (the
    * synthetic docs share a tiny template vocabulary, so TRUE pair
    * density is quadratic-dense — at mod 5/sf0.1 the honest answer is
    * 1.1M pairs ≥ 0.6, a degenerate instance for ANY exact join).
    */
  private def nearDupCorpus(s: SparkSession, dir: String,
      mod: Int = 5): DataFrame = {
    import s.implicits._
    val base = Tables(s, dir, "documents")
      .filter($"doc_id" % mod === 0)
      .select($"doc_id", $"text", $"lang")
    val mutated = base
      .withColumn("doc_id", $"doc_id" + 100000L)
      .withColumn("text", regexp_replace(TextOps.norm($"text"), "^[^ ]+ ", ""))
    base.unionByName(mutated)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // MinHash-LSH: shingle → 16 seeded min-hashes → 4 bands → bucket join.
    "q_minhash_lsh" -> ((s, dir) => {
      import s.implicits._
      Dedup.minhashCandidates(nearDupCorpus(s, dir), "text", "doc_id")
        .orderBy($"id_a", $"id_b")
    }),

    // SimHash-32 values (bit-parity check of the packed sketch).
    "q_simhash" -> ((s, dir) => {
      import s.implicits._
      Dedup.simhash32(
          Tables(s, dir, "documents").filter($"doc_id" % 25 === 0), "text", "doc_id")
        .orderBy($"doc_id")
    }),

    // SimHash near-dup pairs via the pigeonhole chunk join (r=3 → 4
    // 8-bit chunks) over the synthesized near-dup corpus, where the
    // mutated copies sit at hamming ≤ 3 of their originals.
    "q_simhash_pairs" -> ((s, dir) => {
      import s.implicits._
      Dedup.simhashPairs(nearDupCorpus(s, dir), "text", "doc_id", maxHamming = 3)
        .select($"id_a", $"id_b", $"hamming")
        .orderBy($"id_a", $"id_b")
    }),

    // Pairs → duplicate CLUSTERS: connected components over the simhash
    // pair graph (min-label propagation), summarized per component. The
    // oracle rebuilds the same graph all-pairs and closes it with a
    // recursive CTE — component membership must match exactly.
    "q_dedup_clusters" -> ((s, dir) => {
      import s.implicits._
      val pairs = Dedup
        .simhashPairs(nearDupCorpus(s, dir), "text", "doc_id", maxHamming = 3)
      Dedup.connectedComponents(pairs.select($"id_a", $"id_b"))
        .groupBy($"comp")
        .agg(count(lit(1)).as("n_members"),
          sum($"id").cast("bigint").as("sum_ids"),
          max($"id").as("max_id"))
        .orderBy($"comp")
    }),

    // Exact n-gram Jaccard over the known near-dup pairs.
    "q_ngram_jaccard" -> ((s, dir) => {
      import s.implicits._
      val corpus = nearDupCorpus(s, dir)
      val candidates = corpus.filter($"doc_id" < 100000L)
        .select($"doc_id".as("id_a"), ($"doc_id" + 100000L).as("id_b"))
      Dedup.ngramJaccard(corpus, candidates, "text", "doc_id")
        .select($"id_a", $"id_b", $"n_inter", $"n_a", $"n_b", $"jaccard")
        .orderBy($"id_a")
    }),

    // INCREMENTAL dedup against the persisted band-key index: batch A
    // (the originals) is added first, then batch B (the mutated copies)
    // is deduped against the STORED index — B is signed once and probes
    // the index by band key; A is never re-shingled. The oracle closes
    // the full A∪B band-pair graph in one shot (recursive CTE), so the
    // hash match IS the incremental law batch(A then B) == full(A ∪ B).
    "q_dedup_incremental" -> ((s, dir) => {
      import s.implicits._
      val corpus = nearDupCorpus(s, dir)
      val state = sys.props("java.io.tmpdir") +
        s"/graft_inc_dedup_${ProcessHandle.current().pid()}"
      // incremental STATE is the thing under test: start each run fresh
      val p = new org.apache.hadoop.fs.Path(state)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      graft.llm.IncrementalDedup.addBatch(s, state,
        corpus.filter($"doc_id" < 100000L), "text", "doc_id")
      val fin = graft.llm.IncrementalDedup.addBatch(s, state,
        corpus.filter($"doc_id" >= 100000L), "text", "doc_id")
      fin.groupBy($"comp")
        .agg(count(lit(1)).as("n_members"),
          sum($"id").cast("bigint").as("sum_ids"),
          max($"id").as("max_id"))
        .orderBy($"comp")
    }),

    // Cluster KEEP policy: near-dup clusters resolved to the member a
    // real pipeline keeps — the LONGEST variant (the superset doc), ties
    // to the smallest id; singletons keep themselves. This is the
    // deletion decision layered on the pair graph: per doc, its
    // component, the keeper, and whether it is dropped. One window over
    // the component key after CC — no new shuffle class.
    "q_dedup_keep_longest" -> ((s, dir) => {
      import s.implicits._
      val corpus = nearDupCorpus(s, dir)
      val pairs = Dedup.simhashPairs(corpus, "text", "doc_id", maxHamming = 3)
      val cc = Dedup.connectedComponents(pairs.select($"id_a", $"id_b"))
        .withColumnRenamed("id", "doc_id")
      val m = corpus
        .select($"doc_id",
          length(TextOps.norm($"text")).cast("long").as("n_chars"))
        .join(cc, Seq("doc_id"), "left")
        .select($"doc_id", $"n_chars", coalesce($"comp", $"doc_id").as("comp"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"comp").orderBy($"n_chars".desc, $"doc_id".asc)
      m.withColumn("keeper", first($"doc_id").over(w))
        .select($"doc_id", $"n_chars", $"comp", $"keeper",
          ($"doc_id" =!= $"keeper").as("is_dropped"))
        .orderBy($"doc_id")
    }),

    // EXACT set-similarity join (prefix filtering, AllPairs/PPJoin): ALL
    // pairs with token-set Jaccard ≥ 0.6 over the near-dup corpus. The
    // oracle is BRUTE-FORCE all-pairs Jaccard — the hash match IS the
    // no-miss guarantee of the prefix filter, pair for pair, at exactly
    // the threshold boundary included.
    "q_similarity_join" -> ((s, dir) => {
      import s.implicits._
      graft.llm.SetJoin.similarityJoin(
          nearDupCorpus(s, dir, mod = 25), "text", "doc_id", 0.6)
        .orderBy($"id_a", $"id_b")
    }),

    // INCREMENTAL exact set-similarity join (persisted frozen-order
    // prefix index — llm/IncrementalSetJoin): the originals are indexed
    // as the standing corpus, the mutated docs arrive as a batch, and
    // the probe must report EVERY ≥0.6-Jaccard pair touching the batch
    // at batch cost, no corpus re-tokenization. The token order is
    // FROZEN at init (the lemma needs a fixed order, not the true df),
    // so the index stays append-only and the oracle — brute-force
    // all-pairs over the full corpus restricted to batch-touching
    // pairs — must match pair for pair, boundary included.
    "q_similarity_join_incremental" -> ((s, dir) => {
      import s.implicits._
      val corpus = nearDupCorpus(s, dir, mod = 25)
      val state = sys.props("java.io.tmpdir") +
        s"/graft_incsj_${ProcessHandle.current().pid()}/state"
      graft.ops.FileOps.resetWorkDirs(s, Seq(state))
      graft.llm.IncrementalSetJoin.init(s, state,
        corpus.filter($"doc_id" < 100000L), "text", "doc_id", 0.6)
      graft.llm.IncrementalSetJoin.addBatch(s, state,
          corpus.filter($"doc_id" >= 100000L), "text", "doc_id", 0.6)
        .orderBy($"id_a", $"id_b")
    }),

    // EXACT repeated-span dedup (fixed-width suffix-array approximation):
    // per-doc maximal duplicated 8-token regions + covered fraction over
    // the near-dup corpus — the mutated copies are suffixes of their
    // originals, so every one of their 8-gram spans repeats and the
    // operator must report them ~fully covered (dup_frac 1.0) while the
    // originals lose only the first token's coverage.
    "q_repeated_spans" -> ((s, dir) => {
      import s.implicits._
      Dedup.repeatedSpans(nearDupCorpus(s, dir), "text", "doc_id", k = 8)
        .withColumnRenamed("id", "doc_id")
        .orderBy($"doc_id")
    }))

  private val duckNorm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

  /** Shared corpus + shingle CTEs (DuckDB); `corpusCtesMod` mirrors the
    * Spark side's sampling modulus.
    */
  private def corpusCtesMod(mod: Int) =
    s"""corpus AS (
       |  SELECT doc_id, text, lang FROM documents WHERE doc_id % $mod = 0
       |  UNION ALL
       |  SELECT doc_id + 100000, regexp_replace($duckNorm, '^[^ ]+ ', ''), lang
       |  FROM documents WHERE doc_id % $mod = 0
       |),
       |toks AS (
       |  SELECT doc_id, string_split($duckNorm, ' ') AS tk FROM corpus
       |),
       |shingle AS (
       |  SELECT doc_id,
       |    unnest(list_transform(range(1, greatest(len(tk) - 1, 1)),
       |      i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS sh
       |  FROM toks
       |)""".stripMargin

  private val corpusCtes = corpusCtesMod(5)

  private val simhashSums = (0 until 32)
    .map(j => s"SUM(((h >> $j) % 2) * 2 - 1) AS b$j").mkString(",\n    ")
  private val simhashPack = (0 until 32)
    .map(j => s"CASE WHEN b$j > 0 THEN ${1L << j} ELSE 0 END").mkString(" + ")

  /** MinHash signature + band-key CTEs (DuckDB) — shared by the LSH
    * candidate oracle and the incremental-dedup closure oracle.
    */
  private val bandsCtes =
    """sig AS (
      |  SELECT doc_id, seed, MIN(md5('s' || seed || '|' || sh)) AS mh
      |  FROM shingle, range(0, 16) t(seed)
      |  GROUP BY doc_id, seed
      |),
      |bands AS (
      |  SELECT doc_id, CAST(FLOOR(seed / 4) AS int) AS band,
      |    md5(concat_ws('|',
      |      MAX(CASE WHEN seed % 4 = 0 THEN mh END),
      |      MAX(CASE WHEN seed % 4 = 1 THEN mh END),
      |      MAX(CASE WHEN seed % 4 = 2 THEN mh END),
      |      MAX(CASE WHEN seed % 4 = 3 THEN mh END))) AS band_key
      |  FROM sig GROUP BY doc_id, FLOOR(seed / 4)
      |)""".stripMargin

  def oracle: Map[String, String] = Map(
    "q_minhash_lsh" ->
      s"""WITH $corpusCtes,
         |$bandsCtes
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  COUNT(DISTINCT a.band) AS n_shared_bands
         |FROM bands a
         |JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
         |            AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 ORDER BY id_a, id_b""".stripMargin,
    // Full-corpus closure of the band-pair graph: the incremental Spark
    // path (A added, then B against the stored index) must reproduce it
    // exactly, singletons included.
    "q_dedup_incremental" ->
      s"""WITH RECURSIVE $corpusCtes,
         |$bandsCtes,
         |p AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM bands a
         |  JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
         |              AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |),
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM p
         |  UNION SELECT id_b, id_a FROM p
         |),
         |reach(src, lbl) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.src
         |),
         |cc AS (SELECT src AS id, MIN(lbl) AS comp FROM reach GROUP BY src),
         |fin AS (
         |  SELECT c.doc_id AS id, COALESCE(cc.comp, c.doc_id) AS comp
         |  FROM corpus c LEFT JOIN cc ON cc.id = c.doc_id
         |)
         |SELECT comp, COUNT(1) AS n_members,
         |  CAST(SUM(id) AS bigint) AS sum_ids, MAX(id) AS max_id
         |FROM fin GROUP BY comp ORDER BY comp""".stripMargin,
    // Same corpus, 8-token spans with positions (zipped equal-length
    // unnests), corpus-wide occurrence count as a window, then the
    // gaps-and-islands interval merge per doc.
    "q_repeated_spans" ->
      s"""WITH $corpusCtes,
         |occ AS (
         |  SELECT doc_id, len(tk) AS n_toks,
         |    unnest(range(1, greatest(len(tk) - 6, 1))) AS pos,
         |    unnest(list_transform(range(1, greatest(len(tk) - 6, 1)),
         |      i -> array_to_string(tk[i:i+7], ' '))) AS sh8
         |  FROM toks
         |),
         |counted AS (
         |  SELECT doc_id, n_toks, pos, COUNT(1) OVER (PARTITION BY sh8) AS n
         |  FROM occ
         |),
         |dfl AS (SELECT doc_id, n_toks, pos FROM counted WHERE n >= 2),
         |marked AS (
         |  SELECT doc_id, n_toks, pos,
         |    CASE WHEN pos > COALESCE(MAX(pos + 7) OVER (
         |        PARTITION BY doc_id ORDER BY pos
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
         |      THEN 1 ELSE 0 END AS new_grp
         |  FROM dfl
         |),
         |grp AS (
         |  SELECT doc_id, n_toks, pos,
         |    SUM(new_grp) OVER (PARTITION BY doc_id ORDER BY pos) AS g
         |  FROM marked
         |),
         |regions AS (
         |  SELECT doc_id, n_toks, g, MIN(pos) AS s, MAX(pos) + 7 AS e,
         |    COUNT(1) AS n_occ
         |  FROM grp GROUP BY doc_id, n_toks, g
         |)
         |SELECT doc_id, n_toks,
         |  CAST(SUM(n_occ) AS bigint) AS n_dup_spans,
         |  CAST(COUNT(1) AS bigint) AS n_dup_regions,
         |  CAST(SUM(e - s + 1) AS bigint) AS dup_tokens,
         |  CAST(SUM(e - s + 1) AS double) / CAST(n_toks AS double) AS dup_frac
         |FROM regions GROUP BY doc_id, n_toks ORDER BY doc_id""".stripMargin,
    "q_simhash" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(string_split($duckNorm, ' ')) AS t
         |  FROM documents WHERE doc_id % 25 = 0
         |),
         |hashed AS (
         |  SELECT doc_id, CAST(('0x' || substr(md5(t), 1, 8)) AS bigint) AS h FROM tok
         |),
         |sums AS (
         |  SELECT doc_id,
         |    $simhashSums
         |  FROM hashed GROUP BY doc_id
         |)
         |SELECT doc_id, CAST($simhashPack AS bigint) AS simhash
         |FROM sums ORDER BY doc_id""".stripMargin,
    // Oracle is the brute-force all-pairs hamming filter — the pigeonhole
    // chunk join must reproduce it exactly (it is a lossless candidate
    // generator for r ≤ maxHamming, unlike MinHash banding).
    "q_simhash_pairs" ->
      s"""WITH $corpusCtes,
         |tok AS (
         |  SELECT doc_id, unnest(string_split($duckNorm, ' ')) AS t FROM corpus
         |),
         |hashed AS (
         |  SELECT doc_id, CAST(('0x' || substr(md5(t), 1, 8)) AS bigint) AS h FROM tok
         |),
         |sums AS (
         |  SELECT doc_id, $simhashSums
         |  FROM hashed GROUP BY doc_id
         |),
         |sh AS (
         |  SELECT doc_id, CAST($simhashPack AS bigint) AS simhash FROM sums
         |)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(bit_count(xor(a.simhash, b.simhash)) AS int) AS hamming
         |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
         |ORDER BY id_a, id_b""".stripMargin,
    // Transitive closure of the (all-pairs) simhash graph via a recursive
    // CTE: comp = min reachable doc_id, exactly what min-label
    // propagation converges to.
    "q_dedup_clusters" ->
      s"""WITH RECURSIVE $corpusCtes,
         |tok AS (
         |  SELECT doc_id, unnest(string_split($duckNorm, ' ')) AS t FROM corpus
         |),
         |hashed AS (
         |  SELECT doc_id, CAST(('0x' || substr(md5(t), 1, 8)) AS bigint) AS h FROM tok
         |),
         |sums AS (
         |  SELECT doc_id, $simhashSums
         |  FROM hashed GROUP BY doc_id
         |),
         |sh AS (
         |  SELECT doc_id, CAST($simhashPack AS bigint) AS simhash FROM sums
         |),
         |p AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
         |),
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM p
         |  UNION SELECT id_b, id_a FROM p
         |),
         |reach(src, lbl) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.src
         |),
         |cc AS (SELECT src AS id, MIN(lbl) AS comp FROM reach GROUP BY src)
         |SELECT comp, COUNT(1) AS n_members,
         |  CAST(SUM(id) AS bigint) AS sum_ids, MAX(id) AS max_id
         |FROM cc GROUP BY comp ORDER BY comp""".stripMargin,
    // Same simhash pair graph + closure, then the keep-longest window
    // (singletons via the corpus left join).
    "q_dedup_keep_longest" ->
      s"""WITH RECURSIVE $corpusCtes,
         |tok AS (
         |  SELECT doc_id, unnest(string_split($duckNorm, ' ')) AS t FROM corpus
         |),
         |hashed AS (
         |  SELECT doc_id, CAST(('0x' || substr(md5(t), 1, 8)) AS bigint) AS h FROM tok
         |),
         |sums AS (
         |  SELECT doc_id, $simhashSums
         |  FROM hashed GROUP BY doc_id
         |),
         |sh AS (
         |  SELECT doc_id, CAST($simhashPack AS bigint) AS simhash FROM sums
         |),
         |p AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
         |),
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM p
         |  UNION SELECT id_b, id_a FROM p
         |),
         |reach(src, lbl) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.src
         |),
         |cc AS (SELECT src AS id, MIN(lbl) AS comp FROM reach GROUP BY src),
         |m AS (
         |  SELECT c.doc_id, CAST(len($duckNorm) AS bigint) AS n_chars,
         |    COALESCE(cc.comp, c.doc_id) AS comp
         |  FROM corpus c LEFT JOIN cc ON cc.id = c.doc_id
         |),
         |k AS (
         |  SELECT doc_id, n_chars, comp,
         |    FIRST_VALUE(doc_id) OVER (PARTITION BY comp
         |      ORDER BY n_chars DESC, doc_id ASC) AS keeper
         |  FROM m
         |)
         |SELECT doc_id, n_chars, comp, keeper, doc_id != keeper AS is_dropped
         |FROM k ORDER BY doc_id""".stripMargin,
    // Brute-force all-pairs token Jaccard — the ground truth the prefix
    // filter must reproduce exactly (recall AND reported similarity).
    "q_similarity_join" ->
      s"""WITH ${corpusCtesMod(25)},
         |tsets AS (SELECT DISTINCT doc_id, unnest(tk) AS tok FROM toks),
         |tsizes AS (SELECT doc_id, COUNT(1) AS n FROM tsets GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(1) AS n_inter
         |  FROM tsets a JOIN tsets b ON a.tok = b.tok AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |),
         |j AS (
         |  SELECT i.id_a, i.id_b, i.n_inter, sa.n AS n_a, sb.n AS n_b,
         |    CAST(i.n_inter AS double) /
         |      CAST(sa.n + sb.n - i.n_inter AS double) AS jaccard
         |  FROM inter i
         |  JOIN tsizes sa ON sa.doc_id = i.id_a
         |  JOIN tsizes sb ON sb.doc_id = i.id_b
         |)
         |SELECT id_a, id_b, n_inter, n_a, n_b, jaccard
         |FROM j WHERE jaccard >= 0.6::double ORDER BY id_a, id_b""".stripMargin,
    "q_similarity_join_incremental" ->
      s"""WITH ${corpusCtesMod(25)},
         |tsets AS (SELECT DISTINCT doc_id, unnest(tk) AS tok FROM toks),
         |tsizes AS (SELECT doc_id, COUNT(1) AS n FROM tsets GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(1) AS n_inter
         |  FROM tsets a JOIN tsets b ON a.tok = b.tok AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |),
         |j AS (
         |  SELECT i.id_a, i.id_b, i.n_inter, sa.n AS n_a, sb.n AS n_b,
         |    CAST(i.n_inter AS double) /
         |      CAST(sa.n + sb.n - i.n_inter AS double) AS jaccard
         |  FROM inter i
         |  JOIN tsizes sa ON sa.doc_id = i.id_a
         |  JOIN tsizes sb ON sb.doc_id = i.id_b
         |)
         |SELECT id_a, id_b, n_inter, n_a, n_b, jaccard
         |FROM j WHERE jaccard >= 0.6::double
         |  AND (id_a >= 100000 OR id_b >= 100000)
         |ORDER BY id_a, id_b""".stripMargin,
    "q_ngram_jaccard" ->
      s"""WITH $corpusCtes,
         |sets AS (SELECT DISTINCT doc_id, sh FROM shingle),
         |sizes AS (SELECT doc_id, COUNT(1) AS n FROM sets GROUP BY doc_id),
         |pairs AS (
         |  SELECT doc_id AS id_a, doc_id + 100000 AS id_b
         |  FROM corpus WHERE doc_id < 100000
         |),
         |inter AS (
         |  SELECT p.id_a, p.id_b, COUNT(1) AS n_inter
         |  FROM pairs p
         |  JOIN sets a ON a.doc_id = p.id_a
         |  JOIN sets b ON b.doc_id = p.id_b AND a.sh = b.sh
         |  GROUP BY p.id_a, p.id_b
         |)
         |SELECT i.id_a, i.id_b, i.n_inter, sa.n AS n_a, sb.n AS n_b,
         |  CAST(i.n_inter AS double) / CAST(sa.n + sb.n - i.n_inter AS double) AS jaccard
         |FROM inter i
         |JOIN sizes sa ON sa.doc_id = i.id_a
         |JOIN sizes sb ON sb.doc_id = i.id_b
         |ORDER BY id_a""".stripMargin)
}
