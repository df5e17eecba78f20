package graft.queries

import graft.Tables
import graft.llm.{Dedup, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LLM-pipeline text operators over `documents` (SURVEY north-star +
  * builder mandate): exact dedup, corpus stats, language-ID, quality
  * scoring, token counting, fingerprinting. All oracle-checked — the
  * DuckDB SQL reproduces every hash/fold bit-for-bit (md5-derived hashes,
  * sequential integer folds).
  */
object TextQueries extends graft.QueryModule {

  /** documents ∪ a shifted copy of itself — gives exact dedup real
    * duplicates to collapse (the raw table is all-unique by construction).
    */
  private def dupCorpus(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = Tables(s, dir, "documents")
    d.unionByName(d.withColumn("doc_id", $"doc_id" + 100000L))
  }

  private val duckNorm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
  private val duckToks = s"string_split($duckNorm, ' ')"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact dedup: content-hash + deterministic representative; per-lang
    // input vs kept counts (2x input collapses back to 1x).
    "q_dedup_exact" -> ((s, dir) => {
      import s.implicits._
      val corpus = dupCorpus(s, dir)
      val kept = Dedup.exact(corpus, "text", "doc_id")
      corpus.groupBy($"lang").agg(count(lit(1)).as("n_input"))
        .join(kept.groupBy($"lang").agg(count(lit(1)).as("n_kept")), Seq("lang"))
        .orderBy($"lang")
    }),

    // Corpus stats: per (lang, 100-char length bucket) doc counts + mean
    // length — the length-histogram shape of a data-quality dashboard.
    "q_text_stats" -> ((s, dir) => {
      import s.implicits._
      Tables(s, dir, "documents")
        .groupBy($"lang", floor($"n_chars" / 100).as("len_bucket"))
        .agg(count(lit(1)).as("n_docs"),
          (sum($"n_chars").cast("double") / count(lit(1))).as("mean_chars"))
        .orderBy($"lang", $"len_bucket")
    }),

    // Language-ID heuristic vs the labeled lang: confusion counts.
    "q_lang_id" -> ((s, dir) => {
      import s.implicits._
      Tables(s, dir, "documents")
        // tokens bound once per row (TextOps perf contract)
        .select($"lang", $"text", TextOps.tokens($"text").as("__toks"))
        .select($"lang", TextOps.langIdOf($"text", $"__toks").as("predicted"))
        .groupBy($"lang", $"predicted")
        .agg(count(lit(1)).as("n"))
        .orderBy($"lang", $"predicted")
    }),

    // Token counting: whitespace tokens + BPE-ish pre-tokenizer count.
    "q_token_count" -> ((s, dir) => {
      import s.implicits._
      Tables(s, dir, "documents")
        .filter($"doc_id" % 25 === 0)
        // normalized text bound once per row (TextOps perf contract)
        .select($"doc_id", TextOps.norm($"text").as("__norm"))
        .select($"doc_id",
          size(split($"__norm", " ")).as("n_ws_tokens"),
          TextOps.bpeCountOfNorm($"__norm").as("n_bpe_tokens"),
          length($"__norm").as("n_norm_chars"))
        .orderBy($"doc_id")
    }),

    // HTML → text extraction (TextOps.htmlToText): each document is
    // wrapped in realistic markup — script WITH an embedded '<', style,
    // comments, attributes, named entities incl. the &amp;lt; double-
    // escape — and the stripped text is hashed. The oracle applies the
    // identical RE2-compatible regex chain, so the hash pins tag
    // removal, script/style CONTENT removal, entity decode order, and
    // whitespace canonicalization byte-for-byte.
    "q_html_strip" -> ((s, dir) => {
      import s.implicits._
      Tables(s, dir, "documents")
        .filter($"doc_id" % 25 === 0)
        .select($"doc_id", concat(
          lit("<html><head><title>T</title><style>p {color: red}</style>" +
            "<script type=\"text/javascript\">var x = 1 < 2;</script></head>" +
            "<body><h1>Heading</h1><p class=\"x\">"),
          $"text",
          lit(" &amp; more &lt;tags&gt;&nbsp;done &amp;lt;literal" +
            "</p><!-- hidden -->tail</body></html>")).as("raw"))
        .select($"doc_id", TextOps.htmlToText($"raw").as("__t"))
        .select($"doc_id",
          size(split($"__t", " ")).as("n_tokens"),
          length($"__t").as("n_chars"),
          md5($"__t").as("h"))
        .orderBy($"doc_id")
    }),

    // Quality-score components + fixed linear composite.
    "q_quality_score" -> ((s, dir) => {
      import s.implicits._
      Tables(s, dir, "documents")
        .filter($"doc_id" % 25 === 0)
        // norm + tokens each bound once per row (TextOps perf contract)
        .select($"doc_id", TextOps.norm($"text").as("__norm"))
        .select($"doc_id", $"__norm", split($"__norm", " ").as("__toks"))
        .select($"doc_id",
          TextOps.punctRatioOfNorm($"__norm").as("punct_ratio"),
          TextOps.stopRatioOfToks($"__toks").as("stop_ratio"),
          TextOps.meanTokenLenOfToks($"__toks").as("mean_tok_len"),
          TextOps.qualityScoreOf($"__norm", $"__toks").as("score"))
        .orderBy($"doc_id")
    }),

    // PII redaction: deterministic synthetic PII (email, IP, phone) is
    // appended to each sampled doc — the corpus itself is clean — then
    // redacted with the fixed-order regex chain; the md5 of the redacted
    // text pins the rewrite EXACTLY against the oracle's identical RE2
    // patterns, and the count columns audit what was found.
    "q_pii_redact" -> ((s, dir) => {
      import s.implicits._
      Tables(s, dir, "documents").filter($"doc_id" % 25 === 0)
        .select($"doc_id",
          TextOps.norm(concat($"text",
            lit(" contact user"), $"doc_id".cast("string"),
            lit("@corp.example.com or 10.0."),
            ($"doc_id" % 256).cast("string"), lit(".7 tel +1 555 010 99"),
            ($"doc_id" % 10).cast("string"))).as("__norm"))
        .select($"doc_id",
          TextOps.patternCount($"__norm", TextOps.EmailPattern).as("n_emails"),
          TextOps.patternCount($"__norm", TextOps.Ipv4Pattern).as("n_ips"),
          md5(TextOps.redactPii($"__norm")).as("redacted_md5"))
        .orderBy($"doc_id")
    }),

    // Repetition signal (Gopher-style): the fraction of all word bigrams
    // taken by the single most frequent one. Shape: one shuffle on
    // (doc_id, bigram) then a per-doc max/sum — partial aggregation
    // collapses repeats map-side, no per-doc maps, no explode×explode.
    "q_repetition_ratio" -> ((s, dir) => {
      import s.implicits._
      val grams = Tables(s, dir, "documents").filter($"doc_id" % 10 === 0)
        .select($"doc_id", TextOps.tokens($"text").as("__toks"))
        .select($"doc_id", explode(TextOps.bigramsOf($"__toks")).as("bg"))
      grams.groupBy($"doc_id", $"bg").agg(count(lit(1)).as("n"))
        .groupBy($"doc_id")
        .agg(sum($"n").cast("bigint").as("n_bigrams"),
          max($"n").cast("bigint").as("top_bigram_n"))
        .withColumn("rep_ratio",
          $"top_bigram_n".cast("double") / $"n_bigrams".cast("double"))
        .orderBy($"doc_id")
    }),

    // Deterministic train/valid/test split: bucket = first-32-md5-bits of
    // the doc id mod 100 → 90/5/5. Content-stable (re-runs and re-shards
    // never move a doc between splits — the property a training pipeline
    // needs), pure projection (no shuffle until the audit agg), and at
    // scale the split column is what you partitionBy so downstream
    // readers prune to their split.
    // CORPUS MIXING to a token budget (llm/Mix — the data-mixture step
    // of a training pipeline): each source gets a budget derived from
    // its name, docs are consumed in md5(doc_id) order, and a doc is
    // selected iff its inclusive running token sum fits. The Spark
    // path is the TWO-PASS distributed prefix sum (local (source,
    // hash-bucket) windows + a sequential window over ≤256 subtotals
    // per source — no reducer ever sees a whole source); the oracle is
    // DuckDB's naive single window, so one hash pins the prefix-sum
    // decomposition AND the deterministic hash-order selection.
    // REQUIRED in-query: at least one budget actually binds. At 100 TB
    // the mixture re-derives identically after corpus growth — already-
    // selected docs never churn.
    "q_corpus_mix" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents")
      val budgets = docs.select($"source").distinct()
        .withColumn("__budget", lit(150L) +
          (regexp_replace($"source", "src", "").cast("long") % 7L) * 40L)
      val sel = graft.llm.Mix.sampleToBudget(docs, budgets,
        "source", "text", "doc_id")
      val out = sel.groupBy($"source")
        .agg(count(lit(1)).as("n_docs"), sum($"__tokens").as("n_tokens"))
      val nAll = docs.count()
      val nSel = sel.count()
      require(nSel > 0 && nSel < nAll,
        s"budgets must bind: selected $nSel of $nAll docs")
      out.orderBy($"source")
    }),

    // BENCHMARK DECONTAMINATION (llm/Decontaminate — the GPT-3/PaLM
    // n-gram collision check): every 20th doc's first 30 tokens stand
    // in for an eval benchmark; corpus docs containing any of its
    // 6-grams (token-boundary exact) are flagged with their DISTINCT
    // hit count. The Spark path is gram-explode → BROADCAST semi-join
    // (the corpus never shuffles — plan-pinned in spec); the oracle
    // finds the same hits by a completely different algorithm
    // (space-padded substring containment over the normalized text),
    // so one hash pins normalization parity, boundary semantics, and
    // distinct counting. At 100 TB: megabytes of benchmark broadcast
    // against the corpus at scan speed.
    "q_decontaminate" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents")
      val bench = docs.filter($"doc_id" % 20 === 0)
        .select($"doc_id",
          array_join(slice(split(TextOps.norm($"text"), " "), 1, 30), " ")
            .as("text"))
      graft.llm.Decontaminate.flag(docs, bench, "text", "doc_id", 6)
        .orderBy($"doc_id")
    }),

    // INCREMENTAL DECONTAMINATION (llm/IncrementalDecontaminate — the
    // persisted-index family's 10th member): the benchmark set accretes
    // in TWO batches (doc_id%40==0, then %40==20 — together exactly
    // q_decontaminate's %20==0 set), each folding its grams into the
    // stored index; the flag probes the STORE without re-shingling old
    // benches. The oracle is IDENTICAL to q_decontaminate's — the
    // incremental protocol must land the exact same per-doc hit
    // counts. REQUIRED in-query: replaying batch 1 is a state no-op.
    "q_decontaminate_incremental" -> ((s, dir) => {
      import s.implicits._
      val st = sys.props("java.io.tmpdir") +
        s"/graft_deconinc_${ProcessHandle.current().pid()}/grams"
      graft.ops.FileOps.resetWorkDirs(s,
        Seq(st.stripSuffix("/grams")))
      val docs = Tables(s, dir, "documents")
      def benchSlice(resid: Long) = docs.filter($"doc_id" % 40 === resid)
        .select($"doc_id",
          array_join(slice(split(TextOps.norm($"text"), " "), 1, 30), " ")
            .as("text"))
      graft.llm.IncrementalDecontaminate.addBench(
        s, benchSlice(0L), "text", 6, st)
      val afterB = graft.llm.IncrementalDecontaminate.addBench(
        s, benchSlice(20L), "text", 6, st)
      val replayed = graft.llm.IncrementalDecontaminate.addBench(
        s, benchSlice(0L), "text", 6, st)
      require(replayed == afterB,
        s"replaying a bench batch must be a state no-op: $replayed vs $afterB")
      graft.llm.IncrementalDecontaminate
        .flag(s, docs, "text", "doc_id", 6, st)
        .orderBy($"doc_id")
    }),

    // FUZZY DECONTAMINATION (Decontaminate.flagFuzzy — near-verbatim
    // paraphrase contamination the exact gram check misses): the bench
    // set is PLANTED PARAPHRASES — each %20==0 doc's first 30 tokens
    // with every 7th token DROPPED, so no 4-gram spanning a drop
    // boundary survives but runs between drops match; containment of
    // the item's grams in its source doc lands ~0.5, caught at tau=2/5
    // while unrelated docs stay near zero. The threshold compares in
    // INTEGER arithmetic (n_hits*5 >= n_grams*2) so both engines agree
    // bit-for-bit. The oracle rebuilds the same dropped-token bench in
    // SQL and checks gram containment via padded-substring matching —
    // a completely different algorithm. At 100 TB: the bench gram
    // relation broadcasts; the corpus is a map-side explode+probe and
    // never shuffles.
    "q_decontaminate_fuzzy" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents")
      val bench = docs.filter($"doc_id" % 20 === 0)
        .select($"doc_id".as("bench_id"),
          array_join(filter(
            slice(split(TextOps.norm($"text"), " "), 1, 30),
            (_, i) => (i + lit(1)) % 7 =!= 0), " ").as("text"))
      graft.llm.Decontaminate.flagFuzzy(docs, bench, "text",
        "doc_id", "bench_id", n = 4, tauNum = 2, tauDen = 5)
        .orderBy($"doc_id", $"bench_id")
    }),

    "q_hash_split" -> ((s, dir) => {
      import s.implicits._
      val bucket = pmod(TextOps.hash32($"doc_id".cast("string")), lit(100L))
      Tables(s, dir, "documents")
        .select($"doc_id",
          when(bucket < 90, "train").when(bucket < 95, "valid")
            .otherwise("test").as("split"))
        .groupBy($"split")
        .agg(count(lit(1)).as("n_docs"),
          min($"doc_id").as("min_id"), max($"doc_id").as("max_id"),
          sum($"doc_id").cast("bigint").as("sum_ids"))
        .orderBy($"split")
    }),

    // Benchmark-contamination screen: docs sharing ANY 3-gram shingle
    // with the benchmark set (stand-in: doc_id % 50 == 0) are flagged.
    // Shape: benchmark shingles are DISTINCT + broadcast (eval sets are
    // tiny next to a training corpus), so the corpus side is a map-side
    // semi-join — no corpus shuffle, no hot-shingle key.
    "q_contamination" -> ((s, dir) => {
      import s.implicits._
      val sh = Tables(s, dir, "documents")
        .select($"doc_id", TextOps.tokens($"text").as("__toks"))
        .select($"doc_id",
          explode(array_distinct(TextOps.shingles3($"__toks"))).as("sh"))
      val benchSh = sh.filter($"doc_id" % 50 === 0).select($"sh").distinct()
      val contaminated = sh.filter($"doc_id" % 50 =!= 0)
        .join(broadcast(benchSh), Seq("sh"), "left_semi")
        .select($"doc_id").distinct()
        .withColumn("hit", lit(1L))
      Tables(s, dir, "documents").filter($"doc_id" % 50 =!= 0)
        .join(contaminated, Seq("doc_id"), "left")
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(coalesce($"hit", lit(0L))).cast("bigint").as("n_contaminated"))
        .orderBy($"lang")
    }),

    // Domain-blocklist filter: deterministic synthetic URLs are appended
    // to each doc (the corpus itself has none), extracted, reduced to
    // registered domains, and matched against a broadcast blocklist —
    // the corpus side stays a map-side semi-join (no corpus shuffle; the
    // per-lang audit agg is the only exchange on the big side).
    "q_url_filter" -> ((s, dir) => {
      import s.implicits._
      val block = Seq("src3-mirror.org", "src7-mirror.org", "img2-cdn.net")
        .toDF("domain")
      val docs = Tables(s, dir, "documents")
        .select($"doc_id", $"lang",
          TextOps.norm(concat($"text",
            lit(" see https://files.src"), ($"doc_id" % 20).cast("string"),
            lit("-mirror.org/d/"), $"doc_id".cast("string"),
            lit(" and http://img"), ($"doc_id" % 7).cast("string"),
            lit("-cdn.net/t.png"))).as("__norm"))
      val doms = docs
        .select($"doc_id", $"lang", explode(TextOps.urlsOf($"__norm")).as("url"))
        .select($"doc_id", $"lang",
          TextOps.registeredDomainOf(TextOps.hostOf($"url")).as("domain"))
      val flagged = doms.join(broadcast(block), Seq("domain"), "left_semi")
        .select($"doc_id").distinct().withColumn("hit", lit(1L))
      doms.groupBy($"doc_id", $"lang").agg(count(lit(1)).as("nu"))
        .join(flagged, Seq("doc_id"), "left")
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(coalesce($"hit", lit(0L))).cast("bigint").as("n_flagged"),
          sum($"nu").cast("bigint").as("n_urls"))
        .orderBy($"lang")
    }),

    // Count-min-sketch heavy hitters: the fixed-memory (3×1024 counters)
    // frequency summary vs the exact top-10 tokens. Both the exact counts
    // (the anchor) AND the sketch estimates are in the output — the
    // estimates are md5-derived so DuckDB rebuilds the identical sketch;
    // one drifted counter anywhere flips the row red.
    "q_cms_topk" -> ((s, dir) => {
      import s.implicits._
      val toks = Tables(s, dir, "documents")
        .select(TextOps.norm($"text").as("__norm"))
        .select(explode(split($"__norm", " ")).as("tok"))
      val exact = toks.groupBy($"tok").agg(count(lit(1)).as("n"))
      val top = exact.orderBy($"n".desc, $"tok").limit(10)
      val sketch = graft.llm.Sketch.countMin(toks, "tok", depth = 3, width = 1024)
      top.join(graft.llm.Sketch.estimate(sketch, top.select($"tok"), "tok", 3, 1024),
          Seq("tok"))
        .select($"tok", $"n", $"cms_est".cast("bigint").as("cms_est"))
        .orderBy($"n".desc, $"tok")
    }),

    // Stratified deterministic sampling: rebalance the training mix by
    // downsampling dominant languages (en to 50%, zh to 80%) with a
    // salted hash-bucket rule — content-stable membership, zero shuffle
    // (pure map-side filter; the audit agg below is the only exchange).
    "q_stratified_sample" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents")
      val kept = graft.llm.Sample.stratified(docs, "doc_id", "lang",
        Map("en" -> 500L, "zh" -> 800L), "strat")
      docs.groupBy($"lang").agg(count(lit(1)).as("n_total"))
        .join(kept.groupBy($"lang").agg(count(lit(1)).as("n_kept"),
          min($"doc_id").as("min_kept"), max($"doc_id").as("max_kept"),
          sum($"doc_id").cast("bigint").as("sum_kept")), Seq("lang"))
        .orderBy($"lang")
    }),

    // Temperature mixture resampling (alpha=0.5, Sample
    // .temperatureSample): the multilingual-balance recipe — en (the
    // dominant class) squashed toward sqrt-share, the smallest class
    // kept whole (rate exactly 1000‰ by construction). Rates derive
    // from counts through correctly-rounded IEEE ops only, so the
    // per-mille floors and the md5-bucket kept set are oracle-exact.
    "q_temperature_sample" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents")
      val kept = graft.llm.Sample.temperatureSample(docs, "doc_id", "lang", "temp")
      docs.groupBy($"lang").agg(count(lit(1)).as("n_total"))
        .join(kept.groupBy($"lang").agg(count(lit(1)).as("n_kept"),
          max($"rate_pm").as("rate_pm"),
          sum($"doc_id").cast("bigint").as("sum_kept")), Seq("lang"))
        .orderBy($"lang")
    }),

    // Weight-proportional deterministic sampling (A-Res, Sample
    // .weightedSample): top-5 docs per lang by the fixed-point priority
    // ln(u)/w with w = token count — longer docs proportionally likelier,
    // same sample on every rerun (u is md5-derived). The oracle rebuilds
    // the identical quantized priorities and window, so selection AND
    // rank order hash-compare exactly.
    "q_weighted_sample" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents").filter($"text".isNotNull)
        .withColumn("w_toks", size(TextOps.tokens($"text")).cast("long"))
      graft.llm.Sample.weightedSample(docs, "doc_id", "w_toks", Seq("lang"), 5)
        .select($"lang", $"rk", $"doc_id", $"w_toks")
        .orderBy($"lang", $"rk")
    }),

    // Sequence packing (GPT-style concat-and-chunk): exact global token
    // offsets in doc_id order via Pack's DISTRIBUTED two-pass prefix sum
    // (no single-partition window over the data), then 1024-token chunk
    // stats. Invariant: every chunk except the last packs exactly 1024
    // tokens. The oracle reproduces the offsets with a plain global
    // window — same algebra, single-node shape.
    "q_token_pack" -> ((s, dir) => {
      import s.implicits._
      val toks = graft.Tables(s, dir, "documents")
        .select($"doc_id", TextOps.norm($"text").as("__norm"))
        .select($"doc_id", graft.llm.Pack.tokenCountOfNorm($"__norm").as("n_tok"))
      val spans = graft.llm.Pack.packOffsets(toks, "doc_id", "n_tok", bucketWidth = 64L)
      graft.llm.Pack.chunkStats(spans, budget = 1024L).orderBy($"chunk")
    }),

    // Fingerprints: rolling token-hash fold + min/max shingle hashes.
    "q_fingerprint" -> ((s, dir) => {
      import s.implicits._
      Tables(s, dir, "documents")
        .filter($"doc_id" % 25 === 0)
        // tokens and shingles each bound once per row (TextOps perf contract)
        .select($"doc_id", TextOps.tokens($"text").as("__toks"))
        .select($"doc_id", $"__toks", TextOps.shingles3($"__toks").as("__shs"))
        .select($"doc_id",
          TextOps.rollingFingerprint($"__toks").as("rolling_fp"),
          array_min(transform($"__shs", sh => md5(sh))).as("min_shingle"),
          array_max(transform($"__shs", sh => md5(sh))).as("max_shingle"))
        .orderBy($"doc_id")
    }),

    // DSIR importance-weighted selection (VERDICT r15 missing #3 — Xie
    // et al. NeurIPS'23): keep the docs whose hashed-bigram distribution
    // most resembles a TARGET corpus (here: the labeled-'en' slice),
    // scored against the whole corpus as the raw model. Per-bucket
    // log-likelihood ratios are FIXED-POINT (round(ln·1e6) BIGINT, the
    // Retrieval trick — ln quantized ≤1024 places, never per row), doc
    // weights are integer sums, top-budget breaks ties on the samplers'
    // md5(id) key — hash-exact against DuckDB recomputing the identical
    // features and integer weights. 100 TB shape: two vocab-bounded
    // count aggs; the λ table broadcasts as a map literal so scoring is
    // a ZERO-SHUFFLE map over the corpus; selection plans as
    // TakeOrderedAndProject (per-partition top-k), never a global sort.
    "q_dsir_select" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents")
      val b = 1024
      val lambdas = graft.llm.Dsir.logRatios(
        docs.filter($"lang" === "en"), docs, "text", b)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      graft.llm.Dsir.select(docs, lambdas, "text", "doc_id", b, budget = 200)
        .orderBy($"doc_id")
    }),

    // DSIR importance RESAMPLING — the R in the recipe: draw k docs
    // WITHOUT replacement with probability ∝ exp(importance weight) via
    // the Gumbel-top-k identity, the perturbation derived from the
    // samplers' deterministic md5 uniform (content-stable, no RNG
    // state). Both terms are MICRO fixed point (weight_micro +
    // round(−ln(−ln(u))·1e6) as BIGINT), so the drawn set is hash-exact
    // against DuckDB replaying the identical integer keys. Same
    // zero-shuffle scoring + TakeOrdered shape as q_dsir_select.
    "q_dsir_resample" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents")
      val b = 1024
      val lambdas = graft.llm.Dsir.logRatios(
        docs.filter($"lang" === "en"), docs, "text", b)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      graft.llm.Dsir.resample(docs, lambdas, "text", "doc_id", b,
          k = 150, salt = "s16")
        .orderBy($"doc_id")
    }))

  private val stopAll = TextOps.StopWords.values.flatten.toSeq
    .map(w => s"'$w'").mkString(", ")
  private def stopList(l: String) = TextOps.StopWords(l).map(w => s"'$w'").mkString(", ")

  def oracle: Map[String, String] = Map(
    "q_dedup_exact" ->
      s"""WITH corpus AS (
         |  SELECT * FROM documents
         |  UNION ALL
         |  SELECT doc_id + 100000, text, lang, source, n_chars FROM documents
         |),
         |kept AS (
         |  SELECT lang FROM (
         |    SELECT c.lang, ROW_NUMBER() OVER (
         |      PARTITION BY md5($duckNorm) ORDER BY doc_id ASC) AS rn
         |    FROM corpus c) WHERE rn = 1
         |)
         |SELECT i.lang, i.n_input, k.n_kept
         |FROM (SELECT lang, COUNT(1) AS n_input FROM corpus GROUP BY lang) i
         |JOIN (SELECT lang, COUNT(1) AS n_kept FROM kept GROUP BY lang) k USING (lang)
         |ORDER BY lang""".stripMargin,
    "q_text_stats" ->
      """SELECT lang, CAST(FLOOR(n_chars / 100) AS bigint) AS len_bucket,
        |  COUNT(1) AS n_docs,
        |  CAST(SUM(n_chars) AS double) / COUNT(1) AS mean_chars
        |FROM documents GROUP BY lang, FLOOR(n_chars / 100)
        |ORDER BY lang, len_bucket""".stripMargin,
    "q_lang_id" ->
      s"""WITH scored AS (
         |  SELECT lang,
         |    CAST(len(list_filter($duckToks, t -> t IN (${stopList("en")}))) AS int) AS h_en,
         |    CAST(len(list_filter($duckToks, t -> t IN (${stopList("es")}))) AS int) AS h_es,
         |    CAST(len(list_filter($duckToks, t -> t IN (${stopList("de")}))) AS int) AS h_de,
         |    CAST(len(list_filter($duckToks, t -> t IN (${stopList("fr")}))) AS int) AS h_fr,
         |    regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') AS cjk
         |  FROM documents
         |)
         |SELECT lang,
         |  CASE WHEN cjk THEN 'zh'
         |       WHEN greatest(h_en, h_es, h_de, h_fr) = 0 THEN 'und'
         |       WHEN h_en = greatest(h_en, h_es, h_de, h_fr) THEN 'en'
         |       WHEN h_es = greatest(h_en, h_es, h_de, h_fr) THEN 'es'
         |       WHEN h_de = greatest(h_en, h_es, h_de, h_fr) THEN 'de'
         |       ELSE 'fr' END AS predicted,
         |  COUNT(1) AS n
         |FROM scored GROUP BY 1, 2 ORDER BY lang, predicted""".stripMargin,
    "q_token_count" ->
      s"""SELECT doc_id,
         |  CAST(len($duckToks) AS int) AS n_ws_tokens,
         |  CAST(len(regexp_extract_all($duckNorm, ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+')) AS int) AS n_bpe_tokens,
         |  CAST(length($duckNorm) AS int) AS n_norm_chars
         |FROM documents WHERE doc_id % 25 = 0 ORDER BY doc_id""".stripMargin,
    "q_html_strip" ->
      s"""WITH raw AS (
         |  SELECT doc_id,
         |    '<html><head><title>T</title><style>p {color: red}</style>' ||
         |    '<script type="text/javascript">var x = 1 < 2;</script></head>' ||
         |    '<body><h1>Heading</h1><p class="x">' || text ||
         |    ' &amp; more &lt;tags&gt;&nbsp;done &amp;lt;literal' ||
         |    '</p><!-- hidden -->tail</body></html>' AS r
         |  FROM documents WHERE doc_id % 25 = 0
         |),
         |s1 AS (SELECT doc_id,
         |  regexp_replace(r, '(?is)<script\\b[^>]*>.*?</script>', ' ', 'g') AS r FROM raw),
         |s2 AS (SELECT doc_id,
         |  regexp_replace(r, '(?is)<style\\b[^>]*>.*?</style>', ' ', 'g') AS r FROM s1),
         |s3 AS (SELECT doc_id, regexp_replace(r, '(?s)<!--.*?-->', ' ', 'g') AS r FROM s2),
         |s4 AS (SELECT doc_id, regexp_replace(r, '(?s)<[^>]+>', ' ', 'g') AS r FROM s3),
         |e1 AS (SELECT doc_id, regexp_replace(r, '&lt;', '<', 'g') AS r FROM s4),
         |e2 AS (SELECT doc_id, regexp_replace(r, '&gt;', '>', 'g') AS r FROM e1),
         |e3 AS (SELECT doc_id, regexp_replace(r, '&quot;', '"', 'g') AS r FROM e2),
         |e4 AS (SELECT doc_id, regexp_replace(r, '&#39;', chr(39), 'g') AS r FROM e3),
         |e5 AS (SELECT doc_id, regexp_replace(r, '&apos;', chr(39), 'g') AS r FROM e4),
         |e6 AS (SELECT doc_id, regexp_replace(r, '&nbsp;', ' ', 'g') AS r FROM e5),
         |e7 AS (SELECT doc_id, regexp_replace(r, '&amp;', '&', 'g') AS r FROM e6),
         |n AS (SELECT doc_id,
         |  trim(regexp_replace(lower(r), '\\s+', ' ', 'g')) AS t FROM e7)
         |SELECT doc_id, CAST(len(string_split(t, ' ')) AS int) AS n_tokens,
         |  CAST(length(t) AS int) AS n_chars, md5(t) AS h
         |FROM n ORDER BY doc_id""".stripMargin,
    "q_quality_score" ->
      s"""WITH c AS (
         |  SELECT doc_id,
         |    CAST(length(regexp_replace($duckNorm, '[a-z0-9 ]', '', 'g')) AS double)
         |      / CAST(greatest(length($duckNorm), 1) AS double) AS punct_ratio,
         |    CAST(len(list_filter($duckToks, t -> t IN ($stopAll))) AS double)
         |      / CAST(greatest(len($duckToks), 1) AS double) AS stop_ratio,
         |    CAST(list_sum(list_transform($duckToks, t -> length(t))) AS double)
         |      / CAST(greatest(len($duckToks), 1) AS double) AS mean_tok_len
         |  FROM documents WHERE doc_id % 25 = 0
         |)
         |SELECT doc_id, punct_ratio, stop_ratio, mean_tok_len,
         |  0.5::double * stop_ratio - 0.3::double * punct_ratio
         |    + 0.2::double * least(mean_tok_len / 10.0::double, 1.0::double) AS score
         |FROM c ORDER BY doc_id""".stripMargin,
    "q_corpus_mix" ->
      s"""WITH toks AS (
         |  SELECT source, doc_id,
         |    CAST(len(string_split($duckNorm, ' ')) AS bigint) AS nt,
         |    md5(CAST(doc_id AS varchar)) AS h
         |  FROM documents
         |),
         |b AS (
         |  SELECT DISTINCT source,
         |    150 + (CAST(replace(source, 'src', '') AS bigint) % 7) * 40
         |      AS budget
         |  FROM documents
         |),
         |c AS (
         |  SELECT source, nt,
         |    SUM(nt) OVER (PARTITION BY source ORDER BY h) AS cum
         |  FROM toks
         |)
         |SELECT c.source, CAST(COUNT(1) AS bigint) AS n_docs,
         |  CAST(SUM(nt) AS bigint) AS n_tokens
         |FROM c JOIN b ON c.source = b.source
         |WHERE cum <= budget
         |GROUP BY c.source ORDER BY c.source""".stripMargin,
    "q_decontaminate_incremental" ->
      s"""WITH norm AS (
         |  SELECT doc_id, $duckNorm AS t FROM documents
         |),
         |bench AS (
         |  SELECT array_to_string(list_slice(string_split(t, ' '), 1, 30), ' ')
         |    AS bt
         |  FROM norm WHERE doc_id % 20 = 0
         |),
         |btoks AS (SELECT string_split(bt, ' ') AS toks FROM bench),
         |grams AS (
         |  SELECT DISTINCT array_to_string(list_slice(toks, i, i + 5), ' ') AS g
         |  FROM btoks, UNNEST(generate_series(1, len(toks) - 5)) AS u(i)
         |  WHERE len(toks) >= 6
         |)
         |SELECT n.doc_id, CAST(COUNT(DISTINCT g.g) AS bigint) AS n_hits
         |FROM norm n JOIN grams g
         |  ON strpos(' ' || n.t || ' ', ' ' || g.g || ' ') > 0
         |GROUP BY n.doc_id ORDER BY n.doc_id""".stripMargin,
    "q_decontaminate" ->
      s"""WITH norm AS (
         |  SELECT doc_id, $duckNorm AS t FROM documents
         |),
         |bench AS (
         |  SELECT array_to_string(list_slice(string_split(t, ' '), 1, 30), ' ')
         |    AS bt
         |  FROM norm WHERE doc_id % 20 = 0
         |),
         |btoks AS (SELECT string_split(bt, ' ') AS toks FROM bench),
         |grams AS (
         |  SELECT DISTINCT array_to_string(list_slice(toks, i, i + 5), ' ') AS g
         |  FROM btoks, UNNEST(generate_series(1, len(toks) - 5)) AS u(i)
         |  WHERE len(toks) >= 6
         |)
         |SELECT n.doc_id, CAST(COUNT(DISTINCT g.g) AS bigint) AS n_hits
         |FROM norm n JOIN grams g
         |  ON strpos(' ' || n.t || ' ', ' ' || g.g || ' ') > 0
         |GROUP BY n.doc_id ORDER BY n.doc_id""".stripMargin,
    "q_decontaminate_fuzzy" ->
      s"""WITH norm AS (
         |  SELECT doc_id, $duckNorm AS t FROM documents
         |),
         |src AS (
         |  SELECT doc_id, list_slice(string_split(t, ' '), 1, 30) AS toks
         |  FROM norm WHERE doc_id % 20 = 0
         |),
         |kept AS (
         |  SELECT doc_id, i, toks[i] AS tok
         |  FROM src, UNNEST(generate_series(1, len(toks))) AS u(i)
         |  WHERE i % 7 <> 0
         |),
         |bt AS (
         |  SELECT doc_id AS bench_id, list(tok ORDER BY i) AS toks
         |  FROM kept GROUP BY doc_id
         |),
         |grams AS (
         |  SELECT DISTINCT bench_id,
         |    array_to_string(list_slice(toks, i, i + 3), ' ') AS g
         |  FROM bt, UNNEST(generate_series(1, len(toks) - 3)) AS u(i)
         |  WHERE len(toks) >= 4
         |),
         |gcount AS (SELECT bench_id, COUNT(1) AS n_b FROM grams GROUP BY bench_id),
         |hits AS (
         |  SELECT nm.doc_id, g.bench_id, COUNT(DISTINCT g.g) AS n_hits
         |  FROM norm nm JOIN grams g
         |    ON strpos(' ' || nm.t || ' ', ' ' || g.g || ' ') > 0
         |  GROUP BY 1, 2
         |)
         |SELECT h.doc_id, h.bench_id, CAST(h.n_hits AS bigint) AS n_hits,
         |  CAST(c.n_b AS bigint) AS n_bench_grams
         |FROM hits h JOIN gcount c USING (bench_id)
         |WHERE h.n_hits * 5 >= c.n_b * 2
         |ORDER BY doc_id, bench_id""".stripMargin,
    "q_dsir_select" ->
      s"""WITH toks AS (
         |  SELECT doc_id, lang, $duckToks AS tk FROM documents
         |),
         |grams AS (
         |  SELECT doc_id, lang, tk[i] || ' ' || tk[i+1] AS g
         |  FROM toks, UNNEST(generate_series(1, len(tk) - 1)) AS u(i)
         |  WHERE len(tk) >= 2
         |),
         |bk AS (
         |  SELECT doc_id, lang,
         |    CAST(('0x' || substr(md5(g), 1, 8)) AS bigint) % 1024 AS bucket
         |  FROM grams
         |),
         |tot AS (SELECT
         |  (SELECT COUNT(1) FROM bk WHERE lang = 'en') AS tt,
         |  (SELECT COUNT(1) FROM bk) AS tr),
         |tc AS (SELECT bucket, COUNT(1) AS ct FROM bk WHERE lang = 'en' GROUP BY 1),
         |rc AS (SELECT bucket, COUNT(1) AS cr FROM bk GROUP BY 1),
         |lam AS (
         |  SELECT r.range AS bucket,
         |    CAST(round(ln(
         |      (COALESCE(ct, 0) + 1)::double * (tot.tr + 1024)::double /
         |      ((COALESCE(cr, 0) + 1)::double * (tot.tt + 1024)::double)
         |    ) * 1000000) AS bigint) AS lambda
         |  FROM range(0, 1024) r
         |  LEFT JOIN tc ON tc.bucket = r.range
         |  LEFT JOIN rc ON rc.bucket = r.range
         |  CROSS JOIN tot
         |),
         |w AS (
         |  SELECT b.doc_id, CAST(SUM(l.lambda) AS bigint) AS dsir_weight
         |  FROM bk b JOIN lam l USING (bucket) GROUP BY 1
         |),
         |allw AS (
         |  SELECT d.doc_id, COALESCE(w.dsir_weight, 0) AS dsir_weight
         |  FROM documents d LEFT JOIN w USING (doc_id)
         |),
         |sel AS (
         |  SELECT doc_id, dsir_weight FROM allw
         |  ORDER BY dsir_weight DESC,
         |    CAST(('0x' || substr(md5(CAST(doc_id AS varchar)), 1, 8)) AS bigint) ASC,
         |    doc_id ASC
         |  LIMIT 200
         |)
         |SELECT doc_id, dsir_weight FROM sel ORDER BY doc_id""".stripMargin,
    "q_dsir_resample" ->
      s"""WITH toks AS (
         |  SELECT doc_id, lang, $duckToks AS tk FROM documents
         |),
         |grams AS (
         |  SELECT doc_id, lang, tk[i] || ' ' || tk[i+1] AS g
         |  FROM toks, UNNEST(generate_series(1, len(tk) - 1)) AS u(i)
         |  WHERE len(tk) >= 2
         |),
         |bk AS (
         |  SELECT doc_id, lang,
         |    CAST(('0x' || substr(md5(g), 1, 8)) AS bigint) % 1024 AS bucket
         |  FROM grams
         |),
         |tot AS (SELECT
         |  (SELECT COUNT(1) FROM bk WHERE lang = 'en') AS tt,
         |  (SELECT COUNT(1) FROM bk) AS tr),
         |tc AS (SELECT bucket, COUNT(1) AS ct FROM bk WHERE lang = 'en' GROUP BY 1),
         |rc AS (SELECT bucket, COUNT(1) AS cr FROM bk GROUP BY 1),
         |lam AS (
         |  SELECT r.range AS bucket,
         |    CAST(round(ln(
         |      (COALESCE(ct, 0) + 1)::double * (tot.tr + 1024)::double /
         |      ((COALESCE(cr, 0) + 1)::double * (tot.tt + 1024)::double)
         |    ) * 1000000) AS bigint) AS lambda
         |  FROM range(0, 1024) r
         |  LEFT JOIN tc ON tc.bucket = r.range
         |  LEFT JOIN rc ON rc.bucket = r.range
         |  CROSS JOIN tot
         |),
         |w AS (
         |  SELECT b.doc_id, CAST(SUM(l.lambda) AS bigint) AS dsir_weight
         |  FROM bk b JOIN lam l USING (bucket) GROUP BY 1
         |),
         |keyed AS (
         |  SELECT d.doc_id, COALESCE(w.dsir_weight, 0) AS dsir_weight,
         |    COALESCE(w.dsir_weight, 0) + CAST(round(-ln(-ln(
         |      (CAST(('0x' || substr(md5('s16:' || CAST(d.doc_id AS varchar)), 1, 8)) AS bigint) + 0.5)
         |        / 4294967296.0
         |    )) * 1000000) AS bigint) AS gumbel_key
         |  FROM documents d LEFT JOIN w USING (doc_id)
         |),
         |sel AS (
         |  SELECT doc_id, dsir_weight, gumbel_key FROM keyed
         |  ORDER BY gumbel_key DESC, doc_id ASC
         |  LIMIT 150
         |)
         |SELECT doc_id, dsir_weight, gumbel_key FROM sel ORDER BY doc_id""".stripMargin,
    "q_hash_split" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS varchar)), 1, 8)) AS bigint) % 100 AS bucket
        |  FROM documents
        |)
        |SELECT CASE WHEN bucket < 90 THEN 'train'
        |            WHEN bucket < 95 THEN 'valid' ELSE 'test' END AS split,
        |  COUNT(1) AS n_docs, MIN(doc_id) AS min_id, MAX(doc_id) AS max_id,
        |  CAST(SUM(doc_id) AS bigint) AS sum_ids
        |FROM b GROUP BY 1 ORDER BY split""".stripMargin,
    "q_contamination" ->
      s"""WITH sh AS (
         |  SELECT doc_id,
         |    unnest(list_distinct(list_transform(range(1, greatest(len(tk) - 1, 1)),
         |      i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS sh
         |  FROM (SELECT doc_id, $duckToks AS tk FROM documents)
         |),
         |bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 50 = 0),
         |hits AS (
         |  SELECT DISTINCT s.doc_id FROM sh s JOIN bench b USING (sh)
         |  WHERE s.doc_id % 50 != 0
         |)
         |SELECT d.lang, COUNT(1) AS n_docs,
         |  CAST(SUM(CASE WHEN h.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS bigint) AS n_contaminated
         |FROM documents d LEFT JOIN hits h USING (doc_id)
         |WHERE d.doc_id % 50 != 0
         |GROUP BY d.lang ORDER BY lang""".stripMargin,
    "q_pii_redact" ->
      s"""WITH p AS (
         |  SELECT doc_id, trim(regexp_replace(lower(
         |    text || ' contact user' || doc_id || '@corp.example.com or 10.0.'
         |      || (doc_id % 256) || '.7 tel +1 555 010 99' || (doc_id % 10)),
         |    '\\s+', ' ', 'g')) AS nrm
         |  FROM documents WHERE doc_id % 25 = 0
         |)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(nrm, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}')) AS bigint) AS n_emails,
         |  CAST(len(regexp_extract_all(nrm, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS bigint) AS n_ips,
         |  md5(regexp_replace(regexp_replace(regexp_replace(nrm,
         |    '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}', '<EMAIL>', 'g'),
         |    '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g'),
         |    '\\+?\\d[\\d .-]{7,}\\d', '<PHONE>', 'g')) AS redacted_md5
         |FROM p ORDER BY doc_id""".stripMargin,
    "q_repetition_ratio" ->
      s"""WITH toks AS (
         |  SELECT doc_id, $duckToks AS tk FROM documents WHERE doc_id % 10 = 0
         |),
         |bg AS (
         |  SELECT doc_id,
         |    unnest(list_transform(range(1, greatest(len(tk), 1)),
         |      i -> tk[i] || ' ' || tk[i+1])) AS bg
         |  FROM toks
         |),
         |cnt AS (SELECT doc_id, bg, COUNT(1) AS n FROM bg GROUP BY 1, 2)
         |SELECT doc_id, CAST(SUM(n) AS bigint) AS n_bigrams,
         |  CAST(MAX(n) AS bigint) AS top_bigram_n,
         |  CAST(MAX(n) AS double) / CAST(SUM(n) AS double) AS rep_ratio
         |FROM cnt GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_url_filter" ->
      """WITH p AS (
        |  SELECT doc_id, lang, trim(regexp_replace(lower(
        |    text || ' see https://files.src' || (doc_id % 20) || '-mirror.org/d/' || doc_id
        |         || ' and http://img' || (doc_id % 7) || '-cdn.net/t.png'),
        |    '\s+', ' ', 'g')) AS nrm
        |  FROM documents
        |),
        |u AS (
        |  SELECT doc_id, lang,
        |    unnest(regexp_extract_all(nrm, 'https?://[a-z0-9.-]+[a-z0-9/._-]*')) AS url
        |  FROM p
        |),
        |d AS (
        |  SELECT doc_id, lang,
        |    string_split(regexp_extract(url, 'https?://([a-z0-9.-]+)', 1), '.') AS hp
        |  FROM u
        |),
        |dom AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN len(hp) >= 2 THEN hp[len(hp)-1] || '.' || hp[len(hp)]
        |         ELSE array_to_string(hp, '.') END AS domain
        |  FROM d
        |),
        |flagged AS (
        |  SELECT DISTINCT doc_id FROM dom
        |  WHERE domain IN ('src3-mirror.org', 'src7-mirror.org', 'img2-cdn.net')
        |),
        |urls_per AS (SELECT doc_id, lang, COUNT(1) AS nu FROM dom GROUP BY 1, 2)
        |SELECT u.lang, COUNT(1) AS n_docs,
        |  CAST(SUM(CASE WHEN f.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS bigint) AS n_flagged,
        |  CAST(SUM(nu) AS bigint) AS n_urls
        |FROM urls_per u LEFT JOIN flagged f USING (doc_id)
        |GROUP BY u.lang ORDER BY u.lang""".stripMargin,
    "q_cms_topk" ->
      s"""WITH toks AS (
         |  SELECT unnest($duckToks) AS tok FROM documents
         |),
         |cnt AS (SELECT tok, COUNT(1) AS n FROM toks GROUP BY tok),
         |topk AS (SELECT tok, n FROM cnt ORDER BY n DESC, tok LIMIT 10),
         |rows3 AS (SELECT unnest([0, 1, 2]) AS i),
         |sketch AS (
         |  SELECT i,
         |    CAST(('0x' || substr(md5('cms' || i || ':' || tok), 1, 8)) AS bigint) % 1024 AS bucket,
         |    COUNT(1) AS c
         |  FROM toks, rows3 GROUP BY 1, 2
         |),
         |qb AS (
         |  SELECT tok, i,
         |    CAST(('0x' || substr(md5('cms' || i || ':' || tok), 1, 8)) AS bigint) % 1024 AS bucket
         |  FROM topk, rows3
         |),
         |est AS (
         |  SELECT qb.tok, MIN(s.c) AS cms_est
         |  FROM qb JOIN sketch s ON qb.i = s.i AND qb.bucket = s.bucket
         |  GROUP BY qb.tok
         |)
         |SELECT t.tok, CAST(t.n AS bigint) AS n, CAST(e.cms_est AS bigint) AS cms_est
         |FROM topk t JOIN est e USING (tok) ORDER BY t.n DESC, t.tok""".stripMargin,
    "q_stratified_sample" ->
      """WITH k AS (
        |  SELECT * FROM documents
        |  WHERE CAST(('0x' || substr(md5('strat:' || doc_id), 1, 8)) AS bigint) % 1000
        |    < CASE lang WHEN 'en' THEN 500 WHEN 'zh' THEN 800 ELSE 1000 END
        |)
        |SELECT t.lang, t.n_total, s.n_kept, s.min_kept, s.max_kept, s.sum_kept
        |FROM (SELECT lang, COUNT(1) AS n_total FROM documents GROUP BY lang) t
        |JOIN (SELECT lang, COUNT(1) AS n_kept, MIN(doc_id) AS min_kept,
        |        MAX(doc_id) AS max_kept, CAST(SUM(doc_id) AS bigint) AS sum_kept
        |      FROM k GROUP BY lang) s USING (lang)
        |ORDER BY t.lang""".stripMargin,
    "q_temperature_sample" ->
      """WITH c AS (SELECT lang, COUNT(1) AS n FROM documents GROUP BY lang),
        |w AS (
        |  SELECT lang, n, sqrt(CAST(n AS double)) AS w,
        |    CAST(n AS double) / sqrt(CAST(n AS double)) AS ratio
        |  FROM c
        |),
        |m AS (SELECT MIN(ratio) AS m FROM w),
        |r AS (
        |  SELECT lang, CAST(floor(m.m * w.w / CAST(w.n AS double) * 1000) AS bigint)
        |    AS rate_pm
        |  FROM w, m
        |),
        |kept AS (
        |  SELECT d.lang, d.doc_id, r.rate_pm FROM documents d
        |  JOIN r USING (lang)
        |  WHERE CAST(('0x' || substr(md5('temp:' || doc_id), 1, 8)) AS bigint) % 1000
        |    < r.rate_pm
        |)
        |SELECT t.lang, t.n_total, s.n_kept, s.rate_pm, s.sum_kept
        |FROM (SELECT lang, COUNT(1) AS n_total FROM documents GROUP BY lang) t
        |JOIN (SELECT lang, COUNT(1) AS n_kept, MAX(rate_pm) AS rate_pm,
        |        CAST(SUM(doc_id) AS bigint) AS sum_kept
        |      FROM kept GROUP BY lang) s USING (lang)
        |ORDER BY t.lang""".stripMargin,
    "q_weighted_sample" ->
      s"""WITH d AS (
         |  SELECT doc_id, lang, CAST(len($duckToks) AS bigint) AS w_toks,
         |    (CAST(('0x' || substr(md5(CAST(doc_id AS varchar)), 1, 8)) AS bigint)
         |      + 0.5) / 4294967296.0 AS u
         |  FROM documents WHERE text IS NOT NULL
         |),
         |r AS (
         |  SELECT lang, doc_id, w_toks,
         |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY
         |      CAST(round(ln(u) / greatest(CAST(w_toks AS double), 1e-9)
         |        * 1000000) AS bigint) DESC, doc_id ASC) AS rk
         |  FROM d
         |)
         |SELECT lang, CAST(rk AS int) AS rk, doc_id, w_toks
         |FROM r WHERE rk <= 5 ORDER BY lang, rk""".stripMargin,
    "q_token_pack" ->
      s"""WITH t AS (
         |  SELECT doc_id, CAST(len($duckToks) AS bigint) AS n_tok FROM documents
         |),
         |o AS (
         |  SELECT doc_id, n_tok,
         |    CAST(SUM(n_tok) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bigint) AS e
         |  FROM t
         |),
         |spans AS (SELECT doc_id, e - n_tok AS s, e FROM o WHERE n_tok > 0),
         |x AS (
         |  SELECT s, e,
         |    unnest(generate_series(s // 1024, (e - 1) // 1024)) AS chunk
         |  FROM spans
         |)
         |SELECT chunk, COUNT(1) AS n_docs,
         |  CAST(SUM(LEAST(e, (chunk + 1) * 1024) - GREATEST(s, chunk * 1024)) AS bigint) AS n_tokens
         |FROM x GROUP BY chunk ORDER BY chunk""".stripMargin,
    "q_fingerprint" ->
      s"""WITH base AS (
         |  SELECT doc_id, $duckToks AS toks FROM documents WHERE doc_id % 25 = 0
         |),
         |sh AS (
         |  SELECT doc_id,
         |    list_transform(range(1, greatest(len(toks) - 1, 1)),
         |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS shingles
         |  FROM base
         |)
         |SELECT b.doc_id,
         |  list_reduce(
         |    list_concat([CAST(0 AS bigint)],
         |      list_transform(b.toks, x -> CAST(('0x' || substr(md5(x), 1, 8)) AS bigint))),
         |    (acc, h) -> (acc * 31 + h) % 1000000007) AS rolling_fp,
         |  list_min(list_transform(s.shingles, x -> md5(x))) AS min_shingle,
         |  list_max(list_transform(s.shingles, x -> md5(x))) AS max_shingle
         |FROM base b JOIN sh s USING (doc_id) ORDER BY doc_id""".stripMargin)
}
