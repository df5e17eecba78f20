package graft

import graft.llm.IncrementalSetJoin
import org.apache.spark.sql.functions._

/** Scaling evidence for the INCREMENTAL set-similarity claim: probing a
  * FIXED batch against a growing persisted prefix index must cost ~the
  * batch, not the corpus — the index is scanned (IO linear in corpus)
  * but never re-tokenized, re-ranked, or re-joined against itself, so
  * the probe curve should grow far slower than the full-join curve on
  * the same corpus. A degeneration (frozen-df drift sending hot tokens
  * into prefixes, or an accidental corpus² join) would bend the probe
  * curve toward the full-join curve.
  *
  * Synthetic corpus, fully distributed generation (any size): docs are
  * 8 xxhash64-derived words over a 50k vocabulary; every 10th doc
  * near-dups its predecessor (fixed density at every size). The BATCH is
  * a fixed 10k-doc slice (near-dup structure against the corpus tail).
  *
  * Usage (ONE corpus size per invocation — fresh JVM per curve point):
  *   sbt "runMain graft.SetJoinScaleBench [corpusRows=200000] [runs=3] [partitions=32]"
  * Prints one JSON line with BOTH times: the batch probe against the
  * persisted index, and the full similarityJoin over corpus ∪ batch —
  * the quantity the incremental path exists to avoid.
  *
  * Measured (round 8, local[32], 10k-doc batch): corpus 100k → 400k
  * (4×) moves the probe 2.54 s → 4.63 s (1.8× — the linear part is the
  * index scan) while the full join moves 4.49 s → 27.7 s (6.2× — corpus
  * re-rank + self-join); full/probe widens 1.77× → 5.98× and keeps
  * widening with corpus size, which is the incremental claim made
  * measurable.
  */
object SetJoinScaleBench {

  def main(args: Array[String]): Unit = {
    val corpusRows = args.headOption.map(_.toLong).getOrElse(200000L)
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val parts = args.lift(2).map(_.toInt).getOrElse(32)
    val batchRows = 10000L
    val threshold = 0.6
    val spark = Engine.session()
    import spark.implicits._

    val vocab = 50000L
    val nTok = 8
    def corpusSlice(lo: Long, hi: Long) =
      spark.range(lo, hi, 1, parts).select($"id".as("doc_id"),
        concat_ws(" ", (0 until nTok).map { j =>
          val base =
            if (j == 0) $"id"
            else when($"id" % 10 === 9, $"id" - 1).otherwise($"id")
          concat(lit("w"), pmod(xxhash64(base * nTok + j), lit(vocab)))
        }: _*).as("text"))

    val corpus = corpusSlice(0L, corpusRows)
    val batch = corpusSlice(corpusRows, corpusRows + batchRows)

    val state = java.nio.file.Files
      .createTempDirectory("setjoin_scale").toString + "/state"
    IncrementalSetJoin.init(spark, state, corpus, "text", "doc_id", threshold)

    def probe(): Long = {
      // re-point the probe at a FRESH state copy each run? No — addBatch
      // appends, so probe against a throwaway clone of the state dir to
      // keep every run identical.
      val run = java.nio.file.Files.createTempDirectory("setjoin_run").toString + "/state"
      org.apache.commons.io.FileUtils.copyDirectory(
        new java.io.File(state), new java.io.File(run))
      val n = IncrementalSetJoin
        .addBatch(spark, run, batch, "text", "doc_id", threshold).count()
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(run).getParentFile)
      n
    }
    def full(): Long = graft.llm.SetJoin.similarityJoin(
      corpus.unionByName(batch), "text", "doc_id", threshold).count()

    val nPairs = probe() // warmup
    val probeTimes = (1 to runs).map { _ =>
      val t0 = System.nanoTime(); probe(); (System.nanoTime() - t0) / 1e9
    }.sorted
    full() // warmup
    val fullTimes = (1 to runs).map { _ =>
      val t0 = System.nanoTime(); full(); (System.nanoTime() - t0) / 1e9
    }.sorted
    val pm = probeTimes(probeTimes.length / 2)
    val fm = fullTimes(fullTimes.length / 2)
    println(s"""{"metric":"setjoin_scale","corpus_rows":$corpusRows,"batch_rows":$batchRows,"runs":$runs,"partitions":$parts,"batch_pairs":$nPairs,"probe_median_sec":$pm,"full_median_sec":$fm,"full_over_probe":${"%.2f".formatLocal(java.util.Locale.ROOT, fm / pm)}}""")
    spark.stop()
  }
}
