package graft

import graft.llm.Dedup
import org.apache.spark.sql.functions._

/** Scaling evidence for the repeated-span pass (COVERAGE.md
  * "Repeated-span exact substring dedup"): the pipeline is exactly two
  * shuffles — occurrences clustered on the span hash (COUNT window),
  * survivors clustered on doc id (interval merge) — so wall time must
  * grow LINEARLY with corpus size at fixed dup density. A hot-span
  * degeneration (all occurrences of a boilerplate span converging on one
  * reducer that can't spill) or an accidental join would bend the curve.
  *
  * Synthetic corpus, fully distributed generation (same generator shape
  * as [[DedupScaleBench]]): 40 xxhash64-derived tokens per doc over a
  * 50k vocabulary; every 10th doc is a near-copy of its predecessor with
  * token 0 replaced, so spans 2..33 of each copy repeat (fixed ~10% dup
  * density at every size) while the rest of the corpus stays unique.
  *
  * Usage (ONE size per invocation — fresh JVM per curve point):
  *   sbt "runMain graft.SpanScaleBench [rows=1000000] [runs=3] [partitions=32]"
  * Prints one JSON line {"metric":"span_scale",...}.
  */
object SpanScaleBench {

  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(1000000L)
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val parts = args.lift(2).map(_.toInt).getOrElse(32)
    val spark = Engine.session()
    import spark.implicits._

    val vocab = 50000L
    val nTok = 40
    val docs = spark.range(0, rows, 1, parts).select($"id".as("doc_id"),
      concat_ws(" ", (0 until nTok).map { j =>
        val base =
          if (j == 0) $"id"
          else when($"id" % 10 === 9, $"id" - 1).otherwise($"id")
        concat(lit("w"), pmod(xxhash64(base * nTok + j), lit(vocab)))
      }: _*).as("text"))

    def job(): (Long, Long) = {
      val r = Dedup.repeatedSpans(docs, "text", "doc_id", k = 8)
        .agg(count(lit(1)).as("n_docs_hit"),
          sum($"dup_tokens").cast("long").as("dup_tokens"))
        .collect()(0)
      (r.getLong(0), r.getLong(1))
    }

    val (hit, dupToks) = job() // warmup + volume facts
    val times = (1 to runs).map { _ =>
      val t0 = System.nanoTime(); job(); (System.nanoTime() - t0) / 1e9
    }.sorted
    val med = times(times.length / 2)
    println(s"""{"metric":"span_scale","rows":$rows,"runs":$runs,"partitions":$parts,"docs_hit":$hit,"dup_tokens":$dupToks,"median_sec":$med,"docs_per_sec":${(rows / med).toLong}}""")
    spark.stop()
  }
}
