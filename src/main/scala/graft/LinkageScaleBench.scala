package graft

import graft.ops.Linkage
import org.apache.spark.sql.functions._

/** Scaling evidence for blocked record linkage (COVERAGE.md "Record
  * linkage"): the match join's pair volume is Σ block², so with a
  * blocking key whose CARDINALITY tracks the corpus (here a 5-hex-char
  * prefix = 16^5 ≈ 1M blocks; on real data: zip+surname, sorted-
  * neighborhood keys, …) the expected block size — and therefore pairs
  * per record — stays constant and the whole resolve (block join +
  * threshold levenshtein + CC) should hold flat records/sec. A fixed
  * tiny block count (the naive choice) would square: doubling the
  * corpus doubles every block and quadruples its pairs.
  *
  * Synthetic dirty corpus, fully distributed generation: each record id
  * gets a 12-hex md5 name; ids ≡ 7 (mod 10) also emit a typo copy
  * (char 7 deleted — AFTER the 5-char blocking prefix, so blocking
  * keeps the true pair) under id+1e9. Resolution must re-link each copy
  * (cluster of 2) and leave the rest singletons, so matched-pair volume
  * is ≈ corpus/10 (planted pairs, plus the rare md5 near-collision) —
  * reported as the linearity anchor next to the timing.
  *
  * Usage (ONE size per invocation — fresh JVM per curve point):
  *   sbt "runMain graft.LinkageScaleBench [records=1000000] [runs=3] [partitions=32] [prefixLen=5]"
  * `prefixLen` sets block cardinality (16^prefixLen): shortening it at a
  * fixed corpus demonstrates the Σ block² cliff directly.
  * Prints one JSON line {"metric":"linkage_scale",...}.
  */
object LinkageScaleBench {

  def main(args: Array[String]): Unit = {
    val nRecs = args.headOption.map(_.toLong).getOrElse(1000000L)
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val parts = args.lift(2).map(_.toInt).getOrElse(32)
    val prefixLen = args.lift(3).map(_.toInt).getOrElse(5)
    val spark = Engine.session()
    import spark.implicits._

    val base = spark.range(0, nRecs, 1, parts)
      .select($"id", substring(md5($"id".cast("string")), 1, 12).as("name"))
    val typo = base.filter($"id" % 10 === 7)
      .select(($"id" + 1000000000L).as("id"),
        concat(substring($"name", 1, 6), substring($"name", 8, 12)).as("name"))
    val dirty = base.unionByName(typo)

    def job(): Long = Linkage
      .matches(dirty, "id", "name", substring(col("name"), 1, prefixLen), 2)
      .count()

    val nPairs = job() // warmup; also the Σ block² linearity anchor
    val times = (1 to runs).map { _ =>
      val t0 = System.nanoTime(); job(); (System.nanoTime() - t0) / 1e9
    }.sorted
    val med = times(times.length / 2)
    println(s"""{"metric":"linkage_scale","records":$nRecs,"runs":$runs,"partitions":$parts,"prefix_len":$prefixLen,"matched_pairs":$nPairs,"median_sec":$med,"records_per_sec":${(nRecs / med).toLong}}""")
    spark.stop()
  }
}
