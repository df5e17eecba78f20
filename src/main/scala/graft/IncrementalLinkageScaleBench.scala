package graft

import graft.ops.{IncrementalLinkage, Linkage}
import org.apache.spark.sql.functions._

/** Scaling evidence for INCREMENTAL entity resolution (COVERAGE.md round-9
  * "Incremental entity resolution") — with the HONEST cost model: what
  * the probe avoids is re-BLOCKING and re-COMPARING the corpus (the
  * Σ block² levenshtein term, the part that grows superlinearly with
  * block occupancy); what it still pays, like every staged-swap
  * incremental operator here (`IncrementalDedup`'s assignment swap
  * included), is corpus-LINEAR metadata IO per batch — index scan,
  * allIds distinct, full assignment rewrite. So the measured gap vs a
  * full re-resolve is modest on tiny blocks (16^5 blocks at 1M records:
  * blocks of ~1-2, compare cost ≈ 0 — speedup ~1.1) and widens exactly
  * as block occupancy grows (`prefixLen=4`: speedup ~1.4 at 1M; on real
  * master data, zip+surname blocks of 10²-10³, the compare term
  * dominates outright). The assignment-swap linear term is removable at
  * deploy time by versioned/partitioned assignment storage — the same
  * remedy every table format applies — but the COMPARE term is the one
  * that can't be fixed after the fact, and that is what the persisted
  * index eliminates.
  *
  * Same synthetic dirty corpus as `LinkageScaleBench` (hex-prefix
  * blocks, planted distance-1 typo pairs at ids ≡ 7 mod 10); the BATCH
  * plants typo copies of stored ids ≡ 3 mod 10 so every batch pair is
  * batch×stored — the worst case for an incremental design (nothing
  * resolvable inside the batch alone).
  *
  * Usage (ONE size per invocation — fresh JVM per curve point):
  *   sbt "runMain graft.IncrementalLinkageScaleBench [records=1000000] [batch=50000] [runs=3] [partitions=32] [prefixLen=5]"
  * Prints one JSON line {"metric":"incremental_linkage_scale",...}.
  */
object IncrementalLinkageScaleBench {

  def main(args: Array[String]): Unit = {
    val nRecs = args.headOption.map(_.toLong).getOrElse(1000000L)
    val nBatch = args.lift(1).map(_.toLong).getOrElse(50000L)
    val runs = args.lift(2).map(_.toInt).getOrElse(3)
    val parts = args.lift(3).map(_.toInt).getOrElse(32)
    val prefixLen = args.lift(4).map(_.toInt).getOrElse(5)
    val spark = Engine.session()
    import spark.implicits._
    val blockKey = substring(col("name"), 1, prefixLen)

    val base = spark.range(0, nRecs, 1, parts)
      .select($"id", substring(md5($"id".cast("string")), 1, 12).as("name"))
    val typo = base.filter($"id" % 10 === 7)
      .select(($"id" + 1000000000L).as("id"),
        concat(substring($"name", 1, 6), substring($"name", 8, 12)).as("name"))
    val corpus = base.unionByName(typo)
    // batch = typo copies of STORED ids — every true pair crosses into the index
    val batch = base.filter($"id" % 10 === 3).limit(nBatch.toInt)
      .select(($"id" + 2000000000L).as("id"),
        concat(substring($"name", 1, 6), substring($"name", 8, 12)).as("name"))
      .localCheckpoint(true)

    // init the persisted state once (not timed: the nightly build)
    val state = java.nio.file.Files.createTempDirectory("inclinkage").toString
    IncrementalLinkage.addBatch(spark, state, corpus, "id", "name", blockKey, 2)

    // probe: resolve the batch against the persisted index; the state is
    // restored BEFORE each run (outside the timed window) so every run
    // starts from the same index, and the timed window covers the honest
    // per-batch cost (probe join + CC + state swap)
    val assignBackup = spark.read.parquet(s"$state/assign").localCheckpoint(true)
    val recsBackup = spark.read.parquet(s"$state/recs").localCheckpoint(true)
    def restore(): Unit = {
      assignBackup.write.mode("overwrite").parquet(s"$state/assign")
      recsBackup.write.mode("overwrite").parquet(s"$state/recs")
    }
    def probeOnce(): Long =
      IncrementalLinkage.addBatch(spark, state, batch, "id", "name", blockKey, 2).count()
    restore(); val nInc = probeOnce() // warmup
    val probeTimes = (1 to runs).map { _ =>
      restore()
      val t0 = System.nanoTime(); probeOnce(); (System.nanoTime() - t0) / 1e9
    }.sorted
    val probeSec = probeTimes(probeTimes.length / 2)

    // full: one-shot resolve of corpus ∪ batch
    def fullOnce(): Long =
      Linkage.resolve(corpus.unionByName(batch), "id", "name", blockKey, 2).count()
    val nFull = fullOnce() // warmup
    val fullTimes = (1 to runs).map { _ =>
      val t0 = System.nanoTime(); fullOnce(); (System.nanoTime() - t0) / 1e9
    }.sorted
    val fullSec = fullTimes(fullTimes.length / 2)

    require(nInc == nFull, s"incremental $nInc != full $nFull — law broken")
    println(s"""{"metric":"incremental_linkage_scale","records":$nRecs,"batch":$nBatch,"runs":$runs,"partitions":$parts,"prefix_len":$prefixLen,"assignments":$nInc,"probe_median_sec":$probeSec,"full_median_sec":$fullSec,"speedup":${fullSec / probeSec}}""")
    spark.stop()
  }
}
