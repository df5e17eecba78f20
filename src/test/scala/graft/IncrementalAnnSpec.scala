package graft

import graft.llm.{IncrementalAnn, Similarity}
import org.apache.spark.sql.DataFrame

/** Incremental IVF laws: one-shot assignment ≡ incremental appends
  * against the same persisted centroids (set-exact postings AND
  * bit-identical search), exhaustive probing degenerates to brute force,
  * and postings stay append-only across batches.
  */
class IncrementalAnnSpec extends SparkSpec {

  import spark.implicits._

  private val dims = 8

  /** Three well-separated clusters (offsets 0, 10, 20) plus a
    * deterministic jitter — cluster structure makes IVF probing
    * meaningful, determinism makes the laws exact.
    */
  private def vecs(ids: Seq[Long]): DataFrame =
    ids.map { i =>
      val base = (i % 3L) * 10.0
      (i, Array.tabulate(dims)(d => (base + math.sin(i * dims + d)).toFloat))
    }.toDF("vec_id", "embedding")

  private def postingSet(stateDir: String): Set[(Long, Int)] =
    IncrementalAnn.postings(spark, stateDir)
      .select($"id", $"cell")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet

  private def centroidSet(stateDir: String): Set[Seq[Any]] =
    IncrementalAnn.centroids(spark, stateDir).collect().map(_.toSeq).toSet

  test("init(A) + addBatch(B) equals one-shot assignment of A ∪ B") {
    val all = (1L to 90L)
    val (a, b) = all.partition(_ % 3 != 0)
    val s1 = tmpDir("ann-inc")
    IncrementalAnn.init(spark, s1, vecs(a), "embedding", "vec_id", numCells = 4)
    IncrementalAnn.addBatch(spark, s1, vecs(b), "embedding", "vec_id")
    // same centroids (same training slice A, same seed), union in one shot
    val s2 = tmpDir("ann-one")
    IncrementalAnn.init(spark, s2, vecs(a), "embedding", "vec_id", numCells = 4)
    IncrementalAnn.addBatch(spark, s2, vecs(all), "embedding", "vec_id",
      overwrite = true)
    assert(postingSet(s1) === postingSet(s2),
      "incremental postings must match one-shot assignment exactly")
    // search parity: same rows, same ranks, same cosine bits
    val q = vecs(Seq(5L, 23L, 61L))
    val r1 = IncrementalAnn.search(spark, s1, q, "embedding", "vec_id", 3)
      .collect().map(_.toSeq).toSet
    val r2 = IncrementalAnn.search(spark, s2, q, "embedding", "vec_id", 3)
      .collect().map(_.toSeq).toSet
    assert(r1 === r2)
  }

  test("nprobe = numCells degenerates to exact brute-force top-k") {
    val corpus = vecs(1L to 60L)
    val s1 = tmpDir("ann-exh")
    IncrementalAnn.init(spark, s1, corpus, "embedding", "vec_id", numCells = 4)
    val q = vecs(Seq(7L, 8L, 9L))
    val exhaustive = IncrementalAnn
      .search(spark, s1, q, "embedding", "vec_id", 5, nprobe = 4)
      .collect().map(_.toSeq).toSet
    val brute = Similarity.bruteTopK(corpus, q, "embedding", "vec_id", 5)
      .collect().map(_.toSeq).toSet
    assert(exhaustive === brute,
      "probing every cell must reproduce brute force bit-for-bit")
  }

  test("addBatch appends without touching stored postings") {
    val s1 = tmpDir("ann-app")
    val a = vecs(1L to 30L)
    IncrementalAnn.init(spark, s1, a, "embedding", "vec_id", numCells = 4)
    val before = postingSet(s1)
    IncrementalAnn.addBatch(spark, s1, vecs(31L to 45L), "embedding", "vec_id")
    val after = postingSet(s1)
    assert(before.subsetOf(after), "existing postings must be unchanged")
    assert(after.size === 45)
  }

  test("maintain: an in-distribution batch takes the cheap addBatch path; " +
      "a drifted batch re-freezes (centroids retrained, postings complete)") {
    val s1 = tmpDir("ann-maint")
    IncrementalAnn.init(spark, s1, vecs(1L to 30L), "embedding", "vec_id",
      numCells = 4)
    val centsBefore = centroidSet(s1)
    // same generator → same norm distribution → KS small → no rebuild
    val (r1, ks1) = IncrementalAnn.maintain(spark, s1, vecs(31L to 60L),
      "embedding", "vec_id", numCells = 4)
    assert(!r1 && ks1 <= 0.2, s"in-distribution batch must not re-freeze: $ks1")
    assert(centroidSet(s1) == centsBefore,
      "cheap path must not touch the centroids")
    assert(postingSet(s1).size === 60)
    // drifted batch: 5x magnitude → KS(norm) ≈ 1 → rebuild
    val drifted = vecs(61L to 90L).select($"vec_id",
      org.apache.spark.sql.functions.transform($"embedding",
        x => x * org.apache.spark.sql.functions.lit(5.0f)).as("embedding"))
    val (r2, ks2) = IncrementalAnn.maintain(spark, s1, drifted,
      "embedding", "vec_id", numCells = 4)
    assert(r2 && ks2 > 0.2, s"drifted batch must re-freeze: $ks2")
    assert(centroidSet(s1) != centsBefore,
      "re-freeze must retrain the centroids")
    val after = postingSet(s1)
    assert(after.map(_._1) === (1L to 90L).toSet,
      "re-freeze must reassign every stored id plus the batch")
    // the rebuilt index still satisfies the exhaustive-probe law
    val q = vecs(Seq(2L, 3L))
    val exhaustive = IncrementalAnn
      .search(spark, s1, q, "embedding", "vec_id", 5, nprobe = 4)
      .collect().map(_.toSeq).toSet
    val corpus = vecs(1L to 60L).unionByName(drifted)
    val brute = Similarity.bruteTopK(corpus, q, "embedding", "vec_id", 5)
      .collect().map(_.toSeq).toSet
    assert(exhaustive === brute,
      "probing every cell of the rebuilt index must reproduce brute force")
  }

  test("FROZEN centroids degrade recall on drifted data below the re-freeze " +
      "floor — the cell structure, not the postings, is what breaks") {
    // The q_ann_refreeze degradation claim, moved here from the entry's
    // timed body (VERDICT r15 item 7 — the entry keeps the maintain path
    // + recallChecked output; this spec keeps the frozen-path half of
    // the evidence). Fixture: A holds two MAGNITUDE clusters of one
    // direction (norm 5 and norm 50 along e0) → frozen Euclidean cells
    // split by magnitude. The drifted batch B is cosine-twin PAIRS
    // (u_j = 5·d_j, w_j = 50·d_j, distinct directions d_j off e0):
    // Euclid assigns u to the norm-5 cell and w to the norm-50 cell, so
    // an nprobe=1 search from u NEVER sees its exact cosine twin —
    // recall 0 under the frozen cells, 1.0 when probing exhaustively.
    val dims = 8
    def vec(scale: Double, theta: Double): Array[Float] =
      Array.tabulate(dims)(d =>
        if (d == 0) (scale * math.cos(theta)).toFloat
        else if (d == 1) (scale * math.sin(theta)).toFloat
        else 0f)
    val a = ((1L to 30L).map(i => (i, vec(5.0, 0.001 * i))) ++
      (31L to 60L).map(i => (i, vec(50.0, 0.001 * i)))).toDF("vec_id", "embedding")
    val pairs = (0 until 10).map(j => 0.6 + 0.05 * j)
    val b = pairs.zipWithIndex.flatMap { case (th, j) =>
      Seq((100L + j, vec(5.0, th)), (200L + j, vec(50.0, th)))
    }.toDF("vec_id", "embedding")
    val s1 = tmpDir("ann-frozen-degrade")
    IncrementalAnn.init(spark, s1, a, "embedding", "vec_id", numCells = 2)
    IncrementalAnn.addBatch(spark, s1, b, "embedding", "vec_id")
    val queries = b.filter($"vec_id" < 200L) // the u_j twins
    val corpus = a.unionByName(b)
    val exact = Similarity.bruteTopK(corpus, queries, "embedding", "vec_id", 1)
    def recallOf(ann: DataFrame): Double = {
      val want = exact.select($"id_a", $"id_b")
      want.join(ann.select($"id_a", $"id_b"),
        Seq("id_a", "id_b"), "left_semi").count().toDouble / want.count()
    }
    // sanity: each u's exact nearest neighbor IS its scalar twin w
    val twins = exact.collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert((0 until 10).forall(j => twins(100L + j) == 200L + j),
      s"fixture: exact top-1 must be the cosine twin: $twins")
    val frozen = recallOf(IncrementalAnn.search(spark, s1, queries,
      "embedding", "vec_id", 1, nprobe = 1))
    assert(frozen < 0.8,
      s"frozen-cell recall must degrade below the 0.8 floor on drift: $frozen")
    // exhaustive probing restores recall — the postings are complete,
    // the FROZEN CELL STRUCTURE is what the drift broke
    val exhaustive = recallOf(IncrementalAnn.search(spark, s1, queries,
      "embedding", "vec_id", 1, nprobe = 2))
    assert(exhaustive == 1.0,
      s"exhaustive probe must find every twin: $exhaustive")
  }

  test("a crash between staging and publish leaves the OLD index fully " +
      "live, and the retried maintain completes the re-freeze") {
    val s1 = tmpDir("ann-crash")
    IncrementalAnn.init(spark, s1, vecs(1L to 30L), "embedding", "vec_id",
      numCells = 4)
    val q = vecs(Seq(2L, 3L))
    val searchBefore = IncrementalAnn
      .search(spark, s1, q, "embedding", "vec_id", 5, nprobe = 4)
      .collect().map(_.toSeq).toSet
    val centsBefore = centroidSet(s1)
    val postingsBefore = postingSet(s1)
    val genBefore = graft.ops.StateSwap.currentGen(spark, s1)

    // CRASH SIMULATION: stage the whole re-freeze (retrain + reassign of a
    // drifted corpus) but die before StateSwap.publish — the exact window
    // the old delete-then-rename swap left with NO readable index.
    val drifted = vecs(31L to 60L).select($"vec_id",
      org.apache.spark.sql.functions.transform($"embedding",
        x => x * org.apache.spark.sql.functions.lit(5.0f)).as("embedding"))
    val crashCorpus = IncrementalAnn.postings(spark, s1)
      .select($"id", $"v", $"nrm")
      .unionByName(Similarity.prepared(drifted, "embedding", "vec_id")
        .select($"vec_id".as("id"), $"v", $"nrm"))
    IncrementalAnn.stageFreeze(spark, s1, crashCorpus, numCells = 4,
      seed = 42L, sampleTarget = 4096)

    // old generation still live and bit-identical: reads, searches, pointer
    assert(graft.ops.StateSwap.currentGen(spark, s1) === genBefore,
      "a crash before publish must not advance the generation pointer")
    assert(centroidSet(s1) === centsBefore && postingSet(s1) === postingsBefore,
      "the live index must be untouched by a crashed staging")
    assert(IncrementalAnn.search(spark, s1, q, "embedding", "vec_id", 5, nprobe = 4)
      .collect().map(_.toSeq).toSet === searchBefore,
      "searches against the crashed state must serve the old index")

    // THE RETRY: a plain maintain over the half-staged state heals it —
    // staging overwrites the orphan, publish flips the pointer once.
    val (refrozen, _) = IncrementalAnn.maintain(spark, s1, drifted,
      "embedding", "vec_id", numCells = 4)
    assert(refrozen, "the retried drifted batch must re-freeze")
    assert(graft.ops.StateSwap.currentGen(spark, s1) === genBefore + 1)
    assert(postingSet(s1).map(_._1) === (1L to 60L).toSet,
      "the retry must complete the reassignment of stored ∪ batch")
    // superseded generation reclaimed: exactly one gen dir remains
    val fs = new org.apache.hadoop.fs.Path(s1)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val genDirs = fs.listStatus(new org.apache.hadoop.fs.Path(s1))
      .map(_.getPath.getName).filter(_.startsWith("gen-")).toSeq
    assert(genDirs === Seq(s"gen-${genBefore + 1}"),
      s"publish must reclaim the superseded generation: $genDirs")
  }

  test("an empty batch is a cheap no-op, never a re-freeze (NaN KS guard)") {
    val s1 = tmpDir("ann-empty")
    IncrementalAnn.init(spark, s1, vecs(1L to 30L), "embedding", "vec_id",
      numCells = 4)
    val centsBefore = centroidSet(s1)
    val (refrozen, ks) = IncrementalAnn.maintain(spark, s1,
      vecs(Seq.empty[Long]), "embedding", "vec_id", numCells = 4)
    assert(!refrozen && ks === 0.0,
      s"an empty batch must take the cheap path with ks=0, got ($refrozen, $ks)")
    assert(centroidSet(s1) === centsBefore && postingSet(s1).size === 30)
  }
}
