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
    spark.read.parquet(s"$stateDir/postings")
      .select($"id", $"cell")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet

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
    val centsBefore = spark.read.parquet(s"$s1/centroids")
      .collect().map(_.toSeq).toSet
    // same generator → same norm distribution → KS small → no rebuild
    val (r1, ks1) = IncrementalAnn.maintain(spark, s1, vecs(31L to 60L),
      "embedding", "vec_id", numCells = 4)
    assert(!r1 && ks1 <= 0.2, s"in-distribution batch must not re-freeze: $ks1")
    assert(spark.read.parquet(s"$s1/centroids").collect().map(_.toSeq).toSet
      == centsBefore, "cheap path must not touch the centroids")
    assert(postingSet(s1).size === 60)
    // drifted batch: 5x magnitude → KS(norm) ≈ 1 → rebuild
    val drifted = vecs(61L to 90L).select($"vec_id",
      org.apache.spark.sql.functions.transform($"embedding",
        x => x * org.apache.spark.sql.functions.lit(5.0f)).as("embedding"))
    val (r2, ks2) = IncrementalAnn.maintain(spark, s1, drifted,
      "embedding", "vec_id", numCells = 4)
    assert(r2 && ks2 > 0.2, s"drifted batch must re-freeze: $ks2")
    assert(spark.read.parquet(s"$s1/centroids").collect().map(_.toSeq).toSet
      != centsBefore, "re-freeze must retrain the centroids")
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
}
