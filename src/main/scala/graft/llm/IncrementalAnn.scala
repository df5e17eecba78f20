package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental ANN index maintenance: add new embedding batches to a
  * PERSISTED IVF index without retraining or touching stored vectors.
  *
  * The production vector-search loop is the dedup loop's twin (see
  * [[IncrementalDedup]]): a 100 TB corpus is indexed once, then daily
  * batches must become searchable at batch cost — never re-cluster, never
  * re-assign, never rewrite the postings already on disk. FAISS calls
  * this `add` on a trained index; here the index is a parquet state dir
  * under [[graft.ops.StateSwap]]'s generation-pointer layout
  * (`<stateDir>/GENERATION` → `gen-<N>/{centroids,postings}` — whole-index
  * rebuilds stage the next generation and publish with one atomic pointer
  * advance, r14):
  *
  *  - `centroids/` — (cell, c: array<double>): the coarse quantizer,
  *    trained ONCE at `init` on a bounded sample (`boundedSample` — the
  *    collect is capped at any corpus size) and IMMUTABLE afterwards.
  *    Centroid drift is handled in production by periodic full rebuilds,
  *    not by mutating a live index.
  *  - `postings/` — (id, cell, v, nrm): APPEND-ONLY posting lists. A new
  *    batch is assigned MAP-SIDE against the broadcast-literal centroids
  *    (numCells × dims doubles in the plan) and appended; cost is one
  *    narrow pass over the batch plus the append IO, independent of
  *    corpus size. At scale the postings dir is partitioned by `cell`,
  *    so a search's nprobe cells prune to nprobe directories.
  *
  * THE INCREMENTAL LAW (pinned in IncrementalAnnSpec, recall-pinned in
  * `q_ann_incremental`): because assignment is a pure function of
  * (vector, centroids) — argmin over ||v−c||² with the cell id breaking
  * ties — `init(A); addBatch(B)` yields postings IDENTICAL to assigning
  * A ∪ B in one shot against the same centroids. Search over the
  * incrementally-built index is bit-for-bit search over the one-shot
  * index. The same argmin expression is used at init, at addBatch, and
  * for query probes, so the law holds by construction and the spec can
  * assert set equality, not approximate agreement.
  */
object IncrementalAnn {

  import graft.ops.StateSwap

  private def centroidsPath(spark: SparkSession, stateDir: String) =
    StateSwap.livePath(spark, stateDir, "centroids")
  private def postingsPath(spark: SparkSession, stateDir: String) =
    StateSwap.livePath(spark, stateDir, "postings")

  /** The live postings relation — the resolver specs and callers use
    * instead of assuming an on-disk layout (state moved to generation
    * dirs in r14; see [[graft.ops.StateSwap]]).
    */
  def postings(spark: SparkSession, stateDir: String): DataFrame =
    spark.read.parquet(postingsPath(spark, stateDir))

  /** The live centroid relation (cell, c). */
  def centroids(spark: SparkSession, stateDir: String): DataFrame =
    spark.read.parquet(centroidsPath(spark, stateDir))

  /** Probe-order entries: struct(distance-score, cell) per centroid.
    * score = ||c||² − 2·v·c ranks cells exactly like ||v−c||² (the ||v||²
    * term is constant per row); ties break on cell id.
    */
  private def probeEntries(centroids: Seq[(Int, Array[Double])], v: Column) =
    centroids.map { case (i, c) =>
      struct(
        (lit(c.map(x => x * x).sum) - lit(2d) * Similarity.dot(v, typedlit(c.toSeq))).as("cd"),
        lit(i).as("cell"))
    }

  /** Map-side cell assignment of a prepared vector column. */
  private def assignCell(centroids: Seq[(Int, Array[Double])], v: Column): Column =
    element_at(array_sort(array(probeEntries(centroids, v): _*)), 1).getField("cell")

  private def loadCentroidsFrom(spark: SparkSession, path: String): Seq[(Int, Array[Double])] =
    spark.read.parquet(path)
      .collect() // numCells rows — bounded by construction
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1).toSeq

  /** Train the coarse quantizer on a bounded sample of the PREPARED
    * corpus (columns id, v, nrm) and persist it at `outPath` — the
    * freeze point [[init]] and [[maintain]]'s re-freeze share.
    */
  private def trainCentroidsTo(spark: SparkSession, outPath: String,
      cPrep: DataFrame, numCells: Int, seed: Long,
      sampleTarget: Int): Unit = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val hashSample = Similarity.boundedSample(cPrep, "id", sampleTarget.toLong)
    val trainSample =
      if (hashSample.limit(numCells).count() < numCells) cPrep else hashSample
    val model = new KMeans().setK(numCells).setSeed(seed).setMaxIter(10)
      .setFeaturesCol("fv").setPredictionCol("cell")
      .fit(trainSample.select(array_to_vector(col("v")).as("fv")))
    val cents = model.clusterCenters.map(_.toArray).zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
    import spark.implicits._
    cents.toDF("cell", "c").repartition(1)
      .write.mode("overwrite").parquet(outPath)
  }

  /** STAGE a full freeze of `corpus` (columns id, v, nrm) into the NEXT
    * generation: train centroids, assign every vector under them. The
    * live index is untouched — readers keep the old generation until
    * [[graft.ops.StateSwap.publish]] flips the pointer. Exposed
    * package-private so the crash spec can stop exactly here (the
    * "crash before publish" state) and assert the old index still
    * serves searches.
    */
  private[graft] def stageFreeze(spark: SparkSession, stateDir: String,
      corpus: DataFrame, numCells: Int, seed: Long,
      sampleTarget: Int): Unit = {
    val cOut = StateSwap.stagePath(spark, stateDir, "centroids")
    trainCentroidsTo(spark, cOut, corpus, numCells, seed, sampleTarget)
    val cents = loadCentroidsFrom(spark, cOut)
    corpus.select(col("id"), assignCell(cents, col("v")).as("cell"),
        col("v"), col("nrm"))
      .write.mode("overwrite")
      .parquet(StateSwap.stagePath(spark, stateDir, "postings"))
  }

  /** Stage + publish: the whole-index freeze [[init]] and [[maintain]]'s
    * re-freeze share. Centroids and postings land in ONE generation dir
    * published by ONE atomic pointer advance, so no observable state can
    * pair new centroids with old assignments (the torn-index hazard the
    * old two-dir layout carried).
    */
  private def freeze(spark: SparkSession, stateDir: String, corpus: DataFrame,
      numCells: Int, seed: Long, sampleTarget: Int): Unit = {
    stageFreeze(spark, stateDir, corpus, numCells, seed, sampleTarget)
    StateSwap.publish(spark, stateDir, legacyNames = Seq("centroids", "postings"))
  }

  /** Train the coarse quantizer on a bounded sample of `corpus`, persist
    * it, and assign the initial corpus. One-time cost.
    */
  def init(spark: SparkSession, stateDir: String, corpus: DataFrame,
      vecCol: String, idCol: String, numCells: Int = 16, seed: Long = 42L,
      sampleTarget: Int = 4096): Unit =
    freeze(spark, stateDir,
      Similarity.prepared(corpus, vecCol, idCol)
        .select(col(idCol).as("id"), col("v"), col("nrm")),
      numCells, seed, sampleTarget)

  /** Assign a new batch against the stored centroids and append its
    * postings. Batch ids must be disjoint from ids already added.
    * `overwrite = true` REPLACES the postings under the SAME frozen
    * centroids (the one-shot-assignment law's other half) — it stages a
    * fresh generation restating the centroids and publishes atomically,
    * so even the replace path never leaves a torn or absent index.
    */
  def addBatch(spark: SparkSession, stateDir: String, batch: DataFrame,
      vecCol: String, idCol: String, overwrite: Boolean = false): Unit = {
    val cents = loadCentroidsFrom(spark, centroidsPath(spark, stateDir))
    val assigned = Similarity.prepared(batch, vecCol, idCol)
      .select(col(idCol).as("id"), assignCell(cents, col("v")).as("cell"),
        col("v"), col("nrm"))
    if (overwrite) {
      import spark.implicits._
      cents.map { case (i, c) => (i, c.toSeq) }.toDF("cell", "c")
        .repartition(1).write.mode("overwrite")
        .parquet(StateSwap.stagePath(spark, stateDir, "centroids"))
      assigned.write.mode("overwrite")
        .parquet(StateSwap.stagePath(spark, stateDir, "postings"))
      StateSwap.publish(spark, stateDir, legacyNames = Seq("centroids", "postings"))
    } else
      assigned.write.mode("append").parquet(postingsPath(spark, stateDir))
  }

  /** DRIFT-TRIGGERED MAINTENANCE (VERDICT r12 item 6) — the decision a
    * 100 TB ingest pipeline runs nightly over its frozen quantizer (the
    * FAISS re-train schedule): centroids are IMMUTABLE by design (see
    * the object scaladoc), so distribution drift in the incoming batches
    * silently degrades recall — new clusters straddle the old Voronoi
    * boundaries and neighbors split across un-probed cells. This verb
    * makes the re-freeze decision MEASURED instead of scheduled:
    *
    *  1. Kolmogorov–Smirnov statistic ([[graft.ops.Drift.ksStatistic]],
    *     integer-exact) between the INDEX's stored scalar summary (the
    *     fixed-point L2 norm every posting already carries — zero extra
    *     state) and the incoming batch's;
    *  2. `ks <= threshold` → plain [[addBatch]] (batch cost, the
    *     common case);
    *  3. `ks > threshold` → RE-FREEZE: retrain the coarse quantizer on
    *     a bounded sample of postings ∪ batch and reassign everything
    *     ([[init]] — one full-corpus pass, the amortized nightly cost).
    *
    * Returns (refrozen, ks). The norm summary catches scale/magnitude
    * drift (the dominant embedding-model-swap signature); rotation-only
    * drift is norm-invariant — callers with that threat model feed
    * [[graft.ops.Drift]] a per-dimension summary and call [[init]]
    * directly. `q_ann_refreeze` pins the whole loop: a drifted batch
    * degrades pinned recall under the frozen centroids, `maintain`
    * detects it and re-freezes, and the SAME search meets the floor
    * again — both recalls measured in-query.
    */
  def maintain(spark: SparkSession, stateDir: String, batch: DataFrame,
      vecCol: String, idCol: String, ksThreshold: Double = 0.2,
      numCells: Int = 16, seed: Long = 42L, sampleTarget: Int = 4096)
      : (Boolean, Double) = {
    val stored = postings(spark, stateDir)
    val bPrep = Similarity.prepared(batch, vecCol, idCol)
    val fp = (c: Column) => (c * lit(1e6)).cast("long")
    // collect(), not head(): an empty-vs-empty comparison yields zero
    // statistic rows, and an empty side makes the ratio NaN — both mean
    // "no evidence of drift", so both take the cheap path (ADVICE r13:
    // NaN <= threshold is false, which used to re-freeze on a NO-OP
    // empty batch — the exact opposite of the right default).
    val stats = graft.ops.Drift.ksStatistic(
      stored.select(fp(col("nrm")).as("v")),
      bPrep.select(fp(col("nrm")).as("v")), "v").collect()
    val ks = stats.headOption match {
      case Some(stat) if stat.getLong(0) > 0L && stat.getLong(1) > 0L =>
        stat.getLong(2).toDouble / (stat.getLong(0).toDouble * stat.getLong(1).toDouble)
      case _ => 0.0
    }
    if (ks <= ksThreshold) {
      addBatch(spark, stateDir, batch, vecCol, idCol)
      (false, ks)
    } else {
      // RE-FREEZE: retrain + reassign into the NEXT generation, then one
      // atomic pointer advance (StateSwap.publish). The old index stays
      // live and consistent until the instant the new one is complete —
      // a crash anywhere during staging leaves it untouched, and the
      // retry overwrites the half-staged generation.
      val corpus = stored.select(col("id"), col("v"), col("nrm"))
        .unionByName(bPrep.select(col(idCol).as("id"), col("v"), col("nrm")))
      freeze(spark, stateDir, corpus, numCells, seed, sampleTarget)
      (true, ks)
    }
  }

  /** nprobe-cell search over the stored postings: (id_a, rk, id_b, cos),
    * self-matches excluded, ties on corpus id — same output contract as
    * `Similarity.ivfTopK`.
    */
  def search(spark: SparkSession, stateDir: String, queries: DataFrame,
      vecCol: String, idCol: String, k: Int, nprobe: Int = 4): DataFrame = {
    val cents = loadCentroidsFrom(spark, centroidsPath(spark, stateDir))
    val postings = spark.read.parquet(postingsPath(spark, stateDir))
      .select(col("id").as("id_b"), col("cell"), col("v").as("v_b"),
        col("nrm").as("n_b"))
    val qCells = Similarity.prepared(queries, vecCol, idCol)
      .select(col(idCol).as("id_a"), col("v").as("v_a"), col("nrm").as("n_a"),
        explode(slice(array_sort(array(probeEntries(cents, col("v")): _*)),
          1, nprobe)).as("probe"))
      .withColumn("cell", col("probe.cell"))
      .drop("probe")
    val w = Window.partitionBy(col("id_a")).orderBy(col("cos").desc, col("id_b").asc)
    qCells.join(postings, Seq("cell"))
      .filter(col("id_a") =!= col("id_b"))
      .withColumn("cos", Similarity.dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("id_a"), col("rk"), col("id_b"), col("cos"))
  }
}
