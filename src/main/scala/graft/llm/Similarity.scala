package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Two paths, same contract:
  *  - `bruteTopK`: exact cosine top-k — the correctness baseline. All
  *    arithmetic is float→double promotion then a SEQUENTIAL left-to-right
  *    fold (zip_with + aggregate), which the DuckDB oracle reproduces
  *    bit-for-bit with `list_dot_product(a::DOUBLE[], b::DOUBLE[])`.
  *  - `srpTopK`: sign-random-projection LSH (Charikar hyperplane hashing):
  *    H deterministic pseudo-random hyperplanes → H sign bits → bucket
  *    key; candidates = bucket collisions, with query-side multi-probe
  *    (`probes` buckets per table via lowest-margin bit flips) to fill
  *    under-k results; exact cosine re-rank inside buckets. At
  *    100 TB the brute path is O(Q·N) dot products and dies; SRP is
  *    O(Σ bucket²) with the same re-rank — recall vs brute force is
  *    pinned in SimilaritySpec.
  *
  * Norms are precomputed once per vector (never inside the pair join).
  */
object Similarity {

  /** Promote a float array to double. */
  private def dbl(c: Column): Column = transform(c, x => x.cast("double"))

  /** Sequential-fold dot product of two double arrays. Dispatches to the
    * native codegen'd `graft_dot` expression (see
    * [[graft.functions.ArrayDotProduct]]) — identical fold order and null
    * semantics to `aggregate(zip_with(a, b, _ * _), 0d, _ + _)`, without
    * the per-pair intermediate array.
    */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  def norm2(a: Column): Column = sqrt(dot(a, a))

  /** Vectors with precomputed double array + norm. Zero-norm vectors are
    * dropped: cosine against them is 0/0 = NaN, and Spark orders NaN as
    * GREATER than every double, so a single all-zero vector would
    * otherwise take rank 1 in every top-k (and diverge from the oracle,
    * which does not share NaN-greatest ordering).
    */
  def prepared(vectors: DataFrame, vecCol: String, idCol: String): DataFrame =
    vectors.select(col(idCol), dbl(col(vecCol)).as("v"))
      .withColumn("nrm", norm2(col("v")))
      .filter(col("nrm") > 0d)

  /** Exact cosine top-k of `queries` against `corpus` (self-matches
    * excluded by id). Deterministic tie-break on corpus id.
    */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, k: Int): DataFrame = {
    val c = prepared(corpus, vecCol, idCol)
      .select(col(idCol).as("id_b"), col("v").as("v_b"), col("nrm").as("n_b"))
    val q = prepared(queries, vecCol, idCol)
      .select(col(idCol).as("id_a"), col("v").as("v_a"), col("nrm").as("n_a"))
    val w = Window.partitionBy(col("id_a")).orderBy(col("cos").desc, col("id_b").asc)
    q.crossJoin(c)
      .filter(col("id_a") =!= col("id_b"))
      .withColumn("cos", dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("id_a"), col("rk"), col("id_b"), col("cos"))
  }

  /** Deterministic pseudo-random hyperplanes: component (p, d) is derived
    * from md5("p<p>_<d>") mapped into [-1, 1). Public construction —
    * standard SRP-LSH with a hash-based PRNG.
    */
  def hyperplane(p: Int, dims: Int): Array[Double] =
    Array.tabulate(dims) { d =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"p${p}_$d".getBytes("UTF-8")).take(4)
      val u = java.nio.ByteBuffer.wrap(hex).getInt.toLong & 0xFFFFFFFFL
      u.toDouble / 2147483648.0 - 1.0
    }

  /** SRP bucket key: H sign bits packed into a long. Each hyperplane
    * projection is a dot product against a literal plane — same native
    * `graft_dot` as the scorer.
    */
  def srpKey(v: Column, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex.map { case (pl, i) =>
      val proj = dot(v, typedlit(pl.toSeq))
      when(proj > 0, lit(1L << i)).otherwise(0L)
    }.reduce(_ + _)

  /** Multi-probe key set for one table: the base bucket plus `probes - 1`
    * neighbor buckets reached by flipping the lowest-|projection| bits —
    * a vector near a hyperplane could land on either side, so the bucket
    * differing only in that low-confidence bit is the likeliest home of
    * its missed neighbors (Lv et al.'s multi-probe LSH, single-bit
    * perturbations). Probing is QUERY-side only: the corpus keeps one
    * bucket per table, so the index doesn't grow — only the probe join
    * fans out, by exactly `probes`.
    */
  def srpProbeKeys(v: Column, planes: Seq[Array[Double]], probes: Int): Column = {
    val base = srpKey(v, planes) // single source of truth for the bucket key
    if (probes <= 1) array(base)
    else {
      // (|proj|, bitmask) per bit, sorted by margin asc (struct sort uses
      // the first field; ties break on the mask, deterministically)
      val flips = planes.zipWithIndex.map { case (pl, i) =>
        struct(abs(dot(v, typedlit(pl.toSeq))).as("m"), lit(1L << i).as("mask"))
      }
      val lowMargin = slice(array_sort(array(flips: _*)), 1, probes - 1)
      concat(array(base),
        transform(lowMargin, f => base.bitwiseXOR(f.getField("mask"))))
    }
  }

  /** ANN cosine top-k via the OR-construction: `numTables` independent SRP
    * tables of `bitsPerTable` sign bits each; a corpus vector is a
    * candidate for a query if they collide in ANY table (union → distinct
    * pairs), then exact cosine re-ranks the candidates. One table of many
    * bits has vanishing recall on near-orthogonal (realistic) embeddings;
    * the OR of several short tables trades a bounded candidate blow-up for
    * recall — the standard LSH tuning dial.
    *
    * Scale shape: the explode carries only (id, table, bucket) — 16 bytes
    * a row, never the vectors; candidate pairs are distinct-ed BEFORE the
    * vectors are joined back for scoring, so the heavy payload join is
    * proportional to candidates, not collisions. Queries whose buckets are
    * under-filled return fewer than k rows (multi-probe fills them at
    * scale).
    */
  /** IVF (inverted-file) ANN — the second standard scale path next to
    * SRP-LSH: a k-means coarse quantizer partitions the corpus into
    * `numCells` cells; each query exact-scores only the vectors of its
    * `nprobe` nearest cells. Recall/cost dial: nprobe/numCells.
    *
    * Scale shape: centroids are tiny (numCells × dims) and BROADCAST to
    * both assignment joins — the corpus shuffles once on `cell` (the
    * inverted file, bucketed/partitioned by cell on disk in a real
    * deployment), and the probe join is an equi-join on `cell`, so cost is
    * Σ probed-cell sizes, never |Q|·|corpus|. Training runs on a sample
    * at 100 TB (k-means only needs a representative subsample); the model
    * is deterministic under a fixed seed.
    */
  /** Deterministic, ABSOLUTELY-bounded training sample: ~`target` rows by
    * id-hash threshold, regardless of corpus size. A ratio sample (1 in
    * `mod` by hash) is representative but unbounded in the 100 TB limit —
    * the driver-side collects that train the quantizers would OOM. Here
    * the keep-threshold is derived from one cheap `count()` (a
    * shuffle-free columnar scan): keep rows whose 62-bit id hash falls
    * below 2⁶²·target/n, so the expected sample size is `target` with
    * binomial concentration (±few % at target ≥ 4096) AT ANY CORPUS SIZE.
    * Hash selection (not limit/prefix) keeps the sample spread across the
    * corpus — a prefix would train on whichever partitions scan first,
    * skewing centroids on clustered data — and makes it reproducible
    * under any partitioning. A corpus at or under `target` passes through
    * whole.
    */
  def boundedSample(df: DataFrame, idCol: String, target: Long): DataFrame = {
    require(target > 0, s"sample target must be positive, got $target")
    val n = df.count()
    if (n <= target) df
    else {
      val mod = 1L << 62
      val keep = (BigInt(mod) * target / n).toLong max 1L
      df.filter(pmod(xxhash64(col(idCol)), lit(mod)) < lit(keep))
    }
  }

  def ivfTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, k: Int, numCells: Int = 16, nprobe: Int = 4,
      seed: Long = 42L, sampleTarget: Int = 4096): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val cPrep = prepared(corpus, vecCol, idCol)
    val qPrep = prepared(queries, vecCol, idCol)
    // k-means needs a REPRESENTATIVE subsample, never the whole corpus:
    // ~sampleTarget rows by id-hash threshold (see boundedSample — capped
    // at any scale, deterministic, spread across the corpus).
    val hashSample = boundedSample(cPrep, idCol, sampleTarget.toLong)
    // a tiny corpus/target can still sample below numCells, which would
    // fail deep inside MLlib — fall back to training on the full corpus
    // there; the sample only matters when the corpus is large anyway
    val trainSample =
      if (hashSample.limit(numCells).count() < numCells) cPrep else hashSample
    val model = new KMeans().setK(numCells).setSeed(seed).setMaxIter(10)
      .setFeaturesCol("fv").setPredictionCol("cell")
      .fit(trainSample.select(array_to_vector(col("v")).as("fv")))
    // Cell assignment is MAP-SIDE on both sides — the centroids live in
    // the plan as literals (they are numCells × dims doubles), so neither
    // side shuffles or expands for assignment; the only shuffle is the
    // probe equi-join on `cell`.
    // Corpus: the fitted model's own transform (one narrow pass).
    val corpusCells = model
      .transform(cPrep.withColumn("fv", array_to_vector(col("v"))))
      .select(col(idCol).as("id_b"), col("cell"), col("v").as("v_b"), col("nrm").as("n_b"))
    // Queries: nprobe nearest cells via a literal-centroid distance array,
    // sorted per row (struct sort: distance asc, cell asc). ||v||² is
    // constant per row and cannot change the ranking; ||c||² is computed
    // once per centroid on the driver.
    val probeEntries = model.clusterCenters.map(_.toArray).zipWithIndex.map { case (c, i) =>
      struct(
        (lit(c.map(x => x * x).sum) - lit(2d) * dot(col("v"), typedlit(c.toSeq))).as("cd"),
        lit(i).as("cell"))
    }
    val qCells = qPrep
      .select(col(idCol).as("id_a"), col("v").as("v_a"), col("nrm").as("n_a"),
        explode(slice(array_sort(array(probeEntries.toSeq: _*)), 1, nprobe)).as("probe"))
      .withColumn("cell", col("probe.cell"))
      .drop("probe")
    val w = Window.partitionBy(col("id_a")).orderBy(col("cos").desc, col("id_b").asc)
    qCells.join(corpusCells, Seq("cell"))
      .filter(col("id_a") =!= col("id_b"))
      .withColumn("cos", dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("id_a"), col("rk"), col("id_b"), col("cos"))
  }

  /** Product-quantization codebooks: split the `dims`-dim space into `m`
    * subspaces of dims/m dims and k-means each to `ksub` centroids. A
    * vector encodes to m sub-codes — m bytes (ksub ≤ 256) instead of
    * 8·dims, the 64× compression that lets candidate scoring at 100 TB
    * move codes instead of vectors. Returns codebooks(j)(c) = centroid c
    * of subspace j.
    *
    * Training is DRIVER-LOCAL Lloyd's over the collected sample — by
    * design, not as a shortcut: PQ training only ever sees a bounded
    * sample (that is what makes it train at 100 TB), and m × ksub
    * cluster jobs through a distributed k-means cost m × iterations in
    * job-launch overhead alone (measured: 16 MLlib fits ≈ 15 s of
    * scheduling for <1 ms of arithmetic each). The collect is the same
    * bounded sample the coarse quantizer already trains on; rows are
    * sorted by `idCol` so the codebooks are reproducible regardless of
    * partitioning.
    */
  def trainPq(sample: DataFrame, idCol: String, dims: Int, m: Int, ksub: Int,
      seed: Long): Seq[Array[Array[Double]]] = {
    require(dims % m == 0, s"dims=$dims must be divisible by m=$m")
    val sub = dims / m
    // bounded driver-side collect: the hash-sampled training set
    val pts = sample.select(col(idCol), col("v")).orderBy(col(idCol))
      .collect().map(_.getSeq[Double](1).toArray)
    val rnd = new scala.util.Random(seed)
    (0 until m).map { j =>
      val data = pts.map(p => java.util.Arrays.copyOfRange(p, j * sub, (j + 1) * sub))
      val k = math.min(ksub, data.length)
      // seeded-random distinct starting points (k-means++ slots in here)
      var cents = rnd.shuffle(data.indices.toVector).take(k).map(data).toArray
      for (_ <- 0 until 10) {
        val sums = Array.fill(k, sub)(0d); val cnts = Array.fill(k)(0L)
        data.foreach { p =>
          var best = 0; var bd = Double.MaxValue
          var c = 0
          while (c < k) {
            var d = 0d; var i = 0
            while (i < sub) { val t = p(i) - cents(c)(i); d += t * t; i += 1 }
            if (d < bd) { bd = d; best = c }
            c += 1
          }
          var i = 0
          while (i < sub) { sums(best)(i) += p(i); i += 1 }
          cnts(best) += 1
        }
        cents = Array.tabulate(k)(c =>
          if (cnts(c) == 0) cents(c) // empty cluster keeps its centroid
          else sums(c).map(_ / cnts(c)))
      }
      cents
    }
  }

  /** Encode a vector into its m PQ codes: per subspace, the centroid
    * minimizing ‖v_j − c‖² = argmin(‖c‖² − 2·v_j·c). Encoding is
    * map-side (nothing shuffles), and each subspace is ONE `transform`
    * over the codebook as a literal nested-array — not ksub separate
    * expression nodes, which at m×ksub = 1024 made the plan itself the
    * bottleneck (measured ~2× on the full entry). Ties take the first
    * (lowest) code via array_position's first-match rule.
    */
  def pqCodesCol(v: Column, codebooks: Seq[Array[Array[Double]]]): Column = {
    val sub = codebooks.head.head.length
    array(codebooks.zipWithIndex.map { case (cb, j) =>
      val vj = slice(v, j * sub + 1, sub)
      val d = transform(typedlit(cb.map(_.toSeq).toSeq),
        c => dot(c, c) - lit(2d) * dot(vj, c))
      (array_position(d, array_min(d)) - 1).cast("int")
    }: _*)
  }

  /** Per-query ADC lookup table: lut(j)(c) = q_j · codebook(j)(c), built
    * once per query row (one transform per subspace over the literal
    * codebook).
    */
  def pqLutCol(v: Column, codebooks: Seq[Array[Array[Double]]]): Column = {
    val sub = codebooks.head.head.length
    array(codebooks.zipWithIndex.map { case (cb, j) =>
      val vj = slice(v, j * sub + 1, sub)
      transform(typedlit(cb.map(_.toSeq).toSeq), c => dot(vj, c))
    }: _*)
  }

  /** Asymmetric-distance score: Σ_j lut(j)(codes(j)) ≈ q · v. Exactly
    * q · reconstruct(codes) — the ADC identity SimilaritySpec pins.
    */
  def adcScore(lut: Column, codes: Column, m: Int): Column =
    (0 until m).map(j =>
      element_at(element_at(lut, j + 1), element_at(codes, j + 1) + 1))
      .reduce(_ + _)

  /** IVF-PQ — the composition that runs vector search at extreme scale
    * (the standard inverted-file + product-quantization architecture,
    * here expressed as Spark relational ops): the IVF coarse quantizer
    * prunes the corpus to `nprobe` of `numCells` cells; candidates in
    * probed cells are scored from their m-byte PQ codes via a per-query
    * ADC lookup table (the vectors themselves stay out of the scoring
    * join entirely); only the top `rerank` approximate hits per query
    * re-rank at full precision.
    *
    * Scale shape: the scoring join moves (id, cell, m codes, norm) ≈
    * 8+8+m+8 bytes a row vs 8·dims+16 for exact IVF — at dims=64/m=16 a
    * ~13× reduction in the bytes that ride the probe join, on top of
    * IVF's cell pruning.
    *
    * PQ quantizes RESIDUALS (v − centroid(cell)), the FAISS IVFADC
    * refinement: residuals are clustered near the origin with far less
    * spread than raw vectors, so the same m×ksub code budget spends its
    * precision on the part of v the coarse quantizer did NOT already
    * explain. The approximate score becomes q·v ≈ q·centroid(cell) +
    * ADC(lut, codes): the first term is EXACT and computed once per
    * (query, probed cell) — it already falls out of the probe ranking —
    * and only the residual rides the lossy codes. Same train/encode/LUT
    * shape, better recall at the same byte budget.
    */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, k: Int, numCells: Int = 16, nprobe: Int = 4,
      m: Int = 16, ksub: Int = 64, seed: Long = 42L, sampleTarget: Int = 4096,
      rerank: Int = 40, dims: Int = 64,
      nprobeMax: Int = 0, adaptiveBand: Double = 0.25): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val cPrep = prepared(corpus, vecCol, idCol)
    val qPrep = prepared(queries, vecCol, idCol)
    // same capped deterministic hash-sample + small-corpus fallback as
    // ivfTopK — and the absolute bound is what makes trainPq's driver
    // collect O(sampleTarget) at any corpus size
    val hashSample = boundedSample(cPrep, idCol, sampleTarget.toLong)
    val trainSample =
      if (hashSample.limit(math.max(numCells, ksub)).count() < math.max(numCells, ksub)) cPrep
      else hashSample
    // clamp k to the sample size — a tiny corpus must degrade (fewer
    // cells / a smaller codebook), not crash inside KMeans.fit
    val trainN = trainSample.count().toInt
    val cellsEff = math.max(1, math.min(numCells, trainN))
    val ksubEff = math.max(1, math.min(ksub, trainN))
    val coarse = new KMeans().setK(cellsEff).setSeed(seed).setMaxIter(10)
      .setFeaturesCol("fv").setPredictionCol("cell")
      .fit(trainSample.select(array_to_vector(col("v")).as("fv")))
    // residual of v in its cell: v − centroid(cell), via the centroid
    // table as ONE literal nested array (numCells × dims doubles living
    // in the plan — map-side, nothing shuffles for the subtraction)
    val centLit = typedlit(coarse.clusterCenters.map(_.toArray.toSeq).toSeq)
    def residual(v: Column, cell: Column): Column =
      zip_with(v, element_at(centLit, cell + 1), (a, b) => a - b)
    // PQ codebooks train on the SAMPLE's residuals (same bounded sample
    // the coarse quantizer trained on, assigned + residualized map-side)
    val sampleRes = coarse
      .transform(trainSample.withColumn("fv", array_to_vector(col("v"))))
      .select(col(idCol), residual(col("v"), col("cell")).as("v"))
    val codebooks = trainPq(sampleRes, idCol, dims, m, ksubEff, seed + 1000)
    // corpus index rows: (id, cell, residual codes, norm) — NO vectors.
    // The residual is PROJECTED into a bound column before pqCodesCol
    // references it: the encode expression slices its input inside a
    // per-codebook-entry lambda (m × ksub references), and an inlined
    // zip_with would re-evaluate per reference — measured ~2× on the
    // whole entry (the TextOps materialized-tokens contract again).
    // Referenced m times, the alias is non-cheap, so CollapseProject
    // keeps the boundary.
    val corpusCodes = coarse
      .transform(cPrep.withColumn("fv", array_to_vector(col("v"))))
      .select(col(idCol).as("id_b"), col("cell"), col("nrm").as("n_b"),
        residual(col("v"), col("cell")).as("vres"))
      .select(col("id_b"), col("cell"),
        pqCodesCol(col("vres"), codebooks).as("codes"), col("n_b"))
    // probe entries rank cells by ‖q − c‖² ~ ‖c‖² − 2·q·c and carry q·c,
    // the exact half of the residual score q·v ≈ q·c + q·residual
    val probeEntries = coarse.clusterCenters.map(_.toArray).zipWithIndex.map { case (c, i) =>
      val qc = dot(col("v"), typedlit(c.toSeq))
      struct(
        (lit(c.map(x => x * x).sum) - lit(2d) * qc).as("cd"),
        lit(i).as("cell"), qc.as("qc"))
    }
    // query rows carry the LUT + per-cell q·c, not the vector.
    // ADAPTIVE NPROBE (nprobeMax > nprobe): beyond the base nprobe
    // cells, probe an extra cell only while its centroid distance sits
    // within `adaptiveBand` of the query's own distance SPREAD
    // (cd ≤ cd_best + band·(cd_worst − cd_best)) — a query near a cell
    // boundary fans out, an interior query stays cheap. This is the
    // recall lever past the fixed-nprobe ceiling (round-11 verdict #8):
    // misses concentrate on boundary queries, exactly the ones the
    // band admits more cells for, while the EXPECTED probe count stays
    // near the base.
    val sortedProbes = array_sort(array(probeEntries.toSeq: _*))
    val probeSel =
      if (nprobeMax <= nprobe)
        slice(sortedProbes, 1, nprobe)
      else {
        val best = element_at(sortedProbes, 1).getField("cd")
        val worst = element_at(sortedProbes, size(sortedProbes)).getField("cd")
        val thresh = best + lit(adaptiveBand) * (worst - best)
        concat(
          slice(sortedProbes, 1, nprobe),
          org.apache.spark.sql.functions.filter(
            slice(sortedProbes, nprobe + 1, nprobeMax - nprobe),
            p => p.getField("cd") <= thresh))
      }
    val qCells = qPrep
      .select(col(idCol).as("id_a"), col("nrm").as("n_a"),
        pqLutCol(col("v"), codebooks).as("lut"),
        explode(probeSel).as("probe"))
      .withColumn("cell", col("probe.cell"))
      .withColumn("qc", col("probe.qc"))
      .drop("probe")
    val wApprox = Window.partitionBy(col("id_a"))
      .orderBy(col("approx").desc, col("id_b").asc)
    val shortList = qCells.join(corpusCodes, Seq("cell"))
      .filter(col("id_a") =!= col("id_b"))
      .withColumn("approx",
        (col("qc") + adcScore(col("lut"), col("codes"), m)) / (col("n_a") * col("n_b")))
      .withColumn("ark", row_number().over(wApprox))
      .filter(col("ark") <= rerank)
      .select(col("id_a"), col("id_b"))
    val w = Window.partitionBy(col("id_a")).orderBy(col("cos").desc, col("id_b").asc)
    shortList
      .join(qPrep.select(col(idCol).as("id_a"), col("v").as("v_a"), col("nrm").as("n_a")), Seq("id_a"))
      .join(cPrep.select(col(idCol).as("id_b"), col("v").as("v_b"), col("nrm").as("n_b")), Seq("id_b"))
      .withColumn("cos", dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("id_a"), col("rk"), col("id_b"), col("cos"))
  }

  /** Driver-checkable ANN verification: the EXACT top-k rows (which a SQL
    * oracle can reproduce) plus `recall_ok` — true iff `ann` recovered at
    * least `minRecall` of the exact (id_a, id_b) pairs, computed in-query.
    * The oracle emits the exact rows and literal TRUE, so an ANN recall
    * regression flips every row's hash red at the driver instead of hiding
    * behind a rows-only check. The flag is a 1-row broadcast cross join —
    * no data-path cost beyond the two ANN/exact runs it compares.
    */
  def recallChecked(exact: DataFrame, ann: DataFrame, minRecall: Double): DataFrame = {
    val pairs = exact.select(col("id_a"), col("id_b"))
    val hits = pairs
      .join(ann.select(col("id_a"), col("id_b")), Seq("id_a", "id_b"), "left_semi")
      .agg(count(lit(1)).cast("double").as("hits"))
    val tot = pairs.agg(count(lit(1)).cast("double").as("tot"))
    val flag = hits.crossJoin(tot)
      .select((col("hits") >= col("tot") * lit(minRecall)).as("recall_ok"))
    exact.crossJoin(broadcast(flag))
  }

  /** Symmetric int8 scalar quantization of a (double-promoted) embedding
    * array — the standard memory lever for vector search at 100 TB: 4×
    * smaller than float32, so IVF/SRP candidate scoring reads quantized
    * vectors and only the short list re-ranks at full precision.
    * `scale` = max|x| per vector; q_i = floor(x_i/scale·127 + 0.5) — the
    * EXPLICIT half-up formula, because engines disagree on round()'s
    * half rule while floor(+0.5) is bit-identical everywhere the doubles
    * are. Zero vectors quantize to all zeros.
    */
  def quantScale(v: Column): Column = array_max(transform(v, x => abs(x)))

  def quantizeInt8(v: Column, scale: Column): Column =
    transform(v, x =>
      when(scale > 0d, floor(x / scale * lit(127d) + lit(0.5d)).cast("int"))
        .otherwise(lit(0)))

  /** SRP candidate pairs (id_a, id_b), distinct — shared by the
    * full-precision and quantized scoring paths. Corpus: one bucket per
    * table. Queries: `probes` buckets per table (base + lowest-margin
    * single-bit flips) — fills under-k results from under-populated
    * buckets without growing the corpus index.
    */
  private def srpCandidates(cPrep: DataFrame, qPrep: DataFrame, idCol: String,
      numTables: Int, bitsPerTable: Int, dims: Int, probes: Int): DataFrame = {
    val tables = (0 until numTables).map { t =>
      (t, (0 until bitsPerTable).map(b => hyperplane(t * bitsPerTable + b, dims)))
    }
    def keyed(df: DataFrame, id: String, nProbes: Int): DataFrame = {
      val keys = tables.map { case (t, planes) =>
        transform(srpProbeKeys(col("v"), planes, nProbes),
          bk => struct(lit(t).as("tbl"), bk.as("bk")))
      }
      df.select(col(id), explode(concat(keys: _*)).as("tk"))
    }
    keyed(qPrep.select(col(idCol).as("id_a"), col("v")), "id_a", probes)
      .join(keyed(cPrep.select(col(idCol).as("id_b"), col("v")), "id_b", 1), Seq("tk"))
      .filter(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
  }

  def srpTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, k: Int, numTables: Int = 8, bitsPerTable: Int = 4,
      dims: Int = 64, probes: Int = 1): DataFrame = {
    val cPrep = prepared(corpus, vecCol, idCol)
    val qPrep = prepared(queries, vecCol, idCol)
    val cand = srpCandidates(cPrep, qPrep, idCol, numTables, bitsPerTable, dims, probes)
    val w = Window.partitionBy(col("id_a")).orderBy(col("cos").desc, col("id_b").asc)
    cand
      .join(qPrep.select(col(idCol).as("id_a"), col("v").as("v_a"), col("nrm").as("n_a")), Seq("id_a"))
      .join(cPrep.select(col(idCol).as("id_b"), col("v").as("v_b"), col("nrm").as("n_b")), Seq("id_b"))
      .withColumn("cos", dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("id_a"), col("rk"), col("id_b"), col("cos"))
  }

  /** SRP ANN with QUANTIZED candidate scoring: candidates are scored on
    * int8 vectors (exact integer dot products over the 4×-smaller
    * representation — at scale that is what lives in memory / rides the
    * shuffle), then only the top `rerank` per query re-rank at full
    * precision. With `rerank` ≥ the candidate count this returns exactly
    * `srpTopK`'s answer (pinned in SimilaritySpec); with a short list it
    * trades a little recall for reading 8× fewer vector bytes in the
    * scoring join. Approx ranking key: (q_a·q_b)·s_a·s_b / (n_a·n_b) —
    * monotone in the dequantized cosine for each pair.
    */
  def srpTopKQuantized(corpus: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, k: Int, numTables: Int = 8, bitsPerTable: Int = 4,
      dims: Int = 64, probes: Int = 1, rerank: Int = 20): DataFrame = {
    def quantized(prep: DataFrame, suffix: String): DataFrame =
      prep.withColumn("scale", quantScale(col("v")))
        .select(col(idCol).as(s"id_$suffix"),
          quantizeInt8(col("v"), col("scale")).as(s"q_$suffix"),
          col("scale").as(s"s_$suffix"), col("nrm").as(s"n_$suffix"))
    val cPrep = prepared(corpus, vecCol, idCol)
    val qPrep = prepared(queries, vecCol, idCol)
    val cand = srpCandidates(cPrep, qPrep, idCol, numTables, bitsPerTable, dims, probes)
    val qdot = aggregate(
      zip_with(col("q_a"), col("q_b"), (x, y) => (x * y).cast("long")),
      lit(0L), (acc, x) => acc + x)
    val wApprox = Window.partitionBy(col("id_a"))
      .orderBy(col("approx").desc, col("id_b").asc)
    val shortList = cand
      .join(quantized(qPrep, "a"), Seq("id_a"))
      .join(quantized(cPrep, "b"), Seq("id_b"))
      .withColumn("approx",
        qdot.cast("double") * col("s_a") * col("s_b") / (col("n_a") * col("n_b")))
      .withColumn("ark", row_number().over(wApprox))
      .filter(col("ark") <= rerank)
      .select(col("id_a"), col("id_b"))
    val w = Window.partitionBy(col("id_a")).orderBy(col("cos").desc, col("id_b").asc)
    shortList
      .join(qPrep.select(col(idCol).as("id_a"), col("v").as("v_a"), col("nrm").as("n_a")), Seq("id_a"))
      .join(cPrep.select(col(idCol).as("id_b"), col("v").as("v_b"), col("nrm").as("n_b")), Seq("id_b"))
      .withColumn("cos", dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("id_a"), col("rk"), col("id_b"), col("cos"))
  }
}
