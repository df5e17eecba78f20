package graft

import graft.llm.{Multimodal, Similarity}
import org.apache.spark.sql.functions._

/** ANN recall vs brute force + multimodal plumbing determinism. */
class SimilaritySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // Shared recall harness: one brute-force baseline, each ANN path
  // measured against it with the same pair extraction and threshold.
  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private lazy val (embDf, queryDf) = {
    import spark.implicits._
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    (emb, emb.filter($"vec_id" % 5 === 0))
  }
  private lazy val brutePairs =
    pairs(Similarity.bruteTopK(embDf, queryDf, "embedding", "vec_id", 5))

  private def assertRecall(name: String, ann: org.apache.spark.sql.DataFrame): Unit = {
    val hit = (brutePairs & pairs(ann)).size
    val recall = hit.toDouble / brutePairs.size
    assert(recall > 0.5, s"$name recall@5 was $recall (brute=${brutePairs.size}, hit=$hit)")
  }

  test("srpTopK recall@5 vs bruteTopK is usable (> 0.5 on real embeddings)") {
    assertRecall("SRP", Similarity.srpTopK(embDf, queryDf, "embedding", "vec_id", 5))
  }

  test("ivfTopK recall@5 vs bruteTopK is usable (> 0.5 on real embeddings)") {
    assertRecall("IVF", Similarity.ivfTopK(embDf, queryDf, "embedding", "vec_id", 5))
  }

  test("ivfPqTopK recall@5 vs bruteTopK is usable (> 0.5 on real embeddings)") {
    assertRecall("IVF-PQ",
      Similarity.ivfPqTopK(embDf, queryDf, "embedding", "vec_id", 5))
  }

  test("PQ ADC identity: LUT-summed score equals dot(query, reconstructed vector)") {
    import spark.implicits._
    val dims = 8; val m = 4; val ksub = 4
    val vecs = (1 to 40)
      .map(i => (i.toLong, Array.tabulate(dims)(d => math.sin(i * 31 + d * 7))))
      .toDF("id", "v")
    val cbs = Similarity.trainPq(vecs, "id", dims, m, ksub, seed = 1L)
    val q = Array.tabulate(dims)(d => math.cos(d * 3 + 1))
    val scored = vecs.select($"id",
        Similarity.pqCodesCol($"v", cbs).as("codes"),
        Similarity.adcScore(
          Similarity.pqLutCol(typedlit(q.toSeq), cbs),
          Similarity.pqCodesCol($"v", cbs), m).as("adc"))
      .collect()
    assert(scored.length == 40)
    scored.foreach { r =>
      val codes = r.getSeq[Int](1)
      val recon = (0 until m).flatMap(j => cbs(j)(codes(j)))
      val direct = recon.zip(q).map { case (a, b) => a * b }.sum
      assert(math.abs(r.getDouble(2) - direct) < 1e-9,
        s"id=${r.getLong(0)}: adc=${r.getDouble(2)} direct=$direct")
    }
  }

  test("ivfTopK falls back to full-corpus training when the hash sample is too small") {
    // a target of 1 row samples far below numCells; the guard must fall
    // back to full-corpus training instead of crashing inside KMeans.fit
    val ann = Similarity.ivfTopK(embDf, queryDf, "embedding", "vec_id", 5,
      sampleTarget = 1)
    assert(ann.count() > 0)
  }

  test("boundedSample: ~target rows at ANY corpus size, deterministic, pass-through when small") {
    import spark.implicits._
    // corpus 20× the target: the ratio design this replaces would keep
    // 1/mod of it (unbounded as the corpus grows); the capped design must
    // stay ~target — this is what bounds trainPq's driver collect
    val target = 200L
    val corpus = spark.range(0, 20 * target).select($"id".as("vec_id"))
    val n1 = Similarity.boundedSample(corpus, "vec_id", target).count()
    assert(n1 <= 2 * target, s"sample $n1 must stay near target=$target (got >2x)")
    assert(n1 >= target / 2, s"sample $n1 collapsed far below target=$target")
    // deterministic: same corpus → the same rows, not just the same count
    val s1 = Similarity.boundedSample(corpus, "vec_id", target)
      .collect().map(_.getLong(0)).sorted.toSeq
    val s2 = Similarity.boundedSample(corpus.repartition(7), "vec_id", target)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(s1 == s2, "hash-threshold sample must not depend on partitioning")
    // growing the corpus 5× must NOT grow the sample 5× (the ratio bug)
    val n5 = Similarity.boundedSample(
      spark.range(0, 100 * target).select($"id".as("vec_id")), "vec_id", target).count()
    assert(n5 <= 2 * target, s"5x corpus leaked into the sample: $n5")
    // at-or-under target passes through whole (small-corpus correctness)
    val tiny = spark.range(0, 50).select($"id".as("vec_id"))
    assert(Similarity.boundedSample(tiny, "vec_id", target).count() == 50)
  }

  test("srp multi-probe improves recall at equal table count, never hurts it") {
    def recallAt(probes: Int): (Double, Long) = {
      val ann = Similarity.srpTopK(embDf, queryDf, "embedding", "vec_id", 5,
        probes = probes)
      val p = pairs(ann)
      ((brutePairs & p).size.toDouble / brutePairs.size, ann.count())
    }
    val (r1, n1) = recallAt(1)
    val (r3, n3) = recallAt(3)
    // probe candidates are a superset of the base candidates and the
    // re-rank is exact cosine, so recall is monotone in probes
    assert(r3 >= r1, s"multi-probe recall regressed: probes=3 $r3 < probes=1 $r1")
    assert(n3 >= n1, s"multi-probe must fill under-k result sets: $n3 < $n1")
    assert(r3 > r1 || n3 > n1,
      s"probes=3 should change SOMETHING on this corpus (r $r1->$r3, n $n1->$n3)")
  }

  test("quantized SRP scoring: full rerank reproduces srpTopK exactly; short list stays usable") {
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Int, Long)] =
      df.select("id_a", "rk", "id_b").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq.sorted
    // rerank ≥ any candidate count ⇒ the quantized pass only reorders the
    // SHORT-LIST selection, and the exact re-rank must equal srpTopK
    val full = rows(Similarity.srpTopK(embDf, queryDf, "embedding", "vec_id", 5))
    val quantFull = rows(Similarity.srpTopKQuantized(
      embDf, queryDf, "embedding", "vec_id", 5, rerank = 1000000))
    assert(quantFull == full, "int8 scoring with full rerank must be exact")
    // a tight short list still clears the recall floor
    assertRecall("SRPq", Similarity.srpTopKQuantized(
      embDf, queryDf, "embedding", "vec_id", 5, rerank = 20))
  }

  test("srp bucket key is deterministic and scale-invariant-ish (sign based)") {
    import spark.implicits._
    val planes = (0 until 8).map(Similarity.hyperplane(_, 4))
    val df = Seq(
      (1L, Array(1.0f, 2.0f, -1.0f, 0.5f)),
      (2L, Array(2.0f, 4.0f, -2.0f, 1.0f)), // 2x scale: same signs
      (3L, Array(-1.0f, -2.0f, 1.0f, -0.5f))).toDF("id", "v")
    val keys = df.select($"id",
        Similarity.srpKey(transform($"v", x => x.cast("double")), planes).as("k"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(keys(1L) == keys(2L), "positive scaling preserves all projections' signs")
    assert(keys(1L) != keys(3L), "negation flips every non-zero sign")
  }

  test("multimodal: imageFeatures recovers exact pixel sums through png AND bmp codecs") {
    import spark.implicits._
    val ids = Seq(3L, 8L) // one bmp-shaped id, one png-shaped id
    val fmt = (id: Long) => if (id % 2 == 0) "png" else "bmp"
    val packed = ids.map { id =>
      (id, Multimodal.encodeImage(5, 4, fmt(id),
        (x, y) => Multimodal.fixturePixel(id, x, y)))
    }.toDF("doc_id", "content").repartition(2)
    val feats = Multimodal.imageFeatures(packed, "doc_id")
      .collect().map(r => r.getLong(0) -> r).toMap
    for (id <- ids) {
      // expectations straight from the pixel formula — decode is checked
      // against arithmetic, not against another ImageIO call
      val px = for { y <- 0 until 4; x <- 0 until 5 } yield Multimodal.fixturePixel(id, x, y)
      val r = feats(id)
      assert(r.getInt(1) == 5 && r.getInt(2) == 4, s"id $id dims")
      assert(r.getLong(3) == px.map(p => ((p >> 16) & 0xFF).toLong).sum, s"id $id r_sum")
      assert(r.getLong(4) == px.map(p => ((p >> 8) & 0xFF).toLong).sum, s"id $id g_sum")
      assert(r.getLong(5) == px.map(p => (p & 0xFF).toLong).sum, s"id $id b_sum")
      assert(r.getLong(6) == px.map(p => ((p >> 16) & 0xFF).toLong).map(v => v * v).sum,
        s"id $id rr_sum")
    }
  }

  test("videoFrames: exact luma stats per sampled frame; torn container -> null row") {
    import spark.implicits._
    def luma(f: Int, x: Int, y: Int): Int = (f * 50 + x * 3 + y * 7) % 256
    val good = Multimodal.encodeY4m(4, 4, 10, 1, 5, luma)
    // torn: drop the last byte — frame arithmetic no longer divides
    val torn = good.dropRight(1)
    // marker corruption: flip a byte inside the LAST frame's FRAME marker
    val frameSize = 6 + 4 * 4 + 2 * 2 * 2
    val badMarker = good.clone()
    badMarker(good.length - frameSize) = 'X'.toByte
    // overflow attack: a well-formed header whose W*H overflows 32-bit
    // frame-size arithmetic (65536*65536) — must degrade to the null row,
    // never ArithmeticException/ArrayIndexOutOfBounds in the frame walk
    val huge = ("YUV4MPEG2 W65536 H65536 F25:1\n" + "FRAME\n").getBytes("US-ASCII") ++
      Array.fill[Byte](64)(7)
    val packed = Seq((1L, good), (2L, torn), (3L, badMarker), (4L, huge))
      .toDF("doc_id", "content")
    val out = Multimodal.videoFrames(packed, "doc_id", nSamples = 2)
      .collect().groupBy(_.getLong(0))
    val g = out(1L).sortBy(_.getInt(5))
    assert(g.length == 2 && g(0).getInt(5) == 0 && g(1).getInt(5) == 2,
      "5 frames sampled at i*5/2 = {0, 2}")
    assert(g(0).getInt(3) == 5 && g(0).getLong(4) == 500L,
      "5 frames at 10 fps = 500 ms")
    val expect0 = (for { y <- 0 until 4; x <- 0 until 4 } yield luma(0, x, y).toLong).sum
    assert(g(0).getLong(6) == expect0, "frame-0 luma sum must match the formula")
    assert(out(2L).length == 1 && out(2L).head.isNullAt(1),
      "torn container must yield ONE null row, not garbage stats")
    assert(out(3L).length == 1 && out(3L).head.isNullAt(1),
      "a corrupted FRAME marker must be detected, not read past")
    assert(out(4L).length == 1 && out(4L).head.isNullAt(1),
      "overflowing W*H geometry must yield the null row, not a failed stage")
  }

  test("videoDHash + alignedNearDupPairs: per-frame hashes match the formula, " +
      "aligned slots only, corrupt -> null row") {
    import spark.implicits._
    // group 0: videos 0 (rep), 1 (one-pixel bump on every frame);
    // group 1: video 4 (different gradient). 4 frames, sample 2 ({0,2}).
    def luma(vid: Long)(f: Int, x: Int, y: Int): Int = {
      val gid = vid / 4
      val bump = if (vid % 4 != 0 && x == 3 && y == 2) 97L else 0L
      (((gid * 31 + f * 19 + x * 7 + y * 13) * 97 +
        gid * x * 53 + gid * y * 29 + f * x * 17 + f * y * 23 +
        bump) % 251).toInt
    }
    val packed = Seq(4L, 5L, 8L)
      .map(v => (v, Multimodal.encodeY4m(8, 8, 25, 1, 4, luma(v))))
      .toDF("vid_id", "content")
      .unionByName(Seq((9L, "junk".getBytes("UTF-8")))
        .toDF("vid_id", "content"))
    val fps = Multimodal.videoDHash(packed, "vid_id", nSamples = 2)
    val rows = fps.collect().groupBy(_.getLong(0))
    assert(rows(4L).length == 2 && rows(4L).forall(!_.isNullAt(2)))
    assert(rows(9L).length == 1 && rows(9L).head.isNullAt(2),
      "corrupt payload -> one null-hash row")
    // hash of (vid 4, sample 0) rebuilt from the formula: bit y*7+x =
    // L(x+1,y) > L(x,y) over frame 0
    val expect0 = {
      var h = 0L
      for (y <- 0 until 8; x <- 0 until 7)
        if (luma(4L)(0, x + 1, y) > luma(4L)(0, x, y)) h |= 1L << (y * 7 + x)
      h
    }
    val got0 = rows(4L).find(_.getInt(1) == 0).get.getLong(2)
    assert(got0 == expect0, s"frame-0 dHash must match the formula: " +
      s"got $got0 expect $expect0")
    // in-group pair (4,5) matches on BOTH aligned samples; cross-group
    // pairs do not survive minMatched=2 at maxHamming=4
    val pairs = graft.llm.Dedup.alignedNearDupPairs(fps, "id", "dhash",
      "sample_idx", bits = 56, maxHamming = 4, minMatched = 2).collect()
    assert(pairs.length == 1 &&
      pairs.head.getLong(0) == 4L && pairs.head.getLong(1) == 5L,
      s"exactly the in-group pair must qualify: ${pairs.mkString(",")}")
    assert(pairs.head.getLong(2) == 2L, "both sampled slots must match")
    // alignment law: the same hashes with DISTINCT slot values per video
    // (slot 0 vs slot 1 holding identical hashes) must NOT pair across
    // slots — rotate video 5's slots and the pair disappears
    val rotated = fps.withColumn("sample_idx",
      org.apache.spark.sql.functions.when($"id" === 5L,
        ($"sample_idx" + 1) % 2).otherwise($"sample_idx"))
    val rpairs = graft.llm.Dedup.alignedNearDupPairs(rotated, "id", "dhash",
      "sample_idx", bits = 56, maxHamming = 4, minMatched = 2).collect()
    assert(rpairs.isEmpty,
      "slot-rotated hashes must not match — the join is alignment-keyed")
  }

  test("aviMjpegFrames: container facts exact, solid-color decode within DC-quant bound, corruption -> null row") {
    import spark.implicits._
    // solid color per frame: every 8x8 DCT block is DC-only, so JPEG
    // decode recovers a uniform value within the DC quantization step
    def color(f: Int): (Int, Int, Int) = (32 + f * 40, 64 + f * 30, 96 + f * 20)
    def avi(nFrames: Int): Array[Byte] =
      Multimodal.encodeAviMjpeg(16, 16, 40000, (0 until nFrames).map { f =>
        val (r, g, b) = color(f)
        Multimodal.encodeJpeg(16, 16, 0.9f, (_, _) => (r << 16) | (g << 8) | b)
      })
    val good = avi(4)
    val torn = good.dropRight(8) // last movi chunk now runs past the payload
    // frame-count lie: avih says 4 frames, movi carries 3
    val lying = Multimodal.encodeAviMjpeg(16, 16, 40000, (0 until 3).map { f =>
      val (r, g, b) = color(f)
      Multimodal.encodeJpeg(16, 16, 0.9f, (_, _) => (r << 16) | (g << 8) | b)
    })
    lying(java.nio.ByteBuffer.wrap(lying).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .position(0).array().indexOfSlice("avih".getBytes("US-ASCII")) + 8 + 16) = 4
    val packed = Seq((1L, good), (2L, torn), (3L, lying),
        (4L, "not an avi".getBytes("UTF-8")))
      .toDF("doc_id", "content")
    val out = Multimodal.aviMjpegFrames(packed, "doc_id", nSamples = 2)
      .collect().groupBy(_.getLong(0))
    val g = out(1L).sortBy(_.getInt(5))
    assert(g.length == 2 && g.map(_.getInt(5)).toSeq == Seq(0, 2),
      "2 evenly-sampled frames of 4: indices 0 and 2")
    g.foreach { row =>
      assert(row.getInt(1) == 16 && row.getInt(2) == 16 && row.getInt(3) == 4)
      assert(row.getLong(4) == 160L, "4 frames x 40ms")
      val (er, eg, eb) = color(row.getInt(5))
      val n = 16 * 16
      assert(math.abs(row.getLong(6) / n.toDouble - er) <= 4.0 &&
        math.abs(row.getLong(7) / n.toDouble - eg) <= 4.0 &&
        math.abs(row.getLong(8) / n.toDouble - eb) <= 4.0,
        s"decoded means (${row.getLong(6) / n.toDouble}, ${row.getLong(7) / n.toDouble}, " +
          s"${row.getLong(8) / n.toDouble}) vs ($er, $eg, $eb)")
    }
    Seq(2L, 3L, 4L).foreach { id =>
      assert(out(id).length == 1 && out(id).head.isNullAt(1),
        s"payload $id must degrade to ONE null row")
    }
  }

  test("multimodal: corrupt/truncated/null payloads yield null features; null id drops") {
    import spark.implicits._
    val good = Multimodal.encodeImage(2, 2, "png", (_, _) => 0x010203)
    val df = Seq(
      (java.lang.Long.valueOf(1L), "junk, not an image".getBytes("UTF-8")),
      (java.lang.Long.valueOf(2L), good.take(good.length / 2)), // truncated mid-stream
      (java.lang.Long.valueOf(3L), null: Array[Byte]),
      (null: java.lang.Long, good),
      (java.lang.Long.valueOf(5L), good)).toDF("doc_id", "content")
    val out = Multimodal.imageFeatures(df, "doc_id").collect()
    assert(out.length == 4, "null-id row must drop")
    val byId = out.map(r => r.getLong(0) -> r).toMap
    for (id <- Seq(1L, 2L, 3L))
      assert(byId(id).isNullAt(1), s"id $id must be a null-feature row")
    assert(byId(5L).getInt(1) == 2 && byId(5L).getLong(3) == 4L) // 4 px of r=1
  }

  test("resizeImages: real decode→scale→re-encode; solid colors are exact, corrupt stays null") {
    import spark.implicits._
    val solid = Multimodal.encodeImage(8, 8, "png", (_, _) => 0x204060)
    val df = Seq(
      (1L, solid),
      (2L, "not an image".getBytes("UTF-8"))).toDF("doc_id", "content")
    val resized = Multimodal.resizeImages(df, "doc_id", 4, 4, "png")
    val feats = Multimodal.imageFeatures(
      resized.select($"id".as("doc_id"), $"content"), "doc_id")
      .collect().map(r => r.getLong(0) -> r).toMap
    // bilinear over a constant field is that constant: sums are exact
    assert(feats(1L).getInt(1) == 4 && feats(1L).getInt(2) == 4)
    assert(feats(1L).getLong(3) == 16L * 0x20)
    assert(feats(1L).getLong(4) == 16L * 0x40)
    assert(feats(1L).getLong(5) == 16L * 0x60)
    assert(feats(2L).isNullAt(1), "corrupt payload must stay a null row through resize")
    // identity resize preserves even a NON-constant image exactly
    // (drawImage at source dims is a pixel copy)
    val patterned = Multimodal.encodeImage(5, 4, "png",
      (x, y) => Multimodal.fixturePixel(9L, x, y))
    val ident = Multimodal.resizeImages(
      Seq((3L, patterned)).toDF("doc_id", "content"), "doc_id", 5, 4, "png")
    val f0 = Multimodal.imageFeatures(
      Seq((3L, patterned)).toDF("doc_id", "content"), "doc_id").head()
    val f1 = Multimodal.imageFeatures(
      ident.select($"id".as("doc_id"), $"content"), "doc_id").head()
    assert(f0.getLong(3) == f1.getLong(3) && f0.getLong(4) == f1.getLong(4) &&
      f0.getLong(5) == f1.getLong(5))
  }

  test("audioFeatures: WAV PCM round-trip recovers exact amplitude stats; junk is null") {
    import spark.implicits._
    val samples = Array.tabulate(123)(i => ((i * 37) % 2000 - 1000).toShort)
    val wav = Multimodal.encodeWavPcm16(16000, samples)
    val df = Seq(
      (1L, wav),
      (2L, "junk audio".getBytes("UTF-8")),
      (3L, wav.take(20))).toDF("doc_id", "content") // truncated header
    val out = Multimodal.audioFeatures(df, "doc_id")
      .collect().map(r => r.getLong(0) -> r).toMap
    val good = out(1L)
    assert(good.getInt(1) == 1 && good.getInt(2) == 16000)
    assert(good.getLong(3) == 123L)
    assert(good.getLong(4) == 123L * 1000 / 16000)
    assert(good.getLong(5) == samples.map(s => math.abs(s.toInt).toLong).sum)
    assert(good.getInt(6) == samples.map(s => math.abs(s.toInt)).max)
    assert(out(2L).isNullAt(1) && out(3L).isNullAt(1),
      "undecodable audio must be a null-feature row")
  }

  test("frameSample slices n frames of the requested width") {
    import spark.implicits._
    val df = Seq((1L, "abcdefghijklmnopqrstuvwxyz")).toDF("doc_id", "text")
    val packed = Multimodal.packText(df, "text")
    val frames = packed.select(Multimodal.frameSample($"content", 4, 3).as("fr"))
      .collect()(0).getSeq[Array[Byte]](0)
    assert(frames.length == 4)
    assert(frames.forall(_.length == 3))
    assert(new String(frames.head, "UTF-8") == "abc")
  }
}
