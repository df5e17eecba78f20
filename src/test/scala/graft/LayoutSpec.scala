package graft

import graft.ops.Layout
import org.apache.spark.sql.functions._

/** Morton-interleave laws + the data-skipping evidence the layout buys. */
class LayoutSpec extends SparkSpec {

  import spark.implicits._

  private def mortonRef(vals: Seq[Long], bits: Int): Long =
    (for {
      i <- 0 until bits
      (v, j) <- vals.zipWithIndex
    } yield ((v >> i) & 1L) << (i * vals.length + j)).sum

  test("zValueN matches the reference interleave; 2-dim case equals zValue") {
    val rows = Seq((0L, 0L, 0L), (255L, 0L, 0L), (0L, 255L, 0L), (0L, 0L, 255L),
      (170L, 85L, 204L), (1L, 2L, 4L), (255L, 255L, 255L))
    val df = rows.toDF("a", "b", "c")
      .withColumn("z3", Layout.zValueN(Seq($"a", $"b", $"c"), 8))
      .withColumn("z2n", Layout.zValueN(Seq($"a", $"b"), 8))
      .withColumn("z2", Layout.zValue($"a", $"b", 8))
    df.collect().foreach { r =>
      val (a, b, c) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(r.getLong(3) == mortonRef(Seq(a, b, c), 8), s"z3($a,$b,$c)")
      assert(r.getLong(4) == mortonRef(Seq(a, b), 8), s"z2n($a,$b)")
      assert(r.getLong(4) == r.getLong(5), "zValue must be zValueN's 2-dim case")
    }
    // dimension-count and width guards
    intercept[IllegalArgumentException](Layout.zValueN(Seq($"a"), 8))
    intercept[IllegalArgumentException](Layout.zValueN(Seq($"a", $"b", $"c"), 22))
  }

  /** Textbook Skilling transform (AIP Conf. Proc. 707, 2004): the
    * mutable-array formulation the chained-projection Column version
    * must reproduce bit-for-bit.
    */
  private def hilbertRef(coords: Seq[Long], bits: Int): Long = {
    val x = coords.toArray
    val n = x.length
    var q = 1L << (bits - 1)
    while (q > 1) {
      val p = q - 1
      for (i <- 0 until n) {
        if ((x(i) & q) != 0) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
      }
      q >>= 1
    }
    for (i <- 1 until n) x(i) ^= x(i - 1)
    var t = 0L
    q = 1L << (bits - 1)
    while (q > 1) { if ((x(n - 1) & q) != 0) t ^= q - 1; q >>= 1 }
    for (i <- 0 until n) x(i) ^= t
    (for (p <- (bits - 1) to 0 by -1; i <- 0 until n)
      yield ((x(i) >> p) & 1L) << (p * n + (n - 1 - i))).sum
  }

  test("hilbert column matches the Skilling reference") {
    val rows = (0 until 500).map { i =>
      (i.toLong, i * 7919L % 256, i * 104729L % 256, i * 6271L % 256)
    }
    val got = Layout.withHilbert(rows.toDF("id", "a", "b", "c"),
        Seq("a", "b", "c"), 8, "hv")
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    rows.foreach { case (id, a, b, c) =>
      val want = hilbertRef(Seq(a, b, c), 8)
      assert(got(id) == want, s"id $id ($a,$b,$c): got ${got(id)}, want $want")
    }
    intercept[IllegalArgumentException](
      Layout.withHilbert(rows.toDF("id", "a", "b", "c"), Seq("a"), 8, "hv"))
    intercept[IllegalArgumentException](
      Layout.withHilbert(rows.toDF("id", "a", "b", "c"), Seq("a", "b", "c"), 22, "hv"))
  }

  test("hilbert keys on a full grid are a permutation taking only unit steps") {
    // THE defining curve property, checked exhaustively: on the complete
    // 8x8 (n=2,b=3) and 4x4x4 (n=3,b=2) grids the keys hit 0..63 exactly
    // once and consecutive keys differ in ONE coordinate by 1 — any bit
    // error anywhere in the step chain breaks one of the two.
    for ((n, bits) <- Seq((2, 3), (3, 2))) {
      val size = 1 << bits
      val total = math.pow(size.toDouble, n.toDouble).toInt
      val cells = (0 until total).map { v =>
        (0 until n).map(j => (v / math.pow(size.toDouble, j.toDouble).toInt % size).toLong)
      }
      val cols = (0 until n).map(j => s"c$j")
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(cells.map(c => org.apache.spark.sql.Row.fromSeq(c)), 4),
        org.apache.spark.sql.types.StructType(cols.map(c =>
          org.apache.spark.sql.types.StructField(c, org.apache.spark.sql.types.LongType))))
      val keyed = Layout.withHilbert(df, cols, bits, "hv")
        .collect().map(r => (r.getLong(n), cols.indices.map(r.getLong)))
        .sortBy(_._1)
      assert(keyed.map(_._1).toSeq == (0 until total).map(_.toLong),
        s"n=$n b=$bits keys not a permutation")
      keyed.sliding(2).foreach { case Array((h1, c1), (h2, c2)) =>
        val d = c1.zip(c2).map { case (a, b) => math.abs(a - b) }.sum
        assert(d == 1, s"n=$n b=$bits non-unit step $c1 -> $c2 ($h1->$h2)")
      }
    }
  }

  test("3-dim z-layout bounds every dim's per-file range; a single sort leaves two dims full-range") {
    // 4096 rows over a 16x16x16 grid (8 rows per cell, distinct ids).
    val n = 4096
    val rows = (0 until n).map { i =>
      (i.toLong, (i % 16).toLong, (i / 16 % 16).toLong, (i / 256 % 16).toLong)
    }
    val df = rows.toDF("id", "a", "b", "c")
    def fileRanges(ordered: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] = {
      val w = org.apache.spark.sql.expressions.Window.orderBy($"sk", $"id")
      ordered.withColumn("file", ntile(16).over(w))
        .groupBy($"file")
        .agg((max($"a") - min($"a")).as("ra"), (max($"b") - min($"b")).as("rb"),
          (max($"c") - min($"c")).as("rc"))
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    }
    val z = fileRanges(df.withColumn("sk", Layout.zValueN(Seq($"a", $"b", $"c"), 4)))
    val single = fileRanges(df.withColumn("sk", $"a"))
    def avg(xs: Seq[Long]): Double = xs.sum.toDouble / xs.length
    // single-column sort: perfect on a, FULL range (15) on b and c
    assert(avg(single.map(_._1)) <= 1.0 && avg(single.map(_._2)) >= 14.0 &&
      avg(single.map(_._3)) >= 14.0)
    // z-layout: EVERY dim's average per-file range strictly bounded away
    // from full — that is the skip-range evidence on all three predicates
    Seq(z.map(_._1), z.map(_._2), z.map(_._3)).foreach { dim =>
      assert(avg(dim) <= 10.0, s"z-order should bound each dim, got avg ${avg(dim)}")
    }
    // Hilbert vs Morton on the SAME cut: summed per-file bounding-box
    // volume (the quantity min/max skipping actually prunes on) must not
    // be worse — unit-step locality never pays Morton's diagonal jumps.
    val h = fileRanges(Layout.withHilbert(df, Seq("a", "b", "c"), 4, "sk"))
    def vol(rs: Seq[(Long, Long, Long)]): Long =
      rs.map { case (ra, rb, rc) => (ra + 1) * (rb + 1) * (rc + 1) }.sum
    assert(vol(h) <= vol(z),
      s"hilbert bbox volume ${vol(h)} should be <= morton ${vol(z)}")
    Seq(h.map(_._1), h.map(_._2), h.map(_._3)).foreach { dim =>
      assert(avg(dim) <= 10.0, s"hilbert should bound each dim, got avg ${avg(dim)}")
    }
  }

  test("writeSorted: range shuffle (never a single-partition sort), files cover disjoint key slices") {
    val n = 4096
    val df = (0 until n).map { i =>
      (i.toLong, (i % 16).toLong, (i / 16 % 16).toLong)
    }.toDF("id", "a", "b")
      .withColumn("zv", Layout.zValue($"a", $"b", 4))

    // plan pin: the layout step is RangePartitioning(16) — the global
    // window it replaced planned a SinglePartition exchange, the one
    // shape that cannot survive 100 TB
    val plan = Layout.sortedByRange(df, Seq($"zv"), 16)
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("rangepartitioning"),
      s"expected a range exchange in:\n$plan")
    assert(!plan.contains("SinglePartition"),
      s"layout write must not plan a single-partition exchange:\n$plan")

    // physical law: each written file covers a contiguous, DISJOINT slice
    // of the curve key — per-file min/max never overlap, so a reader
    // prunes files by footer stats alone
    val out = tmpDir("layout-write") + "/sorted"
    Layout.writeSorted(df, Seq($"zv"), 16, out)
    val ranges = spark.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg(min($"zv").as("lo"), max($"zv").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length > 1, "writeSorted should emit multiple files")
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"file key ranges overlap: $ranges")
      case _ =>
    }
  }

  test("skipScan: footer-stats pruning reads a fraction of the files, result equals the full scan") {
    val n = 4096
    val df = (0 until n).map { i =>
      (i.toLong, (i % 16).toLong, (i / 16 % 16).toLong)
    }.toDF("id", "a", "b")
      .withColumn("zv", Layout.zValue($"a", $"b", 4))
    val out = tmpDir("layout-skip") + "/sorted"
    Layout.writeSorted(df, Seq($"zv"), 16, out)

    def full(lo: Long, hi: Long): Set[Long] =
      spark.read.parquet(out).filter($"zv" >= lo && $"zv" <= hi)
        .select($"id").collect().map(_.getLong(0)).toSet

    // narrow range on the sorted key: few files touched, result exact
    val (pruned, kept, total) = Layout.skipScan(spark, out, "zv", 10L, 40L)
    assert(total == 16, s"expected 16 files, saw $total")
    assert(kept <= 4, s"a 12% key range should touch few of 16 files, read $kept")
    assert(pruned.select($"id").collect().map(_.getLong(0)).toSet == full(10L, 40L))

    // boundary laws: full-domain range keeps everything; empty range reads 0 files
    val (all, keptAll, _) = Layout.skipScan(spark, out, "zv", 0L, 255L)
    assert(keptAll == 16 && all.count() == n)
    val (none, keptNone, _) = Layout.skipScan(spark, out, "zv", 1000L, 2000L)
    assert(keptNone == 0 && none.count() == 0)

    // stats themselves: every file reports a range, and they tile the domain
    val stats = Layout.fileStats(spark, out, "zv")
    assert(stats.size == 16 && stats.forall(_._2.isDefined))
    assert(stats.flatMap(_._2).map(_._1).min == 0L)
  }

  test("writeSorted with bloomCols lands a bloom filter in every footer; lookups stay exact") {
    import scala.jdk.CollectionConverters._
    val df = (0 until 4096).map(i => (i.toLong, (i % 16).toLong, (i / 16 % 16).toLong))
      .toDF("id", "a", "b")
      .withColumn("zv", Layout.zValue($"a", $"b", 4))
    val out = tmpDir("layout-bloom") + "/sorted"
    // id is NOT the sort key — the case min/max skipping cannot help
    Layout.writeSorted(df, Seq($"zv"), 8, out, bloomCols = Seq("id"))
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(out)
    val files = root.getFileSystem(conf).listStatus(root).toSeq
      .filter(_.getPath.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    files.foreach { st =>
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(st, conf))
      try {
        val cols = r.getFooter.getBlocks.asScala
          .flatMap(_.getColumns.asScala)
          .filter(_.getPath.toDotString == "id")
        assert(cols.nonEmpty &&
          cols.forall(_.getBloomFilterOffset >= 0),
          s"bloom filter missing from ${st.getPath.getName}")
      } finally r.close()
    }
    // and the read side: an equality probe on id returns exactly one row
    val hit = spark.read.parquet(out).filter($"id" === 1234L).collect()
    assert(hit.length == 1 && hit.head.getLong(0) == 1234L)
  }

  test("harvestStats (executor-side) agrees with the sequential fileStats footer walk") {
    val df = (0 until 4096).map(i => (i.toLong, (i % 16).toLong, (i / 16 % 16).toLong))
      .toDF("id", "a", "b")
      .withColumn("zv", Layout.zValue($"a", $"b", 4))
    val out = tmpDir("layout-harvest") + "/sorted"
    Layout.writeSorted(df, Seq($"zv"), 16, out)
    val sequential = Layout.fileStats(spark, out, "zv").toMap
    val distributed = Layout.harvestStats(spark, out, Seq("zv"))
      .collect().map(r => r.getString(0) ->
        (r.getString(3) == null, Option(r.getString(3)).map(_.toLong),
          Option(r.getString(4)).map(_.toLong))).toMap
    assert(distributed.keySet == sequential.keySet)
    sequential.foreach { case (f, st) =>
      val (isNull, mn, mx) = distributed(f)
      assert(!isNull && st.isDefined, s"stats must be present for $f")
      assert(mn.get == st.get._1 && mx.get == st.get._2,
        s"distributed harvest disagrees with footers for $f")
    }
  }

  test("skipScanManifest: zero footer opens at read time (an excluded file can be garbage)") {
    val df = (0 until 4096).map(i => (i.toLong, (i % 16).toLong, (i / 16 % 16).toLong))
      .toDF("id", "a", "b")
      .withColumn("zv", Layout.zValue($"a", $"b", 4))
    val out = tmpDir("layout-manifest") + "/sorted"
    Layout.writeSorted(df, Seq($"zv"), 16, out, statsCols = Seq("zv", "id"))
    val expect = spark.read.parquet(out).filter($"zv" >= 10L && $"zv" <= 40L)
      .select($"id").collect().map(_.getLong(0)).toSet

    // SMASH a file the manifest excludes for [10, 40]: if the scan (or
    // its planning) touched that file in any way, it would now fail —
    // passing proves the decision came from the manifest alone.
    val stats = Layout.manifestKeepFiles(spark, out, "zv", "10", "40")
    val (keptFiles, total) = stats
    assert(total == 16 && keptFiles.size <= 4, s"kept ${keptFiles.size} of $total")
    val victim = Layout.manifestKeepFiles(spark, out, "zv", "200", "255")._1
      .filterNot(keptFiles.contains).head
    java.nio.file.Files.write(java.nio.file.Paths.get(
      new java.net.URI(victim).getPath), "not parquet at all".getBytes)

    val (pruned, kept, totalM) = Layout.skipScanManifest(spark, out, "zv", "10", "40")
    assert(kept == keptFiles.size && totalM == 16)
    assert(pruned.select($"id").collect().map(_.getLong(0)).toSet == expect,
      "manifest-pruned scan must equal the pre-smash full-scan result")
  }

  test("distributed planning: a 50k-file manifest plans under a tiny kept ceiling (no per-file array on the driver)") {
    // 4 REAL files (known ranges) + 49,996 SYNTHETIC manifest rows whose
    // paths don't exist and whose ranges are disjoint from the probe.
    // Planning with maxDriverFiles=8 must succeed — proving the planner
    // materializes ONLY the kept subset, never the 50k-row decision
    // relation — and the scan must equal the real files' filter (the
    // fake files are never opened: they have no bytes to open).
    val dir = tmpDir("layout-50k")
    val out = s"$dir/sorted"
    val df = (0 until 400).map(i => (i.toLong, i.toLong)).toDF("id", "k")
    Layout.writeSorted(df, Seq($"k"), 4, out, statsCols = Seq("k"))
    val real = spark.read.parquet(s"$out/_stats")
    val fake = spark.range(0, 49996).select(
      concat(lit(s"$out/fake-"), $"id", lit(".parquet")).as("file"),
      lit("k").as("column"), lit("long").as("typ"),
      ($"id" + 1000L).cast("string").as("min_v"),
      ($"id" + 1000L).cast("string").as("max_v"),
      lit(100L).as("n_rows"), lit(0L).as("n_nulls"),
      lit(4096L).as("n_bytes"),
      map().cast("map<string,string>").as("parts"))
    val tmpStats = s"$dir/stats_big"
    real.unionByName(fake).repartition(8).write.parquet(tmpStats)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$out/_stats"), true)
    assert(fs.rename(new org.apache.hadoop.fs.Path(tmpStats),
      new org.apache.hadoop.fs.Path(s"$out/_stats")))

    val (verdict, _) = Layout.decisionRelation(spark, Seq(s"$out/_stats"),
      "k", Layout.rangeKeepExpr(_, "100", "299"))
    val (scan, kept, total) = Layout.scanFromDecisions(spark, out, verdict,
      spark.emptyDataFrame, maxDriverFiles = 8)
    assert(total == 50000, s"decision relation must cover all $total files")
    assert(kept >= 1 && kept <= 4, s"only real files overlap [100,299]: $kept")
    assert(scan.filter($"k" >= 100L && $"k" <= 299L)
      .select($"id").collect().map(_.getLong(0)).toSet == (100L to 299L).toSet,
      "pruned scan over the 50k manifest must equal the real filter")

    // the ceiling BITES: a probe keeping the 49k fakes must refuse to
    // materialize them on the driver instead of silently collecting
    val (verdictAll, _) = Layout.decisionRelation(spark, Seq(s"$out/_stats"),
      "k", Layout.rangeKeepExpr(_, "0", "99999"))
    val e = intercept[IllegalArgumentException] {
      Layout.scanFromDecisions(spark, out, verdictAll,
        spark.emptyDataFrame, maxDriverFiles = 8)
    }
    assert(e.getMessage.contains("refusing to materialize"))

    // the FILE-GRANULAR planner (manifestFileDecisions — what pruneRefs
    // and lookupEq restrict) plans the same 50k manifest on the unified
    // decisionRelation path: one streamed pass, every file verdicted,
    // only the 4 real files kept (r12: the eager-checkpoint/double-
    // collect planner is gone; the verdict list is bounded protocol
    // metadata, the dropped side becomes file-granular refs)
    val (decisions, typ) = Layout.manifestFileDecisions(spark,
      Seq(s"$out/_stats"), "k", "100", "299")
    assert(typ == "long" && decisions.length == 50000,
      s"every manifest file must receive a verdict: ${decisions.length}")
    val keptN = decisions.count(_._2)
    assert(keptN >= 1 && keptN <= 4,
      s"only the real files overlap [100,299]: $keptN")
    assert(decisions.filter(_._2).forall(!_._1.contains("fake-")),
      "no synthetic file may be kept")
  }

  test("multi-predicate manifest skipping: kept = intersection, result equals the full scan") {
    val df = (0 until 4096).map(i => (i.toLong, (i % 64).toLong, (i / 64).toLong))
      .toDF("id", "a", "b")
      .withColumn("zv", Layout.zValue($"a", $"b", 6))
    val out = tmpDir("layout-2d") + "/sorted"
    Layout.writeSorted(df, Seq($"zv"), 16, out, statsCols = Seq("a", "b"))
    val expect = spark.read.parquet(out)
      .filter($"a" >= 16L && $"a" <= 31L && $"b" >= 32L && $"b" <= 47L)
      .select($"id").collect().map(_.getLong(0)).toSet
    val (scan, kept, total) = Layout.skipScanManifestPreds(spark, out,
      Seq(("a", "16", "31"), ("b", "32", "47")))
    val ka = Layout.manifestKeepFiles(spark, out, "a", "16", "31")._1.size
    val kb = Layout.manifestKeepFiles(spark, out, "b", "32", "47")._1.size
    assert(total == 16 && kept <= math.min(ka, kb),
      s"2-dim kept $kept must not exceed either single dim (a=$ka b=$kb)")
    assert(kept < total, "pruning must bite")
    assert(scan.select($"id").collect().map(_.getLong(0)).toSet == expect,
      "multi-predicate pruned scan must equal the full-scan filter")
  }

  test("null-count skipping: IS NULL / IS NOT NULL prune; all-null files drop from range scans") {
    // ids 0..4095 sorted into 8 files; v is NULL for the low quarter →
    // the low files are all-null, the high files null-free
    val df = (0 until 4096).map { i =>
      (i.toLong, if (i < 1024) None else Some(i * 2.0))
    }.toDF("id", "v")
    val out = tmpDir("layout-nulls") + "/sorted"
    Layout.writeSorted(df, Seq($"id"), 8, out, statsCols = Seq("v", "id"))
    val (nn, keptNN, total) = Layout.skipScanManifestNull(spark, out, "v", wantNull = false)
    assert(total == 8 && keptNN <= 6, s"IS NOT NULL must skip all-null files: $keptNN")
    assert(nn.count() == 4096 - 1024)
    val (isn, keptN, _) = Layout.skipScanManifestNull(spark, out, "v", wantNull = true)
    assert(keptN <= 3, s"IS NULL must skip null-free files: $keptN")
    assert(isn.count() == 1024)
    // and the RANGE path also drops all-null files now (they used to be
    // conservative): a range on v over the whole domain must not read
    // the all-null low files
    val (rng, keptR, _) = Layout.skipScanManifest(spark, out, "v", "0", "999999")
    assert(keptR <= 6, s"range scan must drop all-null files: $keptR")
    assert(rng.count() == 4096 - 1024)
    // metadata-only COUNT(*): summed n_rows equals the real count with
    // zero data IO (the Delta checkpoint answer)
    assert(Layout.manifestRowCount(spark, out) == 4096L)
  }

  test("manifest skipping works on date / timestamp_ntz / string keys (beyond long)") {
    val rows = (0 until 1000).map { i =>
      (i.toLong,
        java.sql.Date.valueOf(java.time.LocalDate.of(1994, 1, 1).plusDays(i / 4)),
        java.time.LocalDateTime.of(1994, 1, 1, 0, 0).plusHours(i.toLong),
        f"k$i%04d")
    }.toDF("id", "d", "ts", "s")
    val out = tmpDir("layout-typed")
    // date key
    Layout.writeSorted(rows, Seq($"d"), 8, s"$out/byDate", statsCols = Seq("d"))
    val (pd, kd, td) = Layout.skipScanManifest(spark, s"$out/byDate", "d",
      "1994-02-01", "1994-02-28")
    assert(kd < td, s"date pruning must bite: $kd of $td")
    assert(pd.count() ==
      spark.read.parquet(s"$out/byDate")
        .filter($"d" >= lit("1994-02-01").cast("date") &&
          $"d" <= lit("1994-02-28").cast("date")).count())
    // timestamp_ntz key
    Layout.writeSorted(rows, Seq($"ts"), 8, s"$out/byTs", statsCols = Seq("ts"))
    val (pt, kt, tt) = Layout.skipScanManifest(spark, s"$out/byTs", "ts",
      "1994-01-10 00:00:00", "1994-01-12 23:59:59.999999")
    assert(kt < tt, s"ntz pruning must bite: $kt of $tt")
    assert(pt.count() ==
      spark.read.parquet(s"$out/byTs")
        .filter($"ts" >= lit("1994-01-10 00:00:00").cast("timestamp_ntz") &&
          $"ts" <= lit("1994-01-12 23:59:59.999999").cast("timestamp_ntz"))
        .count())
    // string key
    Layout.writeSorted(rows, Seq($"s"), 8, s"$out/byStr", statsCols = Seq("s"))
    val (ps, ks, tsT) = Layout.skipScanManifest(spark, s"$out/byStr", "s",
      "k0100", "k0199")
    assert(ks < tsT, s"string pruning must bite: $ks of $tsT")
    assert(ps.count() == 100)
  }

  test("a column the manifest does not carry scans conservatively, never prunes to zero") {
    val out = tmpDir("layout-nostat") + "/t"
    val rows = (1 to 400).map(i => (i.toLong, i * 3L)).toDF("id", "other")
    // stats harvested for `id` ONLY; the queries probe `other`
    Layout.writeSorted(rows, Seq($"id"), 4, out, statsCols = Seq("id"))
    val (scan, kept, total) = Layout.skipScanManifest(spark, out, "other", "30", "90")
    assert(kept == total && total == 4,
      s"an unstatted column must keep every file: $kept of $total")
    assert(scan.count() == 21, "the row filter still applies exactly")
    val (nn, keptNN, totalNN) =
      Layout.skipScanManifestNull(spark, out, "other", wantNull = false)
    assert(keptNN == totalNN && nn.count() == 400,
      "null-count skipping on an unstatted column must stay conservative")
  }

  test("hive layout: partition pruning × range skipping compose, result equals the full scan") {
    val out = tmpDir("layout-hive") + "/t"
    // 12 months × keys 0..999, sorted by key within each month partition
    val rows = (0 until 12000).map { i =>
      (f"2024-${i % 12 + 1}%02d", (i / 12).toLong, i.toLong)
    }.toDF("month", "k", "payload")
    Layout.writeSortedPartitioned(rows, Seq("month"), Seq($"k"), 48, out,
      statsCols = Seq("k"))
    // manifest records partition values alongside file stats
    val man = spark.read.parquet(s"$out/_stats")
    assert(man.schema.fieldNames.contains("parts"))
    assert(man.filter(element_at($"parts", "month").isNull).count() == 0,
      "every partitioned file must carry its partition value in the manifest")
    // 3 months × a quarter of the key space
    val (scan, keptBoth, keptPart, total) = Layout.skipScanManifestHive(spark,
      out, Seq(("month", "2024-04", "2024-06", "string")),
      Seq(("k", "100", "349")))
    assert(keptPart < total, s"partition pruning must bite: $keptPart of $total")
    assert(keptBoth < keptPart,
      s"range skipping must beat partition pruning alone: $keptBoth vs $keptPart")
    val expected = spark.read.parquet(out)
      .filter($"month" >= "2024-04" && $"month" <= "2024-06" &&
        $"k" >= 100L && $"k" <= 349L)
    assert(scan.count() == expected.count())
    assert(scan.agg(sum($"payload")).head.getLong(0) ==
      expected.agg(sum($"payload")).head.getLong(0),
      "pruned scan must equal the unpruned scan exactly")
    // partition columns come back as data columns via basePath
    assert(scan.schema.fieldNames.contains("month"))
  }

  test("bloom point-lookup skipping beats min/max on a non-sort key; superset guarantee holds") {
    val out = tmpDir("layout-bloomskip") + "/t"
    // sorted by k; probe column is a high-cardinality permutation, so
    // every file's probe [min,max] spans ~the full domain — the range
    // cut keeps everything and only the bloom can prune
    val rows = (0 until 4000)
      .map(i => (i.toLong, ((i * 2654435761L) % 1000003L), i.toLong))
      .toDF("k", "probe", "payload")
    Layout.writeSorted(rows, Seq($"k"), 8, out,
      bloomCols = Seq("probe"), statsCols = Seq("k", "probe"))
    val target = ((1234L * 2654435761L) % 1000003L).toString
    val (scan, keptBloom, keptRange, total) =
      Layout.skipScanBloomEq(spark, out, "probe", target)
    assert(keptRange == total,
      s"a permuted probe column must defeat min/max: kept $keptRange of $total")
    assert(keptBloom < keptRange,
      s"the bloom cut must keep strictly fewer files: $keptBloom vs $keptRange")
    val got = scan.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(got == Set((1234L, 1234L)),
      "the pruned probe must return exactly the unpruned result")
    // a value present nowhere: blooms may false-positive a file or two,
    // but the row filter restores exactness — zero rows, never a crash
    val (miss, keptMiss, _, _) = Layout.skipScanBloomEq(spark, out, "probe",
      "999999999")
    assert(miss.count() == 0)
    assert(keptMiss <= total)
    // string probes hash as UTF8 binaries: same compose on a string col
    val sout = tmpDir("layout-bloomskip-s") + "/t"
    val srows = (0 until 2000)
      .map(i => (i.toLong, s"doc-${(i * 7919) % 99991}", i.toLong))
      .toDF("k", "sid", "payload")
    Layout.writeSorted(srows, Seq($"k"), 8, sout,
      bloomCols = Seq("sid"), statsCols = Seq("sid"))
    val (sscan, sKept, sRange, _) =
      Layout.skipScanBloomEq(spark, sout, "sid", s"doc-${(777 * 7919) % 99991}")
    assert(sKept < sRange, s"string bloom must prune: $sKept vs $sRange")
    assert(sscan.collect().map(_.getLong(0)).toSet == Set(777L))
  }

  test("quantile sketches: merged per-file KLL tracks exact ranks; " +
      "file-granular refs restrict the merge") {
    import graft.ops.Versioned
    val t = tmpDir("layout-qtl") + "/t"
    // values 1..10000 shuffled across files — exact quantiles are known
    val rows = (1 to 10000).map(i => ((i * 7919) % 10000 + 1.0, i.toLong))
      .toDF("v", "k")
    Versioned.commitWithQuantiles(spark, t,
      rows.repartition(6), Seq("k"), Seq("v"))
    val est = Versioned.approxQuantiles(spark, t, "v", Seq(0.1, 0.5, 0.99)).get
    Seq(0.1, 0.5, 0.99).zip(est).foreach { case (p, q) =>
      assert(math.abs(q / 10000.0 - p) <= 0.02,
        s"p$p estimate $q strayed past 2% of ${p * 10000}")
    }
    // a merge that drops files to file-granular refs restricts the
    // sketch union: merging away the low half shifts the median up
    val batch = rows.filter($"v" <= 5000).select(($"v" + 20000).as("v"), $"k")
    // (mergePruned requires matching schemas and a key column)
    Versioned.mergePruned(spark, t, batch, "k", Seq("k", "v"))
    // dirs written by mergePruned carry stats but no _qtl → None,
    // honest refusal instead of a stale answer
    assert(Versioned.approxQuantiles(spark, t, "v", Seq(0.5)).isEmpty)
    // missing probs guard
    intercept[IllegalArgumentException] {
      Versioned.approxQuantiles(spark, t, "v", Seq(1.5))
    }
  }
}
