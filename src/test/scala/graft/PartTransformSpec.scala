package graft

import graft.ops.{PartSpec, Versioned}
import graft.ops.Versioned.ScanPredicate
import org.apache.spark.sql.functions._

/** Partition-transform laws (hidden partitioning — [[graft.ops.PartSpec]]):
  * staging derives path values that agree with driver-side literal
  * mapping, predicate derivation prunes without changing results, nulls
  * land where each transform's null contract says, transforms stick to
  * every later append/merge/OPTIMIZE, and the SQL surface round-trips.
  */
class PartTransformSpec extends SparkSpec {

  import spark.implicits._

  private def listParquet(dir: String): Seq[String] = {
    val root = java.nio.file.Paths.get(dir)
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet") &&
        !p.toString.contains("_stats"))
      .map(_.toString).toSeq
  }

  test("spec strings normalize, parse, and round-trip") {
    assert(PartSpec.normalize("bucket(8, k)") == "bucket:8:k")
    assert(PartSpec.normalize("BUCKET( 16 , `key` )") == "bucket:16:key")
    assert(PartSpec.normalize("days(ts)") == "days::ts")
    assert(PartSpec.normalize("trunc(4, lang)") == "trunc:4:lang")
    assert(PartSpec.normalize("plain_col") == "plain_col")
    assert(PartSpec.parse("bucket:8:k") == PartSpec.Bucket(8, "k"))
    assert(PartSpec.parse("days::ts") == PartSpec.Days("ts"))
    assert(PartSpec.parse("trunc:4:lang") == PartSpec.Trunc(4, "lang"))
    assert(PartSpec.parse("k").isIdentity)
  }

  test("bucket staging: path values equal the driver-side literal mapping") {
    val t = tmpDir("ptb") + "/t"
    val df = (1L to 200L).map(i => (i, s"s$i")).toDF("k", "s")
    Versioned.commitPartitioned(spark, t, df, Seq("bucket(8, k)"))
    // every staged dir segment __p_k_bucket=<b> must agree with
    // PartSpec.Bucket.mapPoint of the keys inside it
    val spec = PartSpec.Bucket(8, "k")
    val zone = spark.sessionState.conf.sessionLocalTimeZone
    val staged = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$t/data").withColumn("f", input_file_name())
      .select(col("k"), col("f")).collect()
    assert(staged.length == 200)
    staged.foreach { r =>
      val k = r.getLong(0)
      val b = "__p_k_bucket=(\\d+)".r.findFirstMatchIn(r.getString(1))
        .map(_.group(1)).get
      assert(spec.mapPoint(k.toString,
        org.apache.spark.sql.types.LongType, zone).contains(b),
        s"key $k staged under bucket $b")
    }
  }

  test("bucket point lookup prunes to one bucket, exact rows") {
    val t = tmpDir("ptb2") + "/t"
    val df = (1L to 400L).map(i => (i, i % 7)).toDF("k", "v")
    Versioned.commitPartitioned(spark, t, df, Seq("bucket:8:k"))
    val (frame, kept, total) = Versioned.readPruned(spark, t, None,
      Seq(ScanPredicate.Bounds("k", Some("123"), Some("123"))))
    assert(total > kept, s"bucket cut must prune: kept $kept of $total")
    val got = frame.filter(col("k") === 123L).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(123L))
    // IN-set derives through the bucket too
    val (f2, kept2, total2) = Versioned.readPruned(spark, t, None,
      Seq(ScanPredicate.InSet("k", Seq("5", "123"))))
    assert(total2 > kept2)
    assert(f2.filter(col("k").isin(5L, 123L)).count() == 2)
    // a RANGE on the source column derives nothing through a bucket —
    // every file scans, every row arrives
    val (f3, kept3, total3) = Versioned.readPruned(spark, t, None,
      Seq(ScanPredicate.Bounds("k", Some("1"), Some("400"))))
    assert(kept3 == total3)
    assert(f3.count() == 400)
  }

  test("days hidden partitioning: raw-timestamp range prunes by day; nulls") {
    val t = tmpDir("ptd") + "/t"
    val rows = (0 until 96).map { h =>
      (java.sql.Timestamp.valueOf(f"2024-03-${1 + h / 24}%02d ${h % 24}%02d:30:00"),
        h.toLong)
    } :+ ((null: java.sql.Timestamp), -1L)
    val df = rows.toDF("ts", "v")
    Versioned.commitPartitioned(spark, t, df, Seq("days(ts)"))
    // 4 day dirs + the null dir
    val parts = Versioned.partitionValues(spark, t).collect().map(_.getString(0))
    assert(parts.toSet == Set(
      "ts_day=2024-03-01", "ts_day=2024-03-02", "ts_day=2024-03-03",
      "ts_day=2024-03-04", "ts_day=__HIVE_DEFAULT_PARTITION__"))
    // a range inside one day keeps strictly fewer files than referenced
    val (frame, kept, total) = Versioned.readPruned(spark, t, None,
      Seq(ScanPredicate.Bounds("ts",
        Some("2024-03-02 00:00:00"), Some("2024-03-02 23:59:59"))))
    assert(kept < total, s"day cut must prune: kept $kept of $total")
    val vs = frame.filter(col("ts").between("2024-03-02 00:00:00",
      "2024-03-02 23:59:59")).select("v").as[Long].collect().toSet
    assert(vs == (24L until 48L).toSet)
    // IS NULL keeps the default partition; IS NOT NULL drops it
    val (fn, keptN, totalN) = Versioned.readPruned(spark, t, None,
      Seq(ScanPredicate.NullCheck("ts", isNull = true)))
    assert(keptN < totalN)
    assert(fn.filter(col("ts").isNull).select("v").as[Long].collect().toSeq
      == Seq(-1L))
    val (fnn, _, _) = Versioned.readPruned(spark, t, None,
      Seq(ScanPredicate.NullCheck("ts", isNull = false)))
    assert(fnn.filter(col("ts").isNotNull).count() == 96)
  }

  test("trunc prefix partitioning: monotone range derivation") {
    val t = tmpDir("ptt") + "/t"
    val df = Seq("alpha", "amber", "bravo", "breeze", "cedar", "crisp")
      .zipWithIndex.map { case (s, i) => (s, i.toLong) }.toDF("w", "v")
    Versioned.commitPartitioned(spark, t, df, Seq("trunc(1, w)"))
    val (frame, kept, total) = Versioned.readPruned(spark, t, None,
      Seq(ScanPredicate.Bounds("w", Some("b"), Some("bz"))))
    assert(kept < total)
    assert(frame.filter(col("w") >= "b" && col("w") <= "bz")
      .select("w").as[String].collect().toSet == Set("bravo", "breeze"))
  }

  test("transforms are sticky: plain append and OPTIMIZE keep deriving") {
    val t = tmpDir("pts") + "/t"
    Versioned.commitPartitioned(spark, t,
      (1L to 50L).map(i => (i, "a")).toDF("k", "s"), Seq("bucket(4, k)"))
    // a PLAIN commit (no declaration) must stage hive dirs derived the
    // same way
    Versioned.commit(spark, t, (51L to 80L).map(i => (i, "b")).toDF("k", "s"))
    val afterAppend = listParquet(s"$t/data")
    assert(afterAppend.forall(_.contains("__p_k_bucket=")),
      "append lost the transform staging")
    // OPTIMIZE rewrites everything — layout must survive
    Versioned.compact(spark, t)
    val m = Versioned.latestVersion(spark, t).map(v =>
      Versioned.read(spark, t, Some(v))).get
    assert(m.count() == 80)
    val afterCompact = listParquet(s"$t/data")
    assert(afterCompact.forall(_.contains("__p_k_bucket=")),
      "OPTIMIZE lost the transform staging")
    // and pruning still bites post-compact
    val (_, kept, total) = Versioned.readPruned(spark, t, None,
      Seq(ScanPredicate.Bounds("k", Some("42"), Some("42"))))
    assert(kept < total)
  }

  test("mergePruned on a bucketed table: bucket cut + layout preserved") {
    val t = tmpDir("ptm") + "/t"
    val base = (1L to 300L).map(i => (i, 1L)).toDF("k", "v")
    Versioned.commitPartitioned(spark, t, base, Seq("bucket:8:k"))
    val batch = Seq((7L, 99L), (123L, 99L), (301L, 99L)).toDF("k", "v")
    val (v, rewrote, keptAsIs) =
      Versioned.mergePruned(spark, t, batch, "k", Seq("k", "v"))
    assert(rewrote > 0 && keptAsIs > 0,
      s"bucket cut must keep files as-is: rewrote $rewrote kept $keptAsIs")
    val after = Versioned.read(spark, t, Some(v))
    assert(after.count() == 301)
    assert(after.filter(col("v") === 99L).select("k").as[Long]
      .collect().toSet == Set(7L, 123L, 301L))
    // the merge rewrite dir keeps the hive layout
    assert(listParquet(s"$t/data").forall(_.contains("__p_k_bucket=")))
    // and a follow-up point lookup still prunes
    val (_, kept, total) = Versioned.readPruned(spark, t, None,
      Seq(ScanPredicate.Bounds("k", Some("301"), Some("301"))))
    assert(kept < total)
  }

  test("lookupEq composes the bucket cut with blooms") {
    val t = tmpDir("ptl") + "/t"
    // commitPartitioned + bucket; values hash-scattered so min/max alone
    // keeps everything
    val df = (1L to 500L).map(i => (i * 7919L % 10007L, i)).toDF("k", "v")
    Versioned.commitPartitioned(spark, t, df, Seq("bucket:8:k"))
    val probe = (250L * 7919L % 10007L).toString
    val (frame, read, rangeKept, total) =
      Versioned.lookupEq(spark, t, "k", probe)
    assert(rangeKept < total,
      s"bucket cut must prune the equality lookup: $rangeKept of $total")
    assert(frame.select("v").as[Long].collect().toSeq == Seq(250L))
  }

  test("SQL surface: CREATE PARTITIONED BY (bucket(...)) + pushed filters prune") {
    val dir = tmpDir("ptsql")
    val loc = s"$dir/t"
    spark.sql(s"DROP TABLE IF EXISTS pt_sql_bucketed")
    spark.sql(
      s"""CREATE TABLE pt_sql_bucketed
         |USING graft-table PARTITIONED BY (bucket(8, k), days(ts))
         |LOCATION '$loc'
         |AS SELECT id AS k,
         |  TIMESTAMP '2024-05-01 00:00:00' + make_interval(0,0,0,0,CAST(id AS INT),0,0) AS ts,
         |  id * 2 AS v
         |FROM range(96)""".stripMargin).collect()
    // SHOW PARTITIONS lists derived names
    val parts = spark.sql("SHOW PARTITIONS pt_sql_bucketed")
      .collect().map(_.getString(0))
    assert(parts.nonEmpty && parts.forall(p =>
      p.contains("k_bucket=") && p.contains("ts_day=")))
    assert(parts.exists(_.contains("ts_day=2024-05-02")))
    // a pushed equality on the RAW key prunes through the bucket: rows
    // still exact
    val got = spark.sql("SELECT v FROM pt_sql_bucketed WHERE k = 37")
      .as[Long].collect()
    assert(got.toSeq == Seq(74L))
    // raw-timestamp range still answers exactly
    val cnt = spark.sql(
      """SELECT count(*) FROM pt_sql_bucketed
        |WHERE ts >= TIMESTAMP '2024-05-02 00:00:00'
        |  AND ts < TIMESTAMP '2024-05-03 00:00:00'""".stripMargin)
      .as[Long].head()
    assert(cnt == 24L)
    // INSERT INTO keeps deriving (sticky through the SQL write path)
    spark.sql("INSERT INTO pt_sql_bucketed SELECT 1000 AS k, " +
      "TIMESTAMP '2024-06-01 12:00:00' AS ts, 1 AS v").collect()
    assert(listParquet(s"$loc/data").forall(_.contains("__p_k_bucket=")))
    assert(spark.sql("SELECT count(*) FROM pt_sql_bucketed").as[Long].head()
      == 97L)
    spark.sql("DROP TABLE pt_sql_bucketed")
  }

  test("years/months/hours transforms prune at their granularity") {
    import java.sql.Timestamp
    def check(t: String, decl: String, lo: String, hi: String): Unit = {
      val (frame, kept, total) = Versioned.readPruned(spark, t, None,
        Seq(ScanPredicate.Bounds("ts", Some(lo), Some(hi))))
      assert(kept < total, s"$decl must prune: kept $kept of $total")
      val expect = Versioned.read(spark, t, None)
        .filter(col("ts").between(lo, hi)).count()
      assert(frame.filter(col("ts").between(lo, hi)).count() == expect)
      assert(expect > 0)
    }
    val tm = tmpDir("ptmon") + "/t"
    val mrows = (0 until 60).map(i => (i.toLong,
      Timestamp.valueOf(f"2024-${1 + i % 6}%02d-${1 + i % 28}%02d 08:00:00")))
    Versioned.commitPartitioned(spark, tm, mrows.toDF("id", "ts"),
      Seq("months(ts)"))
    check(tm, "months", "2024-03-01 00:00:00", "2024-03-31 23:59:59")
    assert(Versioned.partitionValues(spark, tm).collect()
      .map(_.getString(0)).forall(_.startsWith("ts_month=")))
    val ty = tmpDir("ptyr") + "/t"
    val yrows = (0 until 40).map(i => (i.toLong,
      Timestamp.valueOf(f"${2021 + i % 4}%d-06-15 12:00:00")))
    Versioned.commitPartitioned(spark, ty, yrows.toDF("id", "ts"),
      Seq("years(ts)"))
    check(ty, "years", "2022-01-01 00:00:00", "2022-12-31 23:59:59")
    val th = tmpDir("pthr") + "/t"
    val hrows = (0 until 48).map(i => (i.toLong,
      Timestamp.valueOf(f"2024-01-01 ${i % 24}%02d:${i % 60}%02d:00")))
    Versioned.commitPartitioned(spark, th, hrows.toDF("id", "ts"),
      Seq("hours(ts)"))
    check(th, "hours", "2024-01-01 05:00:00", "2024-01-01 06:59:59")
    // the hour value is a zone-free `yyyy-MM-dd HH` string (UTC for
    // instants): lexicographic order == instant order in ANY session zone
    assert(Versioned.partitionValues(spark, th).collect()
      .map(_.getString(0)).exists(_ == "ts_hour=2024-01-01 05"))
  }

  test("hours() legacy vintage: pre-r15 'HH:00:00' recorded stats never " +
      "misprune — the hi-cap covers both forms, IN-sets stay conservative") {
    import java.sql.Timestamp
    import org.apache.spark.sql.functions.{concat, lit, when}
    // an hours() table whose stats rows are then REWRITTEN into the
    // legacy derived form ('yyyy-MM-dd HH:00:00') — simulating a table
    // written by a pre-r15 build (ADVICE r15 low / PartSpec format note)
    val t = tmpDir("pthr-legacy") + "/t"
    val rows = (0 until 48).map(i => (i.toLong,
      Timestamp.valueOf(f"2024-01-01 ${i % 24}%02d:${i % 60}%02d:00")))
    Versioned.commitPartitioned(spark, t, rows.toDF("id", "ts"),
      Seq("hours(ts)"))
    // rewrite every dir's _stats: ts_hour min/max gain the legacy suffix
    val dataDir = new java.io.File(s"$t/data")
    dataDir.listFiles().filter(_.isDirectory).foreach { d =>
      val statsPath = s"${d.getAbsolutePath}/_stats"
      if (new java.io.File(statsPath).exists()) {
        val legacy = spark.read.parquet(statsPath)
          .withColumn("min_v", when(col("column") === "ts_hour",
            concat(col("min_v"), lit(":00:00"))).otherwise(col("min_v")))
          .withColumn("max_v", when(col("column") === "ts_hour",
            concat(col("max_v"), lit(":00:00"))).otherwise(col("max_v")))
          .collect()
        val schema = spark.read.parquet(statsPath).schema
        spark.createDataFrame(
          new java.util.ArrayList(java.util.Arrays.asList(legacy: _*)), schema)
          .repartition(1).write.mode("overwrite").parquet(statsPath + ".new")
        val fsys = org.apache.hadoop.fs.FileSystem.getLocal(
          spark.sparkContext.hadoopConfiguration)
        fsys.delete(new org.apache.hadoop.fs.Path(statsPath), true)
        fsys.rename(new org.apache.hadoop.fs.Path(statsPath + ".new"),
          new org.apache.hadoop.fs.Path(statsPath))
      }
    }
    // a raw-ts range inside hour 05 must KEEP the legacy-stats hour-05
    // files (pre-fix, the derived hi '2024-01-01 05' lexicographically
    // excluded '2024-01-01 05:00:00' and the rows vanished) and still
    // PRUNE other hours
    val (frame, kept, total) = Versioned.skipRead(spark, t, "ts",
      "2024-01-01 05:00:00", "2024-01-01 05:59:59")
    val got = frame.filter(col("ts").between(
      "2024-01-01 05:00:00", "2024-01-01 05:59:59")).count()
    val expect = Versioned.read(spark, t, None).filter(col("ts").between(
      "2024-01-01 05:00:00", "2024-01-01 05:59:59")).count()
    assert(expect > 0 && got == expect,
      s"legacy-vintage hour stats mispruned: got $got want $expect")
    assert(kept < total, s"other hours must still prune: $kept/$total")
  }

  test("raw TIMESTAMP min/max stats prune with no transform declared — and " +
      "the comparison frame stays sound across session zones") {
    import java.sql.Timestamp
    // INT64-micros parquet (Engine pins outputTimestampType) carries real
    // footer stats; INT96 (the old default) recorded the opaque null row
    // and raw-ts ranges NEVER pruned. The stats strings are UTC wall
    // clocks — the keep expressions compare as timestamp_ntz with the
    // literal converted from the READER's session zone, so a non-UTC
    // session cannot prune files holding matching rows.
    def ts(s: String): Timestamp = Timestamp.from(java.time.Instant.parse(s))
    val t = tmpDir("tsstats") + "/t"
    val rows = Seq(
      (0L, ts("2024-01-09T12:00:00Z")),
      (1L, ts("2024-01-10T23:30:00Z")),
      (2L, ts("2024-01-11T01:00:00Z")),
      (3L, ts("2024-01-12T05:00:00Z")))
    Versioned.commitWithStats(spark, t,
      graft.ops.Layout.sortedByRange(rows.toDF("id", "ts"),
        Seq(col("ts")), 4), Seq("id", "ts"))
    val (f0, k0, t0) = Versioned.skipRead(spark, t, "ts",
      "2024-01-10 00:00:00", "2024-01-10 23:59:59")
    assert(k0 < t0, s"raw ts range must prune day-disjoint files: $k0/$t0")
    assert(f0.filter(col("ts").between("2024-01-10 00:00:00",
      "2024-01-10 23:59:59")).count() == 1L)
    // zone soundness: a UTC+2 reader's lo literal means 22:00Z the
    // PREVIOUS UTC day — the 23:30Z file must survive the cut
    val zoneKey = "spark.sql.session.timeZone"
    val prior = spark.conf.get(zoneKey)
    try {
      spark.conf.set(zoneKey, "Etc/GMT-2")
      val (f1, k1, t1) = Versioned.skipRead(spark, t, "ts",
        "2024-01-11 00:00:00", "2024-01-13 00:00:00")
      assert(f1.filter(col("ts") >= "2024-01-11 00:00:00")
        .select("id").as[Long].collect().toSet == Set(1L, 2L, 3L),
        "the UTC-frame comparison must keep the 23:30Z file")
      assert(k1 < t1, s"and still prune the out-of-range file: $k1/$t1")
    } finally spark.conf.set(zoneKey, prior)
  }

  test("temporal transforms are zone-pinned to UTC: a reader/writer session-" +
      "zone mismatch never prunes files containing matching rows") {
    import java.sql.Timestamp
    // ADVICE r14 medium: derive() used the WRITER's session zone while
    // mapPoint prefixed the READER's literal — e.g. writer UTC stages
    // ts=2024-01-10T23:30Z under ts_day=2024-01-10; a UTC+2 reader's
    // `ts >= '2024-01-11 00:00:00'` (= 22:00Z) derived ts_day >=
    // 2024-01-11 and DROPPED that file. Both sides now evaluate in UTC
    // (the Iceberg rule); literals parse in the reader's zone exactly
    // as the row-filter cast will, then map to the UTC day.
    def ts(s: String): Timestamp = // an INSTANT, zone-explicit
      Timestamp.from(java.time.Instant.parse(s))
    val zoneKey = "spark.sql.session.timeZone"
    val prior = spark.conf.get(zoneKey)
    try {
      // writer in UTC
      spark.conf.set(zoneKey, "UTC")
      val t = tmpDir("ptzone") + "/t"
      val rows = Seq(
        (0L, ts("2024-01-09T12:00:00Z")),
        (1L, ts("2024-01-10T23:30:00Z")), // the ADVICE row
        (2L, ts("2024-01-11T01:00:00Z")),
        (3L, ts("2024-01-12T05:00:00Z")))
      Versioned.commitPartitioned(spark, t, rows.toDF("id", "ts"),
        Seq("days(ts)"))
      // reader at UTC+2: the literal means instant 2024-01-10T22:00Z
      spark.conf.set(zoneKey, "Etc/GMT-2")
      val lo = "2024-01-11 00:00:00"
      val (frame, _, _) = Versioned.readPruned(spark, t, None,
        Seq(ScanPredicate.Bounds("ts", Some(lo), None)))
      val got = frame.filter(col("ts") >= lo).select("id")
        .as[Long].collect().toSet
      assert(got == Set(1L, 2L, 3L),
        s"zone-shifted reader lost rows: $got (row 1 is the ADVICE case)")
      // and pruning still bites in the shifted zone (soundness didn't
      // come from giving up derivation)
      val (_, kept, total) = Versioned.readPruned(spark, t, None,
        Seq(ScanPredicate.Bounds("ts", None, Some("2024-01-10 00:00:00"))))
      assert(kept < total, s"derived cut must still prune: $kept/$total")
      // writer in a non-UTC zone: derived days are UTC regardless
      spark.conf.set(zoneKey, "Etc/GMT+8") // UTC-8
      val t2 = tmpDir("ptzone2") + "/t"
      Versioned.commitPartitioned(spark, t2, rows.toDF("id", "ts"),
        Seq("days(ts)"))
      assert(Versioned.partitionValues(spark, t2).collect()
        .map(_.getString(0)).toSet.contains("ts_day=2024-01-10"),
        "a UTC-8 writer must still stage the 23:30Z row under its UTC day")
      spark.conf.set(zoneKey, "UTC")
      val (frame2, _, _) = Versioned.readPruned(spark, t2, None,
        Seq(ScanPredicate.Bounds("ts", Some("2024-01-10 00:00:00"),
          Some("2024-01-10 23:59:59"))))
      assert(frame2.filter(col("ts").between("2024-01-10 00:00:00",
        "2024-01-10 23:59:59")).select("id").as[Long].collect().toSet ==
        Set(1L))
    } finally spark.conf.set(zoneKey, prior)
  }

  test("mergeApply (MoR) on a days table keeps the layout") {
    val t = tmpDir("ptma") + "/t"
    val rows = (0 until 48).map(h => (h.toLong,
      java.sql.Timestamp.valueOf(f"2024-03-${1 + h / 24}%02d ${h % 24}%02d:00:00"),
      1L))
    Versioned.commitPartitioned(spark, t, rows.toDF("id", "ts", "v"),
      Seq("days(ts)"))
    val batch = Seq(
      (5L, java.sql.Timestamp.valueOf("2024-03-01 05:00:00"), 99L),
      (100L, java.sql.Timestamp.valueOf("2024-03-05 01:00:00"), 7L))
      .toDF("id", "ts", "v")
    Versioned.mergeApply(spark, t, batch, "id",
      whenMatchedUpdate = Some(Map("v" -> lit(99L))))
    val after = Versioned.read(spark, t, None)
    assert(after.count() == 49)
    assert(after.filter(col("id") === 5L).select("v").as[Long].head() == 99L)
    assert(after.filter(col("id") === 100L).select("v").as[Long].head() == 7L)
    // dv dirs are coordinate lists, not data — they stay flat by design
    assert(listParquet(s"$t/data").filterNot(_.contains("/dv"))
      .forall(_.contains("__p_ts_day=")),
      "MoR merge delta dir lost the transform staging")
    // the new day partition the insert opened still prunes
    val (_, kept, total) = Versioned.readPruned(spark, t, None,
      Seq(ScanPredicate.Bounds("ts",
        Some("2024-03-05 00:00:00"), Some("2024-03-05 23:59:59"))))
    assert(kept < total)
  }

  test("compactWhere: partial OPTIMIZE folds only the matching day, " +
      "content-identical, dvs carried, untouched bytes intact") {
    import java.sql.Timestamp
    val t = tmpDir("ptcw") + "/t"
    // one dir per day via three separate partitioned appends
    (1 to 3).foreach { d =>
      val rows = (0 until 24).map(h => ((d * 100 + h).toLong,
        Timestamp.valueOf(f"2024-03-0$d%d ${h}%02d:00:00"), 1L))
      if (d == 1)
        Versioned.commitPartitioned(spark, t, rows.toDF("id", "ts", "v"),
          Seq("days(ts)"), numFiles = 4)
      else Versioned.commit(spark, t, rows.toDF("id", "ts", "v"))
    }
    // a dv delete in the target day must MATERIALIZE through the fold
    Versioned.deleteWhere(spark, t, col("id") === 205L)
    val before = Versioned.read(spark, t, None).orderBy("id")
      .collect().map(_.toSeq).toSeq
    val untouchedBefore = listParquet(s"$t/data")
      .filterNot(_.contains("/dv")).filter(_.contains("2024-03-01"))
      .map(p => (p, new java.io.File(p).length)).toSet
    val (v, folded, carried) = Versioned.compactWhere(spark, t,
      Seq(ScanPredicate.Bounds("ts",
        Some("2024-03-02 00:00:00"), Some("2024-03-03 23:59:59"))),
      numFiles = 2)
    assert(folded > 0 && carried > 0,
      s"partial fold must keep day-1 files as-is: folded $folded carried $carried")
    val after = Versioned.read(spark, t, Some(v)).orderBy("id")
      .collect().map(_.toSeq).toSeq
    assert(after == before, "OPTIMIZE WHERE must be invisible to readers")
    // untouched day-1 files byte-identical (same paths, same lengths)
    val untouchedAfter = listParquet(s"$t/data")
      .filterNot(_.contains("/dv")).filter(_.contains("2024-03-01"))
      .map(p => (p, new java.io.File(p).length)).toSet
    assert(untouchedBefore.subsetOf(untouchedAfter))
    // folded dir keeps the declared layout and the day pruning still bites
    val (_, kept, total) = Versioned.readPruned(spark, t, None,
      Seq(ScanPredicate.Bounds("ts",
        Some("2024-03-02 00:00:00"), Some("2024-03-02 23:59:59"))))
    assert(kept < total)
    // SQL form over a raw-timestamp WHERE (derives through days(ts))
    val v2 = spark.sql(s"OPTIMIZE graft.`$t` " +
      "WHERE ts >= TIMESTAMP '2024-03-01 00:00:00' " +
      "AND ts <= TIMESTAMP '2024-03-01 23:59:59'").collect().head.getLong(0)
    assert(Versioned.read(spark, t, Some(v2)).orderBy("id")
      .collect().map(_.toSeq).toSeq == before)
    // refusals: row-level predicates and WHERE+ZORDER
    intercept[Exception] {
      spark.sql(s"OPTIMIZE graft.`$t` WHERE id + 1 = 2").collect()
    }
    intercept[Exception] {
      spark.sql(s"OPTIMIZE graft.`$t` WHERE id = 1 ZORDER BY (id)").collect()
    }
  }

  test("type guards: days needs date/timestamp, trunc needs string") {
    val t = tmpDir("ptguard") + "/t"
    val df = Seq((1L, "alpha")).toDF("id", "name")
    intercept[IllegalArgumentException] {
      Versioned.commitPartitioned(spark, t, df, Seq("days(name)"))
    }
    intercept[IllegalArgumentException] {
      Versioned.commitPartitioned(spark, t, df, Seq("trunc(2, id)"))
    }
  }

  test("partition-spec evolution: SET PARTITIONED BY re-declares forward, " +
      "old dirs compose, empty spec reverts to flat, bad specs refuse") {
    import java.sql.Timestamp
    val t = tmpDir("ptevolspec") + "/t"
    val rows = (0 until 48).map(h => (h.toLong,
      Timestamp.valueOf(f"2024-03-${1 + h / 24}%02d ${h % 24}%02d:00:00"),
      h.toLong))
    Versioned.commitPartitioned(spark, t, rows.toDF("id", "ts", "v"),
      Seq("days(ts)"))
    val v2 = Versioned.setPartitionSpec(spark, t, Seq("bucket(4, id)"))
    assert(v2 == 2L, "the evolution is one metadata commit")
    assert(Versioned.read(spark, t, Some(2L)).count() == 48L,
      "the metadata commit must not touch data")
    // the next append stages the NEW layout; old dirs keep theirs
    val more = (100 until 120).map(i => (i.toLong,
      Timestamp.valueOf("2024-03-05 12:00:00"), i.toLong))
    Versioned.commit(spark, t, more.toDF("id", "ts", "v"))
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    val v3dir = new java.io.File(s"$t/data").listFiles()
      .filter(_.getName.startsWith("v000003")).head
    assert(walk(v3dir).exists(_.getPath.contains("__p_id_bucket=")),
      "post-evolution appends must stage the new bucket layout")
    assert(walk(new java.io.File(s"$t/data"))
      .exists(_.getPath.contains("__p_ts_day=")),
      "pre-evolution day dirs keep their physical layout")
    assert(Versioned.read(spark, t).count() == 68L)
    // planning composes: a point lookup prunes through the new bucket
    // layout (old dirs conservative), a ts range prunes the old dirs
    val (f1, kept1, total1) = Versioned.readPruned(spark, t, None,
      Seq(ScanPredicate.Bounds("id", Some("105"), Some("105"))))
    assert(kept1 < total1, s"bucket cut on the new dirs: $kept1/$total1")
    assert(f1.filter(col("id") === 105L).count() == 1L)
    val (f2, kept2, total2) = Versioned.readPruned(spark, t, None,
      Seq(ScanPredicate.Bounds("ts", Some("2024-03-01 00:00:00"),
        Some("2024-03-01 23:59:59"))))
    assert(kept2 < total2, s"old day dirs still prune: $kept2/$total2")
    assert(f2.filter(col("ts") < "2024-03-02 00:00:00").count() == 24L)
    // SHOW PARTITIONS speaks the CURRENT spec: new dirs list real bucket
    // values; pre-evolution files (no bucket key in their paths) report
    // the default-partition placeholder — defined, never a crash
    val pvs = Versioned.partitionValues(spark, t).collect()
      .map(_.getString(0))
    assert(pvs.exists(p => p.startsWith("id_bucket=") &&
      p != "id_bucket=__HIVE_DEFAULT_PARTITION__"),
      s"new dirs must list real bucket values: ${pvs.mkString(",")}")
    assert(pvs.contains("id_bucket=__HIVE_DEFAULT_PARTITION__"),
      "pre-evolution files report the placeholder under the current spec")
    // empty spec reverts to FLAT staging going forward
    val v4 = Versioned.setPartitionSpec(spark, t, Seq.empty)
    assert(v4 == 4L)
    // and an unpartitioned head refuses SHOW PARTITIONS loudly
    intercept[IllegalArgumentException](
      Versioned.partitionValues(spark, t).collect())
    Versioned.commit(spark, t,
      Seq((200L, Timestamp.valueOf("2024-03-06 01:00:00"), 200L))
        .toDF("id", "ts", "v"))
    val v5dir = new java.io.File(s"$t/data").listFiles()
      .filter(_.getName.startsWith("v000005")).head
    assert(!walk(v5dir).exists(_.getPath.contains("__p_")),
      "an empty spec must stage flat")
    assert(Versioned.read(spark, t).count() == 69L)
    // refusals: unknown source column; derived-name collision
    intercept[IllegalArgumentException](
      Versioned.setPartitionSpec(spark, t, Seq("bucket(4, nope)")))
    intercept[IllegalArgumentException](
      Versioned.setPartitionSpec(spark, t, Seq("days(v)"))) // v is long
  }

  test("an append staged BEFORE a concurrent SET PARTITIONED BY grafts " +
      "soundly: the dir keeps its old layout, the manifest carries the new " +
      "spec + past, reads and pruning stay exact") {
    import java.sql.Timestamp
    val t = tmpDir("ptevolrace") + "/t"
    val rows = (0 until 24).map(h => (h.toLong,
      Timestamp.valueOf(f"2024-03-01 $h%02d:00:00"), h.toLong))
    Versioned.commitPartitioned(spark, t, rows.toDF("id", "ts", "v"),
      Seq("days(ts)"))
    val more = (100 until 110).map(i => (i.toLong,
      Timestamp.valueOf("2024-03-02 06:00:00"), i.toLong))
    // the evolution lands INSIDE the rebase race seam: the staged dir
    // was laid out under days(ts), the head it grafts onto declares
    // bucket(4, id)
    val (v, attempts) = Versioned.appendRebase(spark, t,
      more.toDF("id", "ts", "v"),
      onStaged = () =>
        { Versioned.setPartitionSpec(spark, t, Seq("bucket(4, id)")); () })
    assert(v == 3L && attempts == 2,
      s"the staged race must cost exactly one lost CAS: v=$v a=$attempts")
    val m = Versioned.readManifest(spark, t, v)
    assert(m.partCols == Seq("bucket:4:id") &&
      m.pastPartCols.contains("days::ts"),
      s"the graft must carry the NEW spec + past: ${m.partCols} / " +
        s"${m.pastPartCols}")
    assert(Versioned.read(spark, t).count() == 34L,
      "both writers' rows must survive the graft")
    // the old-layout staged dir plans conservatively for bucket preds
    // but its own day synthesis (now a PAST spec) still prunes it
    val (f1, k1, t1) = Versioned.readPruned(spark, t, None,
      Seq(ScanPredicate.Bounds("ts", Some("2024-03-01 00:00:00"),
        Some("2024-03-01 23:59:59"))))
    assert(k1 < t1, s"day pruning must survive the race: $k1/$t1")
    assert(f1.filter(col("ts") < "2024-03-02 00:00:00").count() == 24L)
  }

  test("graft_files: stats-backed rows, honest nulls for manifest-less " +
      "dirs, version pinning") {
    val t = tmpDir("ptgf") + "/t"
    Versioned.commitPartitioned(spark, t,
      (1L to 40L).map(i => (i, s"s$i")).toDF("k", "s"), Seq("bucket(4, k)"))
    // a sticky append is hive-staged WITH stats — every file statted
    Versioned.commit(spark, t,
      (41L to 50L).map(i => (i, s"s$i")).toDF("k", "s"))
    val meta = spark.sql(s"SELECT * FROM graft_files('$t')").collect()
    assert(meta.nonEmpty)
    assert(meta.map(_.getLong(2)).sum == 50L)
    assert(meta.forall(_.getString(1).startsWith("k_bucket=")))
    assert(meta.forall(_.getLong(3) > 0L))
    // version pinning sees only v1's files
    val v1 = spark.sql(s"SELECT * FROM graft_files('$t', 1)").collect()
    assert(v1.map(_.getLong(2)).sum == 40L)
    // a PLAIN unpartitioned commit has no manifest: honest nulls for
    // partition AND row count, real byte sizes
    val t2 = tmpDir("ptgf2") + "/t"
    Versioned.commit(spark, t2, (1L to 10L).map(i => (i, i)).toDF("a", "b"))
    graft.ops.Versioned.commitWithStats(spark, t2,
      (11L to 20L).map(i => (i, i)).toDF("a", "b"), Seq("a"))
    val meta2 = spark.sql(s"SELECT * FROM graft_files('$t2')").collect()
    val plain = meta2.filter(_.isNullAt(2))
    val statted2 = meta2.filter(r => !r.isNullAt(2))
    assert(plain.nonEmpty && statted2.nonEmpty)
    assert(statted2.map(_.getLong(2)).sum == 10L)
    assert(meta2.forall(_.getLong(3) > 0L))
    assert(meta2.forall(_.isNullAt(1)), "unpartitioned files: null partition")
    intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_files('$t', 1, 2, 3)").collect()
    }
    // ADVICE r14 low: a referenced file whose dir HAS a _stats manifest
    // but which has NO row in it (pre-sentinel-fix manifests) must still
    // get a row via the listing fallback — honest nulls, not a silent
    // omission from the inspection surface
    val t3 = tmpDir("ptgf3") + "/t"
    Versioned.commitWithStats(spark, t3,
      (1L to 30L).map(i => (i, i)).toDF("a", "b"), Seq("a"))
    val dataDir3 = new java.io.File(s"$t3/data").listFiles().head
    // drop every manifest ROW while keeping the _stats dir present:
    // overwrite with a filtered (empty-matching) copy of itself
    val statsPath = new java.io.File(dataDir3, "_stats").toString
    val gutted = spark.read.parquet(statsPath).filter("file = 'nope'")
      .collect()
    assert(gutted.isEmpty)
    val full = spark.read.parquet(statsPath)
    val one = full.orderBy("file").limit(0) // schema-bearing empty
    val tmpStats = statsPath + ".respec"
    one.coalesce(1).write.parquet(tmpStats)
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(statsPath))
    new java.io.File(tmpStats).renameTo(new java.io.File(statsPath))
    val meta3 = spark.sql(s"SELECT * FROM graft_files('$t3')").collect()
    assert(meta3.nonEmpty,
      "row-less manifests must not hide the dir's files")
    assert(meta3.forall(r => r.isNullAt(2) && r.getLong(3) > 0L),
      "fallback rows report honest null n_rows with real byte sizes")
  }

  test("compactSmall and purge keep the declared layout") {
    val t = tmpDir("ptcsp") + "/t"
    Versioned.commitPartitioned(spark, t,
      (1L to 60L).map(i => (i, i % 5)).toDF("k", "g"), Seq("bucket(4, k)"))
    (61L to 63L).foreach(i =>
      Versioned.commit(spark, t, Seq((i, i % 5)).toDF("k", "g")))
    // sizeOf must see through the hive layout (the broadcast statistic —
    // a flat listing reported ~0 bytes for partitioned tables)
    assert(Versioned.sizeOf(spark, t) > 0L)
    val (_, foldedN, _) = Versioned.compactSmall(spark, t,
      smallBytes = 1L << 20, sortCols = Seq(col("k")), numFiles = 2,
      statsCols = Seq("k"))
    assert(foldedN > 1)
    assert(Versioned.read(spark, t, None).count() == 63)
    assert(listParquet(s"$t/data").filterNot(_.contains("/dv"))
      .forall(_.contains("__p_k_bucket=")),
      "compactSmall fold lost the transform staging")
    // purge keeps the declaration: later appends still derive, SHOW
    // PARTITIONS still answers
    Versioned.purge(spark, t, col("k") <= 3L)
    Versioned.commit(spark, t, Seq((100L, 0L)).toDF("k", "g"))
    assert(Versioned.read(spark, t, None).count() == 61)
    assert(Versioned.partitionValues(spark, t).collect()
      .forall(_.getString(0).startsWith("k_bucket=")))
    assert(listParquet(s"$t/data").filterNot(_.contains("/dv"))
      .forall(_.contains("__p_k_bucket=")),
      "purge must not undeclare partitioning")
  }

  test("manifest-less PARTITIONED dirs scan conservatively — rows never " +
      "vanish from reads, merges, or graft_files") {
    val t = tmpDir("ptnostat") + "/t"
    Versioned.commitPartitioned(spark, t,
      (1L to 30L).map(i => (i, i)).toDF("k", "v"), Seq("bucket(4, k)"))
    // simulate a legacy/degraded dir: remove its stats manifest
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(s"$t/data"))
      .iterator().asScala.toSeq.reverse
      .filter(_.toString.contains("_stats"))
      .foreach(p => java.nio.file.Files.deleteIfExists(p))
    // the planner must fall to a conservative RECURSIVE listing — a flat
    // one reports a hive-partitioned dir as empty and rows silently
    // VANISH rather than scan
    val (frame, kept, total) = Versioned.readPruned(spark, t, None,
      Seq(ScanPredicate.Bounds("k", Some("5"), Some("5"))))
    assert(kept == total && total > 0)
    assert(frame.count() == 30, "conservative scan must keep every row")
    // graft_files lists the files with honest null row counts
    val meta = spark.sql(s"SELECT * FROM graft_files('$t')").collect()
    assert(meta.nonEmpty && meta.forall(_.isNullAt(2)))
    assert(meta.forall(_.getLong(3) > 0L))
    // a merge keeps the dir's rows referenced
    val (v, _, _) = Versioned.mergePruned(spark, t,
      Seq((5L, 99L)).toDF("k", "v"), "k", Seq("k", "v"))
    val after = Versioned.read(spark, t, Some(v))
    assert(after.count() == 30, "merge must not drop the stat-less dir's rows")
    assert(after.filter(col("k") === 5L).select("v").as[Long].head() == 99L)
  }

  test("trunc mapPoint counts CODE POINTS like Spark substring") {
    import org.apache.spark.sql.types.StringType
    val s2 = "😀z" // astral emoji + 'z'
    val mp = PartSpec.Trunc(1, "c").mapPoint(s2, StringType, "UTC").get
    val viaSpark = spark.range(1)
      .select(substring(lit(s2), 1, 1)).head().getString(0)
    assert(mp == viaSpark, s"mapPoint '$mp' vs Spark substring '$viaSpark'")
    assert(mp == "😀", "one code point, not one UTF-16 unit")
  }

  test("ANALYZE WITH SKETCHES tolerates an all-null dir; quantiles still " +
      "answer from the others") {
    val t = tmpDir("ptnulq") + "/t"
    Versioned.commit(spark, t,
      (1L to 100L).map(i => (i, Option(i.toDouble))).toDF("k", "x"))
    Versioned.commit(spark, t,
      (101L to 110L).map(i => (i, Option.empty[Double])).toDF("k", "x"))
    spark.sql(s"ANALYZE TABLE graft.`$t` COMPUTE STATISTICS " +
      "FOR COLUMNS x WITH SKETCHES").collect()
    val med = Versioned.approxQuantiles(spark, t, "x", Seq(0.5)).get.head
    assert(math.abs(med - 50.0) <= 10.0, s"median off: $med")
  }

  test("declaration guards: float bucket, name collisions, bad source") {
    val t = tmpDir("ptg") + "/t"
    val df = Seq((1.5, 1L, 2L)).toDF("f", "k", "k_bucket")
    intercept[IllegalArgumentException] {
      Versioned.commitPartitioned(spark, t, df, Seq("bucket(4, f)"))
    }
    intercept[IllegalArgumentException] {
      Versioned.commitPartitioned(spark, t, df, Seq("bucket(4, k)"))
    } // derived name k_bucket collides with a real column
    intercept[IllegalArgumentException] {
      Versioned.commitPartitioned(spark, t, df, Seq("bucket(4, nope)"))
    }
  }
}
