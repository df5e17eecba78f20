package graft

import graft.streaming.Streams
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType, LongType}

/** The round-7 regression, pinned: the driver regenerated `events.parquet`
  * with `ts` as TIMESTAMP(MICROS, isAdjustedToUTC=false) instead of
  * TIMESTAMP(NANOS) and ten entries silently broke, because both the batch
  * loader and the stream schema hard-coded the int64-nanos surface. The
  * engine must accept every encoding a real lake mixes:
  *
  *  - int64 raw nanos (what `spark.sql.legacy.parquet.nanosAsLong`
  *    surfaces for TIMESTAMP(NANOS) files — simulated here by writing the
  *    long column directly, which round-trips to the identical reader
  *    surface: a LongType `ts`),
  *  - TIMESTAMP_NTZ micros (today's testdata),
  *  - TIMESTAMP_LTZ micros (the adjustedToUTC=true variant).
  *
  * For each encoding, `Tables.normalizeTs` must produce byte-identical
  * session-zoned timestamps, and the file STREAM must agree with the batch
  * read — so the next re-encode cannot break anything without failing here.
  */
class TsEncodingSpec extends SparkSpec {

  // 2020-03-01T00:00:00Z plus offsets that exercise sub-second micros.
  private val baseUs = 1583020800000000L
  private def fixture: Seq[(Long, Long, Long, String, Double, String)] =
    (0 until 20).map { i =>
      (i.toLong, baseUs + i * 137000001L, (i % 3).toLong,
        if (i % 2 == 0) "click" else "purchase", i * 1.5, "{}")
    }

  /** Write the fixture with ts in the given encoding; returns the dir. */
  private def write(encoding: String): String = {
    import spark.implicits._
    val dir = tmpDir(s"ts-enc-$encoding")
    val raw = fixture.toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
    val df = encoding match {
      case "long_nanos" => raw.withColumn("ts", $"ts_us" * 1000L)
      case "ntz_micros" =>
        raw.withColumn("ts", timestamp_micros($"ts_us").cast(TimestampNTZType))
      case "ltz_micros" => raw.withColumn("ts", timestamp_micros($"ts_us"))
    }
    // TIMESTAMP_MICROS keeps LTZ as int64 micros on disk (the lake-
    // canonical physical type), not INT96.
    val key = "spark.sql.parquet.outputTimestampType"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "TIMESTAMP_MICROS")
    try df.select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    finally spark.conf.set(key, prev)
    dir
  }

  private val encodings = Seq("long_nanos", "ntz_micros", "ltz_micros")

  private def canon(df: DataFrame): Seq[(Long, Long)] = {
    import spark.implicits._
    df.select($"event_id", unix_micros($"ts").as("us"))
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
  }

  test("normalizeTs yields identical TimestampType values for all three encodings") {
    val dirs = encodings.map(e => e -> write(e)).toMap
    // preconditions: the three files really do surface three different types
    assert(spark.read.parquet(dirs("long_nanos")).schema("ts").dataType == LongType)
    assert(spark.read.parquet(dirs("ntz_micros")).schema("ts").dataType == TimestampNTZType)
    assert(spark.read.parquet(dirs("ltz_micros")).schema("ts").dataType == TimestampType)

    val results = encodings.map { e =>
      val n = Tables.normalizeTs(spark.read.parquet(dirs(e)))
      assert(n.schema("ts").dataType == TimestampType,
        s"$e must normalize to session-zoned TimestampType")
      e -> canon(n)
    }.toMap
    val expected = fixture.map(r => (r._1, r._2))
    encodings.foreach { e =>
      assert(results(e) == expected,
        s"$e: normalized micros must equal the authored micros exactly")
    }
  }

  test("probeTsType: empty/missing dirs default to NTZ; corrupt footers RETHROW") {
    import graft.streaming.Streams
    // missing path → the documented empty-start default
    assert(Streams.probeTsType(spark, tmpDir("probe-missing") + "/nowhere") ==
      org.apache.spark.sql.types.TimestampNTZType)
    // empty dir → same default
    val empty = tmpDir("probe-empty")
    assert(Streams.probeTsType(spark, empty) ==
      org.apache.spark.sql.types.TimestampNTZType)
    // a corrupt footer must SURFACE, not silently run with a guessed
    // schema (ADVICE r8): the stream would misread every later file
    val corrupt = tmpDir("probe-corrupt")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(corrupt, "bad.parquet"), "junk".getBytes)
    intercept[Exception] { Streams.probeTsType(spark, corrupt) }
  }

  test("eventsFileStream agrees with the batch read under every encoding") {
    encodings.foreach { e =>
      val dir = write(e)
      val streamed = Streams.runToTable(spark,
        Streams.windowedCounts(Streams.eventsFileStream(spark, dir)),
        s"enc_$e", "complete")
        .select(col("win_start").cast("long"), col("event_type"), col("n"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      val batch = Streams.windowedCounts(Streams.eventsBatch(spark, dir))
        .select(col("win_start").cast("long"), col("event_type"), col("n"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(streamed.nonEmpty && streamed == batch,
        s"$e: stream/batch window counts must match (stream=$streamed batch=$batch)")
    }
  }
}
