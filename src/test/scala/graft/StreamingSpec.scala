package graft

import graft.streaming.Streams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming semantics: A7 archive-on-read, watermark late-data drop,
  * streaming dedup — the stateful machinery SURVEY §7 flags as the risk.
  */
class StreamingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("RocksDB state store: session state survives a checkpointed restart") {
    import spark.implicits._
    val root = tmpDir("rocksdb-restart")
    val in = s"$root/in"
    val ckpt = s"$root/ckpt"
    new java.io.File(in).mkdirs()
    val t0 = 1577836800L // 2020-01-01 00:00:00 UTC, epoch seconds
    def feed(rows: Seq[(Long, Long, Long)]): Unit = // (event_id, sec, user_id)
      rows.map { case (id, sec, uid) =>
        (id, sec * 1000000000L, uid, "click", 1.0, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("append").parquet(in)
    def run(name: String) =
      Streams.runToTable(spark,
        Streams.sessionCounts(Streams.eventsFileStream(spark, in)),
        name, "complete", checkpoint = Some(ckpt),
        stateStoreProvider = Some(Streams.RocksDBProvider))

    // run 1: user 7 has two events 10 min apart (one open session),
    // user 8 one event
    feed(Seq((1L, t0, 7L), (2L, t0 + 600, 7L), (3L, t0, 8L)))
    assert(run("rocks_run1").count() == 2)

    // run 2 over the SAME checkpoint: user 7's new event is 10 min after
    // the last — it extends the run-1 session, which only happens if the
    // RocksDB state was recovered on restart (the consumed file is never
    // re-read: the checkpoint pins the source offsets). user 8's event is
    // 2 h later — a genuinely new session.
    feed(Seq((4L, t0 + 1200, 7L), (5L, t0 + 7200, 8L)))
    val got = run("rocks_run2")
      .select($"user_id", $"n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(got(7L) == Seq(3L),
      s"user 7 must have ONE 3-event session (state recovered), got $got")
    assert(got(8L) == Seq(1L, 1L),
      s"user 8 must have two 1-event sessions, got $got")

    // and the state on disk IS RocksDB: its checkpoint uploads version
    // zips, never the HDFS-backed store's .delta files
    val stateFiles = java.nio.file.Files.walk(java.nio.file.Paths.get(s"$ckpt/state"))
      .iterator().asInstanceOf[java.util.Iterator[java.nio.file.Path]]
    val names = scala.jdk.CollectionConverters.IteratorHasAsScala(stateFiles)
      .asScala.map(_.getFileName.toString).toList
    assert(names.exists(_.endsWith(".zip")) && !names.exists(_.endsWith(".delta")),
      s"expected RocksDB zip checkpoints, saw: ${names.filter(_.contains(".")).take(10)}")
  }

  test("csvUpsertStream: checkpointed restarts never re-merge consumed files") {
    import spark.implicits._
    val root = tmpDir("stream-upsert")
    val in = s"$root/in"; val table = s"$root/table"; val ckpt = s"$root/ckpt"
    new java.io.File(in).mkdirs()
    Seq((1.0, "seed-1", 1.5), (9.0, "keep", 9.5)).toDF("k", "s", "v")
      .write.parquet(table)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$in/blob1.csv"), "1.0|from-blob1|2.5\n4.0|ins|4.5")
    Streams.csvUpsertStream(spark, in, table, Seq("k"), ckpt)
    def snapshot() = spark.read.parquet(table).collect()
      .map(r => (r.getDouble(0), r.getString(1), r.getDouble(2))).toSet
    assert(snapshot() == Set((1.0, "from-blob1", 2.5), (4.0, "ins", 4.5), (9.0, "keep", 9.5)))
    // plant a marker on a key blob1 owns — if a restart re-read blob1,
    // the marker would be overwritten back to "from-blob1"
    graft.ops.Upsert.run(spark, table,
      Seq((1.0, "marker", 0.0)).toDF("k", "s", "v"), Seq("k"))
    // restart with the same checkpoint and NO new files: a no-op
    Streams.csvUpsertStream(spark, in, table, Seq("k"), ckpt)
    assert(snapshot().contains((1.0, "marker", 0.0)),
      "restart must not re-merge files the checkpoint already consumed")
    // a NEW blob after restart is merged exactly once, marker still intact
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$in/blob2.csv"), "9.0|from-blob2|0.25")
    Streams.csvUpsertStream(spark, in, table, Seq("k"), ckpt)
    assert(snapshot() == Set((1.0, "marker", 0.0), (4.0, "ins", 4.5), (9.0, "from-blob2", 0.25)))
  }

  test("file source with cleanSource=archive moves processed files (A7 semantics)") {
    val root = tmpDir("stream-archive")
    val in = s"$root/in"
    val archive = s"$root/archive"
    val checkpoint = s"$root/ckpt"
    // copy the events parquet into our own input dir (testdata is read-only)
    new java.io.File(in).mkdirs()
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      java.nio.file.Paths.get(s"$in/batch1.parquet"))
    // Keep ONE continuous query alive: the source cleaner archives a
    // batch's files asynchronously after a later batch commits, on a
    // thread pool that dies with the query — so poll while it runs.
    val stream = Streams.eventsFileStream(spark, in, archiveDir = Some(archive))
    val q = stream.writeStream.format("memory").queryName("archive_test")
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(100))
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("archive_test").count() > 0, "first file must be processed")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sf/events.parquet"),
        java.nio.file.Paths.get(s"$in/batch2.parquet"))
      q.processAllAvailable()
      def archived: Boolean = {
        val d = new java.io.File(archive)
        d.exists() &&
          java.nio.file.Files.walk(d.toPath).filter(_.toString.endsWith(".parquet")).count() > 0
      }
      val deadline = System.currentTimeMillis() + 30000
      while (!archived && System.currentTimeMillis() < deadline) Thread.sleep(250)
      assert(archived, "batch-1 file should be moved under the archive dir")
    } finally q.stop()
  }

  test("watermark drops late data in append-mode windowed agg") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val windowed = mem.toDF().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "10 minutes"), $"k")
      .agg(count(lit(1)).as("n"))
    val q = windowed.writeStream.format("memory").queryName("late_test")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    def t(min: Int) = java.sql.Timestamp.valueOf(f"2020-01-01 ${min / 60}%02d:${min % 60}%02d:00")
    // batch 1: events at 00:05 and 01:00 — watermark advances to 00:50
    mem.addData((t(5), "a"), (t(60), "a"))
    q.processAllAvailable()
    // batch 2: a LATE event at 00:06 (window [00:00,00:10) < watermark) — dropped
    mem.addData((t(6), "a"))
    q.processAllAvailable()
    // batch 3: advance watermark far so all surviving windows emit
    mem.addData((t(200), "a"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("late_test")
      .select($"window.start".cast("string"), $"n").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.getOrElse("2020-01-01 00:00:00", 0L) == 1L,
      s"late event must NOT be added to the closed 00:00 window (got $rows)")
  }

  test("dropDuplicatesWithinWatermark collapses duplicate event_ids (batch-equivalent)") {
    val path = Streams.stageAsDir(s"$sf/events.parquet")
    val doubled = Streams.eventsFileStream(spark, path)
      .union(Streams.eventsFileStream(spark, path))
    val got = Streams.runToTable(spark, Streams.dedupWithinWatermark(doubled),
      "dedup_test", "append")
    val expect = Streams.eventsBatch(spark, path).count()
    assert(got.count() == expect)
  }

  test("streaming session_window equals batch sessionize, session-for-session") {
    import spark.implicits._
    val path = Streams.stageAsDir(s"$sf/events.parquet")
    val streamed = Streams.runToTable(spark, Streams.sessionCounts(
        Streams.eventsFileStream(spark, path)), "sess_eq", "complete")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    val events = Streams.eventsBatch(spark, path)
    val batch = graft.ops.Sessions
      .sessionize(events, $"user_id", $"ts", $"event_id", 1800L)
      .groupBy($"user_id", $"session_idx")
      .agg(min($"ts").as("sess_start"), count(lit(1)).as("n_events"))
      .select($"user_id", $"sess_start", $"n_events")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    assert(streamed.nonEmpty, "fixture must produce sessions")
    assert(streamed == batch,
      s"stream-only=${(streamed -- batch).take(3)} batch-only=${(batch -- streamed).take(3)}")
  }

  test("gap law agrees at the boundary: == gap merges, one second over splits (both engines)") {
    // Sessions.sessionize splits on gap > gapSec; session_window turned
    // out to share the law (an event at exactly sessionEnd still merges
    // — verified here, not assumed). Pin agreement on BOTH sides of the
    // boundary so neither implementation can drift from the other;
    // q_sessionize's oracle anchors the batch law externally.
    import spark.implicits._
    def at(sec: Int) = java.sql.Timestamp
      .valueOf(f"2020-01-01 ${sec / 3600}%02d:${sec % 3600 / 60}%02d:${sec % 60}%02d")
    def laws(gapSec: Int): (Long, Long) = {
      val df = Seq((at(0), 1L, 1L), (at(gapSec), 1L, 2L))
        .toDF("ts", "user_id", "event_id")
      val stream = df
        .groupBy(session_window($"ts", "30 minutes"), $"user_id").count().count()
      val batch = graft.ops.Sessions
        .sessionize(df, $"user_id", $"ts", $"event_id", 1800L)
        .agg(max($"session_idx")).head().getLong(0)
      (stream, batch)
    }
    assert(laws(1800) == ((1L, 1L)), "a gap of exactly 30 min merges under BOTH laws")
    assert(laws(1801) == ((2L, 2L)), "one second over the gap splits under BOTH laws")
  }

  test("stream-stream interval join equals the batch interval join, pair-for-pair") {
    import spark.implicits._
    val stream = Streams.eventsFileStream(spark, Streams.stageAsDir(s"$sf/events.parquet"))
    val streamed = Streams.runToTable(spark, Streams.clickPurchaseJoin(stream),
        "ss_join_eq", "append")
      .select($"click_id", $"purchase_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val events = Streams.eventsBatch(spark, s"$sf/events.parquet")
    val clicks = events.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), $"ts".as("c_ts"), $"event_id".as("click_id"))
    val purchases = events.filter($"event_type" === "purchase")
      .select($"user_id".as("p_user"), $"ts".as("p_ts"), $"event_id".as("purchase_id"))
    val batch = clicks.join(purchases,
        $"c_user" === $"p_user" && $"p_ts" >= $"c_ts" &&
          $"p_ts" <= $"c_ts" + expr("interval 30 minutes"))
      .select($"click_id", $"purchase_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed.nonEmpty, "fixture must produce at least one attributed pair")
    assert(streamed == batch)
  }

  test("left-outer stream-stream join: inner pairs exact, null-emission follows the watermark eviction law") {
    import spark.implicits._
    val stream = Streams.eventsFileStream(spark, Streams.stageAsDir(s"$sf/events.parquet"))
    val streamed = Streams.runToTable(spark, Streams.clickPurchaseJoinOuter(stream),
      "ss_outer_eq", "append")
    val got = streamed
      .select($"click_id", $"purchase_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet

    val events = Streams.eventsBatch(spark, s"$sf/events.parquet")
    val clicks = events.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), $"ts".as("c_ts"), $"event_id".as("click_id"))
    val purchases = events.filter($"event_type" === "purchase")
      .select($"user_id".as("p_user"), $"ts".as("p_ts"), $"event_id".as("purchase_id"))
    val pairs = clicks.join(purchases,
        $"c_user" === $"p_user" && $"p_ts" >= $"c_ts" &&
          $"p_ts" <= $"c_ts" + expr("interval 30 minutes"))
      .select($"click_id", $"purchase_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // the watermark law: global wm = min(max c_ts, max p_ts) - 1h at ms
    // precision; an unmatched click null-emits iff c_ts + 30min < wm
    val maxC = clicks.agg(max(unix_micros($"c_ts"))).head().getLong(0)
    val maxP = purchases.agg(max(unix_micros($"p_ts"))).head().getLong(0)
    val wmUs = (math.min(maxC, maxP) / 1000L - 3600L * 1000L) * 1000L
    val matchedClicks = pairs.map(_._1)
    val expectNulls = clicks
      .filter(unix_micros($"c_ts") + 1800L * 1000000L < wmUs)
      .select($"click_id").collect().map(_.getLong(0)).toSet -- matchedClicks
    assert(got.filter(_._2 >= 0) == pairs, "matched pairs must equal the batch inner join")
    assert(got.filter(_._2 < 0).map(_._1) == expectNulls,
      s"null-emitted clicks must follow the eviction law (got ${got.count(_._2 < 0)}, expect ${expectNulls.size})")
    assert(expectNulls.nonEmpty, "fixture must exercise the null-emission path")
  }

  test("dead-letter stream: corrupt lines preserved byte-exact and replayable after a schema fix") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val root = tmpDir("dlq")
    val in = s"$root/in"; val good = s"$root/good"; val bad = s"$root/bad"
    new java.io.File(in).mkdirs()
    // rows 2 and 4 are valid JSON but `k` is a STRING — dead under the
    // strict long schema, alive under a widened one (the replay story);
    // row 5 is truncated garbage that stays dead forever
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$in/a.jsonl"),
      """{"k":1,"v":"a"}
        |{"k":"two","v":"b"}
        |{"k":3,"v":"c"}
        |{"k":"four","v":"d"}
        |{"k":5,"v":""".stripMargin)
    val strict = StructType(Seq(StructField("k", LongType), StructField("v", StringType)))
    Streams.deadLetterStream(spark, in, strict, good, bad, s"$root/ckpt1")
    assert(spark.read.parquet(good).select($"k").collect().map(_.getLong(0)).toSet
      == Set(1L, 3L))
    val raw = spark.read.parquet(bad).select(col("value")).collect().map(_.getString(0)).toSet
    assert(raw == Set("""{"k":"two","v":"b"}""", """{"k":"four","v":"d"}""", """{"k":5,"v":"""),
      s"DLQ must hold the ORIGINAL bytes, got $raw")

    // the replay: stage the DLQ as a new input, parse under the widened
    // schema — the two schema casualties come back, the garbage stays dead
    val in2 = s"$root/in2"; val good2 = s"$root/good2"; val bad2 = s"$root/bad2"
    new java.io.File(in2).mkdirs()
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$in2/replay.jsonl"),
      raw.toSeq.sorted.mkString("\n"))
    val widened = StructType(Seq(StructField("k", StringType), StructField("v", StringType)))
    Streams.deadLetterStream(spark, in2, widened, good2, bad2, s"$root/ckpt2")
    assert(spark.read.parquet(good2).select($"k").collect().map(_.getString(0)).toSet
      == Set("two", "four"))
    assert(spark.read.parquet(bad2).count() == 1, "true garbage stays in the DLQ")
  }

  test("full-outer stream-stream join: both sides' null-emissions follow their eviction laws") {
    import spark.implicits._
    val stream = Streams.eventsFileStream(spark, Streams.stageAsDir(s"$sf/events.parquet"))
    val streamed = Streams.runToTable(spark, Streams.clickPurchaseJoinFull(stream),
      "ss_full_eq", "append")
    val got = streamed
      .select($"click_id", $"purchase_id").collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))).toSet

    val events = Streams.eventsBatch(spark, s"$sf/events.parquet")
    val clicks = events.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), $"ts".as("c_ts"), $"event_id".as("click_id"))
    val purchases = events.filter($"event_type" === "purchase")
      .select($"user_id".as("p_user"), $"ts".as("p_ts"), $"event_id".as("purchase_id"))
    val pairs = clicks.join(purchases,
        $"c_user" === $"p_user" && $"p_ts" >= $"c_ts" &&
          $"p_ts" <= $"c_ts" + expr("interval 30 minutes"))
      .select($"click_id", $"purchase_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val maxC = clicks.agg(max(unix_micros($"c_ts"))).head().getLong(0)
    val maxP = purchases.agg(max(unix_micros($"p_ts"))).head().getLong(0)
    val wmUs = (math.min(maxC, maxP) / 1000L - 3600L * 1000L) * 1000L
    val expectNullClicks = clicks
      .filter(unix_micros($"c_ts") + 1800L * 1000000L < wmUs)
      .select($"click_id").collect().map(_.getLong(0)).toSet -- pairs.map(_._1)
    val expectNullPurchases = purchases
      .filter(unix_micros($"p_ts") < wmUs)
      .select($"purchase_id").collect().map(_.getLong(0)).toSet -- pairs.map(_._2)
    assert(got.filter(p => p._1 >= 0 && p._2 >= 0) == pairs)
    assert(got.filter(_._2 < 0).map(_._1) == expectNullClicks,
      s"left null-emissions off: got ${got.count(_._2 < 0)} expect ${expectNullClicks.size}")
    assert(got.filter(_._1 < 0).map(_._2) == expectNullPurchases,
      s"right null-emissions off: got ${got.count(_._1 < 0)} expect ${expectNullPurchases.size}")
    assert(expectNullPurchases.nonEmpty, "fixture must exercise the purchase-side path")
  }

  test("sessionsWithTimeout: data-closed sessions exact, timeout eviction follows the watermark law") {
    import spark.implicits._
    val stream = Streams.eventsFileStream(spark, Streams.stageAsDir(s"$sf/events.parquet"))
    val got = Streams.runToTable(spark,
        Streams.sessionsWithTimeout(spark, stream, 1800L), "sess_to_eq", "append")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet

    val events = Streams.eventsBatch(spark, s"$sf/events.parquet")
    val sess = graft.ops.Sessions
      .sessionize(events, $"user_id", $"ts", $"event_id", 1800L)
      .groupBy($"user_id", $"session_idx")
      .agg(min(unix_micros($"ts")).as("start_us"),
        max(unix_micros($"ts")).as("last_us"), count(lit(1)).as("n"))
    val maxUs = events.agg(max(unix_micros($"ts"))).head().getLong(0)
    val wmMs = maxUs / 1000L - 1800L * 1000L
    val lastIdx = sess.groupBy($"user_id")
      .agg(max($"session_idx").as("last_idx"))
    val expect = sess.join(lastIdx, "user_id")
      .select($"user_id", $"start_us", $"n",
        ($"session_idx" === $"last_idx").as("is_last"), $"last_us")
      .collect().flatMap { r =>
        val (uid, start, n, isLast, lastUs) =
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3), r.getLong(4))
        if (!isLast) Some((uid, start, n, "data"))
        else if (lastUs / 1000L + 1800L * 1000L < wmMs) Some((uid, start, n, "timeout"))
        else None
      }.toSet
    assert(got.exists(_._4 == "timeout") && got.exists(_._4 == "data"),
      "fixture must exercise both close paths")
    assert(got == expect,
      s"stream-only=${(got -- expect).take(3)} expect-only=${(expect -- got).take(3)}")
  }

  test("streaming windowed counts equal the batch computation (complete mode)") {
    import spark.implicits._
    val stream = Streams.eventsFileStream(spark, Streams.stageAsDir(s"$sf/events.parquet"))
    val streamed = Streams.runToTable(spark, Streams.windowedCounts(stream),
        "win_batch_eq", "complete")
      .select($"win_start", $"event_type", $"n").collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    val batch = Streams.eventsBatch(spark, s"$sf/events.parquet")
      .groupBy(window($"ts", "10 minutes"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select($"window.start", $"event_type", $"n").collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(streamed == batch)
  }
}
