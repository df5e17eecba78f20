package graft

import graft.ops.Versioned
import org.apache.spark.sql.streaming.Trigger

/** Versioned-table streaming source laws: versions ARE offsets (each
  * commit processed exactly once, checkpoint resume picks up only new
  * versions), append mode refuses non-append commits loudly, cdf mode
  * emits the change feed with commit versions.
  */
class VersionedStreamSpec extends SparkSpec {

  import spark.implicits._

  private def runOnce(table: String, name: String, ck: String,
      mode: String = "append"): org.apache.spark.sql.DataFrame = {
    val q = spark.readStream.format("graft-versioned")
      .option("table", table).option("mode", mode).load()
      .writeStream.format("memory").queryName(name).outputMode("append")
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name)
  }

  test("versions are offsets: history replays once, resume is exactly-once") {
    val t = tmpDir("vstream") + "/t"
    val ck = tmpDir("vstream-ck")
    val out = tmpDir("vstream-out")
    Versioned.commit(spark, t, (1 to 5).map(i => (i.toLong, s"a$i")).toDF("id", "s"))
    Versioned.commit(spark, t, (6 to 10).map(i => (i.toLong, s"b$i")).toDF("id", "s"))
    // durable file sink: the memory sink refuses checkpoint recovery, and
    // the resume law is exactly what needs the recovery path
    def run(): Unit = {
      val q = spark.readStream.format("graft-versioned")
        .option("table", t).load()
        .writeStream.format("parquet").outputMode("append")
        .option("path", out).option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    run()
    val r1 = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val want1 = ((1 to 5).map(i => (i.toLong, s"a$i", 1L)) ++
      (6 to 10).map(i => (i.toLong, s"b$i", 2L))).toSet
    assert(r1 == want1, s"history must replay with commit versions, got $r1")
    // a third commit lands; the SAME checkpoint resumes from version 2 —
    // exactly-once: the new rows appear ONCE and nothing re-emits
    Versioned.commit(spark, t, Seq((11L, "c11")).toDF("id", "s"))
    run()
    val rows2 = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows2.length == 11,
      s"resume must be exactly-once, got ${rows2.length} rows")
    assert(rows2.toSet == want1 + ((11L, "c11", 3L)),
      s"resume must append only the new version, got ${rows2.toSet}")
  }

  test("startingVersion tails the log from a later commit") {
    val t = tmpDir("vstream-tail") + "/t"
    Versioned.commit(spark, t, Seq((1L, "old")).toDF("id", "s"))
    Versioned.commit(spark, t, Seq((2L, "new")).toDF("id", "s"))
    val q = spark.readStream.format("graft-versioned")
      .option("table", t).option("startingVersion", "1").load()
      .writeStream.format("memory").queryName("vs_tail").outputMode("append")
      .option("checkpointLocation", tmpDir("vstream-tail-ck"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("vs_tail").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(got == Set((2L, 2L)), s"startingVersion=1 must skip v1, got $got")
  }

  test("append mode refuses a non-append commit loudly") {
    val t = tmpDir("vstream-dv") + "/t"
    Versioned.commit(spark, t, (1 to 4).map(i => (i.toLong, s"r$i")).toDF("id", "s"))
    Versioned.deleteWhere(spark, t, $"id" === 2L)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      runOnce(t, "vs_refuse", tmpDir("vstream-dv-ck"))
    }
    def messages(x: Throwable): Seq[String] =
      Option(x).toSeq.flatMap(t => Option(t.getMessage).toSeq ++ messages(t.getCause))
    assert(messages(e).exists(_.contains("not append-only")),
      s"a dv commit must fail the append stream with guidance, got: ${messages(e)}")
  }

  test("sink: table-to-table streaming replication is exactly-once across resume") {
    val src = tmpDir("vsink-src") + "/t"
    val dst = tmpDir("vsink-dst") + "/t"
    val ck = tmpDir("vsink-ck")
    Versioned.commit(spark, src, (1 to 5).map(i => (i.toLong, s"a$i")).toDF("id", "s"))
    Versioned.commit(spark, src, (6 to 9).map(i => (i.toLong, s"b$i")).toDF("id", "s"))
    def replicate(): Unit = {
      val q = spark.readStream.format("graft-versioned")
        .option("table", src).load()
        .drop("_commit_version")
        .writeStream.format("graft-versioned")
        .option("table", dst).option("checkpointLocation", ck)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    replicate()
    def dstRows = Versioned.read(spark, dst).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(dstRows.toSet == (1 to 9).map(i =>
      (i.toLong, s"${if (i <= 5) "a" else "b"}$i")).toSet)
    // new upstream commit; resume replicates ONLY it, nothing duplicates
    Versioned.commit(spark, src, Seq((10L, "c10")).toDF("id", "s"))
    replicate()
    assert(dstRows.length == 10 && dstRows.toSet ==
      ((1 to 9).map(i => (i.toLong, s"${if (i <= 5) "a" else "b"}$i")) :+
        (10L, "c10")).toSet,
      s"resume must replicate exactly the new commit once, got $dstRows")
    // the destination's manifests carry the txn marks
    assert(Versioned.lastTxn(spark, dst, "graft-stream").nonEmpty,
      "the sink must record its txn mark in the manifest")
  }

  test("sink: a replayed batch id is a no-op (crash between commit and checkpoint)") {
    val dst = tmpDir("vsink-replay") + "/t"
    val sink = new graft.sources.VersionedSink(spark, dst, "app1")
    import org.apache.spark.sql.graftshim.StreamingFrameShim
    // addBatch consumes already-planned incremental frames; plain batch
    // frames exercise the same path through the shim's retag
    sink.addBatch(0L, Seq((1L, "a")).toDF("id", "s"))
    sink.addBatch(1L, Seq((2L, "b")).toDF("id", "s"))
    // the stream dies after committing batch 1 but before its checkpoint
    // advances: the restart re-delivers batch 1 — must not duplicate
    sink.addBatch(1L, Seq((2L, "b")).toDF("id", "s"))
    val got = Versioned.read(spark, dst).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got.length == 2 && got.toSet == Set((1L, "a"), (2L, "b")),
      s"a replayed batch must be a no-op, got $got")
    assert(Versioned.lastTxn(spark, dst, "app1") == Some(1L))
    // a different app's marks are independent
    assert(Versioned.lastTxn(spark, dst, "app2") == None)
    sink.addBatch(2L, Seq((3L, "c")).toDF("id", "s"))
    assert(Versioned.lastTxn(spark, dst, "app1") == Some(2L))
  }

  test("cdf mode streams inserts and deletes with commit versions") {
    val t = tmpDir("vstream-cdf") + "/t"
    Versioned.commit(spark, t, (1 to 6).map(i => (i.toLong, s"r$i")).toDF("id", "s"))
    Versioned.deleteWhere(spark, t, $"id" % 2L === 0L)
    val got = runOnce(t, "vs_cdf", tmpDir("vstream-cdf-ck"), mode = "cdf")
      .collect().map(r => (r.getLong(0), r.getString(2), r.getLong(3))).toSet
    val want = (1 to 6).map(i => (i.toLong, "insert", 1L)).toSet ++
      Seq(2L, 4L, 6L).map(i => (i, "delete", 2L)).toSet
    assert(got == want, s"cdf stream must carry the full change feed, got $got")
  }

  test("a stream RESUMES across RENAME COLUMN: the rename commit is an " +
      "empty feed version, post-rename appends flow, values survive " +
      "under the pinned names via physical identity") {
    val t = tmpDir("vstream-colmap") + "/t"
    val ck = tmpDir("vstream-colmap-ck")
    val out = tmpDir("vstream-colmap-out")
    Versioned.commit(spark, t, (1 to 4).map(i => (i.toLong, s"a$i")).toDF("id", "s"))
    def run(): Unit = {
      val q = spark.readStream.format("graft-versioned")
        .option("table", t).option("mode", "cdf").load()
        .writeStream.format("parquet").outputMode("append")
        .option("path", out).option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    run()
    assert(spark.read.parquet(out).count() == 4L)
    // RENAME lands while the stream is DOWN (the r13 verdict scenario:
    // the first rename used to brick every consumer tailing the table)
    Versioned.renameColumn(spark, t, "s", "label") // v2
    Versioned.commit(spark, t, Seq((5L, "b5")).toDF("id", "label")) // v3
    run() // the resume drains v2 (empty) + v3 under the NEW schema
    // the new run re-pins the schema: the sink's files carry 's' (old
    // run) and 'label' (new run) — union them by name
    val r = spark.read.option("mergeSchema", "true").parquet(out)
    assert(r.count() == 5L, s"resume must drain exactly the new rows")
    val v3 = r.filter($"_commit_version" === 3L).collect()
    assert(v3.length == 1 && v3.head.getAs[Long]("id") == 5L)
    assert(v3.head.getAs[String]("label") == "b5",
      "post-rename rows must flow under the new name")
    // a MID-RUN rename (pin happens before it): physical identity keeps
    // values flowing under the PINNED (old) names instead of null-filling
    val t2 = tmpDir("vstream-colmap2") + "/t"
    Versioned.commit(spark, t2, Seq((1L, "x1")).toDF("id", "s"))
    val name = "vs_colmap_midrun"
    val q = spark.readStream.format("graft-versioned")
      .option("table", t2).option("mode", "cdf").load()
      .writeStream.format("memory").queryName(name).outputMode("append")
      .start()
    q.processAllAvailable()
    Versioned.renameColumn(spark, t2, "s", "label")
    Versioned.commit(spark, t2, Seq((2L, "x2")).toDF("id", "label"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table(name).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSet
    assert(got == Set((1L, "x1", 1L), (2L, "x2", 3L)),
      s"mid-run rename must keep values flowing under the pinned name: $got")
  }

  test("a TYPE WIDENING after the stream pins its schema fails the batch " +
      "loudly (no silent downcast); a restarted stream pins wide and flows") {
    val t = tmpDir("vstream-widen") + "/t"
    Versioned.commit(spark, t, (1 to 3).map(i => (i, i * 2))
      .toDF("k", "v").selectExpr("CAST(k AS INT) AS k", "CAST(v AS INT) AS v"))
    val name = "vs_widen"
    val q = spark.readStream.format("graft-versioned")
      .option("table", t).option("mode", "cdf").load()
      .writeStream.format("memory").queryName(name).outputMode("append")
      .start()
    q.processAllAvailable()
    assert(spark.table(name).count() == 3L)
    // the widening append lands AFTER the pin: draining it must refuse
    // (the pinned int cast would silently wrap the wide values)
    Versioned.commit(spark, t,
      Seq((Int.MaxValue.toLong + 7L, 10L)).toDF("k", "v"))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
      q.awaitTermination(30000)
      ()
    }
    def rootMsg(x: Throwable): String =
      Option(x.getCause).map(rootMsg).getOrElse(Option(x.getMessage).getOrElse(""))
    assert((e.getMessage + rootMsg(e)).contains("restart the stream"),
      s"the refusal must name the remedy: ${e.getMessage}")
    try q.stop() catch { case _: Throwable => () }
    // a FRESH stream pins the WIDE schema and reads everything
    val name2 = "vs_widen2"
    val q2 = spark.readStream.format("graft-versioned")
      .option("table", t).option("mode", "cdf").load()
      .writeStream.format("memory").queryName(name2).outputMode("append")
      .start()
    q2.processAllAvailable()
    val got = spark.table(name2)
    assert(got.schema("k").dataType.simpleString == "bigint")
    assert(got.count() == 4L &&
      got.filter($"k" === (Int.MaxValue.toLong + 7L)).count() == 1L,
      "the restarted stream must carry the wide value intact")
    q2.stop()
  }

  test("checkpointed RESUME across a type widen: the restarted stream pins " +
      "the wide schema, replays from the checkpoint, and values flow — " +
      "table-to-table replication stays exactly-once") {
    // VERDICT r15 item 4: the 24x7 silver-layer shape. The stream is
    // DOWN when the table widens (proactive ALTER + a wide append);
    // resuming from the same checkpoint must pin the head's wide schema
    // and drain the backlog — no manual state surgery. The sink side
    // exercises the widen-union too: its table was committed narrow by
    // run 1 and receives wide batches from run 2.
    val root = tmpDir("vstream-widen-resume")
    val (src, dst, ckpt) = (s"$root/src", s"$root/dst", s"$root/ckpt")
    Versioned.commit(spark, src, (1 to 3).map(i => (i, i * 2))
      .toDF("k", "v").selectExpr("CAST(k AS INT) AS k", "CAST(v AS INT) AS v"))
    def run(): Unit = {
      val q = spark.readStream.format("graft-versioned")
        .option("table", src).load()
        .writeStream.format("graft-versioned").option("table", dst)
        .option("checkpointLocation", ckpt).start()
      q.processAllAvailable(); q.stop()
    }
    run()
    assert(Versioned.read(spark, dst).count() == 3L)
    // while the stream is down: proactive metadata-only widen + a wide
    // append carrying a value int32 cannot hold
    Versioned.widenColumn(spark, src, "k",
      org.apache.spark.sql.types.LongType)
    Versioned.commit(spark, src,
      Seq((Int.MaxValue.toLong + 7L, 10)).toDF("k", "v")
        .selectExpr("k", "CAST(v AS INT) AS v"))
    run() // resume: pins WIDE, drains the widen commit (empty) + wide data
    val out = Versioned.read(spark, dst)
    assert(out.schema("k").dataType.simpleString == "bigint",
      s"the resumed replica must record the wide type: ${out.schema("k").dataType}")
    assert(out.count() == 4L &&
      out.filter($"k" === (Int.MaxValue.toLong + 7L)).count() == 1L,
      "the resumed stream must carry the wide value intact")
    // exactly-once held across the resume: no duplicated narrow rows
    assert(out.select("k").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L, Int.MaxValue.toLong + 7L))
  }

  test("CDF-mode checkpointed resume across a widen presents the wide view") {
    val root = tmpDir("vstream-widen-resume-cdf")
    val (src, dst, ckpt) = (s"$root/src", s"$root/dst", s"$root/ckpt")
    Versioned.commit(spark, src, (1 to 3).map(i => (i, i * 2))
      .toDF("k", "v").selectExpr("CAST(k AS INT) AS k", "CAST(v AS INT) AS v"))
    def run(): Unit = {
      val q = spark.readStream.format("graft-versioned")
        .option("table", src).option("mode", "cdf").load()
        .writeStream.format("graft-versioned").option("table", dst)
        .option("checkpointLocation", ckpt).start()
      q.processAllAvailable(); q.stop()
    }
    run()
    Versioned.widenColumn(spark, src, "k",
      org.apache.spark.sql.types.LongType)
    Versioned.commit(spark, src,
      Seq((Int.MaxValue.toLong + 9L, 11)).toDF("k", "v")
        .selectExpr("k", "CAST(v AS INT) AS v"))
    run()
    val out = Versioned.read(spark, dst)
    assert(out.schema("k").dataType.simpleString == "bigint",
      s"the CDF replica must present the wide view: ${out.schema("k").dataType}")
    assert(out.filter($"k" === (Int.MaxValue.toLong + 9L))
      .select("_change_type").as[String].collect().toSeq == Seq("insert"),
      "the wide row must arrive as a CDF insert with its value intact")
    assert(out.count() == 4L)
  }

  test("maxVersionsPerBatch: a multi-commit backlog drains in bounded " +
      "batches whose union equals the unlimited run") {
    val t = tmpDir("vstream-rate") + "/t"
    (1 to 4).foreach(c => Versioned.commit(spark, t,
      (1 to 5).map(i => ((c * 100 + i).toLong, s"c$c-$i")).toDF("id", "s")))
    val name = "vs_rate"
    val q = spark.readStream.format("graft-versioned")
      .option("table", t).option("maxVersionsPerBatch", 1).load()
      .writeStream.format("memory").queryName(name).outputMode("append")
      .start()
    q.processAllAvailable()
    val batches = q.recentProgress.count(_.numInputRows > 0)
    q.stop()
    assert(batches == 4,
      s"4 commits under maxVersionsPerBatch=1 must drain as 4 batches: $batches")
    val got = spark.table(name).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val want = (for (c <- 1 to 4; i <- 1 to 5)
      yield ((c * 100 + i).toLong, c.toLong)).toSet
    assert(got == want, "rate-limited batches must compose to the full history")
  }

  test("maxBytesPerTrigger: versions admit whole until the budget spends; " +
      "an oversized first version still flows") {
    val t = tmpDir("vstream-bytes") + "/t"
    (1 to 3).foreach(c => Versioned.commit(spark, t,
      (1 to 50).map(i => ((c * 1000 + i).toLong, s"v$c-$i")).toDF("id", "s")))
    val name = "vs_bytes"
    // budget of 1 byte: every version is oversized — each admits alone
    val q = spark.readStream.format("graft-versioned")
      .option("table", t).option("maxBytesPerTrigger", 1).load()
      .writeStream.format("memory").queryName(name).outputMode("append")
      .start()
    q.processAllAvailable()
    val batches = q.recentProgress.count(_.numInputRows > 0)
    q.stop()
    assert(batches == 3,
      s"a 1-byte budget must admit one oversized version per batch: $batches")
    assert(spark.table(name).count() == 150L)
  }

  test("rate limiting + checkpoint: restart resumes from the committed " +
      "offset, never regressing below it") {
    val t = tmpDir("vstream-rate-ck") + "/t"
    val ck = tmpDir("vstream-rate-ck-ck")
    val out = tmpDir("vstream-rate-ck-out")
    (1 to 3).foreach(c => Versioned.commit(spark, t,
      Seq((c.toLong, s"r$c")).toDF("id", "s")))
    def run(): Unit = {
      val q = spark.readStream.format("graft-versioned")
        .option("table", t).option("maxVersionsPerBatch", 1).load()
        .writeStream.format("parquet").outputMode("append")
        .option("path", out).option("checkpointLocation", ck).start()
      q.processAllAvailable()
      q.stop()
    }
    run()
    assert(spark.read.parquet(out).count() == 3L)
    Versioned.commit(spark, t, Seq((4L, "r4")).toDF("id", "s"))
    run() // a FRESH source instance: its floor must rebuild from the engine
    val rows = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(rows.length == 4 && rows.toSet ==
      (1 to 4).map(c => (c.toLong, c.toLong)).toSet,
      s"restart must replay nothing and append only the new version: $rows")
  }

  test("streaming source over a TRANSFORMED (bucketed) table: hive-staged " +
      "versions stream whole, derived path columns stay invisible") {
    val t = tmpDir("vstream-bucket") + "/t"
    Versioned.commitPartitioned(spark, t,
      (1L to 20L).map(i => (i, s"a$i")).toDF("id", "s"), Seq("bucket(4, id)"))
    Versioned.commit(spark, t,
      (21L to 30L).map(i => (i, s"b$i")).toDF("id", "s"))
    val got = runOnce(t, "vs_bucketed", tmpDir("vstream-bucket-ck"))
    assert(got.columns.toSeq == Seq("id", "s", "_commit_version"),
      s"derived __p_ columns must not leak: ${got.columns.mkString(",")}")
    assert(got.count() == 30)
    assert(got.select("id").as[Long].collect().toSet == (1L to 30L).toSet)
  }

  test("availableNow backfill: a 100-commit cold start drains in bounded " +
      "batches and STOPS; a later drain picks up only new commits; replica " +
      "equality through the exactly-once sink") {
    // VERDICT r16 item 5 — the production backfill gesture
    val t = tmpDir("vstream-anow") + "/t"
    val dst = tmpDir("vstream-anow-dst") + "/t"
    val ck = tmpDir("vstream-anow-ck")
    (1 to 100).foreach(c => Versioned.commit(spark, t,
      Seq((c.toLong, s"r$c")).toDF("id", "s")))
    def drain(): Int = {
      val q = spark.readStream.format("graft-versioned")
        .option("table", t).option("availableNow", "true")
        .option("maxVersionsPerBatch", 10).load()
        .writeStream.format("graft-versioned").option("table", dst)
        .option("txnAppId", "anow").outputMode("append")
        .option("checkpointLocation", ck).start()
      graft.streaming.Streams.drainNow(q)
      assert(!q.isActive, "drainNow must STOP the query")
      q.recentProgress.count(_.numInputRows > 0)
    }
    val b1 = drain()
    assert(b1 == 10,
      s"100 commits at maxVersionsPerBatch=10 must drain as 10 bounded batches: $b1")
    def rows(p: String) = Versioned.read(spark, p).select("id", "s").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows(dst) == rows(t), "cold-start backfill must replicate the snapshot")
    // 20 later commits: a SECOND drain on the same checkpoint re-pins the
    // new head and drains exactly the delta
    (101 to 120).foreach(c => Versioned.commit(spark, t,
      Seq((c.toLong, s"r$c")).toDF("id", "s")))
    val b2 = drain()
    assert(b2 == 2, s"resume must drain only the 20 new commits in 2 batches: $b2")
    assert(rows(dst) == rows(t), "resumed backfill must converge to the head")
  }

  test("availableNow pins the head at source creation: later commits are " +
      "not offered to this run") {
    val t = tmpDir("vstream-anow-pin") + "/t"
    (1 to 3).foreach(c => Versioned.commit(spark, t,
      Seq((c.toLong, s"p$c")).toDF("id", "s")))
    val src = new graft.sources.VersionedSource(spark,
      graft.sources.VersionedStream.parse(
        Map("table" -> t, "availableNow" -> "true")))
    (4 to 6).foreach(c => Versioned.commit(spark, t,
      Seq((c.toLong, s"p$c")).toDF("id", "s")))
    val off = src.getOffset
    assert(off.exists(_.json.trim.toLong == 3L),
      s"a pinned source must never offer past its creation-time head: $off")
  }

  test("Trigger.AvailableNow self-terminates completely through Spark's " +
      "wrapper — but only the source-native availableNow option keeps the " +
      "drain rate-limited") {
    // Spark's AvailableNowSourceWrapper pins whatever the v1 source's
    // FIRST getOffset offers. Unlimited source → the full head, one
    // complete batch. RATE-LIMITED source → the first capped offer, and
    // the wrapper STOPS THERE — an INCOMPLETE backfill (the conf's own
    // "use with extreme care" warning, measured). Both pinned here;
    // the incompleteness is exactly why the source-native
    // `availableNow=true` pin exists (previous tests: bounded AND
    // complete).
    val t = tmpDir("vstream-anow-trig") + "/t"
    (1 to 6).foreach(c => Versioned.commit(spark, t,
      Seq((c.toLong, s"w$c")).toDF("id", "s")))
    spark.conf.set("spark.sql.streaming.triggerAvailableNowWrapper.enabled", "true")
    try {
      // unlimited: one complete batch, self-terminating
      val q = spark.readStream.format("graft-versioned")
        .option("table", t).load()
        .writeStream.format("memory").queryName("vs_anow_trig")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      assert(!q.isActive, "Trigger.AvailableNow must self-terminate")
      assert(spark.table("vs_anow_trig").count() == 6L,
        "an unlimited wrapper drain is complete (one whole-head batch)")
      // rate-limited: the wrapper pins the first capped offer and stops
      // — incomplete by design; use the source-native option instead
      val q2 = spark.readStream.format("graft-versioned")
        .option("table", t).option("maxVersionsPerBatch", 2).load()
        .writeStream.format("memory").queryName("vs_anow_trig2")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q2.awaitTermination()
      assert(spark.table("vs_anow_trig2").count() == 2L,
        "DOCUMENTED: the v1 wrapper truncates a rate-limited backfill at " +
          "the first capped offer — the source-native availableNow pin is " +
          "the complete+bounded path")
    } finally {
      spark.conf.unset("spark.sql.streaming.triggerAvailableNowWrapper.enabled")
      spark.catalog.dropTempView("vs_anow_trig")
      spark.catalog.dropTempView("vs_anow_trig2")
    }
  }
}
