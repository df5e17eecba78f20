package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Migration-parity tooling: the queries a user runs while SWITCHING
  * engines (the project's whole premise — moving the reference's
  * Postgres-backed tables onto this engine) to prove both sides hold the
  * same data.
  *
  * `q_table_checksum`: an ORDER-INDEPENDENT per-partition checksum — each
  * row renders to one canonical string (numerics through decimal casts so
  * both engines print identical digits; every field null-guarded), hashes
  * through md5 to a 60-bit integer, and the partition checksum is the
  * XOR of row hashes: associative+commutative, so row order, partition
  * count, and merge order cannot change it, and one flipped row flips the
  * checksum. This is the cross-engine handshake DISTINCT/count can't
  * give.
  *
  * `q_table_diff`: snapshot CDC — full-outer join two table generations
  * on the key and classify added / removed / changed / unchanged, the
  * reconciliation report behind every incremental load (and the
  * verification step of an engine migration's dual-write phase).
  *
  * Scale design (100 TB): the checksum is a pure map-side projection
  * (hash per row) + one tiny shuffle of partial XORs per group — the
  * cheapest possible full-table pass, and embarrassingly parallel. The
  * diff is ONE full-outer shuffle join on the key with map-side column
  * compare; classification counts combine map-side.
  */
object ParityQueries extends graft.QueryModule {

  /** md5(canonical)[0,15] as a 60-bit non-negative BIGINT — same law as
    * DuckDB's `CAST('0x' || substr(md5(s), 1, 15) AS bigint)`.
    */
  private def rowHash(canonical: Column): Column =
    conv(substring(md5(canonical), 1, 15), 16, 10).cast("long")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_table_checksum" -> ((s, dir) => {
      import s.implicits._
      val canonical = concat_ws("|",
        $"o_orderkey".cast("string"),
        coalesce($"o_orderstatus", lit("~")),
        $"o_totalprice".cast("decimal(18,2)").cast("string"),
        $"o_orderdate".cast("date").cast("string"))
      Tables(s, dir, "orders")
        .select($"o_orderstatus", rowHash(canonical).as("h"))
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n_rows"),
          bit_xor($"h").as("checksum"),
          sum($"h".cast("decimal(30,0)")).cast("decimal(30,0)").cast("string")
            .as("hash_sum"))
        .orderBy($"o_orderstatus")
    }),

    // Generation B mutates orders deterministically: keys %97 deleted,
    // status flipped to 'X' on %89, price doubled (exact in IEEE) on
    // %91, new negative keys added for %83. The diff report must count
    // each class exactly.
    "q_table_diff" -> ((s, dir) => {
      import s.implicits._
      val a = Tables(s, dir, "orders")
        .select($"o_orderkey".as("k"), $"o_orderstatus".as("st"),
          $"o_totalprice".as("pr"))
      val b0 = a.filter($"k" % 97 =!= 0)
        .withColumn("st", when($"k" % 89 === 0, lit("X")).otherwise($"st"))
        .withColumn("pr", when($"k" % 91 === 0, $"pr" * 2).otherwise($"pr"))
      val b = b0.unionByName(
        a.filter($"k" % 83 === 0).select((-$"k" - 1).as("k"), $"st", $"pr"))
      val joined = a.select($"k", $"st".as("st_a"), $"pr".as("pr_a"))
        .join(b.select($"k", $"st".as("st_b"), $"pr".as("pr_b")),
          Seq("k"), "full_outer")
      joined
        .select($"k",
          when($"st_a".isNull && $"pr_a".isNull, "added")
            .when($"st_b".isNull && $"pr_b".isNull, "removed")
            .when($"st_a" =!= $"st_b" || $"pr_a" =!= $"pr_b", "changed")
            .otherwise("unchanged").as("change"))
        .groupBy($"change")
        .agg(count(lit(1)).as("n"),
          sum($"k".cast("decimal(30,0)")).cast("bigint").as("sum_keys"),
          min($"k").as("min_key"), max($"k").as("max_key"))
        .orderBy($"change")
    }),

    // CDC APPLY (ops/Cdc): the write side of q_table_diff — a
    // deterministic I/U/D feed with per-key versions folded into the
    // orders snapshot. Keys %20==0 carry TWO updates (v1 then v2; the
    // v2 payload must win), %10==5 a delete, %10==3 an insert at a new
    // key. The full merged relation is hashed, so a resolution bug
    // (wrong version winning, delete surviving, base row leaking
    // through the anti-join) is a hash mismatch. Price deltas are the
    // same IEEE double add on both engines.
    "q_cdc_apply" -> ((s, dir) => {
      import s.implicits._
      val base = Tables(s, dir, "orders")
        .select($"o_orderkey".as("k"), $"o_orderstatus".as("st"),
          $"o_totalprice".as("pr"))
      val upd1 = base.filter($"k" % 10 === 0)
        .select($"k", lit("U1").as("st"), ($"pr" + 1.0).as("pr"),
          lit(1L).as("v"), lit("U").as("op"))
      val upd2 = base.filter($"k" % 20 === 0)
        .select($"k", lit("U2").as("st"), ($"pr" + 2.0).as("pr"),
          lit(2L).as("v"), lit("U").as("op"))
      val dels = base.filter($"k" % 10 === 5)
        .select($"k", lit(null).cast("string").as("st"),
          lit(null).cast("double").as("pr"), lit(1L).as("v"), lit("D").as("op"))
      val ins = base.filter($"k" % 10 === 3)
        .select(($"k" + 10000000L).as("k"), lit("N").as("st"), $"pr",
          lit(1L).as("v"), lit("I").as("op"))
      val feed = upd1.unionByName(upd2).unionByName(dels).unionByName(ins)
      graft.ops.Cdc.apply(base, feed, Seq("k"), "v", "op").orderBy($"k")
    }),

    // STREAMING CDC apply (Streams.cdcApplyStream): the same change
    // feed as q_cdc_apply, shipped as TWO log files in version order
    // (v1 changes then v2), one micro-batch each — every batch folds
    // into the parquet target via foreachBatch → Cdc.apply under the
    // staged-swap writer. The batch-split law (CdcSpec) makes the
    // slicing invisible: the final table must hash-equal the one-shot
    // apply, which is exactly this oracle.
    "q_stream_cdc" -> ((s, dir) => {
      import s.implicits._
      val root = sys.props("java.io.tmpdir") +
        s"/graft_streamcdc_${ProcessHandle.current().pid()}"
      val feed = s"$root/feed"; val table = s"$root/table"; val ckpt = s"$root/ckpt"
      graft.ops.FileOps.resetWorkDirs(s, Seq(feed, ckpt, table))
      val base = Tables(s, dir, "orders")
        .select($"o_orderkey".as("k"), $"o_orderstatus".as("st"),
          $"o_totalprice".as("pr"))
      base.write.mode("overwrite").parquet(table)
      val upd1 = base.filter($"k" % 10 === 0)
        .select($"k", lit("U1").as("st"), ($"pr" + 1.0).as("pr"),
          lit(1L).as("v"), lit("U").as("op"))
      val upd2 = base.filter($"k" % 20 === 0)
        .select($"k", lit("U2").as("st"), ($"pr" + 2.0).as("pr"),
          lit(2L).as("v"), lit("U").as("op"))
      val dels = base.filter($"k" % 10 === 5)
        .select($"k", lit(null).cast("string").as("st"),
          lit(null).cast("double").as("pr"), lit(1L).as("v"), lit("D").as("op"))
      val ins = base.filter($"k" % 10 === 3)
        .select(($"k" + 10000000L).as("k"), lit("N").as("st"), $"pr",
          lit(1L).as("v"), lit("I").as("op"))
      def ship(df: org.apache.spark.sql.DataFrame, name: String, mtimeSec: Long): Unit = {
        val stage = s"$root/stage_$name"
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        val part = new java.io.File(stage).listFiles()
          .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
          .head.toPath
        val dest = java.nio.file.Paths.get(s"$feed/$name.parquet")
        java.nio.file.Files.copy(part, dest)
        java.nio.file.Files.setLastModifiedTime(dest,
          java.nio.file.attribute.FileTime.fromMillis(mtimeSec * 1000L))
      }
      // log order via mtime: the file source processes oldest first
      ship(upd1.unionByName(dels).unionByName(ins), "f1_v1", 1000000000L)
      ship(upd2, "f2_v2", 1000000600L)
      graft.streaming.Streams.cdcApplyStream(s, feed, table, Seq("k"), "v", "op", ckpt,
        maxFilesPerBatch = Some(1))
      s.read.parquet(table).orderBy($"k")
    }),

    // Streaming CDC onto a BUCKETED target (Streams.cdcApplyStreamBucketed
    // via Upsert.transformAndSwapBucketed): the same feed, but the target
    // is a metastore table bucketed on k — inside every micro-batch the
    // target reaches the CDC anti-join with NO Exchange (BucketingSpec
    // pins the plan), which at 100 TB is the difference between a silver
    // layer that shuffles the world per batch and one that only shuffles
    // the feed. The batch-split law makes the slicing invisible, so the
    // final table hash-equals the same one-shot-apply oracle.
    "q_stream_cdc_bucketed" -> ((s, dir) => {
      import s.implicits._
      val root = sys.props("java.io.tmpdir") +
        s"/graft_streamcdcb_${ProcessHandle.current().pid()}"
      val feed = s"$root/feed"; val ckpt = s"$root/ckpt"
      graft.ops.FileOps.resetWorkDirs(s, Seq(feed, ckpt))
      val db = "graft_scdcb"
      s.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
      // The in-memory catalog starts empty each JVM, so the DROP above
      // cannot see a PRIOR run's managed-table directory — saveAsTable
      // then fails with LOCATION_ALREADY_EXISTS. Remove the physical
      // residue explicitly before recreating.
      val whDb = new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir"), s"$db.db")
      val whFs = whDb.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (whFs.exists(whDb)) whFs.delete(whDb, true)
      s.sql(s"CREATE DATABASE $db")
      val tbl = s"$db.target"
      val base = Tables(s, dir, "orders")
        .select($"o_orderkey".as("k"), $"o_orderstatus".as("st"),
          $"o_totalprice".as("pr"))
      base.repartition(8, $"k").write.bucketBy(8, "k").sortBy("k").saveAsTable(tbl)
      val upd1 = base.filter($"k" % 10 === 0)
        .select($"k", lit("U1").as("st"), ($"pr" + 1.0).as("pr"),
          lit(1L).as("v"), lit("U").as("op"))
      val upd2 = base.filter($"k" % 20 === 0)
        .select($"k", lit("U2").as("st"), ($"pr" + 2.0).as("pr"),
          lit(2L).as("v"), lit("U").as("op"))
      val dels = base.filter($"k" % 10 === 5)
        .select($"k", lit(null).cast("string").as("st"),
          lit(null).cast("double").as("pr"), lit(1L).as("v"), lit("D").as("op"))
      val ins = base.filter($"k" % 10 === 3)
        .select(($"k" + 10000000L).as("k"), lit("N").as("st"), $"pr",
          lit(1L).as("v"), lit("I").as("op"))
      def ship(df: org.apache.spark.sql.DataFrame, name: String, mtimeSec: Long): Unit = {
        val stage = s"$root/stage_$name"
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        val part = new java.io.File(stage).listFiles()
          .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
          .head.toPath
        val dest = java.nio.file.Paths.get(s"$feed/$name.parquet")
        java.nio.file.Files.copy(part, dest)
        java.nio.file.Files.setLastModifiedTime(dest,
          java.nio.file.attribute.FileTime.fromMillis(mtimeSec * 1000L))
      }
      ship(upd1.unionByName(dels).unionByName(ins), "f1_v1", 1000000000L)
      ship(upd2, "f2_v2", 1000000600L)
      graft.streaming.Streams.cdcApplyStreamBucketed(s, feed, tbl,
        Seq("k"), "v", "op", ckpt, numBuckets = 8, maxFilesPerBatch = Some(1))
      s.table(tbl).orderBy($"k")
    }),

    // STREAMING MERGE into a VERSIONED table (Streams.mergeStreamVersioned
    // over Versioned.mergePruned in MAX-VERSION-WINS discipline — the
    // lakehouse streaming-upsert composition): the target seeds as a
    // key-sorted, stats-carrying versioned commit; the feed ships two
    // files (overlapping key bands, ver 1 then ver 2, plus inserts past
    // max) that arrive as separate micro-batches, each committing a
    // pruned merge — only the files spanning that batch's key band are
    // rewritten (REQUIRED in-query: the final manifest still carries
    // file-granular survivor refs), every batch boundary is
    // time-travelable, and the version column — not arrival order —
    // decides each key (VersionedSpec pins out-of-order/replay
    // convergence). The oracle reconstructs the max-version closure per
    // version band.
    "q_stream_merge" -> ((s, dir) => {
      import s.implicits._
      val root = sys.props("java.io.tmpdir") +
        s"/graft_streammerge_${ProcessHandle.current().pid()}"
      val t = s"$root/t"; val feed = s"$root/feed"; val ckpt = s"$root/ckpt"
      graft.ops.FileOps.resetWorkDirs(s, Seq(t, feed, ckpt))
      val base = Tables(s, dir, "orders")
        .select($"o_orderkey".as("k"), lit(0L).as("ver"),
          $"o_totalprice".as("pr"))
      graft.ops.Versioned.commitWithStats(s, t,
        graft.ops.Layout.sortedByRange(base, Seq($"k"), 16), Seq("k"))
      val maxk = base.agg(max($"k")).head().getLong(0)
      val lo = maxk * 9L / 10L
      val mid = maxk * 95L / 100L
      val f1 = base.filter($"k" >= lo)
        .select($"k", lit(1L).as("ver"), (-$"pr").as("pr"))
      val f2 = base.filter($"k" >= mid)
        .select($"k", lit(2L).as("ver"), ($"pr" * 2).as("pr"))
        .unionByName(base.filter($"k" >= mid)
          .select(($"k" + maxk).as("k"), lit(2L).as("ver"), $"pr"))
      def ship(df: org.apache.spark.sql.DataFrame, name: String, mtimeSec: Long): Unit = {
        val stage = s"$root/stage_$name"
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        val part = new java.io.File(stage).listFiles()
          .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
          .head.toPath
        val dest = java.nio.file.Paths.get(s"$feed/$name.parquet")
        java.nio.file.Files.copy(part, dest)
        java.nio.file.Files.setLastModifiedTime(dest,
          java.nio.file.attribute.FileTime.fromMillis(mtimeSec * 1000L))
      }
      ship(f1, "f1_v1", 1000000000L)
      ship(f2, "f2_v2", 1000000600L)
      graft.streaming.Streams.mergeStreamVersioned(s, feed, t, "k", "ver",
        ckpt, numFiles = 16, maxFilesPerBatch = Some(1))
      val latest = graft.ops.Versioned.latestVersion(s, t).get
      require(latest == 3L, s"two micro-batches must land two commits, at $latest")
      val m = graft.ops.Versioned.readManifest(s, t, latest)
      require(m.refs.exists(_.contains('/')),
        "pruned merges must leave file-granular survivor refs in the manifest")
      graft.ops.Versioned.read(s, t)
        .groupBy($"ver")
        .agg(count(lit(1)).as("n"),
          sum($"pr".cast("decimal(30,2)")).cast("double").as("sum_pr"),
          min($"k").as("min_k"), max($"k").as("max_k"))
        .orderBy($"ver")
    }),

    // STREAMING MV MAINTENANCE (Streams.mvMaintainStream — the full
    // silver→gold loop): micro-batches MERGE into the versioned silver
    // table (max-version-wins) and each commit's CHANGE FEED folds
    // into the gold per-group aggregate via MaterializedView.refresh.
    // Exactly-once end-to-end comes from composing two independently
    // idempotent halves (version-column merge + CAS-landed MV state),
    // not from the stream checkpoint. The oracle reconstructs the
    // max-version closure and aggregates it from scratch, so one hash
    // pins merge semantics AND the churn-bounded fold. REQUIRED
    // in-query: the MV's applied version equals the silver head. At
    // 100 TB: the gold dashboard of a continuously-upserted petabyte
    // stays current at churn cost per batch.
    "q_stream_mv" -> ((s, dir) => {
      import s.implicits._
      val root = sys.props("java.io.tmpdir") +
        s"/graft_streammv_${ProcessHandle.current().pid()}"
      val t = s"$root/t"; val feed = s"$root/feed"
      val ckpt = s"$root/ckpt"; val mv = s"$root/mv"
      graft.ops.FileOps.resetWorkDirs(s, Seq(root))
      new java.io.File(feed).mkdirs()
      val base = Tables(s, dir, "orders")
        .select($"o_orderkey".as("k"), ($"o_orderkey" % 10L).as("g"),
          lit(0L).as("ver"), $"o_totalprice".as("pr"))
      graft.ops.Versioned.commitWithStats(s, t,
        graft.ops.Layout.sortedByRange(base, Seq($"k"), 16), Seq("k"))
      graft.ops.MaterializedView.refresh(s, t, mv, Seq("g"), "pr")
      val maxk = base.agg(max($"k")).head().getLong(0)
      val lo = maxk * 9L / 10L
      val mid = maxk * 95L / 100L
      val f1 = base.filter($"k" >= lo)
        .select($"k", $"g", lit(1L).as("ver"), (-$"pr").as("pr"))
      val f2 = base.filter($"k" >= mid)
        .select($"k", $"g", lit(2L).as("ver"), ($"pr" * 2).as("pr"))
        .unionByName(base.filter($"k" >= mid)
          .select(($"k" + maxk).as("k"), (($"k" + maxk) % 10L).as("g"),
            lit(2L).as("ver"), $"pr"))
      def ship(df: org.apache.spark.sql.DataFrame, name: String, mtimeSec: Long): Unit = {
        val stage = s"$root/stage_$name"
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        val part = new java.io.File(stage).listFiles()
          .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
          .head.toPath
        val dest = java.nio.file.Paths.get(s"$feed/$name.parquet")
        java.nio.file.Files.copy(part, dest)
        java.nio.file.Files.setLastModifiedTime(dest,
          java.nio.file.attribute.FileTime.fromMillis(mtimeSec * 1000L))
      }
      ship(f1, "f1_v1", 1000000000L)
      ship(f2, "f2_v2", 1000000600L)
      graft.streaming.Streams.mvMaintainStream(s, feed, t, "k", "ver",
        mv, Seq("g"), "pr", ckpt, numFiles = 16, maxFilesPerBatch = Some(1))
      val latest = graft.ops.Versioned.latestVersion(s, t).get
      val (_, applied) = graft.ops.MaterializedView.current(s, mv).get
      require(latest == 3L && applied == latest,
        s"the gold view must track the silver head: applied=$applied latest=$latest")
      graft.ops.MaterializedView.readView(s, mv, Seq("g"))
        .select($"g", $"cnt", $"sv".cast("double").as("sv"))
        .orderBy($"g")
    }),

    // STREAMING DRIFT FOLD (Streams.driftFoldStream over
    // IncrementalDrift): the reference side of the KS monitor arrives
    // as a STREAM — three feed files (years ≤1993, 1994, 1995) land as
    // separate micro-batches, each folding into the persisted per-value
    // count state; the monitor then scans ONLY the current sample
    // (>1995). The oracle recomputes the full two-sample KS with
    // DuckDB's window engine, so one hash pins that stream-folded state
    // is BIT-equal to batch recompute — the composition that lets a
    // drift monitor follow a 100 TB feed at O(distinct)/day state cost.
    "q_stream_drift" -> ((s, dir) => {
      import s.implicits._
      val root = sys.props("java.io.tmpdir") +
        s"/graft_streamdrift_${ProcessHandle.current().pid()}"
      val st = s"$root/ks"; val feed = s"$root/feed"; val ckpt = s"$root/ckpt"
      graft.ops.FileOps.resetWorkDirs(s, Seq(root))
      new java.io.File(feed).mkdirs()
      val orders = Tables(s, dir, "orders")
        .select(year($"o_orderdate").as("y"),
          round($"o_totalprice" * 100, 0).cast("long").as("cents"))
      def ship(df: org.apache.spark.sql.DataFrame, name: String, mtimeSec: Long): Unit = {
        val stage = s"$root/stage_$name"
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        val part = new java.io.File(stage).listFiles()
          .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
          .head.toPath
        val dest = java.nio.file.Paths.get(s"$feed/$name.parquet")
        java.nio.file.Files.copy(part, dest)
        java.nio.file.Files.setLastModifiedTime(dest,
          java.nio.file.attribute.FileTime.fromMillis(mtimeSec * 1000L))
      }
      ship(orders.filter($"y" <= 1993).select($"cents"), "f1", 1000000000L)
      ship(orders.filter($"y" === 1994).select($"cents"), "f2", 1000000600L)
      ship(orders.filter($"y" === 1995).select($"cents"), "f3", 1000001200L)
      graft.streaming.Streams.driftFoldStream(s, feed, "cents", st, ckpt,
        maxFilesPerBatch = Some(1))
      graft.ops.IncrementalDrift.monitor(s,
        orders.filter($"y" > 1995).select($"cents"), "cents", st)
    }),

    // Entity resolution over a deterministically dirtied master-data
    // relation: canonical names are 'cust-' + 10 md5 hex chars (high
    // entropy, byte-identical construction in both engines); keys %5==2
    // add a char-DELETION copy (typo class 1, distance 1), keys %5==4 a
    // char-SUBSTITUTION copy ('z' is outside the hex alphabet, distance
    // 1). Both typo sites sit AFTER the 3-char blocking prefix
    // (positions 6-8 of the name), so blocking keeps every true pair;
    // Linkage must re-link each dirty copy to its source and leave the
    // remaining records as singleton entities.
    "q_entity_resolution" -> ((s, dir) => {
      import s.implicits._
      val cust = Tables(s, dir, "customer")
      def canon(c: Column): Column =
        concat(lit("cust-"), substring(md5(c.cast("string")), 1, 10))
      val base = cust.select($"c_custkey".as("id"),
        canon($"c_custkey").as("name"))
      val del = base.filter($"id" % 5 === 2)
        .select(($"id" + 1000000L).as("id"),
          concat(substring($"name", 1, 9), substring($"name", 11, 100))
            .as("name"))
      val sub = base.filter($"id" % 5 === 4)
        .select(($"id" + 2000000L).as("id"),
          concat(substring($"name", 1, 11), lit("z"),
            substring($"name", 13, 100)).as("name"))
      val dirty = base.unionByName(del).unionByName(sub)
      graft.ops.Linkage
        .resolve(dirty, "id", "name", substring(col("name"), 6, 3), 2)
        .withColumn("n_members", count(lit(1))
          .over(org.apache.spark.sql.expressions.Window
            .partitionBy($"entity_id")))
        .orderBy($"record_id")
    }),

    // INCREMENTAL entity resolution (ops/IncrementalLinkage): the same
    // dirtied master-data relation as q_entity_resolution, but resolved
    // in two batches against persisted state — batch 1 indexes the CLEAN
    // records, batch 2 the typo copies, so EVERY true pair crosses the
    // batch boundary and must be found by the probe join + star-edge CC
    // carry-over, never by re-comparing batch 1. The final assignment is
    // hash-checked against the identical full-closure oracle, pinning
    // the law batch(A then B) == full(A ∪ B) at table scale.
    "q_entity_resolution_incremental" -> ((s, dir) => {
      import s.implicits._
      val st = sys.props("java.io.tmpdir") +
        s"/graft_inclinkage_${ProcessHandle.current().pid()}/state"
      graft.ops.FileOps.resetWorkDirs(s, Seq(st))
      val cust = Tables(s, dir, "customer")
      def canon(c: Column): Column =
        concat(lit("cust-"), substring(md5(c.cast("string")), 1, 10))
      val base = cust.select($"c_custkey".as("id"),
        canon($"c_custkey").as("name"))
      val del = base.filter($"id" % 5 === 2)
        .select(($"id" + 1000000L).as("id"),
          concat(substring($"name", 1, 9), substring($"name", 11, 100))
            .as("name"))
      val sub = base.filter($"id" % 5 === 4)
        .select(($"id" + 2000000L).as("id"),
          concat(substring($"name", 1, 11), lit("z"),
            substring($"name", 13, 100)).as("name"))
      graft.ops.IncrementalLinkage.addBatch(s, st, base,
        "id", "name", substring(col("name"), 6, 3), 2)
      graft.ops.IncrementalLinkage.addBatch(s, st, del.unionByName(sub),
        "id", "name", substring(col("name"), 6, 3), 2)
        .withColumn("n_members", count(lit(1))
          .over(org.apache.spark.sql.expressions.Window
            .partitionBy($"entity_id")))
        .orderBy($"record_id")
    }))

  def oracle: Map[String, String] = Map(
    "q_table_checksum" ->
      """WITH h AS (
        |  SELECT o_orderstatus,
        |    CAST('0x' || substr(md5(concat_ws('|',
        |      CAST(o_orderkey AS varchar),
        |      coalesce(o_orderstatus, '~'),
        |      CAST(CAST(o_totalprice AS decimal(18,2)) AS varchar),
        |      CAST(CAST(o_orderdate AS DATE) AS varchar))), 1, 15) AS bigint)
        |      AS h
        |  FROM orders
        |)
        |SELECT o_orderstatus, count(1) AS n_rows,
        |  bit_xor(h) AS checksum,
        |  CAST(CAST(SUM(CAST(h AS decimal(30,0))) AS decimal(30,0)) AS varchar)
        |    AS hash_sum
        |FROM h GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_table_diff" ->
      """WITH a AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS st, o_totalprice AS pr
        |  FROM orders
        |),
        |b AS (
        |  SELECT k,
        |    CASE WHEN k % 89 = 0 THEN 'X' ELSE st END AS st,
        |    CASE WHEN k % 91 = 0 THEN pr * 2 ELSE pr END AS pr
        |  FROM a WHERE k % 97 != 0
        |  UNION ALL
        |  SELECT -k - 1, st, pr FROM a WHERE k % 83 = 0
        |),
        |j AS (
        |  SELECT coalesce(a.k, b.k) AS k,
        |    a.st AS st_a, a.pr AS pr_a, b.st AS st_b, b.pr AS pr_b
        |  FROM a FULL OUTER JOIN b ON a.k = b.k
        |)
        |SELECT CASE WHEN st_a IS NULL AND pr_a IS NULL THEN 'added'
        |            WHEN st_b IS NULL AND pr_b IS NULL THEN 'removed'
        |            WHEN st_a != st_b OR pr_a != pr_b THEN 'changed'
        |            ELSE 'unchanged' END AS change,
        |  count(1) AS n,
        |  CAST(SUM(CAST(k AS decimal(30,0))) AS bigint) AS sum_keys,
        |  min(k) AS min_key, max(k) AS max_key
        |FROM j GROUP BY 1 ORDER BY change""".stripMargin,
    "q_cdc_apply" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS st, o_totalprice AS pr
        |  FROM orders
        |),
        |feed AS (
        |  SELECT k, 'U1' AS st, pr + 1.0::double AS pr, 1 AS v, 'U' AS op
        |  FROM base WHERE k % 10 = 0
        |  UNION ALL
        |  SELECT k, 'U2', pr + 2.0::double, 2, 'U' FROM base WHERE k % 20 = 0
        |  UNION ALL
        |  SELECT k, NULL, NULL, 1, 'D' FROM base WHERE k % 10 = 5
        |  UNION ALL
        |  SELECT k + 10000000, 'N', pr, 1, 'I' FROM base WHERE k % 10 = 3
        |),
        |latest AS (
        |  SELECT k, st, pr, op FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY k
        |      ORDER BY v DESC, op DESC) AS rn
        |    FROM feed) WHERE rn = 1
        |)
        |SELECT b.k, b.st, b.pr FROM base b
        |WHERE NOT EXISTS (SELECT 1 FROM latest l WHERE l.k = b.k)
        |UNION ALL
        |SELECT k, st, pr FROM latest WHERE op != 'D'
        |ORDER BY k""".stripMargin,
    "q_stream_cdc" -> cdcClosureSql,
    // identical closure: bucketing is a physical-layout choice and must
    // be invisible in the applied table
    "q_stream_cdc_bucketed" -> cdcClosureSql,
    "q_stream_merge" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, CAST(0 AS bigint) AS ver, o_totalprice AS pr
        |  FROM orders
        |),
        |mx AS (SELECT MAX(k) AS mk FROM base),
        |f1 AS (
        |  SELECT k, CAST(1 AS bigint) AS ver, -pr AS pr FROM base
        |  WHERE k >= (SELECT mk * 9 // 10 FROM mx)
        |),
        |f2 AS (
        |  SELECT k, CAST(2 AS bigint) AS ver, pr * 2 AS pr FROM base
        |  WHERE k >= (SELECT mk * 95 // 100 FROM mx)
        |  UNION ALL
        |  SELECT k + (SELECT mk FROM mx), CAST(2 AS bigint), pr FROM base
        |  WHERE k >= (SELECT mk * 95 // 100 FROM mx)
        |),
        |merged AS (
        |  SELECT k, ver, pr FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY k ORDER BY ver DESC) AS rn
        |    FROM (SELECT * FROM base UNION ALL
        |          SELECT * FROM f1 UNION ALL SELECT * FROM f2)
        |  ) WHERE rn = 1
        |)
        |SELECT ver, COUNT(1) AS n,
        |  CAST(SUM(CAST(pr AS decimal(30,2))) AS double) AS sum_pr,
        |  MIN(k) AS min_k, MAX(k) AS max_k
        |FROM merged GROUP BY ver ORDER BY ver""".stripMargin,
    "q_stream_mv" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderkey % 10 AS g,
        |    CAST(0 AS bigint) AS ver, o_totalprice AS pr
        |  FROM orders
        |),
        |mx AS (SELECT MAX(k) AS mk FROM base),
        |f1 AS (
        |  SELECT k, g, CAST(1 AS bigint) AS ver, -pr AS pr FROM base
        |  WHERE k >= (SELECT mk * 9 // 10 FROM mx)
        |),
        |f2 AS (
        |  SELECT k, g, CAST(2 AS bigint) AS ver, pr * 2 AS pr FROM base
        |  WHERE k >= (SELECT mk * 95 // 100 FROM mx)
        |  UNION ALL
        |  SELECT k + (SELECT mk FROM mx), (k + (SELECT mk FROM mx)) % 10,
        |    CAST(2 AS bigint), pr
        |  FROM base WHERE k >= (SELECT mk * 95 // 100 FROM mx)
        |),
        |merged AS (
        |  SELECT k, g, ver, pr FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY k ORDER BY ver DESC) AS rn
        |    FROM (SELECT * FROM base UNION ALL
        |          SELECT * FROM f1 UNION ALL SELECT * FROM f2)
        |  ) WHERE rn = 1
        |)
        |SELECT g, CAST(COUNT(1) AS bigint) AS cnt,
        |  CAST(SUM(CAST(pr AS decimal(30,6))) AS double) AS sv
        |FROM merged GROUP BY g ORDER BY g""".stripMargin,
    "q_entity_resolution" -> entityResolutionSql,
    // identical closure: the incremental protocol must land the exact
    // same assignment as the one-shot resolve
    "q_entity_resolution_incremental" -> entityResolutionSql,
    "q_stream_drift" ->
      """WITH o AS (
        |  SELECT year(o_orderdate) AS y,
        |    CAST(ROUND(o_totalprice * 100) AS bigint) AS cents
        |  FROM orders
        |),
        |a AS (SELECT cents AS v FROM o WHERE y <= 1995),
        |b AS (SELECT cents AS v FROM o WHERE y > 1995),
        |na AS (SELECT CAST(COUNT(1) AS bigint) AS n FROM a),
        |nb AS (SELECT CAST(COUNT(1) AS bigint) AS n FROM b),
        |pts AS (
        |  SELECT v, CAST(COUNT(1) AS bigint) AS ca, CAST(0 AS bigint) AS cb
        |  FROM a GROUP BY v
        |  UNION ALL
        |  SELECT v, CAST(0 AS bigint), CAST(COUNT(1) AS bigint) FROM b GROUP BY v
        |),
        |g AS (
        |  SELECT v, CAST(SUM(ca) AS bigint) AS ca, CAST(SUM(cb) AS bigint) AS cb
        |  FROM pts GROUP BY v
        |),
        |c AS (
        |  SELECT v,
        |    CAST(SUM(ca) OVER (ORDER BY v) AS bigint) AS ra,
        |    CAST(SUM(cb) OVER (ORDER BY v) AS bigint) AS rb
        |  FROM g
        |),
        |d AS (
        |  SELECT v, ABS(ra * (SELECT n FROM nb) - rb * (SELECT n FROM na)) AS diff
        |  FROM c
        |)
        |SELECT (SELECT n FROM na) AS n_a, (SELECT n FROM nb) AS n_b,
        |  CAST(MAX(diff) AS bigint) AS ks_num,
        |  CAST(MIN(CASE WHEN diff = (SELECT MAX(diff) FROM d) THEN v END) AS bigint)
        |    AS v_at_max
        |FROM d""".stripMargin)

  // the one-shot CDC closure: shared by q_stream_cdc (path target) and
  // q_stream_cdc_bucketed (bucketed metastore target) — the slicing and
  // the layout must both be invisible in the final table
  private lazy val cdcClosureSql: String =
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS st, o_totalprice AS pr
        |  FROM orders
        |),
        |feed AS (
        |  SELECT k, 'U1' AS st, pr + 1.0::double AS pr, 1 AS v, 'U' AS op
        |  FROM base WHERE k % 10 = 0
        |  UNION ALL
        |  SELECT k, 'U2', pr + 2.0::double, 2, 'U' FROM base WHERE k % 20 = 0
        |  UNION ALL
        |  SELECT k, NULL, NULL, 1, 'D' FROM base WHERE k % 10 = 5
        |  UNION ALL
        |  SELECT k + 10000000, 'N', pr, 1, 'I' FROM base WHERE k % 10 = 3
        |),
        |latest AS (
        |  SELECT k, st, pr, op FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY k
        |      ORDER BY v DESC, op DESC) AS rn
        |    FROM feed) WHERE rn = 1
        |)
        |SELECT b.k, b.st, b.pr FROM base b
        |WHERE NOT EXISTS (SELECT 1 FROM latest l WHERE l.k = b.k)
        |UNION ALL
        |SELECT k, st, pr FROM latest WHERE op != 'D'
        |ORDER BY k""".stripMargin

  private lazy val entityResolutionSql: String =
      """WITH RECURSIVE recs AS (
        |  SELECT c_custkey AS id,
        |    'cust-' || substr(md5(CAST(c_custkey AS varchar)), 1, 10) AS name
        |  FROM customer
        |  UNION ALL
        |  SELECT c_custkey + 1000000,
        |    substr(n, 1, 9) || substr(n, 11)
        |  FROM (SELECT c_custkey,
        |          'cust-' || substr(md5(CAST(c_custkey AS varchar)), 1, 10)
        |            AS n
        |        FROM customer WHERE c_custkey % 5 = 2)
        |  UNION ALL
        |  SELECT c_custkey + 2000000,
        |    substr(n, 1, 11) || 'z' || substr(n, 13)
        |  FROM (SELECT c_custkey,
        |          'cust-' || substr(md5(CAST(c_custkey AS varchar)), 1, 10)
        |            AS n
        |        FROM customer WHERE c_custkey % 5 = 4)
        |),
        |p AS (
        |  SELECT a.id AS id_a, b.id AS id_b
        |  FROM recs a JOIN recs b
        |    ON substr(a.name, 6, 3) = substr(b.name, 6, 3) AND a.id < b.id
        |  WHERE levenshtein(a.name, b.name) <= 2
        |),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM p
        |  UNION SELECT id_b, id_a FROM p
        |),
        |reach(src, lbl) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.src
        |),
        |cc AS (SELECT src AS id, MIN(lbl) AS comp FROM reach GROUP BY src),
        |asg AS (
        |  SELECT r.id AS record_id, coalesce(cc.comp, r.id) AS entity_id
        |  FROM recs r LEFT JOIN cc ON r.id = cc.id
        |)
        |SELECT record_id, entity_id,
        |  CAST(COUNT(1) OVER (PARTITION BY entity_id) AS bigint) AS n_members
        |FROM asg ORDER BY record_id""".stripMargin
}
