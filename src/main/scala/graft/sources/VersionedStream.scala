package graft.sources

import graft.ops.Versioned
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Sink, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** STREAMING SOURCE over a [[Versioned]] table — the Delta streaming
  * source shape: the commit log IS the offset line. Offsets are table
  * VERSIONS (monotone longs minted by the CAS), so the micro-batch
  * contract is exact by construction: batch (start, end] processes the
  * commits in that version range once, the checkpoint stores plain
  * version numbers, and a restart resumes from the last committed
  * version with no dedup state. `readStream.format("graft-versioned")
  * .option("table", path)` — every downstream streaming capability
  * (windows, watermarks, stream-stream joins, foreachBatch sinks)
  * composes on top for free.
  *
  * Two modes:
  *  - `mode=append` (default): each version contributes the rows of its
  *    NEWLY ADDED data dirs, plus `_commit_version`. A version that
  *    REMOVES refs or touches deletion vectors (delete / update / merge
  *    / compact / rollback / overwrite) fails LOUDLY — silently
  *    streaming an append-view of a table that is being rewritten is
  *    how downstreams diverge (the Delta `ignoreChanges` foot-gun,
  *    refused instead of defaulted). Metadata-only commits (constraints)
  *    contribute zero rows and advance the offset.
  *  - `mode=cdf`: the full change feed — row columns plus
  *    `_change_type` ('insert' | 'delete') and `_commit_version`,
  *    computed per version by [[Versioned.changes]] (cost bounded by
  *    each commit's churned files). Updates appear as delete+insert
  *    pairs, exactly the CDF contract.
  *
  * `startingVersion` (default 0) replays history from that version
  * EXCLUSIVE — 0 streams the whole table from its first commit, the
  * latest-at-start value makes a new-rows-only tail.
  *
  * RATE LIMITING (the Delta `maxFilesPerTrigger`/`maxBytesPerTrigger`
  * idea, keyed to this source's natural unit): `maxVersionsPerBatch`
  * caps how many commits one micro-batch drains; `maxBytesPerTrigger`
  * admits whole versions until their added bytes (plus dv sidecars in
  * cdf mode) exceed the budget — the first version always admits, so an
  * oversized commit still flows. A cold start against a long history
  * replays in BOUNDED micro-batches instead of landing everything in
  * one; exactly-once is untouched because offsets stay plain versions
  * and the admission floor tracks the engine's own getBatch calls (so a
  * capped offer can never regress below the checkpoint on restart).
  *
  * 100 TB shape: getOffset is one directory listing; each micro-batch
  * plans a bounded parquet scan over the versions' added dirs (append)
  * or the churned files (cdf) — cost tracks the COMMITS in the batch,
  * never the table. The schema is pinned at stream start from the
  * latest manifest; older dirs null-fill evolved columns exactly as
  * [[Versioned.read]] presents them.
  */
object VersionedStream {

  final case class Opts(table: String, cdf: Boolean, startingVersion: Long,
      maxVersionsPerBatch: Option[Long] = None,
      maxBytesPerTrigger: Option[Long] = None,
      availableNow: Boolean = false)

  def parse(params: Map[String, String]): Opts = {
    val table = params.getOrElse("table",
      throw new IllegalArgumentException(
        "graft-versioned source requires .option(\"table\", <path>)"))
    val mode = params.getOrElse("mode", "append")
    require(mode == "append" || mode == "cdf",
      s"mode must be append|cdf, got $mode")
    def opt(k: String): Option[String] =
      params.get(k.toLowerCase).orElse(params.get(k))
    val maxV = opt("maxVersionsPerBatch").map(_.toLong)
    maxV.foreach(v => require(v >= 1, s"maxVersionsPerBatch must be >= 1: $v"))
    val maxB = opt("maxBytesPerTrigger").map(_.toLong)
    maxB.foreach(b => require(b >= 1, s"maxBytesPerTrigger must be >= 1: $b"))
    Opts(table, mode == "cdf",
      opt("startingVersion").map(_.toLong).getOrElse(0L),
      maxV, maxB,
      opt("availableNow").exists(_.equalsIgnoreCase("true")))
  }

  /** Row columns from the latest manifest's recorded schema, plus the
    * source's metadata columns.
    */
  def sourceSchema(spark: SparkSession, o: Opts): StructType = {
    val v = Versioned.latestVersion(spark, o.table).getOrElse(
      throw new IllegalArgumentException(s"no commits under ${o.table}"))
    val m = Versioned.readManifest(spark, o.table, v)
    val base = m.schemaJson
      .map(j => org.apache.spark.sql.types.DataType.fromJson(j)
        .asInstanceOf[StructType])
      .getOrElse(Versioned.read(spark, o.table).schema)
    val meta =
      (if (o.cdf) Seq(StructField("_change_type", StringType, nullable = false))
       else Seq.empty) :+
        StructField("_commit_version", LongType, nullable = false)
    StructType(base.fields ++ meta)
  }
}

final class VersionedSourceProvider extends StreamSourceProvider
    with StreamSinkProvider with DataSourceRegister {
  override def shortName(): String = "graft-versioned"

  override def sourceSchema(ctx: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), VersionedStream.sourceSchema(ctx.sparkSession,
      VersionedStream.parse(parameters)))

  override def createSource(ctx: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new VersionedSource(ctx.sparkSession, VersionedStream.parse(parameters))

  override def createSink(ctx: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    require(partitionColumns.isEmpty,
      "graft-versioned sink does not take partition columns (layout is the table's)")
    require(outputMode == OutputMode.Append(),
      s"graft-versioned sink supports Append output only, got $outputMode " +
        "(aggregate upserts want foreachBatch + mergePruned)")
    val table = parameters.getOrElse("table",
      throw new IllegalArgumentException(
        "graft-versioned sink requires .option(\"table\", <path>)"))
    new VersionedSink(ctx.sparkSession, table,
      parameters.getOrElse("txnAppId",
        parameters.getOrElse("txnappid", "graft-stream")))
  }
}

/** STREAMING SINK into a [[Versioned]] table — exactly-once the way the
  * Delta sink does it: every appended commit carries a `txn=appId:batchId`
  * mark in its manifest, and `addBatch` first probes [[Versioned.lastTxn]]
  * — a REPLAYED batch (failure between the table commit and the stream
  * checkpoint advancing) finds its own mark already at or above the
  * incoming batch id and no-ops. Composed with the source, table→table
  * streaming replication is exactly-once end to end with no dedup
  * state: versions are the upstream offsets, txn marks are the
  * downstream idempotence.
  */
final class VersionedSink(spark: SparkSession, table: String, appId: String)
    extends Sink {
  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    var attempt = 0
    while (true) {
      if (Versioned.lastTxn(spark, table, appId).exists(_ >= batchId)) return
      attempt += 1
      try {
        Versioned.commit(spark, table,
          org.apache.spark.sql.graftshim.StreamingFrameShim
            .asBatchFrame(spark, data),
          txn = Some(appId -> batchId))
        return
      } catch {
        // a concurrent writer took the version: re-probe the txn mark
        // (the racer may have BEEN this batch's earlier attempt) and retry
        case e: java.util.ConcurrentModificationException =>
          if (attempt >= 5) throw e
      }
    }
  }
  override def toString: String = s"VersionedSink[$table, appId=$appId]"
}

final class VersionedSource(spark: SparkSession, o: VersionedStream.Opts)
    extends Source {

  override val schema: StructType = VersionedStream.sourceSchema(spark, o)
  private val rowFields = schema.fields.dropRight(if (o.cdf) 2 else 1)

  /** Column mapping pinned at source creation: each pinned field's
    * PHYSICAL name. Physical identity is stable across renames, so a
    * batch drained after a mid-run `RENAME COLUMN` still flows its
    * values under the pinned names (instead of silently null-filling a
    * "missing" column); a RESTART re-pins the new names (VERDICT r13
    * item 2 — the stream source surviving the rename).
    */
  private val pinnedPhys: Map[String, String] = {
    val v = Versioned.latestVersion(spark, o.table)
    v.map(Versioned.readManifest(spark, o.table, _).colmap)
      .getOrElse(Map.empty)
  }

  /** Highest version the ENGINE has told us about through getBatch —
    * the admission floor for rate limiting. On a clean restart the
    * engine re-calls `getBatch` with the committed offsets before the
    * first `getOffset` (the v1 source-initialization contract
    * FileStreamSource and the Delta source both rely on), so a capped
    * offer can never regress below the checkpoint and replay consumed
    * versions.
    */
  @volatile private var engineFloor: Long = o.startingVersion

  /** AVAILABLE-NOW BACKFILL (VERDICT r16 item 5): `availableNow=true`
    * pins the table head at SOURCE CREATION (= query start). `getOffset`
    * never offers past the pin, so the drain is a FIXED target even
    * under concurrent writers — `processAllAvailable()` converges, and
    * [[graft.streaming.Streams.drainNow]] is the one-call
    * drain-everything-then-STOP gesture. Composes with both rate limits
    * (the backlog replays in bounded batches up to the pin) and the
    * exactly-once sink marks; a LATER run (same checkpoint) re-pins the
    * new head and drains only the commits in between. Spark's own
    * `Trigger.AvailableNow` wrapper
    * (`spark.sql.streaming.triggerAvailableNowWrapper.enabled`) also
    * self-terminates, but it pins whatever the v1 source's FIRST
    * `getOffset` returns — under a rate limit that is the first CAPPED
    * offer, and the drain stops there, INCOMPLETE (measured in
    * VersionedStreamSpec; the conf's own "extreme care" warning). This
    * option is the complete-AND-bounded path.
    */
  private val pinnedHead: Option[Long] =
    if (o.availableNow) Versioned.latestVersion(spark, o.table) else None

  /** Admitted bytes of one version, for `maxBytesPerTrigger`: the added
    * dirs' file lengths (append mode) plus its dv sidecars (cdf mode —
    * churn cost rides with the dv). One driver listing per version,
    * memoized (commits are immutable).
    */
  private val bytesMemo = scala.collection.mutable.HashMap.empty[Long, Long]
  private def bytesOfVersion(v: Long): Long = bytesMemo.getOrElseUpdate(v, {
    val m = Versioned.readManifest(spark, o.table, v)
    val prevRefs: Set[String] =
      if (v == 1) Set.empty else Versioned.readManifest(spark, o.table, v - 1).refs.toSet
    val prevDvs: Set[String] =
      if (v == 1) Set.empty else Versioned.readManifest(spark, o.table, v - 1).dvs.toSet
    val root = Versioned.dataRoot(spark, o.table)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def sizeOfRef(r: String): Long = {
      val p = new org.apache.hadoop.fs.Path(s"$root/$r")
      if (r.contains('/')) fs.getFileStatus(p).getLen
      else {
        // recursive: a PARTITIONED dir's files live under key=value
        // subdirs — a flat listing would admit it as zero bytes and
        // defeat maxBytesPerTrigger
        val it = fs.listFiles(p, true)
        var sum = 0L
        while (it.hasNext) {
          val st = it.next()
          if (st.getPath.getName.endsWith(".parquet")) sum += st.getLen
        }
        sum
      }
    }
    val added = m.refs.filterNot(prevRefs).map(sizeOfRef).sum
    val dvs = if (o.cdf) m.dvs.filterNot(prevDvs).map(sizeOfRef).sum else 0L
    added + dvs
  })

  override def getOffset: Option[Offset] = {
    val latestLive = Versioned.latestVersion(spark, o.table) match {
      case None => return None
      case Some(l) => l
    }
    // availableNow: never offer past the creation-time pin (a table
    // that had no commits at pin time offers nothing this run)
    val latest =
      if (!o.availableNow) latestLive
      else pinnedHead.fold(return None)(math.min(latestLive, _))
    val base = math.max(o.startingVersion, engineFloor)
    val cappedV = o.maxVersionsPerBatch
      .fold(latest)(mv => math.min(latest, base + mv))
    val capped = o.maxBytesPerTrigger match {
      case None => cappedV
      case Some(budget) =>
        // admit whole versions until the budget is spent; the FIRST
        // version always admits (an oversized commit must still flow)
        var end = base
        var acc = 0L
        var full = false
        while (!full && end < cappedV) {
          val b = bytesOfVersion(end + 1)
          if (end > base && acc + b > budget) full = true
          else { end += 1; acc += b }
        }
        end
    }
    if (capped > o.startingVersion) Some(LongOffset(capped)) else None
  }

  private def ver(off: Offset): Long = off match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => s.json.trim.toLong
    case other => other.json.trim.toLong
  }

  /** Align a per-version PHYSICAL frame to the pinned source schema:
    * each pinned field resolves by its pinned PHYSICAL name (identity on
    * unmapped tables — the historical behavior), evolved-away columns
    * null-fill, order is the manifest's.
    */
  /** A batch column strictly WIDER than its pinned field means the
    * table was TYPE-WIDENED after this stream pinned its schema — the
    * cast below would silently NARROW live values (long→int wraps with
    * ANSI off). Fail loudly like Delta does on non-additive schema
    * change: the restarted stream pins the wide schema and flows.
    */
  private def refuseWidenedBatch(df: DataFrame, f: StructField,
      physName: String): Unit =
    if (df.columns.contains(physName) &&
        Versioned.widens(f.dataType, df.schema(physName).dataType))
      throw new IllegalStateException(
        s"column ${f.name} of ${o.table} widened from " +
          s"${f.dataType.simpleString} to " +
          s"${df.schema(physName).dataType.simpleString} after this stream " +
          "started — restart the stream to pick up the widened schema")

  private def align(df: DataFrame, metaCols: Seq[org.apache.spark.sql.Column])
      : DataFrame =
    df.select(rowFields.map { f =>
      val p = pinnedPhys.getOrElse(f.name, f.name)
      refuseWidenedBatch(df, f, p)
      if (df.columns.contains(p)) col(p).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    } ++ metaCols: _*)

  /** Align a CDF batch (emitted in version `to`'s LOGICAL view) to the
    * pinned source schema through physical identity: pinned field →
    * pinned physical name → `to`'s logical name bearing it. A rename
    * between pin time and `to` thus keeps flowing values under the
    * pinned names; a field `to` dropped null-fills.
    */
  private def alignCdf(df: DataFrame, to: Long,
      metaCols: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val endM = Versioned.readManifest(spark, o.table, to)
    val endNameOfPhys: Map[String, String] = endM.schemaJson
      .map(j => org.apache.spark.sql.types.DataType.fromJson(j)
        .asInstanceOf[StructType].fieldNames.toSeq
        .map(g => endM.physicalOf(g) -> g).toMap)
      .getOrElse(Map.empty)
    df.select(rowFields.map { f =>
      val p = pinnedPhys.getOrElse(f.name, f.name)
      // legacy schema-less feeds align by NAME; schema-carrying feeds
      // resolve strictly through physical identity (a dropped pinned
      // field must null-fill, never alias a namesake)
      val g = if (endNameOfPhys.isEmpty) Some(f.name) else endNameOfPhys.get(p)
      g.filter(df.columns.contains) match {
        case Some(c) =>
          refuseWidenedBatch(df, f, c)
          col(c).cast(f.dataType).as(f.name)
        case None => lit(null).cast(f.dataType).as(f.name)
      }
    } ++ metaCols: _*)
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(ver).getOrElse(o.startingVersion)
    val to = ver(end)
    engineFloor = math.max(engineFloor, math.max(from, to))
    // CDF mode drains the whole admitted range through the BATCHED
    // planner (pure-append runs = one read per schema class — a
    // cold-start backfill over a long append history costs O(batches),
    // not O(versions)); append mode keeps the per-version walk because
    // it must THROW on the first non-append version, not consume it.
    if (o.cdf) {
      val batch =
        if (to <= from)
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        else {
          val feed = Versioned.changesRange(spark, o.table, from + 1, to)
            .withColumnRenamed("change_type", "_change_type")
            .withColumnRenamed("version", "_commit_version")
          alignCdf(feed, to, Seq(col("_change_type"), col("_commit_version")))
        }
      return org.apache.spark.sql.graftshim.StreamingFrameShim
        .asStreamingFrame(spark, batch)
    }
    val frames = ((from + 1) to to).map { v =>
      {
        val m = Versioned.readManifest(spark, o.table, v)
        val prevRefs: Set[String] =
          if (v == 1) Set.empty
          else Versioned.readManifest(spark, o.table, v - 1).refs.toSet
        val prevDvs: Seq[String] =
          if (v == 1) Seq.empty
          else Versioned.readManifest(spark, o.table, v - 1).dvs
        val removed = prevRefs -- m.refs.toSet
        if (removed.nonEmpty || m.dvs != prevDvs)
          throw new IllegalStateException(
            s"version $v of ${o.table} is not append-only (op=${m.op}: " +
              s"${removed.size} refs removed, dvs ${prevDvs.size}->${m.dvs.size}); " +
              "stream with mode=cdf to consume row-level changes")
        val added = m.refs.filterNot(prevRefs).sorted
        if (added.isEmpty)
          align(Versioned.read(spark, o.table, Some(v)).limit(0),
            Seq(lit(v).as("_commit_version")))
        else
          align(spark.read.option("mergeSchema", "true")
      .option("recursiveFileLookup", "true").parquet(
              added.map(d => s"${Versioned.dataRoot(spark, o.table)}/$d"): _*),
            Seq(lit(v).as("_commit_version")))
      }
    }
    val batch = frames.reduceOption(_.unionByName(_))
      .getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema))
    org.apache.spark.sql.graftshim.StreamingFrameShim
      .asStreamingFrame(spark, batch)
  }

  override def stop(): Unit = ()
}
