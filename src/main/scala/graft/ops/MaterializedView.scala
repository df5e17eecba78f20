package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained MATERIALIZED VIEW over a [[Versioned]] table
  * — the consumer that makes the change data feed pay for itself: a
  * group-by aggregate (`COUNT(*)`, `SUM(val)` per key, the additive
  * family) kept in lock-step with the source by folding each commit's
  * row-level changes ([[Versioned.changes]]) into the stored groups.
  * Inserts contribute `+1 / +val`, deletes `-1 / -val`; an update (via
  * [[Versioned.updateWhere]] or a merge) is old-image delete + new-image
  * insert, so it nets to exactly the value shift. Groups whose live
  * count reaches zero leave the view.
  *
  * Refresh cost is the CHURN since the last refresh, never the table —
  * `changes` is file-bounded per commit and the fold is one keyed join
  * of (stored groups) × (delta groups). The view of a petabyte source
  * whose day moved 0.01% refreshes at 0.01% cost; the one-shot
  * alternative re-aggregates the petabyte every time. The persisted-
  * index family's ninth member (dedup / ANN / set-join / BM25 /
  * PageRank / linkage / hierarchy / drift / MV).
  *
  * EXACTLY-ONCE fold without a separate cursor: the state dir name
  * carries the applied source version (`state_v%06d`), and a refresh
  * lands via stage + atomic no-overwrite rename — the same CAS
  * discipline as the versioned table's manifests. A crash before the
  * rename leaves only a staging orphan (swept on the next refresh); a
  * replayed refresh targeting an already-applied version loses the
  * rename and no-ops. Either way the state observed is always some
  * prefix of the feed applied exactly once — the at-least-once hazard
  * ADVICE r9 flagged on delete-then-rename cursors cannot arise.
  *
  * Aggregates are maintained on an EXACT carrier: `sv` is
  * `SUM(CAST(val AS decimal(30,6)))` — deletes must cancel inserts to
  * the last digit or a long-lived view drifts (float sums don't
  * cancel; decimal sums do). AVG derives as `sv / cnt` at read time;
  * MIN/MAX are NOT maintainable under deletes without per-group
  * re-aggregation and are deliberately out of scope (use
  * [[Incremental]] for the append-only state family).
  */
object MaterializedView {

  private val StateRe = "state_v(\\d{6})".r

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** (state frame, applied source version), or None before the first
    * refresh. Picks the HIGHEST state version present — a crash between
    * "new state renamed in" and "old state deleted" leaves both, and
    * the newer one is always the truth.
    */
  def current(spark: SparkSession, mvPath: String): Option[(DataFrame, Long)] = {
    val f = fs(spark, mvPath)
    val root = new Path(mvPath)
    if (!f.exists(root)) None
    else {
      val vs = f.listStatus(root).toSeq.map(_.getPath.getName).collect {
        case StateRe(v) => v.toLong
      }
      if (vs.isEmpty) None
      else {
        val v = vs.max
        Some((spark.read.parquet(s"$mvPath/state_v${"%06d".format(v)}"), v))
      }
    }
  }

  private def fullAggregate(snapshot: DataFrame, keyCols: Seq[String],
      valCol: String): DataFrame =
    snapshot.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        sum(col(valCol).cast("decimal(30,6)")).as("sv"))

  /** Bring the view up to the source's latest version. First call seeds
    * with a full aggregate of the latest snapshot; later calls fold only
    * `(applied, latest]`'s changes. Returns the applied version (= the
    * source's latest at read time). Idempotent: a refresh that finds
    * nothing new, or replays a version another refresh already landed,
    * is a state no-op.
    */
  def refresh(spark: SparkSession, srcTable: String, mvPath: String,
      keyCols: Seq[String], valCol: String,
      maxCatchup: Int = 64): Long = {
    val latest = Versioned.latestVersion(spark, srcTable)
      .getOrElse(throw new IllegalArgumentException(s"no commits under $srcTable"))
    val f = fs(spark, mvPath)
    // sweep staging orphans from crashed refreshes (uniquely named — they
    // can wedge nothing, this is just hygiene)
    if (f.exists(new Path(mvPath)))
      f.listStatus(new Path(mvPath)).toSeq.map(_.getPath)
        .filter(_.getName.contains("._staging"))
        .foreach(f.delete(_, true))
    current(spark, mvPath) match {
      case Some((_, applied)) if applied >= latest => applied
      case None =>
        val seeded = fullAggregate(
          Versioned.read(spark, srcTable, Some(latest)), keyCols, valCol)
        landState(spark, mvPath, seeded, latest)
        latest
      case Some((_, applied)) if latest - applied > maxCatchup =>
        // a consumer THIS far behind re-seeds: a thousand-leaf change
        // union costs more (plan size + churned-file scans) than one
        // aggregate of the live snapshot, and the result is identical
        val seeded = fullAggregate(
          Versioned.read(spark, srcTable, Some(latest)), keyCols, valCol)
        landState(spark, mvPath, seeded, latest)
        latest
      case Some((state, applied)) =>
        // weighted delta over the churn: one frame per changed version,
        // union'd (allowMissingColumns: the range may straddle a
        // schema-evolution append), aggregated once
        val w = when(col("change_type") === "insert", lit(1L)).otherwise(lit(-1L))
        val changed = (applied + 1 to latest).map(v =>
            Versioned.changes(spark, srcTable, v))
          .reduce(_.unionByName(_, allowMissingColumns = true))
        val delta = changed
          .withColumn("__w", w)
          .groupBy(keyCols.map(col): _*)
          .agg(sum(col("__w")).as("dc"),
            sum(col("__w") * col(valCol).cast("decimal(30,6)")).as("dsv"))
        // null group keys are legal (a GROUP BY key) — the join must be
        // null-safe or those groups fork into duplicates
        val s = state.alias("s")
        val d = delta.alias("d")
        val cond = keyCols.map(k => col(s"s.$k") <=> col(s"d.$k")).reduce(_ && _)
        val merged = s.join(d, cond, "full_outer")
          .select(
            keyCols.map(k => coalesce(col(s"s.$k"), col(s"d.$k")).as(k)) ++ Seq(
              (coalesce(col("s.cnt"), lit(0L)) + coalesce(col("d.dc"), lit(0L))).as("cnt"),
              (coalesce(col("s.sv"), lit(0).cast("decimal(30,6)")) +
                coalesce(col("d.dsv"), lit(0).cast("decimal(30,6)"))).as("sv")): _*)
          .filter(col("cnt") > 0)
          .select(keyCols.map(col) ++
            Seq(col("cnt"), col("sv").cast("decimal(30,6)").as("sv")): _*)
        landState(spark, mvPath, merged, latest)
        latest
    }
  }

  /** Stage + CAS-rename the state for `version`. Losing the rename means
    * another refresh already applied this version — drop the staging and
    * no-op (the state present is the one we would have written: the fold
    * is a pure function of (source, version)).
    */
  private def landState(spark: SparkSession, mvPath: String,
      state: DataFrame, version: Long): Unit = {
    val f = fs(spark, mvPath)
    val tgt = new Path(s"$mvPath/state_v${"%06d".format(version)}")
    val staging = new Path(
      tgt.toString + s"._staging-${java.util.UUID.randomUUID().toString.take(8)}")
    state.write.mode("overwrite").parquet(staging.toString)
    if (f.exists(tgt)) { f.delete(staging, true); return }
    if (!f.rename(staging, tgt)) {
      f.delete(staging, true)
      if (!f.exists(tgt))
        throw new java.io.IOException(s"MV state rename failed for $tgt")
    }
    // Superseded states are garbage — but keep ONE generation: a reader
    // that resolved current() to the previous version may still be
    // mid-scan of its parquet files; deleting it out from under them
    // fails a read that was valid when planned (ADVICE r10). Deleting
    // older-than-previous is safe because any reader that old has had a
    // full refresh cycle to finish.
    val present = f.listStatus(new Path(mvPath)).toSeq.map(_.getPath)
    val prevGen = present.map(_.getName).collect {
      case StateRe(v) if v.toLong < version => v.toLong
    }.maxOption.getOrElse(-1L)
    present.foreach { p =>
      p.getName match {
        case StateRe(v) if v.toLong < prevGen => f.delete(p, true)
        case _ => ()
      }
    }
  }

  /** The view surfaced for reading: group keys, `cnt`, exact `sv`, and
    * derived `avg` — schema-stable regardless of refresh history.
    */
  def readView(spark: SparkSession, mvPath: String,
      keyCols: Seq[String]): DataFrame = {
    val (state, _) = current(spark, mvPath)
      .getOrElse(throw new IllegalArgumentException(s"no MV state under $mvPath"))
    state.select(keyCols.map(col) ++ Seq(col("cnt"), col("sv"),
      (col("sv") / col("cnt")).cast("decimal(30,6)").as("avg")): _*)
  }

  private def fullAggregateMinMax(snapshot: DataFrame, keyCols: Seq[String],
      valCol: String): DataFrame =
    snapshot.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        sum(col(valCol).cast("decimal(30,6)")).as("sv"),
        min(col(valCol).cast("decimal(30,6)")).as("mn"),
        max(col(valCol).cast("decimal(30,6)")).as("mx"))

  /** [[refresh]] extended past the invertible family: the state also
    * carries per-group MIN/MAX (round-10 verdict #3 — what real gold
    * tables hold), maintained under deletes by the standard bounded-
    * rescan rule. Inserts fold free (`least`/`greatest` against the
    * stored extremes); a delete is the hard case — removing a value
    * EQUAL to the stored extremum leaves the new extremum unknowable
    * from the delta alone (another live row may or may not tie it), so
    * exactly those groups — and only those — re-aggregate their
    * extremes from the live snapshot. A delete strictly inside the
    * stored (mn, mx), or one out-raced by a smaller/larger same-batch
    * insert, costs nothing.
    *
    * 100 TB shape: the fold is still churn-bounded; the rescan is ONE
    * pass feeding only the flagged groups' rows through the aggregate
    * (a semi-join on the churned-extremum keys — at petabyte scale a
    * key-partitioned layout prunes the scan too). COUNT/SUM/AVG stay
    * delta-folded exactly as [[refresh]]. Same CAS state landing —
    * exactly-once, replay no-op. Returns (applied version, groups
    * rescanned, total live groups).
    */
  def refreshMinMax(spark: SparkSession, srcTable: String, mvPath: String,
      keyCols: Seq[String], valCol: String,
      maxCatchup: Int = 64): (Long, Long, Long) = {
    val latest = Versioned.latestVersion(spark, srcTable)
      .getOrElse(throw new IllegalArgumentException(s"no commits under $srcTable"))
    val f = fs(spark, mvPath)
    if (f.exists(new Path(mvPath)))
      f.listStatus(new Path(mvPath)).toSeq.map(_.getPath)
        .filter(_.getName.contains("._staging"))
        .foreach(f.delete(_, true))
    def seed(): (Long, Long, Long) = {
      val seeded = fullAggregateMinMax(
        Versioned.read(spark, srcTable, Some(latest)), keyCols, valCol)
      landState(spark, mvPath, seeded, latest)
      (latest, 0L, current(spark, mvPath).get._1.count())
    }
    current(spark, mvPath) match {
      case Some((state, applied)) if applied >= latest =>
        (applied, 0L, state.count())
      case None => seed()
      case Some((_, applied)) if latest - applied > maxCatchup => seed()
      case Some((state, applied)) =>
        val dec = col(valCol).cast("decimal(30,6)")
        val isIns = col("change_type") === "insert"
        val w = when(isIns, lit(1L)).otherwise(lit(-1L))
        val changed = (applied + 1 to latest).map(v =>
            Versioned.changes(spark, srcTable, v))
          .reduce(_.unionByName(_, allowMissingColumns = true))
        val delta = changed
          .withColumn("__w", w)
          .groupBy(keyCols.map(col): _*)
          .agg(sum(col("__w")).as("dc"),
            sum(col("__w") * dec).as("dsv"),
            min(when(isIns, dec)).as("imn"),
            max(when(isIns, dec)).as("imx"),
            min(when(!isIns, dec)).as("dmn"),
            max(when(!isIns, dec)).as("dmx"))
        val s = state.alias("s")
        val d = delta.alias("d")
        val cond = keyCols.map(k => col(s"s.$k") <=> col(s"d.$k")).reduce(_ && _)
        // least/greatest skip NULLs: a missing side simply doesn't bid
        val candMn = least(col("s.mn"), col("d.imn"))
        val candMx = greatest(col("s.mx"), col("d.imx"))
        // rescan iff a deleted value reaches the candidate extremum —
        // only then could the stored extreme have been the deleted row
        val needRescan =
          (col("d.dmn").isNotNull && (candMn.isNull || col("d.dmn") <= candMn)) ||
          (col("d.dmx").isNotNull && (candMx.isNull || col("d.dmx") >= candMx))
        val merged = s.join(d, cond, "full_outer")
          .select(
            keyCols.map(k => coalesce(col(s"s.$k"), col(s"d.$k")).as(k)) ++ Seq(
              (coalesce(col("s.cnt"), lit(0L)) + coalesce(col("d.dc"), lit(0L))).as("cnt"),
              (coalesce(col("s.sv"), lit(0).cast("decimal(30,6)")) +
                coalesce(col("d.dsv"), lit(0).cast("decimal(30,6)"))).as("sv"),
              candMn.as("cand_mn"), candMx.as("cand_mx"),
              coalesce(needRescan, lit(false)).as("__rescan")): _*)
          .filter(col("cnt") > 0)
          // the fold feeds a count() AND the rescan semi-join AND the
          // landed state — one checkpoint, three consumers
          .transform(graft.ops.Checkpoints.stage)
        val toRescan = merged.filter(col("__rescan"))
          .select(keyCols.map(col): _*)
        val nRescan = toRescan.count()
        val resolved =
          if (nRescan == 0L)
            merged.select(keyCols.map(col) ++ Seq(col("cnt"), col("sv"),
              col("cand_mn").as("mn"), col("cand_mx").as("mx")): _*)
          else {
            val live = Versioned.read(spark, srcTable, Some(latest)).alias("l")
            val g = broadcast(toRescan).alias("g")
            val gcond = keyCols.map(k => col(s"l.$k") <=> col(s"g.$k")).reduce(_ && _)
            val rescanned = live.join(g, gcond, "left_semi")
              .groupBy(keyCols.map(col): _*)
              .agg(min(dec).as("rmn"), max(dec).as("rmx")).alias("r")
            val m = merged.alias("m")
            val rcond = keyCols.map(k => col(s"m.$k") <=> col(s"r.$k")).reduce(_ && _)
            m.join(rescanned, rcond, "left_outer")
              .select(keyCols.map(k => col(s"m.$k").as(k)) ++ Seq(
                col("m.cnt").as("cnt"), col("m.sv").as("sv"),
                coalesce(col("r.rmn"), col("m.cand_mn")).as("mn"),
                coalesce(col("r.rmx"), col("m.cand_mx")).as("mx")): _*)
          }
        landState(spark, mvPath, resolved, latest)
        Checkpoints.free(merged) // landed + counted: the checkpoint is dead
        (latest, nRescan, current(spark, mvPath).get._1.count())
    }
  }

  /** The extrema-carrying view: keys, `cnt`, exact `sv`, derived `avg`,
    * and maintained `mn`/`mx`.
    */
  def readViewMinMax(spark: SparkSession, mvPath: String,
      keyCols: Seq[String]): DataFrame = {
    val (state, _) = current(spark, mvPath)
      .getOrElse(throw new IllegalArgumentException(s"no MV state under $mvPath"))
    state.select(keyCols.map(col) ++ Seq(col("cnt"), col("sv"),
      (col("sv") / col("cnt")).cast("decimal(30,6)").as("avg"),
      col("mn"), col("mx")): _*)
  }

  // ---------------------------------------------------------------------
  // JOIN materialized view — the silver→gold shape that actually ships:
  //   SELECT d.<groupCol>, COUNT(*), SUM(f.<valCol>)
  //   FROM fact f JOIN dim d ON f.<joinKey> = d.<joinKey> GROUP BY 1
  // maintained incrementally from BOTH tables' change feeds via the
  // textbook two-level view graph (incremental view maintenance for
  // SPJ+agg, Gupta/Mumick): level 1 is the per-join-key fact aggregate
  // A(jk → cnt, sv) — invertible, folds from the fact CDF exactly like
  // [[refresh]]; level 2 is the view V(g) = Σ_{(jk,g) ∈ D} A(jk), and
  // the join delta expands as Δ(A⋈D) = ΔA⋈D_new + A_old⋈ΔD — using the
  // NEW dim for the fact-side term absorbs the ΔA⋈ΔD cross term, so two
  // keyed joins of churn-sized deltas maintain the view exactly. The
  // dim need not be unique on the join key (each dim row contributes
  // A(jk) to its group independently); null join keys drop on both
  // sides (inner-join semantics), null GROUPS are legal and fold
  // null-safe.
  //
  // 100 TB shape: the fact side — the petabyte side — is touched only
  // through its CDF (churn-bounded) and never re-scanned after the
  // seed; dim churn costs one keyed join against the STORED level-1
  // aggregate (join-key cardinality, not fact rows). Both levels land
  // in ONE CAS-renamed state dir named by the applied (factV, dimV)
  // pair, so the exactly-once/replay-no-op discipline carries over
  // unchanged.
  // ---------------------------------------------------------------------

  private val JStateRe = "jstate_f(\\d{6})_d(\\d{6})".r

  /** (factAgg, view, applied fact version, applied dim version). */
  def currentJoin(spark: SparkSession, mvPath: String)
      : Option[(DataFrame, DataFrame, Long, Long)] = {
    val f = fs(spark, mvPath)
    val root = new Path(mvPath)
    if (!f.exists(root)) None
    else {
      val vs = f.listStatus(root).toSeq.map(_.getPath.getName).collect {
        case JStateRe(fv, dv) => (fv.toLong, dv.toLong)
      }
      if (vs.isEmpty) None
      else {
        val (fv, dv) = vs.max
        val dir = s"$mvPath/jstate_f${"%06d".format(fv)}_d${"%06d".format(dv)}"
        Some((spark.read.parquet(s"$dir/factagg"),
          spark.read.parquet(s"$dir/view"), fv, dv))
      }
    }
  }

  private def landJoinState(spark: SparkSession, mvPath: String,
      factAgg: DataFrame, view: DataFrame, fv: Long, dv: Long): Unit = {
    val f = fs(spark, mvPath)
    val tgt = new Path(
      s"$mvPath/jstate_f${"%06d".format(fv)}_d${"%06d".format(dv)}")
    val staging = new Path(
      tgt.toString + s"._staging-${java.util.UUID.randomUUID().toString.take(8)}")
    factAgg.write.mode("overwrite").parquet(s"$staging/factagg")
    view.write.mode("overwrite").parquet(s"$staging/view")
    if (f.exists(tgt)) { f.delete(staging, true); return }
    if (!f.rename(staging, tgt)) {
      f.delete(staging, true)
      if (!f.exists(tgt))
        throw new java.io.IOException(s"join-MV state rename failed for $tgt")
    }
    // one-generation retention, the landState reader-grace rule
    val present = f.listStatus(new Path(mvPath)).toSeq.map(_.getPath)
    val gens = present.map(_.getName).collect {
      case JStateRe(a, b) => (a.toLong, b.toLong)
    }.filter(_ != ((fv, dv))).sorted
    gens.dropRight(1).foreach { case (a, b) =>
      f.delete(new Path(
        s"$mvPath/jstate_f${"%06d".format(a)}_d${"%06d".format(b)}"), true)
    }
  }

  /** Bring the join view up to both sources' latest versions. Returns
    * (applied fact version, applied dim version). First call seeds from
    * the live join; a consumer too far behind on either feed re-seeds.
    * `joinKeyFact` names the fact side's join column when it differs
    * from the dim's (`o_custkey` vs `c_custkey`); state is keyed by the
    * DIM's name.
    */
  def refreshJoin(spark: SparkSession, factTable: String, dimTable: String,
      mvPath: String, joinKey: String, groupCol: String, valCol: String,
      maxCatchup: Int = 64, joinKeyFact: Option[String] = None): (Long, Long) = {
    val fk = joinKeyFact.getOrElse(joinKey)
    def normFact(df: DataFrame): DataFrame =
      if (fk == joinKey) df else df.withColumnRenamed(fk, joinKey)
    val latestF = Versioned.latestVersion(spark, factTable)
      .getOrElse(throw new IllegalArgumentException(s"no commits under $factTable"))
    val latestD = Versioned.latestVersion(spark, dimTable)
      .getOrElse(throw new IllegalArgumentException(s"no commits under $dimTable"))
    val f = fs(spark, mvPath)
    if (f.exists(new Path(mvPath)))
      f.listStatus(new Path(mvPath)).toSeq.map(_.getPath)
        .filter(_.getName.contains("._staging"))
        .foreach(f.delete(_, true))
    val dec = col(valCol).cast("decimal(30,6)")

    def seed(): (Long, Long) = {
      val fact = normFact(Versioned.read(spark, factTable, Some(latestF)))
        .filter(col(joinKey).isNotNull)
      val dim = Versioned.read(spark, dimTable, Some(latestD))
        .filter(col(joinKey).isNotNull)
      val factAgg = fact.groupBy(col(joinKey))
        .agg(count(lit(1)).as("cnt"), sum(dec).as("sv"))
      val view = fact.alias("f")
        .join(dim.alias("d"), col(s"f.$joinKey") === col(s"d.$joinKey"))
        .groupBy(col(s"d.$groupCol").as(groupCol))
        .agg(count(lit(1)).as("cnt"),
          sum(col(s"f.$valCol").cast("decimal(30,6)")).as("sv"))
      landJoinState(spark, mvPath, factAgg, view, latestF, latestD)
      (latestF, latestD)
    }

    currentJoin(spark, mvPath) match {
      case Some((_, _, fv, dv)) if fv >= latestF && dv >= latestD => (fv, dv)
      case None => seed()
      case Some((_, _, fv, dv))
          if latestF - fv > maxCatchup || latestD - dv > maxCatchup => seed()
      case Some((factAgg0, view0, fv, dv)) =>
        val w = when(col("change_type") === "insert", lit(1L)).otherwise(lit(-1L))
        // level 1: fact CDF → ΔA per join key (empty frame when caught up)
        val dA =
          if (latestF == fv)
            factAgg0.limit(0).select(col(joinKey), col("cnt").as("dc"),
              col("sv").as("dsv"))
          else normFact((fv + 1 to latestF).map(v =>
              Versioned.changes(spark, factTable, v))
            .reduce(_.unionByName(_, allowMissingColumns = true)))
            .filter(col(joinKey).isNotNull)
            .withColumn("__w", w)
            .groupBy(col(joinKey))
            .agg(sum(col("__w")).as("dc"), sum(col("__w") * dec).as("dsv"))
        val factAgg1 = factAgg0.alias("s")
          .join(dA.alias("d"), col(s"s.$joinKey") === col(s"d.$joinKey"), "full_outer")
          .select(
            coalesce(col(s"s.$joinKey"), col(s"d.$joinKey")).as(joinKey),
            (coalesce(col("s.cnt"), lit(0L)) + coalesce(col("d.dc"), lit(0L))).as("cnt"),
            (coalesce(col("s.sv"), lit(0).cast("decimal(30,6)")) +
              coalesce(col("d.dsv"), lit(0).cast("decimal(30,6)"))).as("sv"))
          .filter(col("cnt") > 0)
        // level 2, term 1: ΔA ⋈ D_new (the new dim absorbs the cross term)
        val dimNew = Versioned.read(spark, dimTable, Some(latestD))
          .filter(col(joinKey).isNotNull)
        val t1 = dA.alias("a")
          .join(dimNew.alias("d"), col(s"a.$joinKey") === col(s"d.$joinKey"))
          .select(col(s"d.$groupCol").as(groupCol),
            col("a.dc").as("dc"), col("a.dsv").as("dsv"))
        // level 2, term 2: A_old ⋈ ΔD (each dim-row change moves the OLD
        // per-key fact mass into/out of its group)
        val t2 =
          if (latestD == dv) t1.limit(0)
          else (dv + 1 to latestD).map(v =>
              Versioned.changes(spark, dimTable, v))
            .reduce(_.unionByName(_, allowMissingColumns = true))
            .filter(col(joinKey).isNotNull)
            .withColumn("__w", w).alias("cd")
            .join(factAgg0.alias("a0"), col(s"cd.$joinKey") === col(s"a0.$joinKey"))
            .select(col(s"cd.$groupCol").as(groupCol),
              (col("__w") * col("a0.cnt")).as("dc"),
              (col("__w") * col("a0.sv")).as("dsv"))
        val dV = t1.unionByName(t2)
          .groupBy(col(groupCol))
          .agg(sum(col("dc")).as("dc"),
            sum(col("dsv")).cast("decimal(30,6)").as("dsv"))
        val view1 = view0.alias("s")
          .join(dV.alias("d"), col(s"s.$groupCol") <=> col(s"d.$groupCol"), "full_outer")
          .select(
            coalesce(col(s"s.$groupCol"), col(s"d.$groupCol")).as(groupCol),
            (coalesce(col("s.cnt"), lit(0L)) + coalesce(col("d.dc"), lit(0L))).as("cnt"),
            (coalesce(col("s.sv"), lit(0).cast("decimal(30,6)")) +
              coalesce(col("d.dsv"), lit(0).cast("decimal(30,6)"))).as("sv"))
          .filter(col("cnt") > 0)
        landJoinState(spark, mvPath, factAgg1, view1, latestF, latestD)
        (latestF, latestD)
    }
  }

  /** The join view surfaced for reading: group, `cnt`, exact `sv`,
    * derived `avg`.
    */
  def readJoinView(spark: SparkSession, mvPath: String,
      groupCol: String): DataFrame = {
    val (_, view, _, _) = currentJoin(spark, mvPath)
      .getOrElse(throw new IllegalArgumentException(s"no join-MV state under $mvPath"))
    view.select(col(groupCol), col("cnt"), col("sv"),
      (col("sv") / col("cnt")).cast("decimal(30,6)").as("avg"))
  }
}
