package graft

import graft.ops.{MaterializedView, Versioned}
import org.apache.spark.sql.functions._

/** Randomized REFERENCE-MODEL suite for the versioned table — the
  * strongest kind of law: a seeded random program of every writer verb
  * (append / overwrite / dv delete / merge-on-read update / pruned
  * merge / rollback / compact / optimize-small) runs against both the
  * real table and a driver-side Map model; after EVERY op the snapshot
  * must equal the model, every historical version must replay its
  * recorded state, and an MV refreshed at random points must equal the
  * model's aggregate. Single-op specs prove each verb; this proves the
  * verbs COMPOSE — the regime where table formats actually corrupt
  * (dv after merge after rollback after compact...).
  */
class VersionedChaosSpec extends SparkSpec {

  import spark.implicits._

  private type Model = Map[Long, (String, Long)] // id -> (grp, value)

  private def toDf(m: Seq[(Long, String, Long)]) = m.toDF("id", "g", "v")

  private def snapshot(t: String): Model =
    Versioned.read(spark, t).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap

  test("random verb programs: table == model at every step, history replays, MV tracks") {
    val rnd = new scala.util.Random(20260814L)
    val t = tmpDir("versioned-chaos") + "/t"
    val mv = tmpDir("versioned-chaos") + "/mv"

    var model: Model = (1 to 300).map(i =>
      i.toLong -> (s"g${i % 7}", i.toLong * 3)).toMap
    Versioned.commitWithStats(spark, t,
      graft.ops.Layout.sortedByRange(
        toDf(model.toSeq.map { case (k, (g, v)) => (k, g, v) }.sortBy(_._1)),
        Seq($"id"), 4),
      Seq("id"))
    var history = Vector(model) // history(v-1) = model at version v
    var nextId = 1000L

    def record(): Unit = { history = history :+ model }

    (1 to 24).foreach { step =>
      rnd.nextInt(9) match {
        case 0 => // append fresh rows
          val rows = (0 until 20).map { j =>
            (nextId + j, s"g${rnd.nextInt(7)}", rnd.nextInt(1000).toLong)
          }
          nextId += 20
          Versioned.commit(spark, t, toDf(rows))
          model = model ++ rows.map { case (k, g, v) => k -> (g, v) }
          record()
        case 1 => // dv delete by predicate
          val m = rnd.nextInt(5) + 3
          Versioned.deleteWhere(spark, t, $"id" % m === 0L)
          model = model.filter { case (k, _) => k % m != 0 }
          record()
        case 2 => // merge-on-read update
          val m = rnd.nextInt(4) + 2
          Versioned.updateWhere(spark, t, $"id" % m === 1L,
            Map("v" -> ($"v" + 7L)))
          model = model.map { case (k, (g, v)) =>
            k -> (g, if (k % m == 1) v + 7 else v)
          }
          record()
        case 3 => // pruned merge (last-writer-wins upsert)
          val keys = model.keys.toSeq.sorted.take(15)
          val ins = (0 until 5).map(j => (nextId + j, s"g${rnd.nextInt(7)}",
            rnd.nextInt(1000).toLong))
          nextId += 5
          val batch = keys.map(k => (k, model(k)._1, model(k)._2 + 100L)) ++ ins
          Versioned.mergePruned(spark, t, toDf(batch), "id", Seq("id"), 4)
          model = model ++ batch.map { case (k, g, v) => k -> (g, v) }
          record()
        case 4 => // rollback to a random historical version
          val target = rnd.nextInt(history.size) + 1
          Versioned.rollback(spark, t, target.toLong)
          model = history(target - 1)
          record()
        case 5 => // compact (content-invariant maintenance)
          Versioned.compact(spark, t, numFiles = 3, statsCols = Seq("id"))
          record()
        case 6 => // optimize-small (tail fold, content-invariant)
          Versioned.compactSmall(spark, t, smallBytes = 16 * 1024,
            Seq($"id"), numFiles = 2, statsCols = Seq("id"))
          // a no-op fold commits nothing; track the real version count
          if (Versioned.latestVersion(spark, t).get > history.size) record()
        case 7 => // full MERGE: tombstone deletes + replace updates + inserts
          val live = model.keys.toSeq.sorted
          val dels = live.take(5)
          val upds = live.slice(5, 15)
          val ins = (0 until 5).map(j => (nextId + j, s"g${rnd.nextInt(7)}",
            rnd.nextInt(1000).toLong))
          nextId += 5
          // delete encoded as a negative source value; update replaces
          // the row with the source image
          val batch = dels.map(k => (k, model(k)._1, -1L)) ++
            upds.map(k => (k, model(k)._1, model(k)._2 + 31L)) ++ ins
          Versioned.mergeApply(spark, t, toDf(batch), "id",
            whenMatchedDelete = Some($"src.v" < 0L),
            statsCols = Seq("id"))
          model = (model -- dels) ++
            upds.map(k => k -> (model(k)._1, model(k)._2 + 31L)) ++
            ins.map { case (k, g, v) => k -> (g, v) }
          record()
        case 8 if model.nonEmpty =>
          // conditional MERGE: cond-matched UPDATE (misses stay
          // IN PLACE) + NOT MATCHED BY SOURCE DELETE (full-table clause)
          val live = model.keys.toSeq.sorted
          val keys = live.take(12)
          val batch = keys.map(k => (k, model(k)._1, model(k)._2 + 1000L))
          Versioned.mergeApply(spark, t, toDf(batch), "id",
            whenMatchedUpdate = Some(Map("v" -> $"src.v")),
            whenMatchedUpdateCond = Some($"tgt.v" % 2L === 0L),
            whenNotMatchedBySourceDelete = Some($"tgt.id" % 13L === 5L),
            statsCols = Seq("id"))
          val keySet = keys.toSet
          model = model.map { case (k, (g, v)) =>
            if (keySet.contains(k) && v % 2 == 0) k -> (g, v + 1000L)
            else k -> (g, v)
          }.filter { case (k, _) => keySet.contains(k) || k % 13 != 5 }
          record()
        case _ => () // case-8 draw on an empty model: no-op this step
      }
      assert(snapshot(t) == model, s"divergence from model after step $step")
      if (step % 3 == 0) {
        // MV refreshed mid-program equals the model's aggregate
        MaterializedView.refresh(spark, t, mv, Seq("g"), "v")
        val got = MaterializedView.readView(spark, mv, Seq("g")).collect()
          .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2).longValue))
          .toSet
        val want = model.toSeq.groupBy(_._2._1).map { case (g, rows) =>
          (g, rows.size.toLong, rows.map(_._2._2).sum)
        }.toSet
        assert(got == want, s"MV diverged from model aggregate at step $step")
      }
    }
    // every recorded version replays its state
    history.zipWithIndex.foreach { case (m, i) =>
      val got = Versioned.read(spark, t, Some(i + 1L)).collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
      assert(got == m, s"history replay diverged at version ${i + 1}")
    }
  }

  test("concurrent writers: racing seeded programs converge to the serial " +
      "model under both commit stores") {
    // The regime where table formats actually corrupt is not verb
    // COMPOSITION alone (the single-writer program above) but verb
    // composition UNDER RACES: three writers run deterministic programs
    // on disjoint key slices (k % 3 == w) concurrently — appendRebase
    // (stage-once + publish loop), mergeApply upsert (publish-or-rebase
    // + conflict retry), and deleteWhere (retryOnConflict) — so every
    // conflict path exercises for real. Ownership makes the expected
    // final state the union of each writer's serial model, independent
    // of interleaving. ConditionalPutCommitStore races BARE: its local
    // emulation stages bytes fully and claims via link(2) (content-
    // atomic, like a real conditional PUT), so no synchronization
    // wrapper is needed — the r14 torn-manifest reader race (a racing
    // reader parsing the visible-and-empty claim) is exactly what this
    // exercises.
    for ((storeName, store) <- Seq(
        "rename" -> Versioned.RenameCommitStore,
        "condput" -> Versioned.ConditionalPutCommitStore)) {
      val t = tmpDir(s"versioned-race-$storeName") + "/t"
      val prev = Versioned.commitStore
      Versioned.commitStore = store
      try {
        val seedRows = (1 to 60).map(i => (i.toLong, s"g${i % 3}", i.toLong))
        Versioned.commitWithStats(spark, t,
          graft.ops.Layout.sortedByRange(toDf(seedRows), Seq($"id"), 4),
          Seq("id"))
        val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
        val threads = (0 until 3).map { w =>
          new Thread(() => {
            try {
              // op1: append fresh keys in the writer's own range
              val fresh = (0 until 5).map(j =>
                (1000L + w * 100 + j, s"g$w", w * 10L + j))
              Versioned.appendRebase(spark, t, toDf(fresh), maxAttempts = 30)
              // op2: upsert the writer's OWNED live keys to v = k * 10
              val owned = (1 to 60).filter(_ % 3 == w)
              val batch = owned.map(k => (k.toLong, s"g${k % 3}", k * 10L))
              Versioned.mergeApply(spark, t, toDf(batch), "id",
                whenMatchedUpdate = Some(Map("v" -> $"src.v")),
                statsCols = Seq("id"), maxAttempts = 30)
              // op3: delete three owned keys (attempts sized for a
              // loaded machine: each lost race re-executes, and three
              // writers + maintenance can cost several)
              val dels = owned.take(3).map(_.toLong)
              Versioned.deleteWhere(spark, t, $"id".isin(dels: _*),
                maxAttempts = 30)
              // op4 (writer 0 only): MAINTENANCE racing the other
              // writers — compact is content-invariant, so the expected
              // model is untouched however the race interleaves; its
              // pinned-read retry must absorb concurrent commits
              if (w == 0)
                Versioned.compact(spark, t, numFiles = 3,
                  statsCols = Seq("id"), maxAttempts = 30)
            } catch { case e: Throwable => errs.add(e) }
          })
        }
        threads.foreach(_.start())
        threads.foreach(_.join(300000))
        assert(errs.isEmpty,
          s"[$storeName] writer program failed: ${Option(errs.peek())}")
        // expected = union of the three writers' serial models
        val expected: Model =
          ((1 to 60).map { k =>
            k.toLong -> (s"g${k % 3}", k * 10L) // upserted by its owner
          } ++ (for (w <- 0 until 3; j <- 0 until 5)
            yield (1000L + w * 100 + j) -> (s"g$w", w * 10L + j))).toMap --
            (for (w <- 0 until 3)
              yield (1 to 60).filter(_ % 3 == w).take(3).map(_.toLong))
              .flatten
        assert(snapshot(t) == expected,
          s"[$storeName] racing writers must converge to the serial union")
        // the commit log is contiguous and every manifest readable
        val latest = Versioned.latestVersion(spark, t).get
        assert(latest == 11L,
          s"[$storeName] 1 seed + 9 writer commits + 1 compact must claim " +
            s"versions 1..11 exactly, got head $latest")
        (1L to latest).foreach { v =>
          Versioned.read(spark, t, Some(v)).count() // parses + scans
        }
      } finally Versioned.commitStore = prev
    }
  }

  test("branch chaos: interleaved root/branch verb streams stay isolated; promote legality") {
    val rnd = new scala.util.Random(4242L)
    val base = tmpDir("versioned-chaos-branch")
    val t = s"$base/t"
    var rootModel: Model = (1 to 200).map(i =>
      i.toLong -> (s"g${i % 5}", i.toLong)).toMap
    Versioned.commit(spark, t,
      toDf(rootModel.toSeq.map { case (k, (g, v)) => (k, g, v) }))
    val dev = Versioned.branch(spark, t, "dev")
    val forkModel: Model = rootModel
    var devModel: Model = rootModel
    var rootAdvanced = false
    var nextId = 5000L

    (1 to 14).foreach { step =>
      val onRoot = rnd.nextBoolean()
      val (table, model) = if (onRoot) (t, rootModel) else (dev, devModel)
      val next: Model = rnd.nextInt(3) match {
        case 0 =>
          val rows = (0 until 10).map(j =>
            (nextId + j, s"g${rnd.nextInt(5)}", rnd.nextInt(100).toLong))
          nextId += 10
          Versioned.commit(spark, table, toDf(rows))
          model ++ rows.map { case (k, g, v) => k -> (g, v) }
        case 1 =>
          val m = rnd.nextInt(4) + 3
          Versioned.deleteWhere(spark, table, $"id" % m === 0L)
          model.filter { case (k, _) => k % m != 0 }
        case 2 =>
          val m = rnd.nextInt(3) + 2
          Versioned.updateWhere(spark, table, $"id" % m === 1L,
            Map("v" -> ($"v" + 11L)))
          model.map { case (k, (g, v)) =>
            k -> (g, if (k % m == 1) v + 11 else v) }
      }
      if (onRoot) { rootModel = next; rootAdvanced = true }
      else devModel = next
      assert(snapshot(t) == rootModel, s"root diverged at step $step")
      assert(snapshot(dev) == devModel, s"branch diverged at step $step")
    }
    // promote legality mirrors whether the root advanced since the fork
    if (rootAdvanced) {
      val e = intercept[IllegalArgumentException] { Versioned.promote(spark, dev) }
      assert(e.getMessage.contains("advanced since the fork"))
    }
    // merge3 legality on the same chaotic pair: the outcome must be
    // either a loud file-overlap refusal, or a merged snapshot equal to
    // the row-level three-way reconciliation (file-disjoint touches
    // imply each key was changed by at most one side)
    try {
      Versioned.merge3(spark, dev)
      val keys = forkModel.keySet ++ rootModel.keySet ++ devModel.keySet
      val merged: Model = keys.flatMap { k =>
        val rootChanged = rootModel.get(k) != forkModel.get(k)
        val pick = if (rootChanged) rootModel.get(k) else devModel.get(k)
        pick.map(k -> _)
      }.toMap
      assert(snapshot(t) == merged,
        "a landed merge3 must equal the three-way row-level reconciliation")
    } catch {
      case e: IllegalStateException =>
        assert(e.getMessage.contains("both touched"),
          s"merge3 may refuse only on file overlap, got: ${e.getMessage}")
    }
    // a quiet-root fork always promotes cleanly after the same verb mix
    val t2 = s"$base/t2"
    Versioned.commit(spark, t2,
      (1 to 50).map(i => (i.toLong, s"g${i % 3}", i.toLong)).toDF("id", "g", "v"))
    val dev2 = Versioned.branch(spark, t2, "dev")
    Versioned.deleteWhere(spark, dev2, $"id" % 5 === 0L)
    Versioned.updateWhere(spark, dev2, $"id" % 2 === 1L, Map("v" -> ($"v" * 2L)))
    Versioned.commit(spark, dev2, Seq((999L, "g0", 7L)).toDF("id", "g", "v"))
    Versioned.promote(spark, dev2)
    assert(snapshot(t2) == snapshot(dev2),
      "the promoted root must equal the branch head")
  }
}
