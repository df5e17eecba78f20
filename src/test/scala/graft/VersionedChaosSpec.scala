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
      rnd.nextInt(7) match {
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
}
