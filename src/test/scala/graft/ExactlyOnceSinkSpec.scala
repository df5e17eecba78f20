package graft

import graft.streaming.Streams
import org.apache.spark.sql.functions._

/** The exactly-once sink laws: replaying a (batch, id) pair is a no-op
  * on the table (multiset-identical), a NEW id adds rows, and a replay
  * with CHANGED rows converges to the replay's rows (last-writer-wins
  * within the id's partition) — the three facts that make foreachBatch's
  * at-least-once delivery add up to exactly-once table state.
  */
class ExactlyOnceSinkSpec extends SparkSpec {

  import spark.implicits._

  private def snapshot(table: String): Map[(Long, String, Long), Long] =
    spark.read.parquet(table)
      .groupBy($"k", $"v", $"batch_id".cast("long").as("batch_id"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)) -> r.getLong(3))
      .toMap

  test("same-id replay leaves the table multiset-identical; new id appends") {
    val table = tmpDir("xo-sink") + "/t"
    Streams.writeBatchIdempotent(
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"), 0L, table)
    Streams.writeBatchIdempotent(
      Seq((3L, "c")).toDF("k", "v"), 1L, table)
    val before = snapshot(table)
    // crash-replay of batch 1: same rows, same id
    Streams.writeBatchIdempotent(Seq((3L, "c")).toDF("k", "v"), 1L, table)
    assert(snapshot(table) === before, "replay must be a no-op")
    // genuinely new batch
    Streams.writeBatchIdempotent(Seq((4L, "d")).toDF("k", "v"), 2L, table)
    val after = snapshot(table)
    assert(after.size === before.size + 1)
    assert(after((4L, "d", 2L)) === 1L)
  }

  test("replay with different rows overwrites ONLY that id's partition") {
    val table = tmpDir("xo-sink2") + "/t"
    Streams.writeBatchIdempotent(Seq((1L, "a")).toDF("k", "v"), 0L, table)
    Streams.writeBatchIdempotent(Seq((2L, "b")).toDF("k", "v"), 1L, table)
    // a non-deterministic upstream recomputed batch 1 differently
    Streams.writeBatchIdempotent(Seq((9L, "z")).toDF("k", "v"), 1L, table)
    val snap = snapshot(table)
    assert(snap === Map((1L, "a", 0L) -> 1L, (9L, "z", 1L) -> 1L),
      "batch 0 untouched, batch 1 fully replaced")
  }

  test("replayLastBatch re-executes the highest id and changes nothing") {
    val table = tmpDir("xo-sink3") + "/t"
    Streams.writeBatchIdempotent(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), 0L, table)
    Streams.writeBatchIdempotent(Seq((3L, "c"), (4L, "d")).toDF("k", "v"), 1L, table)
    val before = snapshot(table)
    assert(Streams.replayLastBatch(spark, table) === 1L)
    assert(snapshot(table) === before)
  }
}
