package graft

import graft.llm.Pack
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: the distributed prefix sum must be EXACTLY the naive
  * global-window prefix sum, and chunking must conserve tokens.
  */
class PackSpec extends SparkSpec {

  private def fixture = {
    import spark.implicits._
    // Non-dense, shuffled ids with a zero-token row and a doc longer than
    // the budget (spans several chunks).
    Seq((3L, 5L), (10L, 0L), (17L, 23L), (2L, 7L), (40L, 4L), (41L, 9L), (99L, 1L))
      .toDF("doc_id", "n_tok").repartition(3)
  }

  test("distributed prefix sum equals the naive global window, any bucket width") {
    import spark.implicits._
    val naive = fixture.withColumn("tok_end",
        sum($"n_tok").over(Window.orderBy($"doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("tok_start", $"tok_end" - $"n_tok")
      .select($"doc_id", $"tok_start", $"tok_end")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    for (width <- Seq(1L, 3L, 64L, 1000L)) {
      val dist = Pack.packOffsets(fixture, "doc_id", "n_tok", width)
        .select($"doc_id", $"tok_start", $"tok_end")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(dist == naive, s"bucketWidth=$width")
    }
  }

  test("chunkStats conserves tokens and fills every chunk but the last") {
    import spark.implicits._
    val budget = 10L
    val spans = Pack.packOffsets(fixture, "doc_id", "n_tok", 3L)
    val chunks = Pack.chunkStats(spans, budget)
      .orderBy($"chunk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val totalTok = 5L + 23L + 7L + 4L + 9L + 1L
    assert(chunks.map(_._3).sum == totalTok, "chunk token slots must conserve tokens")
    assert(chunks.map(_._1).toSeq == (0L until (totalTok + budget - 1) / budget).toSeq,
      "chunk ids must be contiguous from 0")
    chunks.dropRight(1).foreach { case (c, _, tok) =>
      assert(tok == budget, s"chunk $c must be exactly full")
    }
    assert(chunks.last._3 == totalTok % budget || chunks.last._3 == budget)
    // the 23-token doc at offset 12 must touch chunks 1..3
    val spanning = Pack.chunkStats(spans, budget)
      .filter($"n_docs" >= 1).count()
    assert(spanning == chunks.length)
  }

  test("zero-token rows never produce chunk rows") {
    import spark.implicits._
    val spans = Pack.packOffsets(fixture, "doc_id", "n_tok", 64L)
    // doc 10 has n_tok=0: start==end, excluded from chunk fan-out
    val z = spans.filter($"doc_id" === 10L).select($"tok_start", $"tok_end").head()
    assert(z.getLong(0) == z.getLong(1))
  }
}
