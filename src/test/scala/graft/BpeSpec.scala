package graft

import graft.llm.Bpe
import org.apache.spark.sql.functions._

/** BPE training + encoding vs an independent textbook implementation
  * (list-of-symbols fold, written here from the algorithm definition),
  * plus the adjacency edge cases the delimiter-replace law must get
  * right in a single pass.
  */
class BpeSpec extends SparkSpec {

  import spark.implicits._

  // --- textbook reference: greedy left-to-right non-overlapping merge ---
  private def mergeOnce(syms: List[String], a: String, b: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toList
  }

  private def refTrain(words: Map[String, Long], n: Int): List[(String, String)] = {
    var vocab: Map[List[String], Long] =
      words.groupMapReduce { case (w, _) => w.map(_.toString).toList }(_._2)(_ + _)
    val merges = scala.collection.mutable.ListBuffer.empty[(String, String)]
    for (_ <- 1 to n) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        syms.zip(syms.drop(1)).foreach(p => counts(p) = counts.getOrElse(p, 0L) + c)
      }
      if (counts.nonEmpty) {
        val (a, b) = counts.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += ((a, b))
        vocab = vocab.groupMapReduce { case (syms, _) => mergeOnce(syms, a, b) }(_._2)(_ + _)
      }
    }
    merges.toList
  }

  private def refEncode(word: String, merges: List[(String, String)]): List[String] =
    merges.foldLeft(word.map(_.toString).toList) { case (syms, (a, b)) =>
      mergeOnce(syms, a, b)
    }

  private def corpus = Seq(
    (1L, "low lower lowest low low"),
    (2L, "new newer newest new newer"),
    (3L, "wide wider widest low new"),
    (4L, "aaaaaa abababab low"), // adjacency chains: aa·aa·aa and ab·ab·ab·ab
    (5L, "lower newer wider lowest"))

  private def wordCounts: Map[String, Long] =
    corpus.flatMap(_._2.split(" ")).groupBy(identity)
      .map { case (w, ws) => w -> ws.size.toLong }

  test("distributed training learns exactly the textbook merge sequence") {
    val df = corpus.toDF("doc_id", "text")
    val got = Bpe.train(Bpe.wordVocab(df, "text"), 10)
      .map(m => (m.left, m.right))
    val want = refTrain(wordCounts, 10)
    assert(got == want, s"got=$got want=$want")
  }

  test("encoder matches the textbook fold on every word, chains included") {
    val df = corpus.toDF("doc_id", "text")
    val merges = Bpe.train(Bpe.wordVocab(df, "text"), 10)
    val refMerges = merges.map(m => (m.left, m.right)).toList
    val words = wordCounts.keys.toSeq.sorted
    val enc = Bpe.encode(words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
        .toDF("doc_id", "text"), "text", "doc_id", merges)
      .orderBy($"doc_id").select($"enc").collect().map(_.getString(0))
    words.zip(enc).foreach { case (w, e) =>
      assert(e == refEncode(w, refMerges).mkString(" "),
        s"word '$w': spark='$e' ref='${refEncode(w, refMerges).mkString(" ")}'")
    }
  }

  test("adjacent chains merge greedily in one replace pass (a a a a -> aa aa)") {
    val merges = Seq(Bpe.Merge("a", "a", 0L), Bpe.Merge("ab", "ab", 0L),
      Bpe.Merge("a", "b", 0L))
    val enc = Bpe.encode(Seq((1L, "aaaa ababab")).toDF("doc_id", "text"),
      "text", "doc_id", Seq(Bpe.Merge("a", "a", 0L)))
      .select($"enc").collect()(0).getString(0)
    assert(enc == "aa aa a b a b a b", s"got '$enc'")
    val enc2 = Bpe.encode(Seq((1L, "ababab")).toDF("doc_id", "text"),
      "text", "doc_id", Seq(Bpe.Merge("a", "b", 0L)))
      .select($"enc").collect()(0).getString(0)
    assert(enc2 == "ab ab ab", s"got '$enc2'")
  }

  test("words containing the delimiter are excluded from vocab, not mis-split") {
    val df = Seq((1L, "ok ok a|b ok")).toDF("doc_id", "text")
    val vocab = Bpe.wordVocab(df, "text").select($"word").collect()
      .map(_.getString(0)).toSet
    assert(vocab == Set("ok"))
  }
}
