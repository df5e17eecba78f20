package graft

import graft.llm.Lm
import org.apache.spark.sql.functions._

/** Bigram-LM scorer laws: hand-computed smoothed logprobs, the
  * unseen-context floor, and the no-bigram exclusion.
  */
class LmSpec extends SparkSpec {

  import spark.implicits._

  private def lp(num: Long, den: Long): Long =
    math.round(math.log(num.toDouble / den.toDouble) * 1e6)

  test("scores equal hand-computed add-one bigram logprobs") {
    // train: "a b a b c" → bigrams ab, ba, ab, bc; c(a)=2 c(b)=2; V=3
    val train = Seq((1L, "a b a b c")).toDF("doc_id", "text")
    val score = Seq((10L, "a b"), (11L, "a z"), (12L, "z")).toDF("doc_id", "text")
    val got = Lm.score(train, score, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // doc 10: bigram (a,b): c2=2, c1=2, V=3 → ln(3/5)
    assert(got(10L) == ((1L, lp(3, 5))), s"got ${got(10L)}")
    // doc 11: (a,z) unseen bigram, seen context a → ln(1/(2+3))
    assert(got(11L) == ((1L, lp(1, 5))), s"got ${got(11L)}")
    // doc 12: single token → no bigrams → no row
    assert(!got.contains(12L))
  }

  test("fully unseen context degrades to ln(1/V), never fails") {
    val train = Seq((1L, "a b c d")).toDF("doc_id", "text") // V=4
    val score = Seq((10L, "x y")).toDF("doc_id", "text")
    val got = Lm.score(train, score, "doc_id", "text").collect()(0)
    assert(got.getLong(2) == lp(1, 4), s"got ${got.getLong(2)}")
  }
}
