package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer: distributed merge-table TRAINING over a
  * word-frequency vocabulary + codegen APPLY of the learned merges — the
  * real-tokenizer step behind the `bpeTokenCount` heuristic in TextOps.
  *
  * Representation: a word's current segmentation is a delimiter string
  * `||s1||s2||...||sk||`. Merging the pair (a, b) is then the LITERAL
  * string replacement `|a||b|` → `|ab|` — because the pattern takes one
  * `|` from each double boundary, immediately-adjacent occurrences keep
  * their shared boundary intact and a single left-to-right non-
  * overlapping replace pass IS greedy BPE (`a a a a` → `aa aa`, chains
  * never need a rescan). Both Spark (`regexp_replace` with a quoted
  * pattern) and DuckDB (`replace`) scan the INPUT left-to-right and
  * resume after the matched occurrence, so the law is engine-identical —
  * that is what makes the training loop and the encoder exactly
  * reproducible by the unrolled SQL oracle. Words containing the
  * delimiter char `|` are excluded from the vocabulary and pass through
  * unsegmented (documented law; they cannot be represented).
  *
  * Scale (100 TB): training never iterates over the corpus — ONE corpus
  * pass builds the (word, count) vocabulary (Zipf: vocab rows, not
  * corpus rows), and each of the nMerges iterations is a pair-count
  * aggregation over that vocabulary-sized relation plus a `collect()` of
  * exactly ONE row (the argmax pair) — the same bounded-driver-work
  * pattern as IVF codebook training. The re-segmentation is a pure
  * column expression chained onto the vocab plan (narrow, no shuffle);
  * iteration i recomputes i cheap string replaces over vocab rows
  * instead of checkpointing — at 8-32 merges the recompute is noise.
  * Encoding is a map-side codegen expression chain: zero shuffles, zero
  * UDFs, broadcast-free (the merge table is baked into the plan as
  * literals).
  */
object Bpe {

  final case class Merge(left: String, right: String, count: Long)

  /** Literal (non-regex) replace, left-to-right non-overlapping. */
  private def litReplace(c: Column, search: String, repl: String): Column =
    regexp_replace(c, java.util.regex.Pattern.quote(search),
      java.util.regex.Matcher.quoteReplacement(repl))

  private def mergePat(m: Merge) = s"|${m.left}||${m.right}|"
  private def mergeRep(m: Merge) = s"|${m.left}${m.right}|"

  /** `||c1||c2||...||cn||` initial per-character segmentation. */
  def symbolize(word: Column): Column =
    concat(lit("|"), regexp_replace(word, "(.)", "|$1|"), lit("|"))

  /** (word, cnt, sym) vocabulary — the ONE corpus pass. */
  def wordVocab(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextOps.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0 && !col("word").contains("|"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .withColumn("sym", symbolize(col("word")))

  /** Learn `nMerges` merges: per iteration, the corpus-weighted most
    * frequent adjacent symbol pair (ties: count desc, then left asc,
    * right asc — total order, engine-reproducible). Stops early if no
    * pair remains (every word fully merged).
    */
  def train(vocab0: DataFrame, nMerges: Int): Seq[Merge] = {
    require(nMerges > 0, s"nMerges must be positive: $nMerges")
    val out = scala.collection.mutable.ListBuffer.empty[Merge]
    var vocab = vocab0
    var i = 0
    var done = false
    while (i < nMerges && !done) {
      val parts = vocab.select(col("cnt"), split(col("sym"), "\\|\\|").as("p"))
      // p = ["", s1..sk, ""] (split keeps boundary empties); adjacent
      // pairs are (p[j], p[j+1]) for j in 2..size-2, none when k < 2.
      val pairs = parts.select(col("cnt"), explode(
        when(size(col("p")) >= 4,
          transform(sequence(lit(2), size(col("p")) - 2), j =>
            struct(element_at(col("p"), j).as("a"),
              element_at(col("p"), j + 1).as("b"))))
          .otherwise(array().cast("array<struct<a:string,b:string>>"))).as("pr"))
      val top = pairs
        .groupBy(col("pr.a").as("a"), col("pr.b").as("b"))
        .agg(sum(col("cnt")).cast("long").as("c"))
        .orderBy(col("c").desc, col("a").asc, col("b").asc)
        .limit(1).collect() // exactly ONE row per iteration — bounded
      if (top.isEmpty) done = true
      else {
        val m = Merge(top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        out += m
        vocab = vocab.withColumn("sym",
          litReplace(col("sym"), mergePat(m), mergeRep(m)))
        i += 1
      }
    }
    out.toList
  }

  /** Apply the ordered merge table to one segmentation string. */
  def applyMerges(sym: Column, merges: Seq[Merge]): Column =
    merges.foldLeft(sym)((c, m) => litReplace(c, mergePat(m), mergeRep(m)))

  /** Encode documents: per word, segment + apply merges; emit the
    * space-joined token string per doc plus token counts. Pure map-side
    * expression chain — the merge table is plan-time literals.
    */
  def encode(docs: DataFrame, textCol: String, idCol: String,
      merges: Seq[Merge]): DataFrame = {
    val words = docs.select(col(idCol),
      TextOps.tokens(col(textCol)).as("__words"))
    words
      .select(col(idCol), size(col("__words")).cast("long").as("n_words"),
        array_join(transform(col("__words"), w =>
          trim(litReplace(applyMerges(symbolize(w), merges), "||", " "))),
          " ").as("enc"))
      .withColumn("n_bpe_tokens", size(split(col("enc"), " ")).cast("long"))
  }
}
