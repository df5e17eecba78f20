package graft.queries

import graft.Tables
import graft.llm.Bpe
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BPE tokenizer entries: distributed merge-table training and the
  * codegen encoder (llm/Bpe). The oracle UNROLLS the training loop —
  * each iteration is a pair-count argmax CTE + a re-segmentation CTE, so
  * DuckDB independently learns the same 8 merges and the hash match
  * covers the whole algorithm: segmentation law, pair counting, the
  * (count desc, pair asc) tie order, and the greedy left-to-right merge
  * semantics of the double-delimiter replace.
  */
object BpeQueries extends graft.QueryModule {

  private val NMerges = 8
  private val duckNorm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

  private def trainCorpus(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents").filter($"doc_id" % 5 === 0)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_bpe_train" -> ((s, dir) => {
      import s.implicits._
      val merges = Bpe.train(Bpe.wordVocab(trainCorpus(s, dir), "text"), NMerges)
      merges.zipWithIndex.map { case (m, i) =>
        (i + 1, m.left, m.right, m.left + m.right, m.count)
      }.toDF("merge_rank", "l_sym", "r_sym", "merged", "pair_count")
        .orderBy($"merge_rank")
    }),

    // Encode a DISJOINT slice with the merges learned on the training
    // slice — per doc: word/token counts, the md5 of the full encoded
    // string (so every symbol boundary is load-bearing), and a prefix
    // for human eyes.
    "q_bpe_encode" -> ((s, dir) => {
      import s.implicits._
      val merges = Bpe.train(Bpe.wordVocab(trainCorpus(s, dir), "text"), NMerges)
      val docs = Tables(s, dir, "documents").filter($"doc_id" % 7 === 3)
      Bpe.encode(docs, "text", "doc_id", merges)
        .select($"doc_id", $"n_words", $"n_bpe_tokens",
          md5($"enc").as("enc_hash"), substring($"enc", 1, 60).as("enc_prefix"))
        .orderBy($"doc_id")
    }))

  /** vocab_0..vocab_n + merge_1..merge_n CTE chain (DuckDB). */
  private def vocabCtes(slice: String): String = {
    val sb = new StringBuilder
    sb.append(
      s"""w AS (
         |  SELECT unnest(string_split($duckNorm, ' ')) AS word
         |  FROM documents WHERE $slice
         |),
         |vocab_0 AS (
         |  SELECT word, COUNT(1) AS cnt,
         |    '|' || regexp_replace(word, '(.)', '|\\1|', 'g') || '|' AS sym
         |  FROM w WHERE len(word) > 0 AND word NOT LIKE '%|%'
         |  GROUP BY word
         |)""".stripMargin)
    for (i <- 1 to NMerges) {
      sb.append(
        s""",
           |pairs_$i AS (
           |  SELECT cnt,
           |    unnest(list_transform(range(2, greatest(len(p) - 1, 2)), j -> p[j])) AS a,
           |    unnest(list_transform(range(2, greatest(len(p) - 1, 2)), j -> p[j + 1])) AS b
           |  FROM (SELECT cnt, string_split(sym, '||') AS p FROM vocab_${i - 1})
           |),
           |merge_$i AS (
           |  SELECT a, b, CAST(SUM(cnt) AS bigint) AS c
           |  FROM pairs_$i GROUP BY a, b ORDER BY c DESC, a ASC, b ASC LIMIT 1
           |),
           |vocab_$i AS (
           |  SELECT word, cnt,
           |    replace(sym, '|' || m.a || '||' || m.b || '|',
           |                 '|' || m.a || m.b || '|') AS sym
           |  FROM vocab_${i - 1}, merge_$i m
           |)""".stripMargin)
    }
    sb.toString
  }

  def oracle: Map[String, String] = Map(
    "q_bpe_train" -> {
      val rows = (1 to NMerges).map(i =>
        s"SELECT $i AS merge_rank, a AS l_sym, b AS r_sym, a || b AS merged, c AS pair_count FROM merge_$i")
        .mkString("\n  UNION ALL\n  ")
      s"""WITH ${vocabCtes("doc_id % 5 = 0")}
         |SELECT * FROM (
         |  $rows
         |) ORDER BY merge_rank""".stripMargin
    },
    "q_bpe_encode" -> {
      // nested replaces m1..mN around the per-char segmentation, inside
      // the per-word lambda; the merge CTEs are 1-row cross joins.
      val seg = "'|' || regexp_replace(w, '(.)', '|\\1|', 'g') || '|'"
      val merged = (1 to NMerges).foldLeft(seg)((acc, i) =>
        s"replace($acc, '|' || m$i.a || '||' || m$i.b || '|', '|' || m$i.a || m$i.b || '|')")
      val mtabs = (1 to NMerges).map(i => s"merge_$i m$i").mkString(", ")
      s"""WITH ${vocabCtes("doc_id % 5 = 0")},
         |docs AS (
         |  SELECT doc_id, $duckNorm AS nt FROM documents WHERE doc_id % 7 = 3
         |),
         |enc AS (
         |  SELECT doc_id,
         |    CAST(len(string_split(nt, ' ')) AS bigint) AS n_words,
         |    array_to_string(list_transform(string_split(nt, ' '), w ->
         |      trim(replace($merged, '||', ' '))), ' ') AS enc
         |  FROM docs, $mtabs
         |)
         |SELECT doc_id, n_words,
         |  CAST(len(string_split(enc, ' ')) AS bigint) AS n_bpe_tokens,
         |  md5(enc) AS enc_hash, substr(enc, 1, 60) AS enc_prefix
         |FROM enc ORDER BY doc_id""".stripMargin
    })
}
