package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** COMPLEX EVENT PROCESSING lite — regex pattern matching over per-key
  * event SEQUENCES (the SQL MATCH_RECOGNIZE / Flink CEP capability,
  * Spark-first): each key's events are ordered by (ts, tiebreak),
  * mapped to one SYMBOL character per event type, and the pattern — a
  * plain regex over the symbol alphabet, e.g. `cv*p` for
  * "click, any views, purchase" — is matched non-overlapping,
  * leftmost-greedy (java.util.regex and RE2 agree on this fragment:
  * keep patterns to the concatenation/star/plus/alternation core so
  * cross-engine oracles stay exact).
  *
  * 100 TB shape: ONE shuffle on the key; the per-key payload collapses
  * to one char per event BEFORE the shuffle (a map-side projection),
  * so a billion-event day shuffles a gigabyte of symbols, and matching
  * is a per-group linear scan. Per-key sequence length is the caller's
  * skew knob — the same bot-user caveat as sessionize; events whose
  * type has no symbol are dropped (not wildcards) so the alphabet is
  * closed.
  */
object Cep {

  /** Per-key `(key, seq_len, n_matches)` — `n_matches` counts
    * non-overlapping occurrences of `pattern` in the key's symbol
    * string.
    */
  def matches(events: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, typeCol: String, symbols: Map[String, String],
      pattern: String): DataFrame = {
    require(symbols.nonEmpty, "symbol alphabet must be non-empty")
    require(symbols.values.forall(_.length == 1),
      s"symbols must be single characters: $symbols")
    val sym = symbols.foldLeft(lit(null).cast("string")) {
      case (acc, (tpe, ch)) => when(col(typeCol) === tpe, lit(ch)).otherwise(acc)
    }
    events
      .withColumn("__sym", sym)
      .filter(col("__sym").isNotNull)
      .groupBy(col(keyCol))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col(tsCol).as("t"),
          col(tieCol).as("i"), col("__sym").as("s")))),
        x => x.getField("s")), "").as("__seq"))
      .select(col(keyCol), length(col("__seq")).as("seq_len"),
        size(regexp_extract_all(col("__seq"), lit(pattern), lit(0)))
          .cast("long").as("n_matches"))
  }
}
