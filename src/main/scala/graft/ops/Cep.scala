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

  /** Reject regex constructs OUTSIDE the java.util.regex ∩ RE2 shared
    * fragment — the cross-engine exactness contract ([[matches]]'
    * oracle runs the same pattern through DuckDB's RE2). INSIDE the
    * fragment, and therefore first-class here: concatenation, `* + ?`
    * and alternation, BOUNDED QUANTIFIERS `{m}` / `{m,}` / `{m,n}`
    * (the MATCH_RECOGNIZE `B{0,3}` shape), and NEGATED CHARACTER
    * CLASSES `[^…]` over the closed symbol alphabet — which is how
    * ABSENCE is expressed without lookahead (RE2 has none):
    * "A then C with no B between" is `a[^b]*c` ([[absencePattern]]).
    * Rejected loudly: backreferences (`\1`) and lookarounds (`(?=`,
    * `(?!`, `(?<`) — RE2 lacks both, so a pattern using them would
    * pass the Spark side and silently diverge from the oracle.
    */
  private[graft] def validatePattern(pattern: String): Unit = {
    require(!"""\\\d""".r.findFirstIn(pattern).isDefined,
      s"backreferences are outside the cross-engine fragment: $pattern")
    require(!pattern.contains("(?=") && !pattern.contains("(?!") &&
      !pattern.contains("(?<"),
      s"lookarounds are outside the cross-engine fragment: $pattern")
    java.util.regex.Pattern.compile(pattern): Unit
  }

  /** The absence-within-sequence pattern: `first`, then `last`, with
    * NONE of `forbidden` between — `a[^b]*c`, the negated-class
    * encoding of MATCH_RECOGNIZE's NOT/absence over a CLOSED alphabet
    * (symbols outside the alphabet were dropped before matching, so
    * `[^b]` can only consume known symbols, never stray event types).
    */
  def absencePattern(first: Char, forbidden: String, last: Char): String =
    s"$first[^$forbidden]*$last"

  /** Per-key `(key, seq_len, n_matches)` — `n_matches` counts
    * non-overlapping occurrences of `pattern` in the key's symbol
    * string. Patterns may use the full shared fragment, including
    * bounded quantifiers and negated classes (see [[validatePattern]]).
    */
  def matches(events: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, typeCol: String, symbols: Map[String, String],
      pattern: String): DataFrame = {
    require(symbols.nonEmpty, "symbol alphabet must be non-empty")
    require(symbols.values.forall(_.length == 1),
      s"symbols must be single characters: $symbols")
    validatePattern(pattern)
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
