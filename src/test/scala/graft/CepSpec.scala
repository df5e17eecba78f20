package graft

import graft.ops.Cep

/** CEP laws: ordering (ts then tiebreak), non-overlapping leftmost
  * matching, unknown-type filtering, and the empty/no-match edges.
  */
class CepSpec extends SparkSpec {

  import spark.implicits._

  test("ordered symbol sequences, non-overlapping counts, unknown types dropped") {
    val ev = Seq(
      // user 1: c v v p c p  -> cv*p matches twice (cvvp, cp)
      (1L, 10L, 1L, "click"), (1L, 20L, 2L, "view"), (1L, 30L, 3L, "view"),
      (1L, 40L, 4L, "purchase"), (1L, 50L, 5L, "click"), (1L, 60L, 6L, "purchase"),
      // user 2: same ts — tiebreak decides: c(p id1) p(id2) -> one match
      (2L, 10L, 1L, "click"), (2L, 10L, 2L, "purchase"),
      // user 3: unknown type between c and p is DROPPED, not a wildcard
      (3L, 1L, 1L, "click"), (3L, 2L, 2L, "refund"), (3L, 3L, 3L, "purchase"),
      // user 4: views only — no match
      (4L, 1L, 1L, "view"), (4L, 2L, 2L, "view")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = Cep.matches(ev, "user_id", "ts", "event_id", "event_type",
      Map("click" -> "c", "view" -> "v", "purchase" -> "p"), "cv*p")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == Set((1L, 6, 2L), (2L, 2, 1L), (3L, 2, 1L), (4L, 2, 0L)),
      s"got $got")
  }

  test("overlap semantics: matches never reuse consumed symbols") {
    val ev = (1 to 6).map(i => (1L, i.toLong, i.toLong, "click"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Cep.matches(ev, "user_id", "ts", "event_id", "event_type",
      Map("click" -> "c"), "cc").head()
    assert(got.getLong(2) == 3L, "cccccc has 3 non-overlapping cc matches")
  }

  private val Syms = Map("a" -> "a", "b" -> "b", "c" -> "c")

  /** Deterministic pseudo-random per-user symbol strings + the driver-
    * side java-regex reference count — the consumed-symbol law: the
    * distributed result must equal a plain leftmost non-overlapping
    * scan of the same string.
    */
  private def refMatches(seq: String, pattern: String): Long =
    java.util.regex.Pattern.compile(pattern).matcher(seq)
      .results().count()

  test("quantifiers and negation match a driver-side regex reference exactly") {
    val alphabet = "abc"
    def seqOf(u: Long): String =
      (0 until 12).map(i => alphabet(((u * 31 + i * 17 + i * i) % 3).toInt)).mkString
    val users = (1L to 40L)
    val ev = users.flatMap { u =>
      seqOf(u).zipWithIndex.map { case (ch, i) =>
        (u, i.toLong, i.toLong, ch.toString)
      }
    }.toDF("user_id", "ts", "event_id", "event_type")
    Seq("ab{0,2}c", "ab{1,}c", "a[^b]*c", "a[^bc]{0,3}c", "ab{2}c")
      .foreach { pat =>
        val got = Cep.matches(ev, "user_id", "ts", "event_id", "event_type",
          Syms, pat).collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
        val want = users.map(u => u -> refMatches(seqOf(u), pat)).toMap
        assert(got == want, s"pattern $pat diverged from the reference scan")
      }
  }

  test("bounded-quantifier laws: {1,1} counts symbols, wide {0,k} equals star") {
    val ev = (1 to 30).map(i =>
      (1L, i.toLong, i.toLong, Seq("a", "b", "c")(i % 3)))
      .toDF("user_id", "ts", "event_id", "event_type")
    def count(pat: String): Long =
      Cep.matches(ev, "user_id", "ts", "event_id", "event_type", Syms, pat)
        .head().getLong(2)
    val bSymbols = (1 to 30).count(_ % 3 == 1)
    assert(count("b{1,1}") == bSymbols.toLong,
      "{1,1} must count exactly the symbol occurrences")
    assert(count("ab{0,30}c") == count("ab*c"),
      "a bound wider than any sequence must equal the unbounded star")
  }

  test("patterns outside the cross-engine fragment refuse loudly") {
    val ev = Seq((1L, 1L, 1L, "a")).toDF("user_id", "ts", "event_id", "event_type")
    Seq("(a)\\1", "a(?=b)", "a(?!b)", "(?<=a)b").foreach { pat =>
      intercept[IllegalArgumentException] {
        Cep.matches(ev, "user_id", "ts", "event_id", "event_type", Syms, pat)
      }
    }
  }

  test("absencePattern builds the negated-class encoding") {
    assert(Cep.absencePattern('a', "b", 'c') == "a[^b]*c")
    assert(refMatches("abc", "a[^b]*c") == 0L, "a B between must break the match")
    assert(refMatches("aac", "a[^b]*c") == 1L)
  }
}
