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
}
