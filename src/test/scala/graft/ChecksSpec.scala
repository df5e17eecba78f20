package graft

import graft.ops.Checks
import graft.ops.Checks._

/** Constraint-suite laws: exact violation counting per constraint kind,
  * SQL null semantics (NULL is only a violation for NotNull; NULL FKs
  * pass Ref), and the single-scan plan shape for row-local suites.
  */
class ChecksSpec extends SparkSpec {

  import spark.implicits._

  private val rows = Seq[(java.lang.Long, String, java.lang.Double)](
    (1L, "A", 10.0), (2L, "B", 20.0), (2L, "C", 999.0), (3L, null, 30.0),
    (null, "ZZ", null), (4L, "A", -5.0))
  private lazy val df = rows.toDF("id", "code", "amt")

  private def result(cs: Seq[Constraint]): Map[String, (Long, Boolean)] =
    Checks.run(df, cs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap

  test("row-local constraints count violations exactly, NULL passes all but NotNull") {
    val r = result(Seq(
      NotNull("id"), NotNull("code"),
      InRange("amt", 0, 100),      // 999 and -5 violate; NULL passes
      Matches("code", "^[A-C]$"),  // ZZ violates; NULL passes
      InSet("code", Seq("A", "B")) // C and ZZ violate; NULL passes
    ))
    assert(r("not_null(id)") === ((1L, false)))
    assert(r("not_null(code)") === ((1L, false)))
    assert(r("in_range(amt,0.0,100.0)") === ((2L, false)))
    assert(r("matches(code,^[A-C]$)") === ((1L, false)))
    assert(r("in_set(code,A|B)") === ((2L, false)))
  }

  test("unique counts extra rows beyond one per key; NULL is a key value") {
    val r = result(Seq(Unique(Seq("id")), Unique(Seq("id", "code"))))
    // ids: 1,2,2,3,null,4 → one duplicate row
    assert(r("unique(id)") === ((1L, false)))
    // (id, code) tuples are all distinct
    assert(r("unique(id,code)") === ((0L, true)))
  }

  test("ref flags dangling non-null FKs only") {
    val dim = Seq(1L, 2L, 3L).toDF("k")
    val r = result(Seq(Ref("id", dim, "k")))
    // id=4 dangles; the NULL id is not a violation
    assert(r("ref(id->k)") === ((1L, false)))
  }

  test("a row-local suite of any width is ONE scan and ONE aggregate") {
    val dir = tmpDir("checks-scan")
    df.write.mode("overwrite").parquet(dir)
    val onDisk = spark.read.parquet(dir)
    val suite = Seq(NotNull("id"), NotNull("code"), InRange("amt", 0, 100),
      Matches("code", "A"), InSet("code", Seq("A")))
    val plan = Checks.rowLocal(onDisk, suite).queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(plan).size === 1,
      s"expected exactly one scan:\n$plan")
  }
}
