package graft

import graft.ops.Sanitize
import org.apache.spark.sql.functions.col
import org.scalacheck.Gen

/** Property tests pinning Sanitize.cell to the reference's sequential
  * six-step model (`/root/reference/SharedCode/HelperFunction.py:36-41`),
  * including ordering and the ASCII drop (SURVEY §5 test strategy, §7
  * "semantics fidelity of sanitize" risk). Uses ScalaCheck generators
  * directly (samples batched into one Spark job) rather than forAll —
  * per-sample Spark jobs would be minutes-slow for no extra coverage.
  */
class SanitizeSpec extends SparkSpec {

  /** The literal Python chain, step by step, as the executable model. */
  private def model(s: String): String = {
    val s1 = s.replace(",", "")
    val s2 = s1.replace("'", "")
    val s3 = s2.replace("\n", " ")
    val s4 = s3.replace("\\", " ")
    val s5 = s4.replace("/", "-")
    s5.filter(_ < 128) // encode('ascii','ignore')
  }

  private def engine(inputs: Seq[String]): Seq[String] = {
    import spark.implicits._
    inputs.toDF("s").select(Sanitize.cell(col("s")).as("c")).collect().map(_.getString(0)).toSeq
  }

  private val charset: Gen[Char] = Gen.frequency(
    (6, Gen.alphaNumChar),
    (4, Gen.oneOf(',', '\'', '\n', '\\', '/', ' ', '.', '-', '_')),
    (2, Gen.oneOf('é', 'ü', '—', '日', '本', '€', 'Ω')),
    (1, Gen.choose(1.toChar, 127.toChar)))

  private val strings: Gen[String] = Gen.listOf(charset).map(_.mkString)

  test("cell() equals the sequential reference model on random strings") {
    val samples = Gen.listOfN(300, strings).sample.get
    val got = engine(samples)
    val want = samples.map(model)
    assert(got == want)
  }

  test("pinned examples: each step, ordering, and number passthrough") {
    val cases = Seq(
      "a,b" -> "ab",
      "it's" -> "its",
      "line1\nline2" -> "line1 line2",
      "back\\slash" -> "back slash",
      "a/b/c" -> "a-b-c",
      "caféé" -> "caf",
      "日本語" -> "",
      ",'\n\\/" -> "  -", // every special in one cell, reference order
      "" -> "")
    val got = engine(cases.map(_._1))
    assert(got == cases.map(_._2))
    assert(cases.map { case (in, _) => model(in) } == cases.map(_._2),
      "model must agree with pinned expectations")
  }

  test("columns() touches only string columns") {
    import spark.implicits._
    val df = Seq((1, "a,b", 2.5), (2, "x/y", 3.5)).toDF("id", "s", "v")
    val out = Sanitize.columns(df).collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))
    assert(out.toSeq == Seq((1, "ab", 2.5), (2, "x-y", 3.5)))
  }

  test("fileNamePrefix strips non-alphanumeric runs (A4)") {
    import spark.implicits._
    val got = Seq("My Report-2024 (final).xlsx", "a_b c")
      .toDF("s").select(Sanitize.fileNamePrefix(col("s"))).collect().map(_.getString(0))
    assert(got.toSeq == Seq("MyReport2024finalxlsx", "abc"))
  }
}
