package graft

import java.time.LocalDate

import graft.ops.Retention
import org.apache.spark.sql.functions.col

/** Retention-predicate boundary tests vs
  * `/root/reference/SharedCode/HelperFunction.py:94-109`
  * (`CheckHDInsightContainer`): inclusive stamp bounds, both-names
  * requirement, and the declared deviations (missing name / missing stamp
  * → false, where the reference returns None / crashes).
  */
class RetentionSpec extends SparkSpec {

  private val today = LocalDate.of(2020, 6, 15)

  private def check(names: Seq[String], dayDiff: Int = 0): Seq[Boolean] = {
    import spark.implicits._
    names.toDF("n")
      .select(Retention.matches(col("n"), "lsvc", "dfac", dayDiff, today).as("m"))
      .collect().map(_.getBoolean(0)).toSeq
  }

  test("stamp bounds are [today+daydiff-60 @000000, today+daydiff @999999]") {
    assert(Retention.stampBounds(0, today) == (20200416000000L, 20200615999999L))
    assert(Retention.stampBounds(-5, today) == (20200411000000L, 20200610999999L))
  }

  test("inclusive boundaries and out-of-range stamps") {
    val got = check(Seq(
      "lsvc-dfac-20200416000000",  // exactly start → true
      "lsvc-dfac-20200615999999",  // exactly end → true (999999 pseudo-time)
      "lsvc-dfac-20200615235959",  // inside → true
      "lsvc-dfac-20200415235959",  // one below start → false
      "lsvc-dfac-20200616000000")) // one above end → false
    assert(got == Seq(true, true, true, false, false))
  }

  test("both names required; first 14-digit run is the stamp") {
    val got = check(Seq(
      "lsvc-only-20200601000000",        // missing dfac → false
      "dfac-only-20200601000000",        // missing lsvc → false
      "lsvc-dfac-no-stamp",              // no stamp → false (ref crashes; A14 error-as-value)
      "pre99999999999999lsvc-dfac-20200601000000")) // first run out of range → false
    assert(got == Seq(false, false, false, false))
  }

  test("dayDiff shifts the window like the reference's timedelta") {
    val got = check(Seq("lsvc-dfac-20200612000000"), dayDiff = -5)
    assert(got == Seq(false), "stamp after today+daydiff must not match")
    val got2 = check(Seq("lsvc-dfac-20200610999999"), dayDiff = -5)
    assert(got2 == Seq(true))
  }

  test("sweep deletes exactly the matches") {
    import spark.implicits._
    val listing = Seq(
      "lsvc-dfac-20200601000000",
      "lsvc-dfac-19990101000000",
      "other-20200601000000").toDF("name")
    var deleted = Vector.empty[String]
    val hits = Retention.sweep(listing, "name", "lsvc", "dfac", 0, today)(d => deleted :+= d)
    assert(hits == Seq("lsvc-dfac-20200601000000"))
    assert(deleted == Vector("lsvc-dfac-20200601000000"))
  }
}
