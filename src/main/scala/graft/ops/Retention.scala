package graft.ops

import java.time.LocalDate
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Retention predicate + sweep (A9/A10) — mirrors
  * `/root/reference/SharedCode/HelperFunction.py:94-123`
  * (`CheckHDInsightContainer` / `RemoveHDInsightContainer`): a container
  * name matches iff it contains BOTH the linked-service and data-factory
  * names AND its first 14-digit stamp lies in
  * `[today+daydiff-60 @ 000000, today+daydiff @ 999999]` (ints compared as
  * `yyyyMMddHHmmss`).
  *
  * Declared deviations from the reference, both pinned in `RetentionSpec`:
  *  - name-check fails → `false` (the reference implicitly returns `None`,
  *    `HelperFunction.py:95` — falsy, same branch behavior);
  *  - names match but NO stamp exists → `false` (the reference CRASHES on
  *    `outputlist[0]`, an IndexError; error-as-value is the A14 contract).
  *
  * The predicate is a pure `Column`, so a 100 TB listing sweeps as one
  * distributed filter — no driver-side loop over names.
  */
object Retention {

  private val Ymd = DateTimeFormatter.ofPattern("yyyyMMdd")

  /** Inclusive `[start, end]` stamp bounds for a given day-diff. */
  def stampBounds(dayDiff: Int, today: LocalDate): (Long, Long) = {
    val start = today.plusDays(dayDiff - 60L).format(Ymd).toLong * 1000000L // yyyyMMdd000000
    val end = today.plusDays(dayDiff.toLong).format(Ymd).toLong * 1000000L + 999999L
    (start, end)
  }

  /** A9: the predicate as a Column over a name column. `today` is a
    * parameter (not `current_date()`) so tests and oracle SQL are
    * deterministic.
    */
  def matches(name: Column, linkedService: String, dataFactory: String,
      dayDiff: Int, today: LocalDate): Column = {
    val (lo, hi) = stampBounds(dayDiff, today)
    val stamp = regexp_extract(name, "\\d{14}", 0)
    name.contains(linkedService) && name.contains(dataFactory) &&
      (stamp =!= "") && stamp.cast("long").between(lo, hi)
  }

  /** A10: sweep a listing relation — returns matching names (distributed
    * filter, collected only to drive the side-effecting deletes, which is
    * the reference's per-container delete loop `HelperFunction.py:115-120`).
    */
  def sweep(listing: DataFrame, nameCol: String, linkedService: String,
      dataFactory: String, dayDiff: Int, today: LocalDate)(
      delete: String => Unit): Seq[String] = {
    val hits = listing
      .filter(matches(col(nameCol), linkedService, dataFactory, dayDiff, today))
      .select(col(nameCol).cast("string"))
      .collect()
      .map(_.getString(0))
      .toSeq
    hits.foreach(delete)
    hits
  }
}
