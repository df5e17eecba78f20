package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Cell sanitize chain (A3) + filename normalize (A4) -- the reference's
  * only in-app transform (`/root/reference/SharedCode/HelperFunction.py:36-41`):
  * per string cell, IN ORDER: strip `,` -> strip `'` -> newline->space ->
  * backslash->space -> `/`->`-` -> drop non-ASCII. Non-string cells pass
  * through untouched (the `isinstance(x, str)` guard -- numbers are never
  * touched).
  *
  * All six steps are independent single-character maps whose outputs
  * (space, dash) are never inputs of a later step, so the sequential chain
  * collapses into ONE `translate` (chars absent from the `to` alphabet are
  * deleted -- `,` and `'` sit past its end) plus ONE `regexp_replace` for
  * the ASCII drop (`encode('ascii','ignore')` == delete codepoints > 127).
  * The equivalence to the literal six-step model is property-tested in
  * `SanitizeSpec`. Both functions are codegen'd built-ins: the chain runs
  * inside WholeStageCodegen at scan speed -- no UDF, no extra stage, which
  * is what makes it free at 100 TB.
  */
object Sanitize {

  /** The A3 chain on one string column. */
  def cell(c: Column): Column =
    regexp_replace(translate(c, "\n\\/,'", "  -"), "[^\\x00-\\x7F]", "")

  /** Apply the chain to every StringType column of `df`, preserving column
    * order and leaving non-string columns untouched (the reference's
    * `isinstance` guard).
    */
  def columns(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      if (f.dataType == StringType) cell(col(f.name)).as(f.name) else col(f.name)
    }
    df.select(cols.toSeq: _*)
  }

  /** The A4 normalization pattern — single source for both the Column and
    * String forms so the rule can never desynchronize between them.
    */
  private val FileNamePattern = "[^A-Za-z0-9]+"

  /** Filename normalize (A4, `HelperFunction.py:18-19`): strip every
    * non-alphanumeric run. Used for the `<prefix>_<sheet>.csv` output
    * naming (`HelperFunction.py:30`).
    */
  def fileNamePrefix(c: Column): Column =
    regexp_replace(c, FileNamePattern, "")

  /** Driver-side String form of the same rule (collision checks, output
    * naming in [[PipelineRunner]]).
    */
  def fileNamePrefixStr(s: String): String = s.replaceAll(FileNamePattern, "")
}
