package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC canonicalization as a native codegen Expression —
  * `graft_nfc(s)`.
  *
  * Why the engine needs it: exact dedup, fingerprinting, and contamination
  * keys hash BYTES, and Unicode lets the same text arrive as composed
  * (`é` U+00E9) or decomposed (`e` + U+0301) sequences — byte-distinct,
  * canonically equal. A corpus mixing sources WILL contain both, and every
  * hash-keyed operator silently treats them as different documents unless
  * keys are canonicalized first. Spark ships no normalization function
  * (the built-in surface stops at case/trim/translate), so per the
  * engine's preference order this is rung (b): a native `UnaryExpression`
  * with `doGenCode` — one static `java.text.Normalizer` call per row,
  * inside WholeStageCodegen, no UDF serialization.
  *
  * Fast path: `Normalizer.isNormalized` is O(n) with no allocation and
  * true for almost every real-world string (ASCII trivially) — the
  * normalize-with-copy only runs on the rare decomposed row. DuckDB's
  * `nfc_normalize` implements the same canonical composition, so oracle
  * hashes match byte-for-byte.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_nfc requires a string argument, got ${t.sql}")
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_nfc"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Static entry shared by eval and generated code. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
