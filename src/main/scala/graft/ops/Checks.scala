package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint suite (the Deequ/Great-
  * Expectations shape): a table publishes only after its expectations
  * pass, and the violation counts are the audit artifact.
  *
  * The reference validates data by side effect — a load either throws
  * inside the Function (`/root/reference/adffunction/__init__.py:150-178`)
  * or silently truncates; there is no declarative gate. This operator is
  * that gate, engine-native.
  *
  * EVALUATION SHAPE (the 100 TB argument):
  *  - Every ROW-LOCAL constraint (not-null, range, regex, set
  *    membership) compiles to one conditional-sum column in a SINGLE
  *    wide aggregate — one scan of the fact table total, regardless of
  *    how many constraints the suite declares. The one-row result is
  *    unpivoted driver-free with `stack`.
  *  - `Unique` needs the key distribution: one groupBy shuffle on the
  *    key columns, violations = extra rows beyond one per key
  *    (Σ cnt − #keys). Never an Expand, never count_distinct in the
  *    row-local aggregate (the q_profile_stats lesson).
  *  - `Ref` (foreign-key integrity) is one left-anti join against the
  *    dimension's key projection — broadcast when the dim is small,
  *    which is the normal FK case. NULL foreign keys are NOT violations
  *    (SQL FK semantics); the null-FK rows never reach the join.
  *
  * Violation counts are exact integers, so a SQL oracle reproduces the
  * whole verdict table hash-exactly (`q_quality_checks`).
  */
object Checks {

  sealed trait Constraint { def name: String }

  /** Column must be non-null. */
  final case class NotNull(col: String) extends Constraint {
    def name = s"not_null($col)"
  }

  /** Column must lie in [lo, hi] (inclusive); NULL is not a violation
    * (declare NotNull separately — one fact per constraint).
    */
  final case class InRange(col: String, lo: Double, hi: Double) extends Constraint {
    def name = s"in_range($col,$lo,$hi)"
  }

  /** Column must match the (Java) regex; NULL is not a violation. */
  final case class Matches(col: String, regex: String) extends Constraint {
    def name = s"matches($col,$regex)"
  }

  /** Column value must be one of `values`; NULL is not a violation. */
  final case class InSet(col: String, values: Seq[String]) extends Constraint {
    def name = s"in_set($col,${values.mkString("|")})"
  }

  /** The column tuple must be unique across the table. */
  final case class Unique(cols: Seq[String]) extends Constraint {
    def name = s"unique(${cols.mkString(",")})"
  }

  /** Every non-null value of `col` must exist in `dimCol` of `dim`. */
  final case class Ref(col: String, dim: DataFrame, dimCol: String) extends Constraint {
    def name = s"ref($col->$dimCol)"
  }

  private def violationExpr(c: Constraint): Column = c match {
    case NotNull(col) => when(expr(col).isNull, 1L).otherwise(0L)
    case InRange(col, lo, hi) =>
      when(expr(col).isNotNull &&
        !expr(col).cast("double").between(lo, hi), 1L).otherwise(0L)
    case Matches(col, re) =>
      when(expr(col).isNotNull && !expr(col).rlike(re), 1L).otherwise(0L)
    case InSet(col, vs) =>
      when(expr(col).isNotNull && !expr(col).isInCollection(vs), 1L).otherwise(0L)
    case other =>
      throw new IllegalArgumentException(s"not row-local: ${other.name}")
  }

  /** All row-local constraints in ONE aggregate over ONE scan; the
    * single wide row unpivots to (check_name, violations) via `stack`.
    */
  def rowLocal(df: DataFrame, cs: Seq[Constraint]): DataFrame = {
    require(cs.nonEmpty, "no row-local constraints")
    val sums = cs.zipWithIndex.map { case (c, i) =>
      sum(violationExpr(c)).as(s"v$i")
    }
    val wide = df.agg(sums.head, sums.tail: _*)
    val stackArgs = cs.zipWithIndex
      .map { case (c, i) => s"'${c.name.replace("'", "")}', v$i" }
      .mkString(", ")
    wide.select(expr(s"stack(${cs.size}, $stackArgs) AS (check_name, violations)"))
  }

  private def uniqueViolations(df: DataFrame, u: Unique): DataFrame = {
    val keyCounts = df.groupBy(u.cols.map(col): _*).agg(count(lit(1)).as("cnt"))
    keyCounts.agg(
      (coalesce(sum(col("cnt")), lit(0L)) - count(lit(1))).as("violations"))
      .select(lit(u.name).as("check_name"), col("violations"))
  }

  private def refViolations(df: DataFrame, r: Ref): DataFrame =
    df.select(expr(r.col).as("fk")).filter(col("fk").isNotNull)
      .join(r.dim.select(expr(r.dimCol).as("fk")).distinct(), Seq("fk"), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit(r.name).as("check_name"), col("violations"))

  /** Evaluate the whole suite: (check_name, violations, passed), one row
    * per constraint, ordered by name.
    */
  def run(df: DataFrame, cs: Seq[Constraint]): DataFrame = {
    val (local, heavy) = cs.partition {
      case _: Unique | _: Ref => false
      case _ => true
    }
    val parts =
      (if (local.nonEmpty) Seq(rowLocal(df, local)) else Nil) ++
        heavy.map {
          case u: Unique => uniqueViolations(df, u)
          case r: Ref => refViolations(df, r)
          case c => throw new IllegalArgumentException(c.name)
        }
    parts.reduce(_ unionByName _)
      .select(col("check_name"), col("violations"),
        (col("violations") === 0L).as("passed"))
      .orderBy(col("check_name"))
  }
}
