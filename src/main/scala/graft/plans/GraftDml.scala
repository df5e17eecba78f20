package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, AttributeSet, EqualTo, Expression, PlanExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, InsertAction, LogicalPlan, MergeIntoTable, UpdateAction}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions.{expr, lit}

import graft.ops.Versioned

/** SQL DML over graft tables: the command nodes `GraftSqlRule`
  * substitutes for resolved `DeleteFromTable` / `UpdateTable` /
  * `MergeIntoTable` statements whose target is a graft relation. Each
  * is a v1 [[LeafRunnableCommand]] — Spark's own planner wraps it in
  * `ExecutedCommandExec` and runs it EAGERLY on `spark.sql(...)`, while
  * `EXPLAIN` shows the node without executing (no side effects at
  * analysis time). The bodies delegate to the table's existing verbs,
  * so SQL DELETE gets dv tombstones + stats-pruned coordinate harvest,
  * SQL UPDATE gets merge-on-read, and SQL MERGE gets the one-commit
  * matched-UPDATE/DELETE + not-matched-INSERT with file pruning — the
  * Delta SQL surface re-expressed over graft's verbs.
  *
  * Conditions and SET values travel as SQL TEXT: the rule rebinds the
  * resolved expression's attribute references to the names the verb's
  * own scan resolves (bare names for single-table DML, `tgt.`/`src.`
  * qualifiers for MERGE — [[Versioned.mergeApply]] aliases its join
  * sides exactly so), then re-parses with the public `expr()`. Staying
  * in the value domain of SQL text keeps the command nodes free of
  * bound attribute ids from a plan that no longer exists at run time.
  */
object GraftDml {

  /** Rebind a resolved single-table predicate/value to bare column
    * names and return its re-parseable SQL. Subqueries refuse loudly
    * (`expr()` cannot re-parse them; graft DML conditions are scalar).
    */
  private[plans] def rebindBare(e: Expression): String = {
    require(!e.exists(_.isInstanceOf[PlanExpression[_]]),
      s"graft DML does not support subqueries in conditions: ${e.sql}")
    e.transform {
      case a: AttributeReference => UnresolvedAttribute(Seq(a.name))
    }.sql
  }

  /** Rebind a resolved MERGE-clause expression to the `tgt`/`src`
    * aliases [[Versioned.mergeApply]] gives its join sides.
    */
  private[plans] def rebindMerge(e: Expression, targetOut: AttributeSet,
      sourceOut: AttributeSet): String = {
    require(!e.exists(_.isInstanceOf[PlanExpression[_]]),
      s"graft MERGE does not support subqueries in clauses: ${e.sql}")
    e.transform {
      case a: AttributeReference if sourceOut.contains(a) =>
        UnresolvedAttribute(Seq("src", a.name))
      case a: AttributeReference if targetOut.contains(a) =>
        UnresolvedAttribute(Seq("tgt", a.name))
      case a: AttributeReference =>
        throw new IllegalArgumentException(
          s"MERGE clause references an attribute from neither side: ${a.name}")
    }.sql
  }

  /** Rebind a SOURCE-only expression (a `WHEN NOT MATCHED [AND cond]
    * THEN INSERT` condition — the Delta rule: no target row exists yet)
    * to BARE names: the engine applies it as a filter on the batch frame
    * before aliasing.
    */
  private[plans] def rebindSourceBare(e: Expression,
      targetOut: AttributeSet, sourceOut: AttributeSet): String = {
    require(!e.exists(_.isInstanceOf[PlanExpression[_]]),
      s"graft MERGE does not support subqueries in clauses: ${e.sql}")
    e.transform {
      case a: AttributeReference if sourceOut.contains(a) =>
        UnresolvedAttribute(Seq(a.name))
      case a: AttributeReference if targetOut.contains(a) =>
        throw new IllegalArgumentException(
          "a WHEN NOT MATCHED INSERT condition may reference only source " +
            s"columns (no target row exists): ${a.name}")
    }.sql
  }

  /** Rebind a TARGET-only expression (`WHEN NOT MATCHED BY SOURCE`
    * conditions and SET values — no source row exists) to the `tgt`
    * alias the verb's scan carries.
    */
  private[plans] def rebindTargetOnly(e: Expression,
      targetOut: AttributeSet, sourceOut: AttributeSet): String = {
    require(!e.exists(_.isInstanceOf[PlanExpression[_]]),
      s"graft MERGE does not support subqueries in clauses: ${e.sql}")
    e.transform {
      case a: AttributeReference if targetOut.contains(a) =>
        UnresolvedAttribute(Seq("tgt", a.name))
      case a: AttributeReference if sourceOut.contains(a) =>
        throw new IllegalArgumentException(
          "a WHEN NOT MATCHED BY SOURCE clause may reference only target " +
            s"columns (no source row exists): ${a.name}")
    }.sql
  }

  /** The equi-key [[Versioned.mergeApply]] joins on, extracted from the
    * ON clause — one `target.k = source.k` equality (either order).
    * Anything else refuses loudly: graft MERGE is keyed, like its verb.
    */
  private[plans] def mergeKey(cond: Expression, targetOut: AttributeSet,
      sourceOut: AttributeSet): String = cond match {
    case EqualTo(a: AttributeReference, b: AttributeReference)
        if targetOut.contains(a) && sourceOut.contains(b) && a.name == b.name =>
      a.name
    case EqualTo(a: AttributeReference, b: AttributeReference)
        if sourceOut.contains(a) && targetOut.contains(b) && a.name == b.name =>
      a.name
    case other => throw new IllegalArgumentException(
      "graft MERGE needs ON target.k = source.k over one same-named key, " +
        s"got: ${other.sql}")
  }
}

/** `DELETE FROM graft.`path`` [WHERE cond] → dv tombstones via
  * [[Versioned.deleteWhere]] (stats-pruned coordinate harvest; zero
  * data files rewrite).
  */
final case class GraftDeleteCommand(table: String, condSql: String)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    Versioned.deleteWhere(spark, table, expr(condSql))
    Seq.empty
  }
}

/** `UPDATE graft.`path` SET ... [WHERE cond]` → merge-on-read via
  * [[Versioned.updateWhere]] (matched rows dv out + new images append,
  * one commit).
  */
final case class GraftUpdateCommand(table: String,
    set: Seq[(String, String)], condSql: Option[String])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    Versioned.updateWhere(spark, table,
      condSql.map(expr).getOrElse(lit(true)),
      set.map { case (c, v) => c -> expr(v) }.toMap)
    Seq.empty
  }
}

/** `MERGE INTO graft.`path` USING src ON ...` → one-commit
  * [[Versioned.mergeApply]]. The resolved source plan rides in the
  * command and becomes the batch frame at run time.
  */
final case class GraftMergeCommand(table: String, key: String,
    source: LogicalPlan, sourceCols: Seq[String],
    deleteCondSql: Option[String], updateSet: Option[Seq[(String, String)]],
    insert: Boolean, schemaEvolution: Boolean,
    updateCondSql: Option[String] = None,
    insertCondSql: Option[String] = None,
    nmbsDeleteCondSql: Option[String] = None,
    nmbsUpdate: Option[(Seq[(String, String)], Option[String])] = None)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val batch = org.apache.spark.sql.graftshim.StreamingFrameShim
      .frameOf(spark, source).toDF(sourceCols: _*)
    Versioned.mergeApply(spark, table, batch, key,
      whenMatchedDelete = deleteCondSql.map(expr),
      whenMatchedUpdate = updateSet.map(_.map { case (c, v) =>
        c -> expr(v)
      }.toMap),
      whenNotMatchedInsert = insert,
      schemaEvolution = schemaEvolution,
      whenMatchedUpdateCond = updateCondSql.map(expr),
      whenNotMatchedInsertCond = insertCondSql.map(expr),
      whenNotMatchedBySourceDelete = nmbsDeleteCondSql.map(expr),
      whenNotMatchedBySourceUpdate = nmbsUpdate.map { case (set, c) =>
        (set.map { case (k2, v) => k2 -> expr(v) }.toMap, c.map(expr))
      })
    Seq.empty
  }
}

/** Translates a RESOLVED `MergeIntoTable` into [[GraftMergeCommand]].
  * The full Delta clause matrix routes: conditional WHEN MATCHED
  * UPDATE/DELETE, conditional WHEN NOT MATCHED INSERT (source-only
  * vocabulary), and WHEN NOT MATCHED BY SOURCE UPDATE/DELETE
  * (target-only vocabulary). What still refuses — loudly, so a
  * statement can never half-run with silently dropped clauses: multiple
  * actions of one kind and non-identity INSERT mappings.
  */
object GraftMergeTranslator {

  def translate(table: String, m: MergeIntoTable): GraftMergeCommand = {
    val targetOut = m.targetTable.outputSet
    val sourceOut = m.sourceTable.outputSet
    val key = GraftDml.mergeKey(m.mergeCondition, targetOut, sourceOut)
    // source columns must speak the target's vocabulary (the common
    // `USING (SELECT ... AS <target cols>) s` shape): name-collisions
    // and renames are the user's SELECT's job, not the translator's
    val srcNames = m.sourceTable.output.map(_.name)
    require(srcNames.distinct.length == srcNames.length,
      s"MERGE source columns must be unique: ${srcNames.mkString(",")}")

    val deletes = m.matchedActions.collect { case d: DeleteAction => d }
    val updates = m.matchedActions.collect { case u: UpdateAction => u }
    require(deletes.length <= 1 && updates.length <= 1 &&
      deletes.length + updates.length == m.matchedActions.length,
      "graft MERGE supports at most one WHEN MATCHED UPDATE and one " +
        "WHEN MATCHED DELETE; other matched actions are unsupported")
    // the engine routes delete-before-update; SQL clause semantics are
    // first-match-wins, so the two agree ONLY when DELETE is written
    // first — anything else would silently diverge, refuse instead
    if (deletes.nonEmpty && updates.nonEmpty)
      require(m.matchedActions.head.isInstanceOf[DeleteAction],
        "graft MERGE requires WHEN MATCHED ... DELETE before WHEN MATCHED " +
          "... UPDATE (the engine's clause precedence is delete-first)")
    val delCond = deletes.headOption.map(d =>
      d.condition.map(GraftDml.rebindMerge(_, targetOut, sourceOut))
        .getOrElse("true"))
    val updSet = updates.headOption.map(_.assignments.map { a =>
      assignName(a) -> GraftDml.rebindMerge(a.value, targetOut, sourceOut)
    })
    // conditional matched UPDATE rides as its own rebound condition; NO
    // matched update clause at all pins the condition to `false` so
    // matched rows the delete clause does not claim stay IN PLACE (the
    // verb's bare default is the classic replace-image upsert)
    val updCond = updates.headOption match {
      case Some(u) => u.condition.map(GraftDml.rebindMerge(_, targetOut, sourceOut))
      case None => Some("false")
    }

    val inserts = m.notMatchedActions.collect { case i: InsertAction => i }
    require(inserts.length == m.notMatchedActions.length &&
      inserts.length <= 1,
      "graft MERGE supports at most one WHEN NOT MATCHED THEN INSERT")
    val insCond = inserts.headOption.flatMap(_.condition)
      .map(GraftDml.rebindSourceBare(_, targetOut, sourceOut))
    inserts.foreach { i =>
      // identity mapping only (INSERT * / INSERT (cols) VALUES (s.cols)):
      // each target column takes the same-named source attribute
      i.assignments.foreach { a =>
        val ok = a.value match {
          case v: AttributeReference => v.name == assignName(a)
          case _ => false
        }
        require(ok, "graft MERGE INSERT must map each column from the " +
          s"same-named source column (use the source SELECT to reshape): " +
          s"${assignName(a)} <- ${a.value.sql}")
      }
    }

    // WHEN NOT MATCHED BY SOURCE: at most one DELETE and one UPDATE,
    // conditions and SET values rebound target-only (no source row
    // exists for these clauses by definition)
    val nmbsDeletes = m.notMatchedBySourceActions.collect { case d: DeleteAction => d }
    val nmbsUpdates = m.notMatchedBySourceActions.collect { case u: UpdateAction => u }
    require(nmbsDeletes.length <= 1 && nmbsUpdates.length <= 1 &&
      nmbsDeletes.length + nmbsUpdates.length ==
        m.notMatchedBySourceActions.length,
      "graft MERGE supports at most one WHEN NOT MATCHED BY SOURCE UPDATE " +
        "and one ... DELETE; other by-source actions are unsupported")
    if (nmbsDeletes.nonEmpty && nmbsUpdates.nonEmpty)
      require(m.notMatchedBySourceActions.head.isInstanceOf[DeleteAction],
        "graft MERGE requires WHEN NOT MATCHED BY SOURCE ... DELETE before " +
          "... UPDATE (the engine's clause precedence is delete-first)")
    val nmbsDel = nmbsDeletes.headOption.map(d =>
      d.condition.map(GraftDml.rebindTargetOnly(_, targetOut, sourceOut))
        .getOrElse("true"))
    val nmbsUpd = nmbsUpdates.headOption.map { u =>
      (u.assignments.map(a => assignName(a) ->
        GraftDml.rebindTargetOnly(a.value, targetOut, sourceOut)),
       u.condition.map(GraftDml.rebindTargetOnly(_, targetOut, sourceOut)))
    }

    GraftMergeCommand(table, key, m.sourceTable, srcNames,
      delCond, updSet, insert = inserts.nonEmpty,
      // `MERGE WITH SCHEMA EVOLUTION` maps straight onto mergeApply's
      // flag; without it a source/target column mismatch refuses loudly
      // at run time (the Delta discipline: evolution is opt-in)
      schemaEvolution = m.withSchemaEvolution,
      updateCondSql = updCond,
      insertCondSql = insCond,
      nmbsDeleteCondSql = nmbsDel,
      nmbsUpdate = nmbsUpd)
  }

  private def assignName(a: Assignment): String = a.key match {
    case ar: AttributeReference => ar.name
    case u: UnresolvedAttribute => u.name
    case other => throw new IllegalArgumentException(
      s"unsupported assignment target in graft MERGE/UPDATE: ${other.sql}")
  }

  /** Shared with UPDATE translation in the rule. */
  private[plans] def assignmentPairs(assignments: Seq[Assignment])
      : Seq[(String, Expression)] =
    assignments.map(a => assignName(a) -> a.value)
}
