package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.Cast
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.TimestampType

/** SQL surface for versioned tables: resolves `graft.`<path>`` table
  * references — including `VERSION AS OF n` / `TIMESTAMP AS OF ts` time
  * travel, which Spark's parser already turns into [[RelationTimeTravel]]
  * — into the `graft-table` relation, so
  *
  * {{{
  *   SELECT ... FROM graft.`/data/t` VERSION AS OF 3 WHERE k BETWEEN a AND b
  *   INSERT INTO graft.`/data/t` SELECT ...
  *   DELETE FROM graft.`/data/t` WHERE ...        -- dv tombstones
  *   UPDATE graft.`/data/t` SET ... WHERE ...     -- merge-on-read
  *   MERGE INTO graft.`/data/t` tgt USING src ON tgt.k = src.k ...
  * }}}
  *
  * work as first-class SQL. An injected RESOLUTION rule (the documented
  * `SparkSessionExtensions` seam — the same mechanism Delta's
  * `DeltaAnalysis` uses) rather than a `TableCatalog`: a v2 catalog
  * would force the DSv2 read stack (hand-rolled `InternalRow` readers),
  * while the substituted v1 relation keeps the pruned snapshot a full
  * Spark plan AND hands the `WHERE` clause to the manifest file-skipper
  * through `PrunedFilteredScan`. Non-graft references pass through
  * untouched (the builtin analyzer leaves unknown relations unresolved
  * until CheckAnalysis, so this rule always gets its chance).
  *
  * `INSERT INTO` resolves because the substituted relation is
  * [[org.apache.spark.sql.sources.InsertableRelation]] — Spark's own
  * DataSourceAnalysis turns the statement into the relation's insert
  * (append = commit-race-safe [[graft.ops.Versioned.appendRebase]]).
  */
final class GraftSqlRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def graftPath(u: UnresolvedRelation): Option[String] =
    u.multipartIdentifier match {
      case Seq(cat, p) if cat.equalsIgnoreCase("graft") => Some(p)
      case _ => None
    }

  /** The table path behind a NAMED session-catalog table created with
    * `CREATE TABLE ... USING graft-table` — closes the round-11 gap
    * where the SQL surface worked on `graft.`path`` literals only. Plain
    * reads, INSERT, and DML already resolve through the builtin
    * FindDataSourceTable path (the provider is a v1 RelationProvider);
    * this hook is for the statements the BUILTIN analyzer cannot route
    * for a v1 source — time travel (`VERSION/TIMESTAMP AS OF name`).
    */
  private def catalogGraftPath(u: UnresolvedRelation): Option[String] = {
    val ident = u.multipartIdentifier match {
      case Seq(t) =>
        Some(org.apache.spark.sql.catalyst.TableIdentifier(t))
      case Seq(db, t) if !db.equalsIgnoreCase("graft") =>
        Some(org.apache.spark.sql.catalyst.TableIdentifier(t, Some(db)))
      case _ => None
    }
    ident.flatMap { id =>
      try {
        val cat = spark.sessionState.catalog
        if (!cat.tableExists(id)) None
        else {
          val meta = cat.getTableMetadata(id)
          if (meta.provider.exists(_.equalsIgnoreCase("graft-table")))
            meta.storage.locationUri
              .map(uri => new org.apache.hadoop.fs.Path(uri).toString)
              .orElse(meta.storage.properties.get("path"))
          else None
        }
      } catch { case _: org.apache.spark.sql.AnalysisException => None }
    }
  }

  /** The graft table path behind a (possibly aliased) resolved
    * relation, for matching DML statement targets.
    */
  private def graftRelPath(plan: LogicalPlan): Option[String] = plan match {
    case s: org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias =>
      graftRelPath(s.child)
    case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
      lr.relation match {
        case vr: graft.sources.VersionedRelation => Some(vr.table)
        case _ => None
      }
    case _ => None
  }

  private def relationAt(p: String, v: Option[Long]): LogicalPlan = {
    val reader = spark.read.format("graft-table")
    v.foreach(x => reader.option("versionAsOf", x))
    reader.load(p).queryExecution.analyzed
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      // InsertIntoStatement is a UnaryNode over its QUERY only — `table`
      // is a field, not a child, so the generic traversal below never
      // reaches it (the same reason builtin ResolveRelations matches the
      // statement explicitly). Substitute the write target here.
      case i: org.apache.spark.sql.catalyst.plans.logical.InsertIntoStatement
          if i.table.isInstanceOf[UnresolvedRelation] &&
            graftPath(i.table.asInstanceOf[UnresolvedRelation]).isDefined =>
        val p = graftPath(i.table.asInstanceOf[UnresolvedRelation]).get
        require(i.partitionSpec.isEmpty,
          s"graft.`$p` has no SQL partitions — INSERT without PARTITION")
        i.copy(table = relationAt(p, None))

      // SQL DML → the table's own verbs, once the statement is fully
      // resolved against the substituted relation (the generic cases
      // below rewrite the UnresolvedRelation child first; builtin rules
      // then resolve conditions/assignments; THEN these fire — before
      // CheckAnalysis can refuse row-level ops on a v1 relation).
      case d @ org.apache.spark.sql.catalyst.plans.logical
          .DeleteFromTable(rel, cond)
          if d.resolved && graftRelPath(rel).isDefined =>
        GraftDeleteCommand(graftRelPath(rel).get, GraftDml.rebindBare(cond))
      case up @ org.apache.spark.sql.catalyst.plans.logical
          .UpdateTable(rel, assignments, cond)
          if up.resolved && graftRelPath(rel).isDefined =>
        GraftUpdateCommand(graftRelPath(rel).get,
          GraftMergeTranslator.assignmentPairs(assignments)
            .map { case (c, v) => c -> GraftDml.rebindBare(v) },
          cond.map(GraftDml.rebindBare))
      case m: org.apache.spark.sql.catalyst.plans.logical.MergeIntoTable
          if m.resolved && graftRelPath(m.targetTable).isDefined =>
        GraftMergeTranslator.translate(graftRelPath(m.targetTable).get, m)

      case tt @ RelationTimeTravel(u: UnresolvedRelation, _, _) =>
        graftPath(u).orElse(catalogGraftPath(u)) match {
          case None => tt
          case Some(p) => GraftTimeTravelRule.resolve(spark, p, tt)
        }
      case u: UnresolvedRelation =>
        graftPath(u).map(p => relationAt(p, None)).getOrElse(u)
    }

  private[plans] def catalogPathOf(u: UnresolvedRelation): Option[String] =
    graftPath(u).orElse(catalogGraftPath(u))
}

/** Time travel over NAMED graft catalog tables must resolve BEFORE the
  * builtin Resolution batch: `ResolveRelations` routes
  * `RelationTimeTravel` through the V2SessionCatalog, which THROWS
  * `UNSUPPORTED_FEATURE.TIME_TRAVEL` for any v1 provider table — a
  * later rule never gets a chance. Injected via
  * `injectHintResolutionRule` (the Hints batch runs first), this rule
  * substitutes graft targets — path literals and catalog names alike —
  * leaving everything else for [[GraftSqlRule]].
  */
final class GraftTimeTravelRule(spark: SparkSession) extends Rule[LogicalPlan] {
  private val delegate = new GraftSqlRule(spark)
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case tt @ RelationTimeTravel(u: UnresolvedRelation, _, _) =>
        delegate.catalogPathOf(u) match {
          case None => tt
          case Some(p) => GraftTimeTravelRule.resolve(spark, p, tt)
        }
    }
}

private[plans] object GraftTimeTravelRule {
  /** Resolve a graft `RelationTimeTravel` to the pinned-version relation. */
  def resolve(spark: SparkSession, p: String,
      tt: RelationTimeTravel): LogicalPlan = {
    val v: Long = tt.version match {
      case Some(s) =>
        try s.toLong
        catch {
          case _: NumberFormatException =>
            throw new IllegalArgumentException(
              s"graft VERSION AS OF takes a commit number, got '$s'")
        }
      case None =>
        val e = tt.timestamp.getOrElse(throw new IllegalArgumentException(
          s"time travel on graft.`$p` needs VERSION or TIMESTAMP"))
        require(e.resolved && e.foldable,
          s"graft TIMESTAMP AS OF must be a literal expression: $e")
        val micros = Cast(e, TimestampType,
            Some(spark.sessionState.conf.sessionLocalTimeZone))
            .eval(InternalRow.empty) match {
          case l: java.lang.Long => l.longValue()
          case other => throw new IllegalArgumentException(
            s"graft TIMESTAMP AS OF did not evaluate to a timestamp: $other")
        }
        graft.ops.Versioned.versionAsOf(spark, p, Math.floorDiv(micros, 1000L))
    }
    val reader = spark.read.format("graft-table").option("versionAsOf", v)
    reader.load(p).queryExecution.analyzed
  }
}
