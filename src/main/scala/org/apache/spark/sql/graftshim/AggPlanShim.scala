package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.expressions.NamedExpression
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.planning.PhysicalAggregation
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.aggregate.AggUtils

/** The aggregate-planning seam (the same boundary-crossing discipline as
  * [[StreamingFrameShim]] — every Spark-internal reach lives in this
  * package, nothing else touches internals): graft's bucketed
  * single-table aggregation strategy must NOT re-implement Spark's
  * partial/final/fallback aggregate routing — `private[sql] AggUtils`
  * already owns it. This shim CALLS it over a strategy-supplied child
  * (the bucket-aligned scan whose `outputPartitioning` lets
  * EnsureRequirements skip the Exchange), exactly how the builtin
  * Aggregation strategy calls it over `planLater(child)`.
  */
object AggPlanShim {

  /** [[PhysicalAggregation]] destructuring — the extractor that splits
    * an [[org.apache.spark.sql.catalyst.plans.logical.Aggregate]] into
    * (named grouping, deduplicated aggregate expressions, result
    * projection, child), rewriting result references the way the
    * physical operators expect.
    */
  def physicalAggregation(plan: LogicalPlan): Option[(Seq[NamedExpression],
      Seq[AggregateExpression], Seq[NamedExpression], LogicalPlan)] =
    PhysicalAggregation.unapply(plan)

  /** Two-phase (partial → final) aggregate planning over an
    * already-planned child — Spark's own routing for the no-DISTINCT
    * case, hash/object-hash/sort fallback included.
    */
  def planAggregateWithoutDistinct(
      groupingExpressions: Seq[NamedExpression],
      aggExpressions: Seq[AggregateExpression],
      resultExpressions: Seq[NamedExpression],
      child: SparkPlan): Seq[SparkPlan] =
    AggUtils.planAggregateWithoutDistinct(
      groupingExpressions, aggExpressions, resultExpressions, child)
}
