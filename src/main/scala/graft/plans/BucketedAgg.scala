package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.graftshim.AggPlanShim

/** BUCKETED SINGLE-TABLE AGGREGATION (VERDICT r16 item 4 — the
  * revisited r16 refusal): `GROUP BY k` on one `bucket(n, k)` graft
  * table pays no Exchange at all.
  *
  * The r16 refusal note argued the only path was re-implementing
  * Spark's partial/final/distinct aggregate routing, which lives behind
  * `private[sql] AggUtils`. The repo's own graftshim precedent
  * contradicts that premise: a one-object shim inside
  * `org.apache.spark.sql` ([[AggPlanShim]]) can simply CALL
  * `AggUtils.planAggregateWithoutDistinct` — Spark's own two-phase
  * planning, hash/object-hash/sort fallback included — over a
  * strategy-supplied child. This strategy matches an Aggregate whose
  * grouping keys CONTAIN the bucket key, plans the bucket-aligned scan
  * ([[GraftBucketedScanExec]] — truthfully `HashPartitioning(k, n)`,
  * the [[BucketedJoin]] soundness law), and delegates everything else
  * to the shim. The final aggregate's `ClusteredDistribution(groups)`
  * is satisfied because the partitioning expression `k` is a member of
  * the grouping set, so `EnsureRequirements` adds no Exchange.
  *
  * Declines (→ vanilla planning, with its Exchange):
  *  - any DISTINCT aggregate (its mid-query re-shuffle genuinely needs
  *    planning around a different distribution);
  *  - grouping keys that are not bare attributes — this also
  *    auto-declines float/double keys, whose grouping expressions the
  *    optimizer wraps in NaN/−0.0 normalization;
  *  - grouping sets (rollup/cube — their Expand sits between);
  *  - a grouping set that does NOT contain the bucket key (rows for one
  *    group would span buckets);
  *  - every [[BucketedJoin.layoutOf]] ineligibility: dv-bearing,
  *    feature-bearing, spec-evolved, multi-spec, non-bucket tables.
  *
  * Payoff is honest-modest (the one shuffle it removes is already
  * map-side combined — one row per group per partition), but at 100 TB
  * a `GROUP BY user_id` over a `bucket(512, user_id)` fact table skips
  * a full-network redistribution of the partial-agg state. Kill
  * switch: `spark.graft.bucketedAgg.enabled=false`.
  */
class GraftBucketedAggStrategy(spark: SparkSession)
    extends org.apache.spark.sql.execution.SparkStrategy {

  import BucketedJoin.Side

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case agg: Aggregate
        if spark.conf.get("spark.graft.bucketedAgg.enabled", "true") != "false" =>
      AggPlanShim.physicalAggregation(agg) match {
        case Some((grouping, aggExprs, result, Side(vr, _, scanOut, wrap)))
            if grouping.nonEmpty &&
              grouping.forall(_.isInstanceOf[AttributeReference]) &&
              aggExprs.forall(ae => !ae.isDistinct) =>
          BucketedJoin.layoutOf(spark, vr.table, vr.version) match {
            case Some(layout)
                if grouping.exists { g =>
                  val a = g.asInstanceOf[AttributeReference]
                  a.name == layout.key &&
                    scanOut.exists(_.exprId == a.exprId)
                } =>
              AggPlanShim.planAggregateWithoutDistinct(grouping, aggExprs,
                result, wrap(GraftBucketedScanExec(scanOut, vr.table, layout)))
            case _ => Nil
          }
        case _ => Nil
      }
    case _ => Nil
  }
}
