package graft.plans

import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Scale guardrail, sibling of [[ApproxPercentileRewrite]]: rewrite
  * EXACT `COUNT(DISTINCT x)` aggregates to the mergeable HLL++ sketch
  * (`approx_count_distinct`).
  *
  * Exact distinct aggregation is the other classic 100 TB hazard
  * (SURVEY.md §4): the planner's distinct rewrite adds a second
  * shuffle keyed by (group, value), and MULTIPLE distincts in one
  * aggregate trigger an Expand that multiplies every input row per
  * distinct column. With this rule injected and
  * `spark.graft.approxDistinctRewrite=true`, any query — including
  * third-party SQL the pipeline didn't author — degrades to a
  * fixed-size mergeable sketch (map-side partials, one shuffle, no
  * Expand) at rsd `spark.graft.approxDistinctRsd` (default 0.023,
  * the q130 profiler's setting). Off by default: the oracle-verified
  * suite keeps exact semantics unless a deployment opts in.
  *
  * Only single-argument COUNT(DISTINCT x) is rewritten. Multi-column
  * COUNT(DISTINCT a, b) stays exact: HLL++ sketches one value stream,
  * and silently sketching a struct of the columns would change null
  * semantics (COUNT(DISTINCT a, b) drops rows where ANY column is
  * null; a struct is non-null when its fields are null).
  */
case class ApproxDistinctRewrite(
    enabled: () => Boolean,
    rsd: () => Double) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled()) plan
    else plan.transformAllExpressions {
      case ae @ AggregateExpression(Count(Seq(child)), _, true, _, _) =>
        ae.copy(
          aggregateFunction = HyperLogLogPlusPlus(child, rsd()),
          isDistinct = false)
    }
}
