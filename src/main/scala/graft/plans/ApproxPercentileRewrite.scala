package graft.plans

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, ApproximatePercentile, Percentile}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Scale guardrail: rewrite EXACT `percentile` aggregates to the
  * mergeable t-digest sketch (`approx_percentile`).
  *
  * Exact Percentile is a non-mergeable aggregate — it buffers every
  * value of a group on the merge side, which is an executor OOM at
  * 100 TB (SURVEY.md §4). With this rule injected and
  * `spark.graft.approxPercentileRewrite=true`, any query (including
  * third-party SQL the pipeline didn't author) silently degrades to
  * the sketch with configurable accuracy instead of a non-scalable
  * exact plan. Off by default: the oracle-verified suite keeps exact
  * semantics unless a deployment opts in.
  */
case class ApproxPercentileRewrite(enabled: () => Boolean) extends Rule[LogicalPlan] {

  private val accuracy = ApproximatePercentile.DEFAULT_PERCENTILE_ACCURACY

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled()) plan
    else plan.transformAllExpressions {
      // reverse=true (descending-order percentile) has no sketch
      // equivalent without flipping p; leave those exact rather than
      // silently answering the wrong quantile
      case ae @ AggregateExpression(
          Percentile(child, percentage, frequency, _, _, reverse), _, _, _, _)
          if frequency == Literal(1L) && !reverse =>
        ae.copy(aggregateFunction = new ApproximatePercentile(
          child, percentage, Literal(accuracy)))
    }
}
