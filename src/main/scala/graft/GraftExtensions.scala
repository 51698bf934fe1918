package graft

import graft.expressions.{CosineSimilarity, DotProduct, PqAdcDistance, SimHashAgg}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session extensions registering graft's native Catalyst expressions
  * as SQL functions (install via
  * `spark.sql.extensions=graft.GraftExtensions`, which
  * `graft.util.configure` sets). Callable from SQL as
  * `cosine_sim(a, b)` or from the DataFrame API via
  * `graft.functions.cosineFast`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // Scale guardrail (opt-in per session): rewrite exact percentile
    // aggregates to the mergeable t-digest sketch. See
    // graft.plans.ApproxPercentileRewrite.
    ext.injectOptimizerRule { session =>
      graft.plans.ApproxPercentileRewrite(() =>
        session.conf.get("spark.graft.approxPercentileRewrite", "false").toBoolean)
    }
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "cosine_sim expects exactly 2 arguments")
        CosineSimilarity(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("simhash_agg"),
      new ExpressionInfo(classOf[SimHashAgg].getName, "simhash_agg"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 1, "simhash_agg expects exactly 1 argument")
        SimHashAgg(children.head).toAggregateExpression()
      }))
    ext.injectFunction((
      new FunctionIdentifier("pq_adc"),
      new ExpressionInfo(classOf[PqAdcDistance].getName, "pq_adc"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "pq_adc expects exactly 2 arguments")
        PqAdcDistance(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "dot_product expects exactly 2 arguments")
        DotProduct(children.head, children(1))
      }))
  }
}
