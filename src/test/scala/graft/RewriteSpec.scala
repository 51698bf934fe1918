package graft

import org.apache.spark.sql.functions._

/** The opt-in optimizer rule must swap exact percentile for the
  * t-digest sketch — and must stay inert when the flag is off.
  */
class RewriteSpec extends SparkSpec {

  private val flag = "spark.graft.approxPercentileRewrite"

  private def percentilePlan(): String =
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_quantity, 0.5)").as("p50"))
      .queryExecution.optimizedPlan.toString

  test("flag off: exact percentile survives") {
    percentilePlan() should include("percentile(")
    percentilePlan() should not include "percentile_approx"
  }

  test("flag on: exact percentile rewrites to the mergeable sketch") {
    spark.conf.set(flag, "true")
    try {
      percentilePlan() should include("percentile_approx")
    } finally spark.conf.unset(flag) // leave the shared session clean
  }
}
