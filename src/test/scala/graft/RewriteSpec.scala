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

  private val dFlag = "spark.graft.approxDistinctRewrite"

  private def distinctPlan(exprSql: String): String =
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(expr(exprSql).as("d"))
      .queryExecution.optimizedPlan.toString

  test("distinct flag off: exact count-distinct survives") {
    distinctPlan("count(DISTINCT l_partkey)") should not include "approx_count_distinct"
  }

  test("distinct flag on: count-distinct rewrites to HLL++; multi-column stays exact") {
    spark.conf.set(dFlag, "true")
    try {
      val single = distinctPlan("count(DISTINCT l_partkey)")
      single should include("approx_count_distinct")
      // multi-column distinct has no null-faithful sketch form — the
      // rule must leave it exact rather than silently change semantics
      val multi = distinctPlan("count(DISTINCT l_partkey, l_suppkey)")
      multi should not include "approx_count_distinct"
      // rewritten estimates land within the configured rsd's design
      // band on real data (sanity: this is HLL++ at rsd 0.023)
      spark.conf.set(dFlag, "false")
      val exact = Tables.lineitem(spark, sfDir)
        .agg(expr("count(DISTINCT l_partkey)")).head().getLong(0)
      spark.conf.set(dFlag, "true")
      val est = Tables.lineitem(spark, sfDir)
        .agg(expr("count(DISTINCT l_partkey)")).head().getLong(0)
      math.abs(est - exact).toDouble / exact should be < 0.1
    } finally spark.conf.unset(dFlag)
  }
}
