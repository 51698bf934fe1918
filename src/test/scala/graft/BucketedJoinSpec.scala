package graft

import org.apache.spark.sql.functions._

/** Bucketed-table co-located joins: when both sides are bucketed by
  * the join key into the same bucket count, the join must run with NO
  * shuffle exchange — the technique that makes repeated fact⨝fact
  * joins affordable at 100 TB (pay the partitioning once at write
  * time, reuse it every query).
  */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("join of co-bucketed tables plans without a shuffle") {
    // default warehouse dir (spark-warehouse/, gitignored) — the
    // warehouse location is a static conf and can't move mid-session
    Tables.orders(spark, sfDir)
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    Tables.lineitem(spark, sfDir)
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")
    try {
      // force sort-merge (tiny test tables would broadcast otherwise) —
      // the point is that the MERGE join needs no Exchange on
      // co-bucketed inputs
      val joined = spark.table("b_lineitem").hint("merge")
        .join(spark.table("b_orders").hint("merge"),
          $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must not introduce Exchanges on either side;
      // the only allowed Exchange is the final single-column aggregate
      val joinPart = plan.split("HashAggregate").last // below the agg
      joinPart should include("SortMergeJoin")
      joinPart should not include "Exchange"
      // and results match the unbucketed join
      val plainRows = Tables.lineitem(spark, sfDir)
        .join(Tables.orders(spark, sfDir), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderstatus").agg(count(lit(1)).as("n"))
      joined.except(plainRows).count() shouldBe 0L
      plainRows.except(joined).count() shouldBe 0L
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
