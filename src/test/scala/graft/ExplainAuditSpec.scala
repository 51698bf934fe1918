package graft

import graft.tools.ExplainAudit
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

/** The plan-shape regression gate's detector, fed REAL Spark plans:
  * healthy gate plans produce zero violations, and seeded regressions
  * (a dropped broadcast hint, a true cartesian) are caught. The
  * precommit --test hook runs the same checks via
  * `runMain graft.tools.ExplainAudit --check`.
  */
class ExplainAuditSpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(FormattedMode)

  test("healthy gate plans carry zero violations") {
    for (name <- Seq("q01_filter_project", "q02_agg_group",
        "q03_join_broadcast", "q04_join_shuffle", "q05_multijoin",
        "q108_keyword_search", "q109_cohort_retention",
        "q110_basket_pairs", "q137_pagerank", "q138_interval_events",
        "q139_gapfill", "q140_concurrency", "q141_transitions",
        "q142_anomaly", "q143_embed_quant", "q144_quant_search",
        "q145_label_attach")) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      ExplainAudit.violations(name, plan(df)) shouldBe empty
    }
  }

  test("seeded regression: dropped broadcast hint on the dim join is caught") {
    // q03's shape WITHOUT the broadcast hint, under a threshold that
    // forbids auto-broadcast — the exact regression the hook guards
    val before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val degraded = Tables.lineitem(spark, sfDir)
        .join(Tables.part(spark, sfDir), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand")).agg(count(lit(1)).as("n"))
      val vs = ExplainAudit.violations("q03_join_broadcast", plan(degraded))
      vs.map(_.rule).exists(_.contains("BroadcastHashJoin")) shouldBe true
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", before)
  }

  test("seeded regression: gap-fill window losing its key partition is caught") {
    // q139's running-count window WITHOUT partitionBy(user_id) — the
    // single-task global sort the windowspecdefinition rule guards
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("day_cents"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("day"))
    val degraded = daily.withColumn("grp", count(col("day_cents")).over(w))
    val vs = ExplainAudit.violations("q139_gapfill", plan(degraded))
    vs.map(_.rule).exists(_.contains("partition")) shouldBe true
  }

  test("unpartitioned windows are bounded: domain-compressed cumsums pass, a raw-scan global sort is caught") {
    // the legitimate unpartitioned-window family: every input is an
    // aggregate / tiny Range spine, so the single-task sort is over a
    // handful of rows — these must stay green under the global rule
    for (name <- Seq("q157_vocab_growth", "q87_vocab_coverage", "q112_kpi_daily")) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      ExplainAudit.violations(name, plan(df)) shouldBe empty
    }
    // seeded regression: the same running-sum shape directly over the
    // raw lineitem scan — the whole fact table onto ONE task
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("l_shipdate"))
    val degraded = Tables.lineitem(spark, sfDir)
      .withColumn("running", sum(col("l_quantity")).over(w))
    val vs = ExplainAudit.violations("seeded_raw_window", plan(degraded))
    vs.map(_.rule).exists(_.contains("unpartitioned window over raw rows")) shouldBe true
    // and a KEYED window over the same raw scan stays fine (partition
    // spec present — not this rule's business)
    val keyed = Tables.lineitem(spark, sfDir)
      .withColumn("running", sum(col("l_quantity")).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("l_orderkey")).orderBy(col("l_shipdate"))))
    ExplainAudit.violations("keyed_raw_window", plan(keyed)) shouldBe empty
  }

  test("seeded regression: UNORDERED unpartitioned window over raw rows is caught") {
    // no partitionBy AND no orderBy — the windowspecdefinition leads
    // with specifiedwindowframe instead of an ASC/DESC expression, the
    // r17 rule's false-negative path: still one task holding the whole
    // fact table
    val w = org.apache.spark.sql.expressions.Window
      .rowsBetween(Long.MinValue, Long.MaxValue)
    val degraded = Tables.lineitem(spark, sfDir)
      .withColumn("total", sum(col("l_quantity")).over(w))
    val vs = ExplainAudit.violations("seeded_unordered_window", plan(degraded))
    vs.map(_.rule).exists(_.contains("unpartitioned window over raw rows")) shouldBe true
  }

  test("structural boundedness: BuildLeft broadcast joins judged by the STREAMED side, Union by EVERY branch") {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("n"))
    // BuildLeft: the broadcast hint on the LEFT relation makes the
    // build side print FIRST in the formatted tree. The streamed side
    // is an aggregate — bounded regardless of print order (the r18
    // walk's false-positive path: it saw BroadcastExchange first and
    // judged the window unbounded)
    val streamedAgg = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n"))
    val dimLeft = broadcast(Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey")))
    val buildLeft = dimLeft
      .join(streamedAgg, col("o_orderkey") === col("l_orderkey"))
      .withColumn("r", sum(col("n")).over(w))
    val pBL = plan(buildLeft)
    pBL should include("BuildLeft") // the shape under test, pinned
    ExplainAudit.violations("buildleft_bounded_stream", pBL) shouldBe empty
    // and the converse: a bounded BUILD side does not excuse a raw
    // streamed side — the single task still sorts the fact table
    val tinyBuild = broadcast(Tables.orders(spark, sfDir)
      .groupBy(col("o_orderkey")).agg(count(lit(1)).as("m")))
    val rawStream = tinyBuild
      .join(Tables.lineitem(spark, sfDir).withColumn("n", col("l_quantity")),
        col("o_orderkey") === col("l_orderkey"))
      .withColumn("r", sum(col("n")).over(w))
    ExplainAudit.violations("buildleft_raw_stream", plan(rawStream))
      .map(_.rule).exists(_.contains("unpartitioned window")) shouldBe true
    // Union: EVERY branch must be bounded — a compressed FIRST branch
    // over a raw second one (the r18 walk's false-negative path: it
    // audited only the first branch in print order) is caught
    val agg = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
    val raw = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_quantity").cast("long").as("n"))
    val mixed = agg.union(raw).withColumn("r", sum(col("n")).over(w))
    ExplainAudit.violations("union_mixed", plan(mixed))
      .map(_.rule).exists(_.contains("unpartitioned window")) shouldBe true
    // while a union of two aggregates stays green
    val bothAgg = agg.union(
      Tables.orders(spark, sfDir)
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
        .select(col("o_orderstatus"), col("n")))
      .withColumn("r", sum(col("n")).over(w))
    ExplainAudit.violations("union_bounded", plan(bothAgg)) shouldBe empty
  }

  test("seeded regression: an aggregate below a fact join does not excuse a global window") {
    // an aggregate EXISTS in the subtree (the tiny per-order count)
    // but the window's direct input is the join against raw lineitem —
    // the single task still sorts the full fact table. The r17 rule's
    // other false-negative path: compression must sit directly below.
    val perOrder = Tables.orders(spark, sfDir)
      .groupBy(col("o_orderkey")).agg(count(lit(1)).as("n"))
    val joined = Tables.lineitem(spark, sfDir)
      .join(perOrder, col("l_orderkey") === col("o_orderkey"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("l_shipdate"))
    val degraded = joined.withColumn("running", sum(col("l_quantity")).over(w))
    val vs = ExplainAudit.violations("seeded_join_window", plan(degraded))
    vs.map(_.rule).exists(_.contains("unpartitioned window over raw rows")) shouldBe true
  }

  test("seeded regression: label attachment via a join is caught") {
    // the naive formulation q145's oracle runs — a keyed range join —
    // must trip the no-join rule if it ever replaces the window shape
    val e = Tables.events(spark, sfDir)
    val v = e.where(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"),
        unix_micros(col("ts")).as("vts"))
    val p = e.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        unix_micros(col("ts")).as("pts"))
    val degraded = v.join(p, Seq("user_id"))
      .where(col("pts") >= col("vts"))
    val vs = ExplainAudit.violations("q145_label_attach", plan(degraded))
    vs.map(_.rule).exists(_.contains("join in plan")) shouldBe true
  }

  test("seeded regression: a non-broadcast cross join is flagged as cartesian") {
    val before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val cart = Tables.nation(spark, sfDir).crossJoin(Tables.region(spark, sfDir))
      val vs = ExplainAudit.violations("any_query", plan(cart))
      vs.map(_.rule).exists(_.contains("CartesianProduct")) shouldBe true
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", before)
  }

  test("stored-artifact consumers read the checkpointed artifact; recompute is caught") {
    // healthy: the warmed q31 plan is a checkpoint scan
    val healthy = SparkEntry.queries("q31_dedup_jaccard")(spark, sfDir)
    ExplainAudit.violations("q31_dedup_jaccard", plan(healthy)) shouldBe empty
    // seeded regression: the same pair list built FRESH (the pre-r7
    // per-query recompute shape) must trip the artifact rule
    val recompute = operators.Dedup.jaccardPairs(
      Tables.documents(spark, sfDir), 0.5, maxShingleDf = 512)
    val vs = ExplainAudit.violations("q31_dedup_jaccard", plan(recompute))
    vs.map(_.rule).exists(_.contains("stored artifact")) shouldBe true
  }

  test("seeded regression: window-based ranking for keyword search is caught") {
    // q108's result computed via a single-partition row_number shape
    // instead of TakeOrderedAndProject — the q18-class straggler.
    // (NB the `where(rnk <= k)` idiom is NOT a usable seed: Spark's
    // LimitPushDownThroughWindow rewrites it into a TakeOrdered +
    // residual Window, so only the unfiltered ranking regresses.)
    import org.apache.spark.sql.expressions.Window
    val degraded = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("term"))
      .where(col("term").isin("join", "window", "agg"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("score"))
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id"))))
    val vs = ExplainAudit.violations("q108_keyword_search", plan(degraded))
    vs.map(_.rule).exists(_.contains("TakeOrderedAndProject")) shouldBe true
    vs.map(_.rule).exists(_.contains("window")) shouldBe true
  }

  test("seeded regression: lost column pruning / pushdown on q01's scan is caught") {
    // a scan that reads every column and pushes nothing — the shape
    // q01 would take if the projection/filter stopped reaching parquet
    val unpruned = Tables.lineitem(spark, sfDir)
    val vs = ExplainAudit.violations("q01_filter_project", plan(unpruned))
    vs.map(_.rule).exists(_.contains("PushedFilters")) shouldBe true
    vs.map(_.rule).exists(_.contains("pruning")) shouldBe true
  }
}
