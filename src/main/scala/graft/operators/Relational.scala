package graft.operators

import graft.{Q, QueryPack, Tables}
import graft.util._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DecimalType, DoubleType, IntegerType, LongType}

/** Core relational suite (SURVEY.md §2, q01–q19): the jx query-language
  * semantics of the reference (filter/select/groupby/edges/window/sort/
  * limit) re-expressed as declarative DataFrame plans so Catalyst gets
  * pushdown, pruning, join-reorder and whole-stage codegen for free.
  *
  * Determinism policy (SURVEY.md §5): money/quantity sums go through
  * DECIMAL so Spark's parallel aggregation is order-independent and
  * matches the single-threaded DuckDB oracle bit-for-bit.
  */
object Relational extends QueryPack {

  private def li(s: SparkSession, d: String) = Tables.lineitem(s, d)
  private def ord(s: SparkSession, d: String) = Tables.orders(s, d)
  private def cust(s: SparkSession, d: String) = Tables.customer(s, d)

  val q01 = Q(
    "q01_filter_project",
    (s, d) =>
      li(s, d)
        .where(col("l_quantity") > 30 && col("l_discount") >= 0.02 &&
          col("l_discount") <= 0.06 && col("l_returnflag") === "R")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          (col("l_quantity") * col("l_tax")).as("taxed_qty")),
    Some("""SELECT l_orderkey, l_linenumber,
           |  l_extendedprice * (1 - l_discount) AS revenue,
           |  l_quantity * l_tax AS taxed_qty
           |FROM lineitem
           |WHERE l_quantity > 30 AND l_discount >= 0.02
           |  AND l_discount <= 0.06 AND l_returnflag = 'R'""".stripMargin),
    "filter + projection with arithmetic expressions")

  val q02 = Q(
    "q02_agg_group",
    (s, d) =>
      li(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_price"),
          davg(col("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order")),
    Some("""SELECT l_returnflag, l_linestatus,
           |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
           |  CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
           |  COUNT(*) AS count_order
           |FROM lineitem
           |GROUP BY l_returnflag, l_linestatus""".stripMargin),
    "group-by with sum/avg/count aggregates")

  val q03 = Q(
    "q03_join_broadcast",
    (s, d) =>
      li(s, d)
        .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"),
          count(lit(1)).as("n_lines")),
    Some("""SELECT p_brand,
           |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           |  COUNT(*) AS n_lines
           |FROM lineitem JOIN part ON l_partkey = p_partkey
           |GROUP BY p_brand""".stripMargin),
    "star-schema broadcast dim join (part is small → broadcast hint)")

  val q04 = Q(
    "q04_join_shuffle",
    (s, d) =>
      ord(s, d)
        .join(li(s, d), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(
          count(lit(1)).as("n_lines"),
          dsum(col("l_extendedprice")).as("gross"),
          dsum(col("o_totalprice")).as("order_price_weighted")),
    Some("""SELECT o_orderstatus,
           |  COUNT(*) AS n_lines,
           |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS gross,
           |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS order_price_weighted
           |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
           |GROUP BY o_orderstatus""".stripMargin),
    "fact⨝fact shuffle join on the natural key; AQE handles skew at scale")

  val q05 = Q(
    "q05_multijoin",
    (s, d) => {
      val l = li(s, d)
      val o = ord(s, d).where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val c = cust(s, d)
      val n = broadcast(Tables.nation(s, d))
      val r = broadcast(Tables.region(s, d))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"),
          count(lit(1)).as("n_lines"))
    },
    Some("""SELECT r_name, n_name,
           |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           |  COUNT(*) AS n_lines
           |FROM lineitem
           |JOIN orders ON l_orderkey = o_orderkey
           |JOIN customer ON o_custkey = c_custkey
           |JOIN nation ON c_nationkey = n_nationkey
           |JOIN region ON n_regionkey = r_regionkey
           |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
           |  AND o_orderdate < TIMESTAMP '1998-01-01'
           |GROUP BY r_name, n_name""".stripMargin),
    "multi-way star join with selective date filter (TPC-H Q5-ish)")

  val q06 = Q(
    "q06_selective_agg",
    (s, d) =>
      li(s, d)
        .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount") >= 0.03 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(
          dsum(col("l_extendedprice") * col("l_discount"), 6).as("revenue"),
          count(lit(1)).as("n_lines")),
    Some("""SELECT
           |  CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
           |  COUNT(*) AS n_lines
           |FROM lineitem
           |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           |  AND l_shipdate < TIMESTAMP '1997-01-01'
           |  AND l_discount >= 0.03 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin),
    "selective scan-aggregate (TPC-H Q6-ish); filters push to parquet")

  val q07 = Q(
    "q07_distinct",
    (s, d) =>
      li(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          countDistinct(col("l_orderkey")).as("n_orders")),
    Some("""SELECT l_returnflag,
           |  COUNT(DISTINCT l_partkey) AS n_parts,
           |  COUNT(DISTINCT l_suppkey) AS n_supps,
           |  COUNT(DISTINCT l_orderkey) AS n_orders
           |FROM lineitem GROUP BY l_returnflag""".stripMargin),
    "distinct + count-distinct; at 100 TB prefer approx_count_distinct " +
      "(provided in graft.functions) unless exactness is required")

  val q08 = Q(
    "q08_sort_limit",
    (s, d) =>
      ord(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
        .limit(10),
    Some("""SELECT o_orderkey, o_totalprice, o_orderpriority
           |FROM orders
           |ORDER BY o_totalprice DESC, o_orderkey ASC
           |LIMIT 10""".stripMargin),
    "global top-k: Spark TakeOrderedAndProject — no full sort at scale")

  val q09 = Q(
    "q09_window_rank",
    (s, d) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      cust(s, d)
        .withColumn("rnk", row_number().over(w))
        .where(col("rnk") <= 3)
        .select(col("c_mktsegment"), col("rnk"), col("c_custkey"), col("c_acctbal"))
    },
    Some("""SELECT c_mktsegment, CAST(rnk AS INT) AS rnk, c_custkey, c_acctbal FROM (
           |  SELECT c_mktsegment, c_custkey, c_acctbal,
           |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment
           |                       ORDER BY c_acctbal DESC, c_custkey ASC) AS rnk
           |  FROM customer) WHERE rnk <= 3""".stripMargin),
    "top-n per group via row_number window")

  val q10 = Q(
    "q10_window_running",
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      ord(s, d)
        .select(
          col("o_custkey"), col("o_orderkey"),
          sum(dsumCast(col("o_totalprice"))).over(w).cast(DoubleType).as("running_total"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_orderkey"), 1).over(w).as("next_orderkey"))
    },
    Some("""SELECT o_custkey, o_orderkey,
           |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
           |       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DOUBLE) AS running_total,
           |  LAG(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price,
           |  LEAD(o_orderkey, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_orderkey
           |FROM orders""".stripMargin),
    "running decimal sum + lag/lead; decimal keeps the cumulative sum " +
      "independent of the engine's frame-accumulation order")

  val q11 = Q(
    "q11_pivot_edges",
    (s, d) =>
      ord(s, d)
        .join(cust(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          sum(when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0)).as("n_urgent"),
          sum(when(col("o_orderpriority") === "2-HIGH", 1).otherwise(0)).as("n_high"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0)).as("n_other"),
          count(lit(1)).as("n_total")),
    Some("""SELECT n_name,
           |  CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
           |  CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
           |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS n_other,
           |  COUNT(*) AS n_total
           |FROM orders
           |JOIN customer ON o_custkey = c_custkey
           |JOIN nation ON c_nationkey = n_nationkey
           |GROUP BY n_name""".stripMargin),
    "jx 'edges' (pivot) as conditional aggregation — one shuffle, no cube")

  val q12 = Q(
    "q12_case_null",
    (s, d) =>
      cust(s, d)
        .groupBy(col("c_mktsegment"))
        .agg(
          dsum(when(col("c_acctbal") > 0, col("c_acctbal"))).as("positive_bal"),
          count(when(col("c_acctbal") < 0, lit(1))).as("n_negative"),
          dsum(coalesce(nullif(col("c_acctbal"), lit(0.0)), lit(0.0))).as("bal_nullif_roundtrip"),
          count(lit(1)).as("n_total")),
    Some("""SELECT c_mktsegment,
           |  CAST(SUM(CAST(CASE WHEN c_acctbal > 0 THEN c_acctbal END AS DECIMAL(18,2))) AS DOUBLE) AS positive_bal,
           |  COUNT(CASE WHEN c_acctbal < 0 THEN 1 END) AS n_negative,
           |  CAST(SUM(CAST(COALESCE(NULLIF(c_acctbal, 0.0), 0.0) AS DECIMAL(18,2))) AS DOUBLE) AS bal_nullif_roundtrip,
           |  COUNT(*) AS n_total
           |FROM customer GROUP BY c_mktsegment""".stripMargin),
    "case/when + coalesce/nullif null semantics (jx 'missing' → SQL NULL)")

  val q13 = Q(
    "q13_string_funcs",
    (s, d) =>
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          upper(substring(col("text"), 1, 10)).as("head"),
          length(col("text")).as("n_chars_str"),
          concat(col("lang"), lit("_"), col("source")).as("tag"),
          col("text").startsWith("the").as("starts_the"),
          col("text").contains("spark").as("has_spark"),
          regexp_extract(col("text"), "^(\\w+)", 1).as("first_word")),
    Some("""SELECT doc_id,
           |  UPPER(SUBSTR(text, 1, 10)) AS head,
           |  CAST(LENGTH(text) AS INT) AS n_chars_str,
           |  lang || '_' || source AS tag,
           |  STARTS_WITH(text, 'the') AS starts_the,
           |  CONTAINS(text, 'spark') AS has_spark,
           |  REGEXP_EXTRACT(text, '^(\w+)', 1) AS first_word
           |FROM documents""".stripMargin),
    "string expressions: prefix / regexp / concat / substr / case-change")

  val q14 = Q(
    "q14_date_funcs",
    (s, d) =>
      ord(s, d)
        .groupBy(
          date_trunc("month", col("o_orderdate")).as("month"),
          year(col("o_orderdate")).as("yr"),
          quarter(col("o_orderdate")).as("qtr"))
        .agg(
          count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("rev")),
    Some("""SELECT
           |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
           |  CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
           |  CAST(EXTRACT(quarter FROM o_orderdate) AS INT) AS qtr,
           |  COUNT(*) AS n_orders,
           |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
           |FROM orders
           |GROUP BY 1, 2, 3""".stripMargin),
    "date expressions: trunc-to-month, extract year/quarter, monthly rollup")

  val q15 = Q(
    "q15_semijoin",
    (s, d) => {
      val highValue = ord(s, d).where(col("o_totalprice") > 100000)
      cust(s, d)
        .join(highValue, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    },
    Some("""SELECT c_custkey, c_name, c_acctbal
           |FROM customer
           |WHERE EXISTS (SELECT 1 FROM orders
           |              WHERE o_custkey = c_custkey AND o_totalprice > 100000)""".stripMargin),
    "EXISTS → left-semi join (no row multiplication, broadcastable)")

  val q16 = Q(
    "q16_antijoin",
    (s, d) => {
      val urgent = ord(s, d).where(col("o_orderpriority") === "1-URGENT")
      cust(s, d)
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    },
    Some("""SELECT c_custkey, c_name, c_mktsegment
           |FROM customer
           |WHERE NOT EXISTS (SELECT 1 FROM orders
           |                  WHERE o_custkey = c_custkey
           |                    AND o_orderpriority = '1-URGENT')""".stripMargin),
    "NOT EXISTS → left-anti join")

  val q17 = Q(
    "q17_union_dedup",
    (s, d) => {
      val a = ord(s, d).where(col("o_totalprice") > 150000)
        .select(col("o_custkey").as("custkey"))
      val b = cust(s, d).where(col("c_acctbal") > 5000)
        .select(col("c_custkey").as("custkey"))
      a.union(b).distinct()
    },
    Some("""SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000
           |UNION
           |SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000""".stripMargin),
    "union + dedup (UNION DISTINCT); partial-agg distinct, one shuffle")

  val q18 = Q(
    "q18_percentile",
    (s, d) => {
      // Exact quantile_cont WITHOUT Spark's `percentile` aggregate,
      // which buffers every group value on the merge side (executor
      // OOM at 100 TB), and WITHOUT a per-group window sort (which
      // funnels each group through ONE task — 3 return flags = 3
      // stragglers at 100 TB). graft.util.rankPrep compresses to
      // distinct (group, value) rows with distributed rank ranges;
      // one ordinary aggregation then brackets position (n-1)*p and
      // interpolates. For pre-aggregated sketch needs use
      // graft.functions.approxPercentile (t-digest).
      val prep = graft.util.rankPrep(
        li(s, d).select(col("l_returnflag"), col("l_quantity")),
        "l_returnflag", "l_quantity")
      prep.groupBy(col("l_returnflag"))
        .agg(
          round(graft.util.quantileCont(col("l_quantity"), 0.5), 4).as("median_qty"),
          round(graft.util.quantileCont(col("l_quantity"), 0.9), 4).as("p90_qty"),
          max(col("n")).as("n"))
    },
    Some("""SELECT l_returnflag,
           |  ROUND(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
           |  ROUND(quantile_cont(l_quantity, 0.9), 4) AS p90_qty,
           |  COUNT(*) AS n
           |FROM lineitem GROUP BY l_returnflag""".stripMargin),
    "exact quantile_cont via distributed rank+interpolate (no group buffering)")

  val q19 = Q(
    "q19_having",
    (s, d) =>
      li(s, d)
        .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("p_size").cast("long")).as("total_size"))
        .where(col("n") >= 20),
    Some("""SELECT p_brand, p_type, COUNT(*) AS n,
           |  CAST(SUM(p_size) AS BIGINT) AS total_size
           |FROM lineitem JOIN part ON l_partkey = p_partkey
           |GROUP BY p_brand, p_type
           |HAVING COUNT(*) >= 20""".stripMargin),
    "post-aggregation HAVING filter")

  val q29 = Q(
    "q29_rollup",
    (s, d) =>
      // jx edges with the ALL domain (subtotal + grand-total rows) —
      // Spark's rollup is one Expand + one aggregate, so subtotals
      // share the single shuffle with the leaf cells instead of a
      // second pass over the data. NULL grouping keys are renamed to
      // 'ALL' (the jx spelling); TPC-H flag columns are never null so
      // the rename is unambiguous.
      li(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
          col("n"), col("qty")),
    Some("""SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
           |  COALESCE(l_linestatus, 'ALL') AS l_linestatus,
           |  COUNT(*) AS n,
           |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
           |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin),
    "rollup subtotals + grand total (jx edges ALL domain) in one aggregate pass")

  val q47 = Q(
    "q47_approx_stats",
    (s, d) => {
      // The 100 TB defaults for distinct counting and quantiles:
      // HLL++ and approx-percentile sketches are MERGEABLE, so the
      // shuffle carries a fixed-size sketch per group instead of raw
      // values (exact countDistinct triggers an Expand; exact
      // percentile buffers whole groups). Production callers take the
      // estimates straight (`nd_est`/`p50_est` below); the GATE row
      // additionally audits them against engine-computed exact values
      // — the consumer-step pattern: the output carries the exact
      // values plus per-group WITHIN-BOUND verdicts, the DuckDB
      // oracle recomputes the exact values and emits literal-true
      // verdicts, so the row hash-matches iff the sketches hold their
      // bound. Bounds: HLL++ within 3·rsd (rsd=0.023 → 6.9%; sketches
      // are deterministic for fixed data, so the gate cannot flake);
      // p50 within the exact [p45, p55] rank band (approx_percentile
      // at accuracy 10000 guarantees rank error ≤ 1e-4). The exact
      // columns exist ONLY in this audit wrapper, not the production
      // aggregate shape.
      val bound = 3 * 0.023
      // Pass 1 — the PRODUCTION shape: one sketch aggregate, 3 rows out.
      val sk = li(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          graft.functions.approxCountDistinct(col("l_partkey")).as("nd_est"),
          graft.functions.approxPercentile(col("l_quantity"), 0.5).as("p50_est"))
      // Pass 2 — the audit: broadcast the 3-row estimates back onto the
      // facts and verify by RANK COUNTING (how many values sit at or
      // below the estimate), all hash aggregates — NEVER an exact
      // percentile, whose per-group sort buffer is the very cost the
      // sketch exists to avoid (a first cut used `percentile(...)` and
      // cost 16.9 s at sf0.1 vs ~0.3 s for the sketches; this shape is
      // ~1 s). The estimate is in-band iff its rank interval
      // (n_lt, n_le] intersects [0.45·n, 0.55·n].
      li(s, d)
        .join(broadcast(sk), Seq("l_returnflag"))
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          countDistinct(col("l_partkey")).as("nd_exact"),
          first(col("nd_est")).as("nd_est"),
          sum(when(col("l_quantity") <= col("p50_est"), 1L).otherwise(0L)).as("n_le"),
          sum(when(col("l_quantity") < col("p50_est"), 1L).otherwise(0L)).as("n_lt"))
        .select(col("l_returnflag"), col("n"), col("nd_exact"),
          (abs(col("nd_est") - col("nd_exact")) <=
            col("nd_exact").cast("double") * bound).as("nd_ok"),
          (col("n_lt").cast("double") < col("n") * 0.55 &&
            col("n_le").cast("double") >= col("n") * 0.45).as("p50_ok"))
    },
    Some("""SELECT l_returnflag, COUNT(*) AS n,
           |  COUNT(DISTINCT l_partkey) AS nd_exact,
           |  TRUE AS nd_ok, TRUE AS p50_ok
           |FROM lineitem GROUP BY l_returnflag""".stripMargin),
    "mergeable sketch aggregates (HLL++ distinct, t-digest percentile) " +
      "with an in-row exactness audit")

  /** Market-basket co-occurrence with lift: part pairs ordered
    * together, support-thresholded, scored by
    * lift = P(p1,p2) / (P(p1)·P(p2)) — the Apriori candidate step a
    * recommender/affinity audit runs over order data.
    *
    * Exactness: supports are integer counts; lift is computed as
    * (n_pair·N) / (c1·c2) with the integer products formed first and
    * ONE double division at the end — bit-identical across engines.
    *
    * Scale shape: baskets materialize ONCE per order key
    * (`collect_set` — one shuffle, dedup included) and pairs expand
    * LOCALLY from the sorted basket array (O(k²) per order, k ≈ 7 in
    * TPC-H; never a join, never a global cross product) — two wide
    * stages total (basket build, pair aggregate) where the naive
    * self-join pays three plus its sorts. The support threshold
    * prunes the pair aggregate before the dimension joins; per-part
    * order counts are a part-dimension-sized broadcast (parts ≪
    * facts). Skewed mega-baskets are the one hazard at 100 TB: the k²
    * fanout is per-row local, so one 10⁶-item basket is a multi-hour
    * straggler row holding a 10¹²-pair array in one task —
    * `maxBasketSize` ENFORCES the cap in-plan (each basket keeps its
    * `maxBasketSize` smallest part keys; the co-occurrence statistics
    * — part counts, order total — are computed over the SAME capped
    * baskets, so lift stays internally consistent). Run
    * [[basketTruncationReport]] alongside a capped job: silently
    * dropping tail items without counting how often reads as
    * "covered everything" when it didn't. The cap defaults off; TPC-H
    * baskets are bounded by construction (the gate runs uncapped).
    */
  def basketPairs(lineitem: DataFrame, minSupport: Int,
      maxBasketSize: Int = Int.MaxValue): DataFrame = {
    require(maxBasketSize >= 2, s"maxBasketSize must be >= 2, got $maxBasketSize")
    val raw = lineitem.groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
    val baskets = reused(
      if (maxBasketSize == Int.MaxValue) raw
      else raw.select(col("l_orderkey"),
        slice(col("ps"), 1, maxBasketSize).as("ps")))
    val partCnt = baskets.select(explode(col("ps")).as("l_partkey"))
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("c"))
    val nOrders = baskets.agg(count(lit(1)).as("n_orders_total"))
    // native pair fanout (r19): the nested transform∘slice HOF paid
    // per-element lambda interpretation (~k²/2 calls per basket);
    // array_pairs emits the identical structs in the identical (i, j)
    // order from one primitive loop (PropertySpec pins ≡ brute force)
    val pairs = baskets
      .select(explode(graft.functions.arrayPairs(col("ps"))).as("pr"))
      .select(col("pr.p1"), col("pr.p2"))
      .groupBy(col("p1"), col("p2"))
      .agg(count(lit(1)).as("n_pair"))
      .where(col("n_pair") >= minSupport)
    pairs
      .join(broadcast(partCnt.select(col("l_partkey").as("p1"), col("c").as("c1"))), Seq("p1"))
      .join(broadcast(partCnt.select(col("l_partkey").as("p2"), col("c").as("c2"))), Seq("p2"))
      .crossJoin(broadcast(nOrders))
      .withColumn("lift",
        (col("n_pair") * col("n_orders_total")).cast("double") / (col("c1") * col("c2")))
      .select(col("p1"), col("p2"), col("n_pair"), col("c1"), col("c2"), col("lift"))
  }

  /** The LOUD half of a capped [[basketPairs]] run: one row —
    * (n_baskets, n_truncated, max_basket, capped_pair_fanout) — an
    * ops job logs next to the pair output so a cap that is silently
    * chopping real signal (n_truncated creeping up) is visible, and
    * an uncapped mega-basket is caught BEFORE it becomes a straggler
    * (max_basket tells you the worst k² a task will pay). One extra
    * aggregate over the same basket build; no pair expansion.
    */
  def basketTruncationReport(lineitem: DataFrame, maxBasketSize: Int): DataFrame =
    lineitem.groupBy(col("l_orderkey"))
      .agg(countDistinct(col("l_partkey")).as("k"))
      .agg(
        count(lit(1)).as("n_baskets"),
        sum(when(col("k") > maxBasketSize, 1L).otherwise(0L)).as("n_truncated"),
        max(col("k")).as("max_basket"),
        sum(expr(s"least(k, ${maxBasketSize}L) * (least(k, ${maxBasketSize}L) - 1) div 2"))
          .as("capped_pair_fanout"))

  val q110 = Q(
    "q110_basket_pairs",
    (s, d) => basketPairs(li(s, d), minSupport = 2),
    Some("""WITH it AS (
           |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
           |), pc AS (
           |  SELECT l_partkey, COUNT(*) AS c FROM it GROUP BY 1
           |), n AS (
           |  SELECT COUNT(DISTINCT l_orderkey) AS n_orders_total FROM it
           |), pairs AS (
           |  SELECT a.l_partkey AS p1, b.l_partkey AS p2, COUNT(*) AS n_pair
           |  FROM it a JOIN it b
           |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
           |  GROUP BY 1, 2 HAVING COUNT(*) >= 2
           |)
           |SELECT p1, p2, n_pair, c1.c AS c1, c2.c AS c2,
           |  CAST(n_pair * n.n_orders_total AS DOUBLE) / (c1.c * c2.c) AS lift
           |FROM pairs
           |JOIN pc c1 ON pairs.p1 = c1.l_partkey
           |JOIN pc c2 ON pairs.p2 = c2.l_partkey
           |CROSS JOIN n""".stripMargin),
    "market-basket pair co-occurrence with lift: orderkey-co-partitioned self-join, support threshold, broadcast part dims")

  /** RFM customer segmentation: recency / frequency / monetary each
    * bucketed into corpus quartiles, concatenated into the classic
    * "444"-style segment label. The canonical customer-analytics
    * derivation the reference's pushed-dashboard layer serves.
    *
    * Quartiles are VALUE BOUNDARIES from exact order statistics
    * (`quantileDisc` over `rankPrep` — the ceil(n·p)-th smallest
    * actual value, DuckDB's quantile_disc convention), not NTILE row
    * buckets: ties get the same score on both engines, no interpolated
    * double boundary to drift an ulp, and — the scale point — no
    * global row_number: the boundary computation runs over the
    * compressed distinct-value domain with rankPrep's bucketed
    * windows, and the boundaries themselves are a 1-row broadcast.
    *
    * Scale shape: one per-customer aggregate (map-side partial on
    * o_custkey), lazily persisted and consumed by the boundary
    * derivation and the final scoring pass; everything downstream of
    * it is broadcast-joined. All three metrics are bit-exact as
    * LONGS (recency/frequency are counts; DECIMAL(18,2) monetary is
    * its cent value — 9.2e16 dollars of headroom), so the boundary
    * pass UNPIVOTS them into (metric, long) rows and runs ONE
    * `rankPrep` partitioned by metric name — one shuffle pass over
    * the per-customer frame instead of three — and the scoring
    * comparisons are long-vs-long (monetary compared in cents).
    * Monetary is cast to double only for output.
    */
  def rfmSegments(orders: DataFrame): DataFrame = {
    val per = reused(
      orders.groupBy(col("o_custkey"))
        .agg(max(col("o_orderdate")).as("last_order"),
          count(lit(1)).as("frequency"),
          sum(col("o_totalprice").cast(DecimalType(18, 2))).as("monetary")))
    val mx = per.agg(max(col("last_order")).as("_mxd"))
    val base = reused(per.crossJoin(broadcast(mx))
      .withColumn("recency",
        datediff(col("_mxd"), col("last_order")).cast("long"))
      .drop("_mxd")
      .withColumn("_mon_cents", (col("monetary") * 100).cast(LongType)))
    val stacked = base.select(expr(
      "stack(3, 'recency', recency, 'frequency', frequency, " +
        "'monetary', _mon_cents) AS (_m, _v)"))
    val rp = rankPrep(stacked, "_m", "_v")
    val perMetric = rp.groupBy(col("_m")).agg(
      quantileDisc(col("_v"), 0.25).as("q1"),
      quantileDisc(col("_v"), 0.50).as("q2"),
      quantileDisc(col("_v"), 0.75).as("q3"))
    def pick(m: String, q: String) = max(when(col("_m") === m, col(q)))
    val b = broadcast(perMetric.agg(
      pick("recency", "q1").as("recency_q1"),
      pick("recency", "q2").as("recency_q2"),
      pick("recency", "q3").as("recency_q3"),
      pick("frequency", "q1").as("frequency_q1"),
      pick("frequency", "q2").as("frequency_q2"),
      pick("frequency", "q3").as("frequency_q3"),
      pick("monetary", "q1").as("_mon_cents_q1"),
      pick("monetary", "q2").as("_mon_cents_q2"),
      pick("monetary", "q3").as("_mon_cents_q3")))
    def upScore(c: String) = lit(1) +
      (col(c) > col(s"${c}_q1")).cast("int") +
      (col(c) > col(s"${c}_q2")).cast("int") +
      (col(c) > col(s"${c}_q3")).cast("int")
    val downScore = lit(1) +
      (col("recency") < col("recency_q3")).cast("int") +
      (col("recency") < col("recency_q2")).cast("int") +
      (col("recency") < col("recency_q1")).cast("int")
    base.crossJoin(b)
      .withColumn("r_score", downScore)
      .withColumn("f_score", upScore("frequency"))
      .withColumn("m_score", upScore("_mon_cents"))
      .withColumn("segment", concat(col("r_score").cast("string"),
        col("f_score").cast("string"), col("m_score").cast("string")))
      .select(col("o_custkey"), col("recency"), col("frequency"),
        col("monetary").cast(DoubleType).as("monetary"),
        col("r_score"), col("f_score"), col("m_score"), col("segment"))
  }

  val q111 = Q(
    "q111_rfm_segments",
    (s, d) => rfmSegments(ord(s, d)),
    Some("""WITH per AS (
           |  SELECT o_custkey, MAX(o_orderdate) AS last_order,
           |    COUNT(*) AS frequency,
           |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
           |  FROM orders GROUP BY 1
           |), base AS (
           |  SELECT o_custkey,
           |    date_diff('day', last_order, (SELECT MAX(last_order) FROM per)) AS recency,
           |    frequency, monetary
           |  FROM per
           |), b AS (
           |  SELECT
           |    quantile_disc(recency, 0.25) AS r_q1,
           |    quantile_disc(recency, 0.50) AS r_q2,
           |    quantile_disc(recency, 0.75) AS r_q3,
           |    quantile_disc(frequency, 0.25) AS f_q1,
           |    quantile_disc(frequency, 0.50) AS f_q2,
           |    quantile_disc(frequency, 0.75) AS f_q3,
           |    quantile_disc(monetary, 0.25) AS m_q1,
           |    quantile_disc(monetary, 0.50) AS m_q2,
           |    quantile_disc(monetary, 0.75) AS m_q3
           |  FROM base
           |), scored AS (
           |  SELECT o_custkey, recency, frequency,
           |    CAST(monetary AS DOUBLE) AS monetary,
           |    1 + CAST(recency < r_q3 AS INT) + CAST(recency < r_q2 AS INT)
           |      + CAST(recency < r_q1 AS INT) AS r_score,
           |    1 + CAST(frequency > f_q1 AS INT) + CAST(frequency > f_q2 AS INT)
           |      + CAST(frequency > f_q3 AS INT) AS f_score,
           |    1 + CAST(monetary > m_q1 AS INT) + CAST(monetary > m_q2 AS INT)
           |      + CAST(monetary > m_q3 AS INT) AS m_score
           |  FROM base CROSS JOIN b
           |)
           |SELECT o_custkey, recency, frequency, monetary,
           |  r_score, f_score, m_score,
           |  CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
           |    || CAST(m_score AS VARCHAR) AS segment
           |FROM scored""".stripMargin),
    "RFM quartile segmentation: exact order-statistic boundaries via rankPrep (no global row_number), broadcast scoring")

  /** Table profiling (the Deequ-style data-QA primitive): per-column
    * row/null/distinct-cardinality facts over the fact table, with the
    * HLL++ estimate audited in-row against the exact cardinality (the
    * q47 consumer-step pattern — the verdict boolean is TRUE iff the
    * sketch is within 10%, ≈4σ at rsd 2.3%, and the oracle mirrors it
    * as a literal).
    *
    * Scale shape: one column-pruned scan per profiled column (each
    * scan reads exactly one parquet column), each aggregating with
    * the planner's standard two-phase distinct over the NATIVE typed
    * value — narrow 8-byte keys through per-column shuffles — plus
    * the HLL++ sketch in the same pass; one-row results unioned.
    *
    * Scale lesson (r11, recorded in BASELINE): an "optimized" single-
    * pass unpivot into (col_name, value-as-string) pairs won 1s of
    * per-job overhead at sf0.1 and then DIED at sf3 — a 90M-row
    * wide-string dictionary forced through one spilling aggregate,
    * minutes where the per-column form takes seconds. Job-count
    * micro-opts that widen keys and serialize shuffles do not survive
    * 30×; per-column typed aggregation does, and at 100 TB the exact
    * arm drops entirely (the profiler keeps the one-pass mergeable
    * HLL arm — see [[tableProfile]], which has NO exact arm and no
    * value shuffle at all).
    */
  val q130 = Q(
    "q130_table_profile",
    (s, d) => {
      import graft.functions.approxCountDistinct
      val li = Tables.lineitem(s, d)
      val cols = Seq("l_orderkey", "l_partkey", "l_quantity", "l_returnflag", "l_shipdate")
      cols.map { name =>
        val c = col(name)
        li.select(c)
          .agg(
            count(lit(1)).as("n_rows"),
            sum(when(c.isNull, lit(1L)).otherwise(lit(0L))).as("n_nulls"),
            countDistinct(c).as("n_distinct"),
            approxCountDistinct(c).as("hll"))
          .select(
            lit(name).as("col_name"), col("n_rows"), col("n_nulls"), col("n_distinct"),
            (abs(col("hll") - col("n_distinct")) * lit(10L) <= col("n_distinct"))
              .as("hll_ok"))
      }.reduce(_.union(_))
    },
    Some(Seq("l_orderkey", "l_partkey", "l_quantity", "l_returnflag", "l_shipdate")
      .map { c =>
        s"""SELECT '$c' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
           |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct, TRUE AS hll_ok
           |FROM lineitem""".stripMargin
      }.mkString("\nUNION ALL\n")),
    "Deequ-style table profile: per-column null/cardinality facts, HLL++ audited in-row against exact distinct")

  /** Mergeable profile artifact — the INCREMENTAL form of q130's
    * table profile: per profiled column one row (col_name, n_rows,
    * n_nulls, sk) where the counts are additive and the distinct
    * sketch is a Datasketches HLL. Counts merge LOSSLESSLY; the HLL
    * union is register-max in dense mode, but in the small-
    * cardinality coupon regime a merged sketch's estimate can differ
    * slightly from a direct build's — both stay within the design
    * rsd (~1.6% at lgK 12), which is the contract consumers get. A
    * nightly pipeline profiles only the delta slice and folds it in
    * at delta cost; the full-table recompute is never needed again.
    */
  def tableProfile(df: DataFrame, cols: Seq[String]): DataFrame =
    // Per-column single-GROUP aggregates: no value ever shuffles —
    // each column contributes one fixed-size partial (two counters +
    // the HLL buffer) per map task, merged once. This is the whole
    // 100 TB story: profiling cost is scan cost, state is O(columns).
    // Values feed the sketch as strings so any column type profiles
    // (the cast is a per-row codegen op; hll_sketch_agg accepts no
    // timestamps/decimals natively).
    cols.map { name =>
      val c = col(name)
      df.select(c)
        .agg(
          count(lit(1)).as("n_rows"),
          sum(when(c.isNull, lit(1L)).otherwise(lit(0L))).as("n_nulls"),
          hll_sketch_agg(c.cast("string")).as("sk"))
        .select(lit(name).as("col_name"), col("n_rows"), col("n_nulls"), col("sk"))
    }.reduce(_.union(_))

  /** Fold any number of [[tableProfile]] artifacts (unioned rows) into
    * one: counts add, sketches union. Merging the artifact of a delta
    * slice into the stored artifact IS the nightly maintenance step.
    */
  def mergeProfiles(profiles: DataFrame): DataFrame =
    profiles.groupBy(col("col_name"))
      .agg(
        sum(col("n_rows")).as("n_rows"),
        sum(col("n_nulls")).as("n_nulls"),
        hll_union_agg(col("sk")).as("sk"))

  /** Read view of a profile artifact: estimated distinct cardinality
    * alongside the exact additive facts.
    */
  def profileReport(profile: DataFrame): DataFrame =
    profile.select(col("col_name"), col("n_rows"), col("n_nulls"),
      hll_sketch_estimate(col("sk")).as("n_distinct_est"))

  /** Incremental profile maintenance ON the gate: the orders table is
    * profiled as two disjoint slices (order-key parity — the stand-in
    * for yesterday's artifact + today's delta), merged with
    * [[mergeProfiles]], and the merged estimate audited in-row
    * against the exact dictionary count (verdict TRUE iff within 10%;
    * Datasketches HLL at default lgK=12 is ~1.6% rsd). The oracle
    * mirrors the exact facts and literal-TRUE verdicts — additive
    * counts must land EXACTLY (n_rows/n_nulls are lossless under
    * merge), only the sketch gets a band.
    */
  val q135 = Q(
    "q135_profile_incr",
    (s, d) => {
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
      val orders = Tables.orders(s, d)
      val merged = mergeProfiles(
        tableProfile(orders.where(pmod(col("o_orderkey"), lit(2)) === 0), cols)
          .unionByName(tableProfile(orders.where(pmod(col("o_orderkey"), lit(2)) === 1), cols)))
      val est = profileReport(merged)
      val exact = cols.map { name =>
        orders.select(col(name))
          .agg(countDistinct(col(name)).as("n_distinct"))
          .select(lit(name).as("col_name"), col("n_distinct"))
      }.reduce(_.union(_))
      est.join(exact, Seq("col_name"))
        .select(col("col_name"), col("n_rows"), col("n_nulls"), col("n_distinct"),
          (abs(col("n_distinct_est") - col("n_distinct")) * lit(10L) <= col("n_distinct"))
            .as("incr_ok"))
    },
    Some(Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
      .map { c =>
        s"""SELECT '$c' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
           |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct, TRUE AS incr_ok
           |FROM orders""".stripMargin
      }.mkString("\nUNION ALL\n")),
    "incremental profile maintenance: two disjoint slices merged via additive counts + Datasketches HLL union, audited against exact")

  /** Blocked fuzzy record linkage over the part-NAME dictionary:
    * near-identical product names (edit distance ≤ 2) found without an
    * all-pairs comparison. Classic entity-resolution shape (Fellegi-
    * Sunter blocking): compare within a blocking key only — here the
    * name's final word — so candidate pairs are Σ_block |block|²
    * over a DICTIONARY, not the row table.
    *
    * Scale shape: the fact table collapses to distinct names first
    * (one partial-agg'd groupBy — the dictionary is ≪ rows and grows
    * with the vocabulary, not the data), so the quadratic-per-block
    * fuzzy compare runs on a constant-size side. levenshtein is a
    * codegen'd built-in evaluated as the post-equijoin filter; the
    * equi-join itself is on the block key. A skewed block (every name
    * the same noun) degrades to dictionary² — still never rows² — and
    * the q31-style df-cut would apply if a real vocabulary needed it.
    */
  val q132 = Q(
    "q132_name_linkage",
    (s, d) => {
      val names = Tables.part(s, d)
        .groupBy(col("p_name"))
        .agg(count(lit(1)).as("n_parts"))
        .withColumn("blk", element_at(split(col("p_name"), " "), -1))
      val a = names.select(col("p_name").as("name_a"), col("n_parts").as("parts_a"), col("blk"))
      val b = names.select(col("p_name").as("name_b"), col("n_parts").as("parts_b"), col("blk"))
      a.join(b, Seq("blk"))
        .where(col("name_a") < col("name_b") &&
          levenshtein(col("name_a"), col("name_b")) <= 2)
        .select(col("name_a"), col("name_b"),
          levenshtein(col("name_a"), col("name_b")).as("dist"),
          col("parts_a"), col("parts_b"))
    },
    Some("""WITH n AS (
           |  SELECT p_name, COUNT(*) AS n_parts FROM part GROUP BY 1
           |), b AS (
           |  SELECT p_name, n_parts, string_split(p_name, ' ')[-1] AS blk FROM n
           |)
           |SELECT a.p_name AS name_a, c.p_name AS name_b,
           |  CAST(levenshtein(a.p_name, c.p_name) AS INT) AS dist,
           |  a.n_parts AS parts_a, c.n_parts AS parts_b
           |FROM b a JOIN b c ON a.blk = c.blk AND a.p_name < c.p_name
           |WHERE levenshtein(a.p_name, c.p_name) <= 2""".stripMargin),
    "blocked fuzzy record linkage: edit-distance ≤ 2 name pairs within last-word blocks over the distinct-name dictionary")

  val all: Seq[Q] = Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09, q10,
    q11, q12, q13, q14, q15, q16, q17, q18, q19, q29, q47, q110, q111,
    q130, q132, q135)
}
