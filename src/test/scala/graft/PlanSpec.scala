package graft

import graft.operators.{Ann, Dedup, Relational}

/** Plan-shape regression tests: the scale properties the Scaladoc
  * promises (broadcasts, pushdown, top-k without global sort, bucketed
  * candidate joins) asserted against the actual physical plans, so a
  * refactor that silently degrades a plan fails CI, not a cluster run.
  */
class PlanSpec extends SparkSpec {

  private def plan(q: Q): String =
    q.build(spark, sfDir).queryExecution.executedPlan.toString

  test("dimension joins broadcast (q03 part, q05 nation+region)") {
    plan(Relational.q03) should include("BroadcastHashJoin")
    plan(Relational.q05) should include("BroadcastHashJoin")
  }

  test("top-k compiles to TakeOrderedAndProject, not a global sort (q08)") {
    val p = plan(Relational.q08)
    p should include("TakeOrderedAndProject")
  }

  test("selective scan pushes filters into the parquet scan (q06)") {
    val p = plan(Relational.q06)
    p should include("PushedFilters: [")
    // at least one real pushed predicate, not just the bare header
    p.split("PushedFilters: \\[")(1).takeWhile(_ != ']').trim should not be empty
  }

  test("projection pruning reaches the scan: q01 reads only needed columns") {
    val p = plan(Relational.q01)
    p should include("ReadSchema")
    p should not include "l_shipdate" // never-used column stays unread
  }

  test("bucketed near-dup candidate joins never fall back to cartesian") {
    Seq(Dedup.q31, Dedup.q32, Dedup.q33, Ann.q35).foreach { q =>
      val p = plan(q)
      withClue(s"${q.name}: ") {
        p should not include "CartesianProduct"
        // also guards q31's cut-inert check: its constant join key must
        // stay non-foldable, or the guard degrades to a BNLJ
        p should not include "BroadcastNestedLoopJoin"
      }
    }
  }

  test("cross-corpus contamination join is bucketed, never cartesian (q58)") {
    val p = plan(Dedup.q58)
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("blocked embed dedup is an equi-join on block pairs (q41)") {
    val p = plan(Ann.q41)
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("token-budget sample: windowed take-while, prefix table broadcast (q59)") {
    val p = plan(operators.Text.q59)
    p should include("Window")
    // the bucket-prefix side is tiny and must broadcast — a shuffle
    // join here would mean the per-doc side shuffles twice
    p should include("BroadcastHashJoin")
    p should not include "SortMergeJoin"
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("as-of join compiles to a window, not a join (q50)") {
    val p = plan(operators.Etl.q50)
    p should include("Window")
    p should not include "SortMergeJoin"
    p should not include "BroadcastNestedLoopJoin"
    p should not include "CartesianProduct"
  }

  test("whole-stage codegen covers the scan-side of text ops (q38)") {
    // codegen'd spans print as "*(n) Op" in executedPlan.toString
    plan(operators.Text.q38) should include("*(1)")
  }

  test("sequence packing: bucketed prefix sums broadcast, never a whole-source sort (q65)") {
    val p = plan(operators.Pack.q65)
    p should include("Window")
    p should include("BroadcastHashJoin") // the per-bucket prefix dim
    p should not include "SortMergeJoin"
    p should not include "CartesianProduct"
  }

  test("PII scrub is a narrow map over the scan: no exchange at all (q66)") {
    val p = plan(operators.Pack.q66)
    p should not include "Exchange"
    p should include("*(1)") // whole-stage codegen covers the regexps
  }

  test("passage dedup: keeper is an aggregate+join, never a per-passage window (q71)") {
    // Window.partitionBy(chunk) would buffer every occurrence of the
    // hottest passage in one task; the groupBy+join shape must hold.
    val p = plan(Dedup.q71)
    p should not include "Window"
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
    p should include("HashAggregate") // partial keeper agg absorbs skew
  }

  test("mixture sampling: weights broadcast, corpus never shuffles (q73)") {
    val p = plan(operators.Pack.q73)
    p should include("BroadcastHashJoin")
    p should not include "SortMergeJoin"
    p should not include "CartesianProduct"
  }

  test("unigram score: hash joins with map-side partials (q72)") {
    val p = plan(operators.Text.q72)
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
    p should include("HashAggregate") // map-side partial aggregation
  }

  test("quality gate is MAP-ONLY; source report adds just its rollup (q74, q78)") {
    // r19: every gate fact is row-local (native WordStats/WordNgrams),
    // so q74 must plan as one scan projection — an Exchange/Window/
    // join here means the gate regressed to the exploded-aggregation
    // shape. q78 = the same scan + one partial-agg'd source rollup.
    val p74 = plan(operators.Text.q74)
    p74 should not include "Exchange"
    p74 should not include "Window"
    p74 should not include "Join"
    p74 should include("wordstats")
    p74 should include("wordngrams")
    val p78 = plan(operators.Text.q78)
    p78 should not include "Join" // source rides the projection now
    p78 should not include "Window"
    p78 should include("HashAggregate") // the per-source rollup partials
    p78.split("Exchange").length shouldBe 2 // exactly ONE exchange (rollup)
  }

  test("embed diversity: two aggregates over one scan, no join of the corpus (q75)") {
    val p = plan(operators.Ann.q75)
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
    p should not include "SortMergeJoin" // the n-per-label join broadcasts
  }

  test("tf-idf: hash joins + 1-row broadcast count, doc-keyed rank only (q79)") {
    val p = plan(operators.Text.q79)
    // the only non-equi join allowed is the 1-row corpus-count
    // broadcast; the tf⨝df join must be a hash join
    p should not include "CartesianProduct"
    p should not include "SortMergeJoin"
    p should include("HashAggregate")
    // the rank window partitions on doc_id (high cardinality) — it
    // must exist, and no whole-vocabulary single-partition window may
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val lp = operators.Text.q79.build(spark, sfDir).queryExecution.optimizedPlan
    val windows = lp.collect { case w: LWindow => w }
    windows should not be empty
    windows.foreach(_.partitionSpec should not be empty)
  }

  test("dup matrix: pair rollup is hash joins over q31's machinery (q80)") {
    val p = plan(Dedup.q80)
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
    p should include("HashAggregate")
  }

  test("vocab overlap: global top-k is a heap, source top-k is salted (q82)") {
    val p = plan(operators.Text.q82)
    p should include("TakeOrderedAndProject") // global top-100: no global sort
    p should include("BroadcastHashJoin")     // ≤100-row top-list join broadcasts
    p should not include "CartesianProduct"
    // capPerKey's phase-1 window must partition by (source, salt) —
    // no window may partition by source alone over the raw vocabulary
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val lp = operators.Text.q82.build(spark, sfDir).queryExecution.optimizedPlan
    val windows = lp.collect { case w: LWindow => w }
    windows should not be empty
    windows.count(_.partitionSpec.size > 1) should be >= 1 // the salted phase
  }

  test("k-means assignment is one scan, no join of the corpus (q81)") {
    val p = plan(Ann.q81)
    p should not include "SortMergeJoin"
    p should not include "CartesianProduct"
    p should not include "Exchange" // pure map: assignment never shuffles
  }

  test("memorization rate: distinct-window hash probe, no window op (q83)") {
    val p = plan(Dedup.q83)
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
    p should not include "Window" // rate is a pure aggregate rollup
    p should include("HashAggregate") // map-side distinct + per-doc partials
  }

  test("centroid drift: no join of the corpus, 1-row broadcast (q84)") {
    val p = plan(Ann.q84)
    p should not include "SortMergeJoin"
    // the only join is the 1-row corpus-vector broadcast
    p should include("HashAggregate")
  }

  test("IVF-PQ: candidates come from the cl equi-join, never cartesian (q85)") {
    val p = plan(Ann.q85)
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
    p should include("pq_adc") // scoring goes through the native ADC expression
  }

  test("vocab coverage: running sums only over value-compressed rows (q87)") {
    // same contract as the rankPrep assertion: the Window.orderBy may
    // be single-partition, but it must sit above an Aggregate (the
    // count-value compression), never over the raw vocabulary
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val lp = operators.Text.q87.build(spark, sfDir).queryExecution.optimizedPlan
    val windows = lp.collect { case w: LWindow => w }
    windows should not be empty
    windows.foreach { w =>
      w.child.collectFirst { case a: Aggregate => a } should not be empty
    }
  }

  test("media phash dedup: banded chunk buckets, never all-pairs (q88)") {
    val p = plan(operators.Multimodal.q88)
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("exact-quantile prep never window-sorts raw rows (q18, q62)") {
    // r4 verdict: Window.partitionBy(group).orderBy(value) over the
    // scan routes every row of a group through ONE task — with 3–20
    // groups, a 100 TB table funnels through 3–20 external sorts.
    // rankPrep compresses to distinct values first, so every Window
    // in these plans must sit above an Aggregate (compressed data),
    // never directly over scan rows.
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    Seq(Relational.q18, operators.Text.q62).foreach { q =>
      val lp = q.build(spark, sfDir).queryExecution.optimizedPlan
      val windows = lp.collect { case w: LWindow => w }
      withClue(s"${q.name}: expected rankPrep windows in the plan: ") {
        windows should not be empty
      }
      windows.foreach { w =>
        withClue(s"${q.name}: window over un-aggregated rows (single-task-per-group sort): ") {
          w.child.collectFirst { case a: Aggregate => a } should not be empty
        }
      }
    }
  }

  test("hierarchy lists: member cap is salted two-phase, no raw-row window (q49)") {
    // r5 verdict: cappedCsvList's old Window.partitionBy(node)
    // .orderBy(member) routed a mega-root's whole closure partition
    // through ONE task's sort. The capPerKey rewrite means every
    // window in the plan is either the salted phase-1 (partitionSpec
    // holds (group, salt) — size > 1) or the phase-2 re-rank, which
    // sits above phase-1's rank Filter (≤ salts×cap rows per group).
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Window => LWindow}
    val lp = operators.Hierarchy.q49.build(spark, sfDir).queryExecution.optimizedPlan
    val windows = lp.collect { case w: LWindow => w }
    windows should not be empty
    windows.foreach { w =>
      withClue("window partitioned by bare group over unfiltered raw rows: ") {
        // anchor on phase-1's rank filter specifically (a Filter whose
        // condition references the _rk scratch attribute), not any
        // Filter — an unrelated upstream filter must not satisfy this
        (w.partitionSpec.size > 1 ||
          w.child.collectFirst {
            case f: Filter if f.condition.references.exists(_.name == "_rk") => f
          }.nonEmpty) shouldBe true
      }
    }
  }

  test("every gate builder runs ZERO Spark jobs at plan-construction time") {
    // r5/r6 verdicts (generalized from simhashPairs' hidden count()):
    // constructing a plan must not execute anything — an action inside
    // a builder recomputes arbitrary upstream lineage every time the
    // operator is merely composed into a larger plan. Data-dependent
    // work (fixpoint convergence, model training) lives in the stored
    // artifacts (closure / pairs / components / centroids / codebooks
    // / PCA), built once per session below; after that, ALL 95
    // builders must build + plan with zero jobs. Count jobs across
    // every build at once, prove listener delivery with a sentinel
    // job, and require the sentinel to be the only one; on failure,
    // rerun per-query to name the offenders.
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    val actionFree = SparkEntry.queries.toSeq.sortBy(_._1)
    // warm the read path and the stored artifacts first: the FIRST
    // parquet access runs schema/listing jobs that belong to the
    // scan, and the stored derived tables / trained models
    // materialize ONCE per session (the nightly-ETL artifact build /
    // index training, not query work) — after warming, EVERY gate
    // builder, hierarchy, clustering and ANN included, must be a
    // pure read. A hidden action in a builder still fires on every
    // later build, so warming does not weaken the assertion.
    Tables.names.foreach(n => Tables.load(spark, sfDir, n).schema)
    operators.Hierarchy.storedClosure(spark, sfDir)
    operators.Hierarchy.storedIncrementalClosure(spark, sfDir)
    operators.Dedup.storedPairs(spark, sfDir)
    operators.Dedup.storedContamination(spark, sfDir)
    operators.Dedup.storedWindowSignatures(spark, sfDir)
    operators.Jx.storedNestedOrders(spark, sfDir)
    operators.Cluster.storedComponents(spark, sfDir)
    operators.Cluster.storedIncrementalComponents(spark, sfDir)
    operators.Etl.storedIncrementalScd2(spark, sfDir)
    operators.Text.storedTrigramTf(spark, sfDir)
    // r16 fix: these two were missing, so the pin only passed when an
    // earlier suite in the same JVM happened to warm their session
    // memos (BpeSpec/DedupSpec run before PlanSpec in a full sbt test,
    // never in a standalone testOnly) — q148's dict training and
    // q149's incremental cooc store build are nightly-artifact work,
    // prewarmed like the closure/pairs/centroids above
    operators.Bpe.storedMerges(spark, sfDir)
    operators.Dedup.storedIncrementalCooc(spark, sfDir)
    operators.Ann.storedCentroids(spark, sfDir, 16, 2)
    operators.Ann.storedCentroids(spark, sfDir, 8, 3)
    operators.Ann.storedCodebooks(spark, sfDir, 8, 16, 2)
    operators.Ann.storedPcaProjection(spark, sfDir, 8)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      actionFree.foreach { case (_, b) =>
        b(spark, sfDir).queryExecution.executedPlan // analysis + planning
      }
      spark.sparkContext.parallelize(Seq(1)).count() // sentinel
      val deadline = System.currentTimeMillis() + 10000
      while (jobs.get() < 1 && System.currentTimeMillis() < deadline) Thread.sleep(50)
      if (jobs.get() != 1) {
        // identify the offenders for the failure message
        val offenders = actionFree.flatMap { case (n, b) =>
          Thread.sleep(200); jobs.set(0)
          b(spark, sfDir).queryExecution.executedPlan
          Thread.sleep(300)
          if (jobs.get() > 0) Some(s"$n(${jobs.get()})") else None
        }
        fail(s"builders ran Spark jobs at plan-construction time: ${offenders.mkString(", ")}")
      }
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("jx limited domain: top-N is TakeOrdered, remap joins broadcast, no cartesian (q93)") {
    // the scale contract of the limited value domain: the top-N
    // selection must be a TakeOrderedAndProject over the counts
    // aggregate (never a single-partition global sort of raw facts),
    // the OTHER remap must reach the facts via a broadcast join of
    // the tiny top-N frame, and the cell join must stay an equi-join
    val p = plan(operators.Jx.q93)
    p should include("TakeOrderedAndProject")
    p should include("BroadcastHashJoin")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("new jx operators keep clean single-pass plans (q94, q96, q97)") {
    // q94: three window clauses over one partitioned sort — no joins
    // at all may appear (a window is a sort within the shuffle, not a
    // self-join), and the sliding frames must not add exchanges
    val p94 = plan(operators.Jx.q94)
    p94 should include("Window")
    p94 should not include "Join"
    // q96/q97: one scan into one hash aggregation; the only joins
    // allowed are the tiny broadcast cell tables of the edge domain
    Seq(operators.Jx.q96, operators.Jx.q97).foreach { q =>
      val p = plan(q)
      withClue(s"${q.name}: ") {
        p should include("HashAggregate")
        p should not include "CartesianProduct"
        p should not include "SortMergeJoin"
      }
    }
  }

  test("dedup sweep: pair list collapses to histograms, never buffered per band (q89)") {
    val p = plan(Dedup.q89)
    p should not include "CartesianProduct"
    // the only non-equi joins are the ≤11-row grid × ≤11-row histogram
    // rollups; the pair list itself must reach them pre-aggregated —
    // no per-band doc-list buffering (the first formulation's
    // collect_list over band × pairs) may reappear. jaccardPairs' own
    // per-doc hot-set collect_lists (keyed by doc_id, bounded by
    // occurrences/maxDf) are visible through the persisted subtree and
    // are fine — only a BAND-keyed buffer is the regression.
    p.linesIterator.filter(_.contains("collect_list")).foreach { l =>
      withClue(s"collect_list not keyed by doc_id: $l") {
        l should include("keys=[doc_id")
      }
    }
    p should include("HashAggregate")
  }

  test("subtree rollup: closure joins facts by key, never cartesian (q90)") {
    val p = plan(operators.Hierarchy.q90)
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("boilerplate scrub: df aggregate + keyed hot-flag join, never cartesian (q91)") {
    val p = plan(Dedup.q91)
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("scd2 + snapshot diff: key-partitioned windows, shuffle full-outer, no cartesian (q115, q116)") {
    val p115 = plan(operators.Etl.q115)
    p115 should not include "CartesianProduct"
    // the history window must partition by the natural key, never global
    p115 should include("windowspecdefinition(user_id")
    val p116 = plan(operators.Etl.q116)
    p116 should not include "CartesianProduct"
    p116 should include("FullOuter")
    // the 14-day slice must reach the scan as a data filter (the
    // cutoffs are data-relative, so they prune post-scan via the
    // broadcast max frame — but the scan itself must stay pruned to
    // the referenced columns only)
    p116 should include("ReadSchema")
  }

  test("winsorize: bounds ride a broadcast, no whole-partition window over raw rows (q113)") {
    val p = plan(operators.Text.q113)
    p should include("BroadcastHashJoin") // per-source bounds joined back
    p should not include "CartesianProduct"
    // (rankPrep's global min/max frame is a 1-row broadcast crossJoin —
    // the repo-wide totals pattern — so a BuildRight-Cross BNLJ of one
    // row is expected here; only CartesianProduct would be a defect)
    // rankPrep windows are partitioned by (group, bucket) over the
    // COMPRESSED distinct-value frame — never a global (unpartitioned)
    // window, which would single-task the sort. Every Window node must
    // carry a non-empty partition spec (printed as a second bracket
    // list after the window expressions).
    val globalWins = p.linesIterator.filter(_.contains("Window ["))
      .filterNot(_.matches(""".*\], \[[^\]]+\].*"""))
    withClue(s"unpartitioned Window nodes:\n${globalWins.mkString("\n")}\n") {
      globalWins shouldBe empty
    }
  }

  test("rolling active users: day-domain join broadcasts, distinct is two-phase (q114)") {
    val p = plan(operators.Etl.q114)
    p should include("BroadcastHashJoin")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
    // the windowed-distinct reformulation must never plan a window op
    p should not include "WindowExec"
    // countDistinct plans as a two-phase aggregate keyed first by
    // (day, user): partial_count(distinct user_id) appears in the
    // final phase, proving the expand-then-group shape
    p.toLowerCase should include("count(distinct")
  }
}
