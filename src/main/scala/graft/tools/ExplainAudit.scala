package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Plan auditor over the gate queries.
  *
  * Print mode (default): formatted physical plans of selected queries
  * (or all) so scan pruning (ReadSchema), parquet pushdown
  * (PushedFilters), join strategies and WholeStageCodegen spans can be
  * inspected. Usage: runMain graft.tools.ExplainAudit [names...]
  *
  * Check mode (`--check`, wired into tools/precommit.sh --test): the
  * plan-shape REGRESSION GATE — asserts the invariants the engine's
  * scale story rests on and exits 1 on any violation, so a commit
  * that silently drops a broadcast hint, loses parquet pushdown /
  * pruning, or introduces a cartesian product fails the hook, not the
  * next bench. Invariants are deliberately coarse (strategy names,
  * not full plan text): they must survive Spark version drift and
  * incidental plan changes while still catching the failure classes
  * that kill a 100 TB run.
  */
object ExplainAudit {

  final case class Violation(query: String, rule: String) {
    override def toString = s"$query: $rule"
  }

  /** Every windowspecdefinition in `plan` must lead with `key` as
    * its first partition expression — an unpartitioned (or
    * mis-keyed) window sorts the whole input on one task. Shared by
    * the q139/q145 rules so a fix to the regex lands once.
    */
  private def keyedWindowPartition(plan: String, key: String): Boolean = {
    val specs = raw"windowspecdefinition\(([^,)]*)".r
      .findAllMatchIn(plan).map(_.group(1)).toList
    specs.nonEmpty && specs.forall(_.startsWith(key))
  }

  /** GLOBAL window-boundedness rule: a Window with an EMPTY partition
    * spec moves its whole input to ONE task (SinglePartition exchange +
    * global sort) — fatal on raw rows at 100 TB, fine on a
    * domain-compressed input (vocabGrowth's 10-row decile cumsum, the
    * q87/q112 coverage curves). So every unpartitioned window must sit
    * ABOVE an aggregate, a Range spine, or literal rows in the plan
    * tree; an unpartitioned window whose subtree is scans/projections
    * only is the global-sort-on-raw-rows regression this rule exists
    * to catch. Detection: in formatted plans an unpartitioned spec's
    * first `windowspecdefinition` argument is either an ORDER
    * expression (`col ASC/DESC ...`) or — for an UNORDERED
    * unpartitioned spec — the frame itself (`specifiedwindowframe`);
    * a partitioned spec leads with the bare partition column. The
    * compressing node must sit DIRECTLY under the window (through
    * sort/exchange/projection plumbing only): an aggregate buried
    * below a join elsewhere in the subtree does not bound the row
    * count the window's single task actually sorts.
    */
  private[tools] def unboundedWindowViolations(name: String, plan: String): Seq[Violation] = {
    val lines = plan.split("\n")
    val detailStart = lines.indexWhere(_.matches(raw"\(\d+\) .*"))
    val tree = if (detailStart < 0) lines.toSeq else lines.take(detailStart).toSeq
    def indent(l: String) = l.indexWhere(_.isLetter)
    val compressed = raw"\b(HashAggregate|SortAggregate|ObjectHashAggregate|Range|LocalTableScan|ReusedExchange)\b".r
    // nodes that preserve (or reduce) their input's row count — the
    // window's effective input is whatever sits below this plumbing.
    // ReusedExchange above counts as compressed: its referent subtree
    // is printed elsewhere and was audited where it appears.
    // Generate is pass-through as well: an explode over a raw scan
    // still terminates at the scan (flagged), while the legitimate
    // calendar/day-spine explodes (q140) sit over a 1-row min/max
    // aggregate — the domain-compressed shape the rule admits.
    // Single-child plumbing only; multi-child nodes (broadcast joins,
    // Union) are handled structurally in boundedAt below.
    val passThrough = raw"\b(Sort|Exchange|Project|Filter|WholeStageCodegen|InputAdapter|ColumnarToRow|RowToColumnar|AQEShuffleRead|ShuffleQueryStage|TableCacheQueryStage|ResultQueryStage|InMemoryTableScan|InMemoryRelation|Window|WindowGroupLimit|Coalesce|AdaptiveSparkPlan|Generate)\b".r
    val treeArr = tree.toArray
    val broadcastJoin = raw"\b(BroadcastHashJoin|BroadcastNestedLoopJoin)\b".r
    val broadcastSide = raw"\b(BroadcastExchange|BroadcastQueryStage)\b".r
    // direct children of the node at line i: the minimally-indented
    // lines of its subtree region (letter-index indentation — the
    // `+- :  *` tree prefix contains no letters)
    def childrenOf(i: Int): Seq[Int] = {
      val ind = indent(treeArr(i))
      var end = i + 1
      while (end < treeArr.length && indent(treeArr(end)) > ind) end += 1
      val region = (i + 1) until end
      if (region.isEmpty) Seq.empty
      else {
        val ci = region.map(j => indent(treeArr(j))).min
        region.filter(j => indent(treeArr(j)) == ci)
      }
    }
    // is the subtree rooted at line i row-count-bounded? A structural
    // walk (not first-in-print-order): broadcast joins scale with the
    // STREAMED side only (the build side is broadcast-small by
    // construction, so its BroadcastExchange/BroadcastQueryStage
    // subtree is skipped regardless of BuildLeft/BuildRight print
    // order — q140's spine⟕counts join, q157's Range-spine decile
    // join); Union is bounded only when EVERY branch is; shuffle
    // joins stay non-pass-through: both sides are unbounded.
    def boundedAt(i: Int): Boolean = {
      val l = treeArr(i)
      if (compressed.findFirstIn(l).isDefined) true
      else if (broadcastJoin.findFirstIn(l).isDefined) {
        val kids = childrenOf(i)
        val streamed = kids.filterNot(j =>
          broadcastSide.findFirstIn(treeArr(j)).isDefined)
        val walk = if (streamed.nonEmpty) streamed else kids
        walk.nonEmpty && walk.forall(boundedAt)
      } else if (raw"\bUnion\b".r.findFirstIn(l).isDefined) {
        val kids = childrenOf(i)
        kids.nonEmpty && kids.forall(boundedAt)
      } else if (passThrough.findFirstIn(l).isDefined) {
        val kids = childrenOf(i)
        kids.nonEmpty && boundedAt(kids.head)
      } else false
    }
    val unpartSpec = raw"windowspecdefinition\(([^,)]*)".r
    tree.zipWithIndex.collect {
      case (l, i) if raw"\bWindow \((\d+)\)".r.findFirstMatchIn(l).isDefined =>
        (raw"\bWindow \((\d+)\)".r.findFirstMatchIn(l).get.group(1), i)
    }.flatMap { case (id, i) =>
      // this Window node's detail block: unpartitioned iff any of its
      // windowspecdefinitions leads with an order expression or
      // (unordered spec) directly with the frame definition
      val detail = (raw"(?s)\n\($id\) Window\n(.*?)(?=\n\(\d+\) |\z)".r
        .findFirstMatchIn(plan).map(_.group(1))).getOrElse("")
      val unpartitioned = unpartSpec.findAllMatchIn(detail).exists { m =>
        raw"\s(ASC|DESC)\b".r.findFirstIn(m.group(1)).isDefined ||
          m.group(1).startsWith("specifiedwindowframe")
      }
      val boundedInput = {
        val kids = childrenOf(i)
        kids.nonEmpty && boundedAt(kids.head)
      }
      if (unpartitioned && !boundedInput)
        Some(Violation(name,
          "unpartitioned window over raw rows (global single-task sort; " +
            "input has no aggregate/Range/literal compression directly below)"))
      else None
    }
  }

  /** Pure check of one query's formatted plan text — unit-testable
    * without running a session (ExplainAuditSpec seeds regressions).
    */
  def violations(name: String, plan: String): Seq[Violation] = {
    val v = Seq.newBuilder[Violation]
    // global: a cartesian product is never the intended shape — every
    // legitimate tiny cross join in the engine broadcasts one side
    // (BroadcastNestedLoopJoin), a CartesianProductExec means a
    // broadcast was lost
    if (plan.contains("CartesianProduct"))
      v += Violation(name, "CartesianProduct in plan (lost broadcast?)")
    // global: unpartitioned windows must ride domain-compressed inputs
    v ++= unboundedWindowViolations(name, plan)
    name match {
      case "q01_filter_project" =>
        // parquet pushdown: the scan must carry at least one pushed
        // filter (the conjunctive comparisons are all pushable)
        if (!raw"PushedFilters: \[[^\]]".r.findFirstIn(plan).isDefined)
          v += Violation(name, "no PushedFilters on the parquet scan")
        // column pruning: l_shipdate is not referenced by the query —
        // its appearance means the scan reads unprojected columns
        if (plan.contains("l_shipdate"))
          v += Violation(name, "column pruning lost (l_shipdate in scan)")
      case "q02_agg_group" =>
        // partial aggregation: map-side combine before the exchange
        if (plan.split("HashAggregate").length <= 2)
          v += Violation(name, "no partial (map-side) aggregation")
      case "q03_join_broadcast" | "q05_multijoin" =>
        if (!plan.contains("BroadcastHashJoin"))
          v += Violation(name, "broadcast dim join degraded (no BroadcastHashJoin)")
      case "q04_join_shuffle" =>
        // fact⨝fact must stay an EQUI join (at audit scale AQE may
        // legitimately broadcast the small side, so any of BHJ/SMJ/SHJ
        // passes); degrading to a nested loop is the regression
        if (!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin") &&
            !plan.contains("BroadcastHashJoin"))
          v += Violation(name, "equi-join lost (nested loop or worse)")
      case "q47_approx_stats" =>
        // the exactness audit must stay hash-aggregate + broadcast:
        // an exact percentile would reintroduce a per-group Sort
        // buffer (the 16.9s regression r11 caught), and the 3-row
        // estimate join must never shuffle
        if (!plan.contains("BroadcastHashJoin"))
          v += Violation(name, "estimate join lost its broadcast")
        if (plan.contains("WindowExec") || plan.contains("percentile("))
          v += Violation(name, "exact percentile crept back into the audit")
      case "q108_keyword_search" =>
        // top-k must be per-partition heaps, never a global sort or a
        // single-partition window
        if (!plan.contains("TakeOrderedAndProject"))
          v += Violation(name, "top-k degraded (no TakeOrderedAndProject)")
        if (plan.contains("Window"))
          v += Violation(name, "window in plan (top-k should be TakeOrdered)")
        // the query-term filter must survive into the plan (it is what
        // collapses the exploded token stream before the tf shuffle)
        if (!plan.contains(" IN (join,window,agg)"))
          v += Violation(name, "query-term isin filter lost")
      case "q109_cohort_retention" =>
        // the matrix is aggregates + joins only — a WindowExec here
        // means someone rewrote first-seen as a running window
        if (plan.contains("Window"))
          v += Violation(name, "window in plan (first-seen must be a min aggregate)")
        if (plan.split("HashAggregate").length <= 2)
          v += Violation(name, "no partial (map-side) aggregation")
      case "q110_basket_pairs" =>
        // pairs expand LOCALLY from the per-order basket array
        // (Generate over the pair transform); the only joins are the
        // broadcast part-count dims — a SortMergeJoin/ShuffledHashJoin
        // means pair generation regressed to the three-shuffle
        // self-join (or the dims lost their broadcast)
        if (!plan.contains("Generate"))
          v += Violation(name, "local pair expansion lost (no Generate in plan)")
        if (plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
          v += Violation(name, "shuffle join in plan (pair self-join regression or lost dim broadcast)")
      case "q121_jx_format_nested" =>
        // the re-nest is a pure projection over a pushed-down filter:
        // no shuffle may appear, and the orderkey predicate must
        // reach the parquet scan
        if (plan.contains("Exchange"))
          v += Violation(name, "shuffle in plan (nested format must be a pure projection)")
        if (!raw"PushedFilters: \[[^\]]".r.findFirstIn(plan).isDefined)
          v += Violation(name, "no PushedFilters on the parquet scan")
      case "q125_lang_trigram" =>
        // profiles must reach the occurrence stream as a BROADCAST
        // (model-sized dim); losing it means shuffling the whole
        // exploded trigram stream against the profile table
        if (!plan.contains("BroadcastHashJoin"))
          v += Violation(name, "profile join degraded (no BroadcastHashJoin)")
        if (plan.split("HashAggregate").length <= 2)
          v += Violation(name, "no partial (map-side) aggregation")
      case "q54_corpus_stats" | "q123_corpus_stats_incr" | "q122_mix_temperature" =>
        // release-report aggregates must keep map-side partials
        if (plan.split("HashAggregate").length <= 2)
          v += Violation(name, "no partial (map-side) aggregation")
      case "q111_rfm_segments" =>
        // quartile boundaries come from ONE rankPrep pass over the
        // stack()-unpivoted (metric, value) rows — the Generate is the
        // unpivot; its absence means the boundary computation regressed
        // to three per-metric rank passes over the customer frame
        if (!plan.contains("Generate"))
          v += Violation(name, "single-pass metric unpivot lost (no Generate in plan)")
      case "q130_table_profile" =>
        // per-column profile: each scan reads exactly its one column
        // (an unprofiled column in the plan means pruning broke) and
        // the distinct-count must use the two-phase rewrite, never an
        // Expand (the N× row multiplication the profiler must avoid)
        if (plan.contains("Expand"))
          v += Violation(name, "Expand in plan (distinct-count rewrite lost)")
        if (plan.contains("l_extendedprice"))
          v += Violation(name, "column pruning lost (unprofiled column in scan)")
      case "q135_profile_incr" =>
        // slice profiles must stay mergeable SKETCH aggregates — an
        // Expand or a Window here means the distinct estimate
        // regressed to an exact formulation that can't maintain at
        // delta cost
        if (plan.contains("Expand"))
          v += Violation(name, "Expand in plan (mergeable sketch lost)")
        if (!plan.contains("hll_union_agg"))
          v += Violation(name, "hll_union_agg missing (artifact merge lost)")
      case "q160_phash_decoded" =>
        // the decode+hash scan must be REUSED across both bucket-join
        // sides — without the memo the 550k-image ImageIO decode runs
        // once PER SIDE — and the candidate join must stay an EQUI
        // join on (chunk, cv) (pigeonhole banding; a nested loop is
        // the all-pairs regression banding exists to prevent)
        if (!plan.contains("InMemoryRelation") && !plan.contains("Scan ExistingRDD"))
          v += Violation(name, "decoded-hash table not reused (decode runs per join side)")
        if (!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin") &&
            !plan.contains("BroadcastHashJoin"))
          v += Violation(name, "bucket equi-join lost (nested loop or worse)")
      case "q131_dup_spans" =>
        // the gram/shingle self-join rides the 64-bit hash — an EQUI
        // join (any strategy); a nested loop means the hash key was lost
        if (!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin") &&
            !plan.contains("BroadcastHashJoin"))
          v += Violation(name, "gram equi-join lost (nested loop or worse)")
      case "q132_name_linkage" =>
        // the fuzzy compare must ride a block-key EQUI join with
        // levenshtein as the post-join filter — levenshtein inside a
        // nested-loop condition over unblocked names is the all-pairs
        // regression blocking exists to prevent
        if (!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin") &&
            !plan.contains("BroadcastHashJoin"))
          v += Violation(name, "block-key equi-join lost (all-pairs nested loop)")
        if (!plan.contains("levenshtein"))
          v += Violation(name, "levenshtein filter missing from plan")
      case "q133_bloom_contain" =>
        // the exact arm joins the broadcast eval fingerprint set; the
        // bloom arm must be the native aggregate (1-row broadcast)
        if (!plan.contains("BroadcastHashJoin"))
          v += Violation(name, "eval fingerprint set lost its broadcast")
        if (!plan.contains("bloom_agg"))
          v += Violation(name, "native bloom_agg missing from plan")
      case "q134_cms_heavyhitters" =>
        // top-k is per-partition heaps; the sketch joins as a 1-row
        // broadcast — a Window or a global Sort is the regression
        if (!plan.contains("TakeOrderedAndProject"))
          v += Violation(name, "top-k degraded (no TakeOrderedAndProject)")
        if (plan.contains("Window"))
          v += Violation(name, "window in plan (top-k should be TakeOrdered)")
      case "q137_pagerank" =>
        // each power-iteration step is an EQUI join of the edge list
        // against the rank vector plus a dst-keyed sum with map-side
        // partials — a nested loop (beyond the broadcast 1-row node
        // count) or a lost partial means the iteration stopped being
        // the distributed PageRank step
        if (!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin") &&
            !plan.contains("BroadcastHashJoin"))
          v += Violation(name, "rank-vector equi-join lost (nested loop or worse)")
        if (plan.split("HashAggregate").length <= 2)
          v += Violation(name, "no partial (map-side) aggregation")
      case "q138_interval_events" =>
        // the whole point of the day-bucket rewrite: the θ-join must
        // surface as a Generate (window → bucket explode) feeding an
        // EQUI join with the range check residual — a
        // BroadcastNestedLoopJoin is the planner-native range join
        // the rewrite exists to avoid (fatal when neither side
        // broadcasts)
        if (!plan.contains("Generate"))
          v += Violation(name, "bucket explode lost (no Generate in plan)")
        if (plan.contains("BroadcastNestedLoopJoin"))
          v += Violation(name, "BroadcastNestedLoopJoin in plan (bucket equi-rewrite lost)")
        if (!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin") &&
            !plan.contains("BroadcastHashJoin"))
          v += Violation(name, "bucket equi-join lost")
      case "q139_gapfill" =>
        // spine explode is a Generate; the observed-days join is an
        // EQUI join on (key, day); both windows must PARTITION by the
        // key — a windowspecdefinition whose first expression is not
        // user_id is an unpartitioned (or mis-keyed) window sorting
        // the whole spine on one task
        if (!plan.contains("Generate"))
          v += Violation(name, "day-spine explode lost (no Generate in plan)")
        if (!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin") &&
            !plan.contains("BroadcastHashJoin"))
          v += Violation(name, "spine/daily equi-join lost")
        if (!keyedWindowPartition(plan, "user_id"))
          v += Violation(name, "window lost its user_id partition (global sort)")
      case "q140_concurrency" =>
        // the sweep-line's whole point: facts collapse to the DAY
        // grain via a map-side-combinable delta aggregate BEFORE the
        // ordered window replays the step function; losing the
        // partial (or the spine Generate) means raw rows reached the
        // single-partition window
        if (plan.split("HashAggregate").length <= 2)
          v += Violation(name, "no partial (map-side) aggregation on the deltas")
        if (!plan.contains("Generate"))
          v += Violation(name, "day-spine explode lost (no Generate in plan)")
      case "q141_transitions" =>
        // successor pairing is one KEYED window; the matrix is
        // model-sized so the totals join must ride a broadcast, and
        // the pair counts keep map-side partials
        if (!plan.contains("BroadcastHashJoin"))
          v += Violation(name, "totals join lost its broadcast")
        if (plan.split("HashAggregate").length <= 2)
          v += Violation(name, "no partial (map-side) aggregation")
      case "q148_bpe_tokens" =>
        // exact BPE accounting is ONE scan projection — the merges
        // ride in the expression, so any Exchange/join means the
        // shuffle-free shape broke (the whole point of the native
        // bpe_tokenize over a tokenize-then-join formulation)
        if (plan.contains("Exchange"))
          v += Violation(name, "shuffle in plan (bpe accounting must be a pure scan map)")
        if (plan.contains("Join"))
          v += Violation(name, "join in plan (merges must ride the expression, not a table)")
      case "q153_bpe_fertility" =>
        // q148's shuffle-free-scan contract, plus ONE language
        // aggregate: the merges ride the expression (no join of any
        // kind), and the rollup keeps map-side partials
        if (plan.contains("Join"))
          v += Violation(name, "join in plan (merges must ride the expression, not a table)")
        if (plan.split("HashAggregate").length <= 2)
          v += Violation(name, "no partial (map-side) aggregation")
      case "q143_embed_quant" =>
        // quantization is a pure per-row map over the scan — any
        // Exchange/Window/join means the one-pass shape broke
        if (plan.contains("Exchange"))
          v += Violation(name, "shuffle in plan (quantization must be a pure scan map)")
        if (plan.contains("Window"))
          v += Violation(name, "window in plan")
      case "q144_quant_search" =>
        // q34's brute contract: the 10 queries ride a BROADCAST over
        // one scan of the quantized corpus — a shuffle join here
        // means the corpus got exchanged to meet the query set
        if (!plan.contains("BroadcastNestedLoopJoin"))
          v += Violation(name, "query set lost its broadcast (corpus-side shuffle join)")
        if (plan.contains("SortMergeJoin"))
          v += Violation(name, "SortMergeJoin in plan (corpus must not shuffle to the queries)")
      case "q145_label_attach" =>
        // the whole point: label attachment is ONE keyed window, no
        // join of any strategy; and the window must partition by the
        // key (the shared q139 check)
        if (plan.contains("Join"))
          v += Violation(name, "join in plan (label attachment must be one keyed window)")
        if (!keyedWindowPartition(plan, "user_id"))
          v += Violation(name, "window lost its user_id partition (global sort)")
      case "q142_anomaly" =>
        // moments are model-sized (one row per series) and must join
        // back broadcast; both aggregates keep map-side partials; a
        // Window here means z regressed to a per-series windowed
        // stddev (whose accumulation order the oracle can't replay)
        if (!plan.contains("BroadcastHashJoin"))
          v += Violation(name, "moments join lost its broadcast")
        if (plan.split("HashAggregate").length <= 2)
          v += Violation(name, "no partial (map-side) aggregation")
        if (plan.contains("Window"))
          v += Violation(name, "window in plan (moments must be exact integer aggregates)")
      case "q150_span_excise" =>
        // q131's contract carried into the rewrite: the gram/occurrence
        // self-join rides the 64-bit hash as an EQUI join (the ONLY
        // join — the keep/drop pass is a joinless sweep-line); the
        // gram-df aggregate keeps map-side partials; the gram stream is
        // persisted (both the df aggregate and the occurrence join
        // consume it under DIFFERENT exchange keys, so losing the
        // InMemoryTableScan means the window+scan runs twice); and no
        // interpreted lambda HOF sits on the data path (the r15 209 s
        // incident class — ArrayFilter/ArrayExists/aggregate are
        // CodegenFallback)
        if (!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin") &&
            !plan.contains("BroadcastHashJoin"))
          v += Violation(name, "gram equi-join lost (nested loop or worse)")
        if (plan.split("HashAggregate").length <= 2)
          v += Violation(name, "no partial (map-side) aggregation")
        if (!plan.contains("InMemoryTableScan"))
          v += Violation(name, "gram stream reuse lost (no InMemoryTableScan)")
        if (plan.contains("lambdafunction"))
          v += Violation(name, "interpreted lambda HOF on the excision path")
      case "q152_selfrep_excise" =>
        // marking is JOINLESS (the first-start window rides the gram
        // stream's doc_id partitioning); the only join is the final
        // doc-keyed intervals attach — an EQUI join of any strategy.
        // Aggregates keep map-side partials; no interpreted lambda HOF
        // on the data path (the keep-pass is the native excise_words
        // two-pointer expression).
        if (!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin") &&
            !plan.contains("BroadcastHashJoin"))
          v += Violation(name, "intervals equi-join lost (nested loop or worse)")
        if (plan.split("HashAggregate").length <= 2)
          v += Violation(name, "no partial (map-side) aggregation")
        if (plan.contains("lambdafunction"))
          v += Violation(name, "interpreted lambda HOF on the excision path")
      case "q154_lm_score" =>
        // one tokenize+shingle pass feeds the doc facts AND both side
        // models (the reused() persist): losing the InMemoryTableScan
        // means the explode runs three times; aggregates keep
        // map-side partials
        if (!plan.contains("InMemoryTableScan"))
          v += Violation(name, "shared bigram pass reuse lost (no InMemoryTableScan)")
        if (plan.split("HashAggregate").length <= 2)
          v += Violation(name, "no partial (map-side) aggregation")
      case "q155_ann_recall" =>
        // ground truth is the q34 broadcast brute shape: the corpus
        // scans once against broadcast queries — a shuffle join here
        // means the corpus got exchanged to meet the probe set
        if (!plan.contains("BroadcastNestedLoopJoin"))
          v += Violation(name, "brute ground truth lost its query broadcast")
      case "q159_bpe_compression" =>
        // q148's shuffle-free-scan contract: the merges ride the
        // expression (no join of any kind), and the source rollup
        // keeps map-side partials
        if (plan.contains("Join"))
          v += Violation(name, "join in plan (merges must ride the expression, not a table)")
        if (plan.split("HashAggregate").length <= 2)
          v += Violation(name, "no partial (map-side) aggregation")
      case "q156_ks_drift" | "q157_vocab_growth" | "q158_gate_ablation" =>
        // compressed-domain analytics: counts aggregate with map-side
        // partials before anything wide happens
        if (plan.split("HashAggregate").length <= 2)
          v += Violation(name, "no partial (map-side) aggregation")
      case "q151_dsir_weights" =>
        // the side models are ≤ buckets rows and must come back to the
        // feature stream as a BROADCAST — a shuffle join here means the
        // model exchange grew with the corpus; both the bucket models
        // and the per-doc dots keep map-side partials
        if (!plan.contains("BroadcastHashJoin"))
          v += Violation(name, "bucket-model join lost its broadcast")
        if (plan.split("HashAggregate").length <= 2)
          v += Violation(name, "no partial (map-side) aggregation")
      case "q20_hierarchy_desc" | "q31_dedup_jaccard" | "q52_dedup_clusters" |
           "q58_contamination" | "q83_memorization" | "q56_jx_nested_from" |
           "q119_components_incr" | "q120_scd2_incr" | "q124_scd2_asof" |
           "q126_state_residency" | "q146_pct_parent" | "q136_containment" =>
        // stored-artifact consumers (closure / pair list / components /
        // contamination audit): after the session memo materializes,
        // the gate plan must READ the checkpointed artifact — the
        // shingle/self-join/fixpoint machinery reappearing here means
        // the materialized-artifact architecture silently regressed to
        // per-query recomputation (the pre-r7 shape)
        if (!plan.contains("ExistingRDD"))
          v += Violation(name, "stored artifact not read (per-query recompute in plan)")
      case _ => ()
    }
    v.result()
  }

  def main(args: Array[String]): Unit = {
    val check = args.contains("--check")
    val names = args.filterNot(_ == "--check")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = graft.util.configureLocalHarness(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val wanted = if (names.nonEmpty) names.toSet else SparkEntry.queries.keySet
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => wanted.contains(q._1))
    if (check) {
      var bad = Seq.empty[Violation]
      var errs = 0
      selected.foreach { case (name, fn) =>
        try {
          val plan = fn(spark, sfDir).queryExecution
            .explainString(org.apache.spark.sql.execution.FormattedMode)
          bad ++= violations(name, plan)
        } catch {
          case e: Throwable =>
            errs += 1
            println(s"AUDIT ERROR $name: ${e.getMessage}")
        }
      }
      bad.foreach(x => println(s"AUDIT FAIL $x"))
      println(s"== plan audit: ${selected.size} plans, ${bad.size} violations, $errs errors ==")
      spark.stop()
      if (bad.nonEmpty || errs > 0) sys.exit(1)
    } else {
      selected.foreach { case (name, fn) =>
        println(s"\n========== $name ==========")
        try fn(spark, sfDir).explain("formatted")
        catch { case e: Throwable => println(s"EXPLAIN FAILED: ${e.getMessage}") }
      }
      spark.stop()
    }
  }
}
