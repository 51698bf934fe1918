package graft

import graft.operators.Cluster

/** Connected components on hand-built graphs with known structure:
  * two chains, a triangle, and an isolated pair.
  */
class ClusterSpec extends SparkSpec {
  import spark.implicits._

  test("components of chains, a triangle, and a pair") {
    val pairs = Seq(
      // chain 1-2-3-4
      (1L, 2L), (2L, 3L), (3L, 4L),
      // triangle 10-11-12
      (10L, 11L), (11L, 12L), (10L, 12L),
      // pair 20-21
      (21L, 20L))
      .toDF("d1", "d2")
    val got = Cluster.connectedComponents(pairs)
      .as[(Long, Long)].collect().toSet
    got shouldBe Set(
      (1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L),
      (10L, 10L), (11L, 10L), (12L, 10L),
      (20L, 20L), (21L, 20L))
  }

  test("dedupCorpus keeps exactly singletons plus one keeper per cluster") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sfDir)
    val cleaned = Cluster.dedupCorpus(docs, 0.5)
      .select($"doc_id").as[Long].collect().toSet
    // ground truth from the verified stages run independently
    val pairs = graft.operators.Dedup.minhashPairs(docs, 0.5)
    val comps = Cluster.connectedComponents(pairs)
    val keeperIds = Cluster.keepers(comps, docs)
      .select($"keeper_id").as[Long].collect().toSet
    val clustered = comps.select($"node").as[Long].collect().toSet
    val allIds = docs.select($"doc_id").as[Long].collect().toSet
    cleaned shouldBe (allIds -- clustered) ++ keeperIds
    (cleaned.size < allIds.size) shouldBe true // some dups actually fell
  }

  test("a long chain converges (log rounds, not diameter rounds)") {
    val n = 64
    val pairs = (1 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("d1", "d2")
    val got = Cluster.connectedComponents(pairs).as[(Long, Long)].collect()
    got.length shouldBe n
    got.map(_._2).distinct.toSeq shouldBe Seq(1L)
  }

  test("componentsIncrement ≡ full recompute on crafted merge cases") {
    // stored graph: components {1,2,3} (root 1), {10,11} (root 10),
    // {20,21} (root 20), {30,31} (root 30, stays untouched)
    val oldPairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (30L, 31L))
      .toDF("d1", "d2")
    val stored = Cluster.connectedComponents(oldPairs).localCheckpoint()
    // delta: bridge two stored components (11~21), attach a NEW node
    // with a SMALLER id than a stored root (5~10 → new root 5), and a
    // brand-new component (40~41)
    val delta = Seq((11L, 21L), (5L, 10L), (40L, 41L)).toDF("d1", "d2")
    val got = Cluster.componentsIncrement(stored, delta)
      .as[(Long, Long)].collect().toSet
    val full = Cluster.connectedComponents(oldPairs.unionByName(delta))
      .as[(Long, Long)].collect().toSet
    got shouldBe full
    // the crafted semantics, spelled out: 10/11 merged under new min 5,
    // 20/21 pulled into 5's component via the 11~21 bridge
    got should contain allOf ((5L, 5L), (10L, 5L), (11L, 5L),
      (20L, 5L), (21L, 5L), (30L, 30L), (31L, 30L), (40L, 40L))
  }

  test("componentsIncrement: chain of three stored components merged via one new node") {
    val oldPairs = Seq((2L, 3L), (10L, 11L), (20L, 21L)).toDF("d1", "d2")
    val stored = Cluster.connectedComponents(oldPairs).localCheckpoint()
    val delta = Seq((3L, 100L), (100L, 10L), (100L, 20L)).toDF("d1", "d2")
    val got = Cluster.componentsIncrement(stored, delta)
      .as[(Long, Long)].collect().toSet
    val full = Cluster.connectedComponents(oldPairs.unionByName(delta))
      .as[(Long, Long)].collect().toSet
    got shouldBe full
    got.filter(_._1 != 100L).map(_._2) shouldBe Set(2L)
  }

  test("componentsIncrement is idempotent: replayed delta changes nothing") {
    val oldPairs = Seq((1L, 2L), (10L, 11L)).toDF("d1", "d2")
    val delta = Seq((2L, 10L), (50L, 51L)).toDF("d1", "d2")
    val once = Cluster.componentsIncrement(
      Cluster.connectedComponents(oldPairs).localCheckpoint(), delta)
      .localCheckpoint()
    // replay: every delta pair contracts to a self-edge and drops out
    Cluster.componentsIncrementDelta(once, delta).count() shouldBe 0L
    val twice = Cluster.componentsIncrement(once, delta)
    twice.as[(Long, Long)].collect().toSet shouldBe
      once.as[(Long, Long)].collect().toSet
  }

  test("componentsIncrementDelta touches only moved + new rows") {
    val oldPairs = Seq((1L, 2L), (10L, 11L), (30L, 31L)).toDF("d1", "d2")
    val stored = Cluster.connectedComponents(oldPairs).localCheckpoint()
    val delta = Seq((2L, 10L)).toDF("d1", "d2")
    val changed = Cluster.componentsIncrementDelta(stored, delta)
      .as[(Long, Long)].collect().toSet
    // only the absorbed component's members move; 1's and 30's rows
    // (component id unchanged) are NOT rewritten
    changed shouldBe Set((10L, 1L), (11L, 1L))
  }

  test("q119 gate shape: split-fold equals the full stored components (sf)") {
    import org.apache.spark.sql.functions._
    val got = Cluster.q119.build(spark, sfDir)
      .as[(Long, Long)].collect().toSet
    val full = Cluster.storedComponents(spark, sfDir)
      .as[(Long, Long)].collect().toSet
    got shouldBe full
  }

  test("batch nearDedupIngest: stored-wins, in-batch collapse, redelivery no-op, component lineage") {
    import java.nio.file.Files
    val docsPath = Files.createTempDirectory("graft-bingest").toString + "/docs"
    val sigsPath = Files.createTempDirectory("graft-bingest").toString + "/sigs"
    val compsPath = Files.createTempDirectory("graft-bingest").toString + "/comps"
    def text(tag: Int) = (0 until 20).map(j => s"t${tag}w$j").mkString(" ")
    // nightly run 1: doc 2 duplicates doc 1; doc 3 distinct
    val b1 = Seq((1L, text(1)), (2L, text(1)), (3L, text(3))).toDF("doc_id", "text")
    // nightly run 2: doc 4 duplicates STORED doc 1; doc 6 duplicates
    // in-batch doc 5
    val b2 = Seq((4L, text(1)), (5L, text(5)), (6L, text(5))).toDF("doc_id", "text")
    Cluster.nearDedupIngest(b1, docsPath, sigsPath, 0.5,
      compsPath = Some(compsPath)) shouldBe 2L // {1, 3}
    Cluster.nearDedupIngest(b2, docsPath, sigsPath, 0.5,
      compsPath = Some(compsPath)) shouldBe 1L // {5}
    def storedIds(p: String) = graft.sources.ParquetUpsertSink.read(spark, p)
      .select($"doc_id").as[Long].collect().toSet
    storedIds(docsPath) shouldBe Set(1L, 3L, 5L)
    storedIds(sigsPath) shouldBe Set(1L, 3L, 5L)
    // lineage: every rejected doc is attributable to its keeper's component
    val comps = graft.sources.ParquetUpsertSink.read(spark, compsPath)
      .select($"node", $"component").as[(Long, Long)].collect().toMap
    comps(2L) shouldBe 1L
    comps(4L) shouldBe 1L
    comps(6L) shouldBe 5L
    // redelivered nightly run: doc 5 passes the gate again (it IS the
    // stored doc — same key, no-op upsert), 4 and 6 rejected again;
    // the STORES are unchanged, which is the idempotence contract
    Cluster.nearDedupIngest(b2, docsPath, sigsPath, 0.5,
      compsPath = Some(compsPath)) shouldBe 1L
    storedIds(docsPath) shouldBe Set(1L, 3L, 5L)
    storedIds(sigsPath) shouldBe Set(1L, 3L, 5L)
  }

  test("leak-free split: no near-dup pair ever straddles a split (q86)") {
    val docs = Tables.documents(spark, sfDir)
    val split = Cluster.leakFreeSplit(docs, 0.5)
    // every document is assigned exactly once
    split.count() shouldBe docs.count()
    // THE guarantee: both ends of every qualifying near-dup pair land
    // in the same split (and share the same root)
    val s1 = split.select($"doc_id".as("d1"), $"split".as("sp1"), $"root".as("r1"))
    val s2 = split.select($"doc_id".as("d2"), $"split".as("sp2"), $"root".as("r2"))
    val straddlers = operators.Dedup.jaccardPairs(docs, 0.5)
      .join(s1, "d1").join(s2, "d2")
      .where($"sp1" =!= $"sp2" || $"r1" =!= $"r2")
      .count()
    straddlers shouldBe 0L
    // un-clustered docs keep q53's per-doc assignment (root = self)
    val roots = split.select($"doc_id", $"root").as[(Long, Long)].collect()
    val clustered = roots.filter { case (d, r) => d != r }
    clustered.length should be > 0 // the corpus does contain near-dups
  }
}
