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
}
