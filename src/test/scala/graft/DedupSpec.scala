package graft

import graft.operators.Dedup
import graft.Tables

/** The rows-only near-dup operators (q32 MinHash, q33 SimHash) are
  * DEFINED by these specs: their correctness signal is recall against
  * the exact-Jaccard pairs (q31, itself DuckDB-oracled) on sf0.001.
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val documents = Tables.documents(spark, sfDir)

  private lazy val exactPairs: Set[(Long, Long)] =
    Dedup.jaccardPairs(documents, 0.5)
      .select($"d1", $"d2").as[(Long, Long)].collect().toSet

  test("exact jaccard finds the planted near-dup pairs") {
    // sf0.001 has ~28 planted pairs, all far above threshold
    exactPairs.size should be >= 20
  }

  test("minhash+LSH pairs are a subset of exact pairs (exact-verified)") {
    val mh = Dedup.minhashPairs(documents, 0.5)
      .select($"d1", $"d2").as[(Long, Long)].collect().toSet
    mh.diff(exactPairs) shouldBe empty
  }

  test("minhash+LSH recall >= 0.9 vs exact jaccard") {
    val mh = Dedup.minhashPairs(documents, 0.5)
      .select($"d1", $"d2").as[(Long, Long)].collect().toSet
    val recall = mh.intersect(exactPairs).size.toDouble / exactPairs.size
    recall should be >= 0.9
  }

  test("simhash recall >= 0.6 vs exact jaccard, and no self-pairs") {
    val sp = Dedup.simhashPairs(documents, maxHamming = 7)
    sp.where($"d1" === $"d2").count() shouldBe 0L
    val pairs = sp.select($"d1", $"d2").as[(Long, Long)].collect().toSet
    val recall = pairs.intersect(exactPairs).size.toDouble / exactPairs.size
    recall should be >= 0.6
  }
}
