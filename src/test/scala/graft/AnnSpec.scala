package graft

import graft.operators.Ann
import graft.Tables
import graft.functions.{cosine, cosineFast}
import org.apache.spark.sql.functions._

/** q35 (LSH ANN) is rows-only; its correctness signal is recall@5
  * against the oracled brute-force q34 on sf0.001, plus agreement of
  * the native CosineSimilarity expression with the interpreted
  * higher-order-function formulation.
  */
class AnnSpec extends SparkSpec {
  import spark.implicits._

  test("native cosine expression matches zip_with/aggregate fold bit-for-bit") {
    val e = Tables.embeddings(spark, sfDir).limit(100)
    val pairs = e.toDF("v1", "e1", "l1")
      .join(e.toDF("v2", "e2", "l2"), $"v1" + 1 === $"v2")
    val diffs = pairs
      .select(cosineFast($"e1", $"e2").as("fast"), cosine($"e1", $"e2").as("slow"))
      .where($"fast" =!= $"slow")
    diffs.count() shouldBe 0L
  }

  test("LSH ANN recall@5 >= 0.5 vs brute force") {
    val brute = Ann.q34.build(spark, sfDir)
      .select($"qid", $"cid").as[(Long, Long)].collect().toSet
    val lsh = Ann.q35.build(spark, sfDir)
      .select($"qid", $"cid").as[(Long, Long)].collect().toSet
    val recall = lsh.intersect(brute).size.toDouble / brute.size
    recall should be >= 0.5
  }

  test("LSH candidate volume is a fraction of the corpus (it's not brute force)") {
    val n = Tables.embeddings(spark, sfDir).count()
    val buckets = Ann.lshBuckets(Tables.embeddings(spark, sfDir), tables = 8, bits = 4)
    val qb = buckets.where($"vec_id" < 10).toDF("qid", "qv", "tbl", "bucket")
    val cand = qb.join(buckets.toDF("cid", "cv", "tbl", "bucket"), Seq("tbl", "bucket"))
      .where($"cid" =!= $"qid").select($"qid", $"cid").distinct().count()
    // 10 queries x full corpus would be 10*(n-1); require < 80% of that
    cand.toDouble should be < 0.8 * 10 * (n - 1)
  }
}
