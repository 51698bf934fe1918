package graft

import graft.tools.SampleDir
import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}

/** The sf1 pair-graph oracle protocol's sampling tool: the sampled
  * documents table must be EXACTLY the deterministic
  * `xxhash64(doc_id) % K = 0` stride of the source (both engines then
  * run the same query on the same input, so the oracle compare stays
  * bit-exact), and every other table must be the source's bytes.
  */
class SampleDirSpec extends SparkSpec {
  import spark.implicits._

  test("SampleDir writes the exact xxhash64 1/K document stride and links every other table") {
    val out = java.nio.file.Files.createTempDirectory("graft-sample").toString
    SampleDir.run(spark, sfDir, out, 4)
    val want = Tables.documents(spark, sfDir)
      .where(pmod(xxhash64(col("doc_id")), lit(4)) === 0)
      .select($"doc_id").as[Long].collect().toSet
    val got = spark.read.parquet(s"$out/documents.parquet")
      .select($"doc_id").as[Long].collect().toSet
    got shouldBe want
    want.size should be < Tables.documents(spark, sfDir).count().toInt
    // the sampled table is a single FILE (DuckDB's plain read path)
    java.nio.file.Files.isRegularFile(
      java.nio.file.Paths.get(s"$out/documents.parquet")) shouldBe true
    // every other table is byte-identical to the source (hardlinked)
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "embeddings")) {
      java.nio.file.Files.size(java.nio.file.Paths.get(s"$out/$t.parquet")) shouldBe
        java.nio.file.Files.size(java.nio.file.Paths.get(s"$sfDir/$t.parquet"))
    }
    // deterministic: a second run reproduces the same sample
    val out2 = java.nio.file.Files.createTempDirectory("graft-sample").toString
    SampleDir.run(spark, sfDir, out2, 4)
    spark.read.parquet(s"$out2/documents.parquet")
      .select($"doc_id").as[Long].collect().toSet shouldBe got
  }
}
