package graft

import graft.sources.{DocumentStore, EtlPipeline, JsonLinesStore, ParquetStore}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The connector seam (SURVEY §3 as a pluggable boundary): the
  * ES-shaped store contract — scroll scan, keyed latest-wins bulk
  * push, full reindex — as traits, with the engine-native
  * ParquetStore and a read-only NDJSON source, plus proof that the
  * reference's main loop runs unchanged against a CUSTOM store.
  */
class DocumentStoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir() = java.nio.file.Files.createTempDirectory("graft-ds").toString

  test("ParquetStore: push is keyed latest-wins, sync deletes absent keys") {
    val store = ParquetStore(tmpDir() + "/t", Seq("id"), "rev", numBuckets = 4)
    store.exists(spark) shouldBe false
    store.push(Seq((1L, "a", 10L), (2L, "b", 10L)).toDF("id", "v", "rev"))
    store.exists(spark) shouldBe true
    // newer revision wins; redelivery of the old one is a no-op
    store.push(Seq((1L, "a2", 20L)).toDF("id", "v", "rev"))
    store.push(Seq((1L, "a", 10L)).toDF("id", "v", "rev"))
    store.scan(spark).select($"id", $"v").as[(Long, String)].collect().toSet shouldBe
      Set((1L, "a2"), (2L, "b"))
    // full reindex: key 2 is gone from the snapshot → gone from the store
    store.sync(Seq((1L, "a3", 30L)).toDF("id", "v", "rev"))
    store.scan(spark).select($"id", $"v").as[(Long, String)].collect().toSet shouldBe
      Set((1L, "a3"))
  }

  test("JsonLinesStore scans an NDJSON export, flattening nested documents") {
    val dir = tmpDir()
    val f = java.nio.file.Paths.get(dir, "docs.ndjson")
    java.nio.file.Files.writeString(f,
      """{"id": 1, "meta": {"lang": "en"}, "text": "hello"}
        |{"id": 2, "meta": {"lang": "de"}, "text": "hallo"}
        |""".stripMargin)
    val got = JsonLinesStore(f.toString).scan(spark)
    got.columns.toSet shouldBe Set("id", "meta.lang", "text")
    got.select(col("id"), col("`meta.lang`")).as[(Long, String)]
      .collect().toSet shouldBe Set((1L, "en"), (2L, "de"))
  }

  /** A minimal non-parquet store (driver-memory table, latest-wins on
    * push) — small-data only, but it implements the full contract, so
    * the pipeline must work against it unchanged.
    */
  private class MemStore extends DocumentStore {
    private var table: Option[DataFrame] = None
    override def exists(s: SparkSession): Boolean = table.isDefined
    override def scan(s: SparkSession): DataFrame = table.get
    override def push(updates: DataFrame): Unit = {
      import org.apache.spark.sql.expressions.Window
      val all = table.fold(updates)(_.unionByName(updates))
      val w = Window.partitionBy(col("ancestor"), col("descendant"))
        .orderBy(col("rev").desc)
      // collect: pin the merged state like a remote store would
      val rows = all.withColumn("_rk", row_number().over(w))
        .where(col("_rk") === 1).drop("_rk").collect()
      table = Some(updates.sparkSession.createDataFrame(
        java.util.Arrays.asList(rows: _*), all.schema))
    }
    override def sync(snapshot: DataFrame): Unit = {
      table = None; push(snapshot)
    }
  }

  test("the main loop runs unchanged against a custom DocumentStore") {
    val bm = tmpDir() + "/wm"
    val store = new MemStore
    val edges1 = Seq((10L, 1L, 100L), (11L, 1L, 100L), (12L, 10L, 150L))
      .toDF("child", "parent", "m")
    val r1 = EtlPipeline.run(spark, edges1, "m", store, bm)
    r1.extracted shouldBe 3
    val edges2 = edges1.union(
      Seq((12L, 1L, 200L), (13L, 12L, 220L)).toDF("child", "parent", "m"))
    val r2 = EtlPipeline.run(spark, edges2, "m", store, bm)
    r2.extracted shouldBe 2
    val want = graft.operators.Hierarchy.closure(edges2.select($"child", $"parent"))
      .as[(Long, Long, Int)].collect().toSet
    store.scan(spark).select($"ancestor", $"descendant", $"depth")
      .as[(Long, Long, Int)].collect().toSet shouldBe want
    // third run over an unchanged source: nothing extracted or pushed
    val r3 = EtlPipeline.run(spark, edges2, "m", store, bm)
    r3.extracted shouldBe 0
    r3.pushed shouldBe 0
  }
}
