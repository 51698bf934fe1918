package graft

import graft.operators.Ann
import graft.sources.ModelStore

/** Persisted ANN model artifacts: save→load must reproduce the model
  * BIT-EXACTLY (doubles round-trip parquet unchanged), so search
  * against a loaded model is bit-identical to the in-session model —
  * the deploy/restart contract of a trained index.
  */
class ModelStoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir() = java.nio.file.Files.createTempDirectory("graft-model").toString

  private lazy val embeddings = Tables.embeddings(spark, sfDir)

  test("IVF centroids: save→load bit-exact; loaded-model search identical") {
    val cents = Ann.storedCentroids(spark, sfDir, 16, 2)
    val path = tmpDir() + "/centroids"
    ModelStore.saveCentroids(spark, path, cents)
    val loaded = ModelStore.loadCentroids(spark, path)
    loaded.length shouldBe cents.length
    loaded.zip(cents).foreach { case (l, c) => l.toSeq shouldBe c.toSeq }
    val orig = Ann.ivfSearchOn(embeddings, cents, nprobe = 4, k = 5)
      .as[(Long, Long, Int, Double)].collect().toSet
    val viaDisk = Ann.ivfSearchOn(embeddings, loaded, nprobe = 4, k = 5)
      .as[(Long, Long, Int, Double)].collect().toSet
    viaDisk shouldBe orig
  }

  test("PQ codebooks: save→load bit-exact; loaded-model IVF-PQ search identical") {
    val cents = Ann.storedCentroids(spark, sfDir, 16, 2)
    val cbs = Ann.storedCodebooks(spark, sfDir, 8, 16, 2)
    val base = tmpDir()
    ModelStore.saveCodebooks(spark, base + "/codebooks", cbs)
    ModelStore.saveCentroids(spark, base + "/centroids", cents)
    val loaded = ModelStore.loadCodebooks(spark, base + "/codebooks")
    loaded.length shouldBe cbs.length
    loaded.zip(cbs).foreach { case (lj, cj) =>
      lj.length shouldBe cj.length
      lj.zip(cj).foreach { case (l, c) => l.toSeq shouldBe c.toSeq }
    }
    val orig = Ann.ivfPqSearchOn(embeddings, cents, cbs,
        nprobe = 4, k = 5, shortlist = 20)
      .as[(Long, Long, Int, Double)].collect().toSet
    val viaDisk = Ann.ivfPqSearchOn(embeddings,
        ModelStore.loadCentroids(spark, base + "/centroids"), loaded,
        nprobe = 4, k = 5, shortlist = 20)
      .as[(Long, Long, Int, Double)].collect().toSet
    viaDisk shouldBe orig
  }

  test("PCA basis: ML-native save→load, projection identical") {
    val model = Ann.pcaFit(embeddings, 8)
    val path = tmpDir() + "/pca"
    ModelStore.savePca(model, path)
    val loaded = ModelStore.loadPca(path)
    val orig = Ann.pcaProjectOn(embeddings, model)
      .select($"vec_id", $"proj").as[(Long, Seq[Double])].collect().toMap
    val viaDisk = Ann.pcaProjectOn(embeddings, loaded)
      .select($"vec_id", $"proj").as[(Long, Seq[Double])].collect().toMap
    viaDisk.keySet shouldBe orig.keySet
    viaDisk.foreach { case (id, p) => p shouldBe orig(id) }
  }

  test("load rejects a malformed model table loudly") {
    val path = tmpDir() + "/bad"
    // non-contiguous centroid ids → a silent reorder would mis-route
    // every probe; must fail instead
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("i", IntegerType, nullable = false),
      StructField("v", ArrayType(DoubleType, containsNull = false), nullable = false)))
    spark.createDataFrame(
      java.util.Arrays.asList(Row(0, Seq(1.0)), Row(2, Seq(2.0))), schema)
      .write.parquet(path)
    an[IllegalArgumentException] should be thrownBy
      ModelStore.loadCentroids(spark, path)
  }
}
