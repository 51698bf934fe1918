package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, StructField, StructType}

/** Persistence seam for the trained ANN model artifacts — IVF
  * centroids, PQ codebooks, the PCA basis (reference: MoDevETL keeps
  * its derived state in the destination index; a deployed ANN index
  * likewise trains once and every later job LOADS the model instead
  * of retraining).
  *
  * In-session the models live in driver memos
  * ([[graft.operators.Ann.storedCentroids]] etc.); across sessions a
  * deployment needs durable save/load. Format: small parquet tables
  * (one row per centroid / codebook entry) next to the data —
  * readable by anything, schema-checked on load, and doubles
  * round-trip parquet BIT-EXACTLY, so a search against a loaded model
  * is bit-identical to one against the in-session model (spec-pinned:
  * save→load→ivfSearchAssigned / ivfPqSearchOn reproduce the
  * original results exactly).
  *
  * The tables are model-parameter-sized (nc×dim / m×ksub×dsub
  * doubles) — they ride to executors as broadcast literals after
  * load, so the driver-side collect here is the intended
  * model-through-driver path, not a data collect.
  *
  * The PCA basis is a Spark ML [[org.apache.spark.ml.feature.PCAModel]]
  * and uses ML's own writer/loader (also parquet under the hood);
  * [[savePca]]/[[loadPca]] are the thin seam so callers stay inside
  * one store API.
  */
object ModelStore {

  private val centroidSchema = StructType(Seq(
    StructField("i", IntegerType, nullable = false),
    StructField("v", ArrayType(DoubleType, containsNull = false), nullable = false)))

  private val codebookSchema = StructType(Seq(
    StructField("j", IntegerType, nullable = false),
    StructField("c", IntegerType, nullable = false),
    StructField("v", ArrayType(DoubleType, containsNull = false), nullable = false)))

  /** IVF coarse-quantizer centroids as (i, v) rows. Overwrites. */
  def saveCentroids(spark: SparkSession, path: String,
      cents: Array[Array[Double]]): Unit = {
    val rows = cents.zipWithIndex.map { case (v, i) => Row(i, v.toSeq) }
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), centroidSchema)
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadCentroids(spark: SparkSession, path: String): Array[Array[Double]] = {
    val rows = spark.read.schema(centroidSchema).parquet(path)
      .collect().sortBy(_.getInt(0))
    require(rows.nonEmpty, s"$path: empty centroid model")
    require(rows.map(_.getInt(0)).toSeq == rows.indices.toSeq,
      s"$path: centroid ids are not contiguous 0..${rows.length - 1}")
    rows.map(_.getSeq[Double](1).toArray)
  }

  /** PQ codebooks as (subspace j, code c, v) rows. Overwrites. */
  def saveCodebooks(spark: SparkSession, path: String,
      cbs: Array[Array[Array[Double]]]): Unit = {
    val rows = for {
      (cb, j) <- cbs.zipWithIndex
      (v, c) <- cb.zipWithIndex
    } yield Row(j, c, v.toSeq)
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), codebookSchema)
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadCodebooks(spark: SparkSession, path: String): Array[Array[Array[Double]]] = {
    val rows = spark.read.schema(codebookSchema).parquet(path).collect()
    require(rows.nonEmpty, s"$path: empty codebook model")
    val byJ = rows.groupBy(_.getInt(0))
    val m = byJ.keys.max + 1
    require(byJ.keySet == (0 until m).toSet,
      s"$path: subspace ids are not contiguous 0..${m - 1}")
    val ksub = byJ(0).length
    Array.tabulate(m) { j =>
      val cb = byJ(j).sortBy(_.getInt(1))
      require(cb.map(_.getInt(1)).toSeq == (0 until ksub).toSeq,
        s"$path: subspace $j codes are not contiguous 0..${ksub - 1}")
      cb.map(_.getSeq[Double](2).toArray)
    }
  }

  private val mergesSchema = StructType(Seq(
    StructField("rank", IntegerType, nullable = false),
    StructField("left", org.apache.spark.sql.types.StringType, nullable = false),
    StructField("right", org.apache.spark.sql.types.StringType, nullable = false)))

  /** Trained BPE merges as (rank, left, right) rows — rank IS the
    * greedy-apply priority, so order round-trips exactly and
    * `bpe_tokenize` under a loaded model is bit-identical to the
    * in-session model (strings round-trip parquet exactly; the spec
    * pins the full token arrays equal). Overwrites.
    */
  def saveMerges(spark: SparkSession, path: String,
      merges: Seq[(String, String)]): Unit = {
    val rows = merges.zipWithIndex.map { case ((l, r), i) => Row(i, l, r) }
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), mergesSchema)
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadMerges(spark: SparkSession, path: String): Seq[(String, String)] = {
    val rows = spark.read.schema(mergesSchema).parquet(path)
      .collect().sortBy(_.getInt(0))
    require(rows.nonEmpty, s"$path: empty merges model")
    require(rows.map(_.getInt(0)).toSeq == rows.indices.toSeq,
      s"$path: merge ranks are not contiguous 0..${rows.length - 1}")
    rows.map(r => (r.getString(1), r.getString(2))).toSeq
  }

  /** PCA basis via Spark ML's native persistence (parquet + metadata
    * dir). Overwrites.
    */
  def savePca(model: org.apache.spark.ml.feature.PCAModel, path: String): Unit =
    model.write.overwrite().save(path)

  def loadPca(path: String): org.apache.spark.ml.feature.PCAModel =
    org.apache.spark.ml.feature.PCAModel.load(path)
}
