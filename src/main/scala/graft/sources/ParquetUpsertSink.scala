package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed batch-upsert sink over partitioned parquet — the Spark
  * re-expression of the reference's destination push (MoDevETL
  * `push_to_es.py`: bulk-push batches keyed by record id, newest
  * revision wins on collision).
  *
  * Layout: the table is partitioned by `bucket = pmod(hash(keys), n)`.
  * A merge then only touches the buckets that contain updated keys:
  * existing rows are read WITH partition pruning on those buckets,
  * merged latest-wins against the updates, and written back in
  * dynamic-partition-overwrite mode so untouched buckets' files are
  * never rewritten. At 100 TB that makes merge cost proportional to
  * the update footprint, not the table size.
  *
  * Consistency note: Spark cannot atomically read-and-overwrite the
  * same files, so the merged buckets are materialized (checkpoint)
  * before the overwrite commits. A production deployment would stage
  * to a new directory or use a transactional table format; the merge
  * mechanics (bucketing, pruning, latest-wins) are identical.
  *
  * SINGLE WRITER per table: a merge is a non-atomic read-modify-write
  * of the touched buckets, so concurrent upserts into the same path
  * can lose updates. Structured Streaming satisfies this per query
  * (foreachBatch batches are serial) — the streaming writers
  * ([[graft.streaming.StreamOps.streamingUpsertIngest]],
  * streamingNearDedupIngest, [[EtlPipeline.runStream]]) are safe as
  * ONE query per store; do not point two queries at one table.
  */
object ParquetUpsertSink {

  private val bucketCol = "__bucket"

  /** Merge `updates` into the keyed table at `path`, newest `versionCol`
    * winning per key (ties broken by the remaining sort stability of
    * a single row_number pass — callers should make versions unique
    * per key, e.g. a revision counter or event timestamp).
    *
    * The bucket count is a TABLE property, not a call property: the
    * first write records `numBuckets` in a `_graft_buckets` sidecar
    * and every later merge uses the stored value — a mismatched
    * caller value would route existing keys to different buckets,
    * skip them during pruning, and silently duplicate keys.
    */
  def upsert(updates: DataFrame, path: String, keyCols: Seq[String],
      versionCol: String, numBuckets: Int = 64): Unit = {
    val spark = updates.sparkSession
    val exists = tableExists(spark, path)
    val buckets = if (exists) readBucketCount(spark, path) else numBuckets
    val keyed = withBucket(updates, keyCols, buckets)
    val merged =
      if (!exists) dedupLatest(keyed, keyCols, versionCol)
      else {
        val touched = keyed.select(col(bucketCol)).distinct()
          .collect().map(_.getInt(0))
        val existing = spark.read.parquet(path)
          .where(col(bucketCol).isin(touched.toSeq: _*)) // partition-pruned scan
        dedupLatest(existing.unionByName(keyed), keyCols, versionCol)
      }
    // materialize before overwrite: the merge reads the files the
    // dynamic overwrite is about to replace
    merged.localCheckpoint()
      .write
      .partitionBy(bucketCol)
      .option("partitionOverwriteMode", "dynamic")
      .mode(SaveMode.Overwrite)
      .parquet(path)
    if (!exists) writeBucketCount(spark, path, buckets)
  }

  private def metaPath(path: String) = new org.apache.hadoop.fs.Path(path, "_graft_buckets")

  private def writeBucketCount(spark: SparkSession, path: String, n: Int): Unit = {
    val fs = metaPath(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(metaPath(path), true)
    try out.write(n.toString.getBytes("UTF-8")) finally out.close()
  }

  private def readBucketCount(spark: SparkSession, path: String): Int = {
    val p = metaPath(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p),
      s"$path exists but has no _graft_buckets sidecar — not an upsert-sink table")
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toInt
    finally in.close()
  }

  /** Read the logical table back (bucket column dropped). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).drop(bucketCol)

  private def withBucket(df: DataFrame, keyCols: Seq[String], n: Int): DataFrame =
    df.withColumn(bucketCol, pmod(hash(keyCols.map(col): _*), lit(n)).cast("int"))

  /** One window shuffle on the key: newest version per key survives. */
  private def dedupLatest(df: DataFrame, keyCols: Seq[String], versionCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(versionCol).desc)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  private[graft] def tableExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).nonEmpty
  }
}
