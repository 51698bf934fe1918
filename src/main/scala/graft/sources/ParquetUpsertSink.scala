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
  */
object ParquetUpsertSink {

  private val bucketCol = "__bucket"

  /** Merge `updates` into the keyed table at `path`, newest `versionCol`
    * winning per key (ties broken by the remaining sort stability of
    * a single row_number pass — callers should make versions unique
    * per key, e.g. a revision counter or event timestamp).
    */
  def upsert(updates: DataFrame, path: String, keyCols: Seq[String],
      versionCol: String, numBuckets: Int = 64): Unit = {
    val spark = updates.sparkSession
    val keyed = withBucket(updates, keyCols, numBuckets)
    val merged =
      if (!tableExists(spark, path)) dedupLatest(keyed, keyCols, versionCol)
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

  private def tableExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).nonEmpty
  }
}
