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
  *
  * SCHEMA EVOLUTION (additive): a push may carry columns the stored
  * table lacks (they appear, null for rows that never carried them)
  * or omit stored columns (the pushed rows hold null there — an
  * upsert replaces the WHOLE document per key, ES bulk semantics, so
  * an omitted field is an absent field, not "keep the old value").
  * Untouched buckets keep their old on-disk schema; reads merge
  * per-file schemas (see [[readRaw]]). A RENAME is therefore two
  * columns, not detected — deliberate: silently matching renamed
  * columns is how keyed stores corrupt.
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
      versionCol: String, numBuckets: Int = 64): Unit =
    withWriteLock(updates.sparkSession, path) {
      doUpsert(updates, path, keyCols, versionCol, numBuckets)
    }

  private def doUpsert(updates: DataFrame, path: String, keyCols: Seq[String],
      versionCol: String, numBuckets: Int): Unit = {
    val spark = updates.sparkSession
    val exists = tableExists(spark, path)
    val buckets = if (exists) readBucketCount(spark, path) else numBuckets
    val keyed = withBucket(updates, keyCols, buckets)
    val merged =
      if (!exists) dedupLatest(keyed, keyCols, versionCol)
      else {
        val touched = keyed.select(col(bucketCol)).distinct()
          .collect().map(_.getInt(0))
        val existing = readRaw(spark, path)
          .where(col(bucketCol).isin(touched.toSeq: _*)) // partition-pruned scan
        // additive schema evolution: either side may carry columns the
        // other lacks (see the class doc) — absent cells become null
        dedupLatest(existing.unionByName(keyed, allowMissingColumns = true),
          keyCols, versionCol)
      }
    // materialize before overwrite: the merge reads the files the
    // dynamic overwrite is about to replace
    writeBuckets(merged.localCheckpoint(), path)
    if (!exists) writeBucketCount(spark, path, buckets)
  }

  /** Bucket-partitioned rewrite, COMPACTED: without the clustering
    * repartition, every shuffle task holding rows of a bucket writes
    * its own small file into that bucket's dir — up to
    * shuffle.partitions files PER BUCKET PER MERGE, the classic
    * small-files failure mode of a frequently-merged 100 TB store
    * (metadata pressure + tiny-scan overhead on every read). Routing
    * all rows of a bucket to one task first costs one extra exchange
    * of the (update-footprint-sized) rewrite set and makes every
    * rewritten bucket exactly ONE parquet file, so file count stays
    * equal to bucket count forever — merges never degrade the layout.
    *
    * Sizing: one file per bucket makes `numBuckets` the parallelism
    * AND file-size knob — pick it so a bucket is ~1 GB at the table's
    * target size (parquet files are splittable, so READS of a large
    * bucket still parallelize across row groups; it is the
    * single-task WRITE of a hot bucket that numBuckets bounds).
    */
  private def writeBuckets(df: DataFrame, path: String): Unit =
    df.repartition(col(bucketCol))
      .write
      .partitionBy(bucketCol)
      .option("partitionOverwriteMode", "dynamic")
      .mode(SaveMode.Overwrite)
      .parquet(path)

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
    readRaw(spark, path).drop(bucketCol)

  /** Every physical read of the table merges per-file schemas: after
    * an additive schema evolution, only the buckets a later merge
    * touched carry the new column on disk — a single-footer read
    * would pick one file's schema and silently DROP the column from
    * (or fail on) the others. mergeSchema reads all footers (cost:
    * numBuckets small footers, not data) and nulls absent cells,
    * which is exactly the evolution contract.
    */
  private def readRaw(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** Full-table synchronization — the reference's RE-INDEX path (push
    * everything, delete stale): make the keyed table at `path` equal
    * `snapshot` exactly, rewriting only buckets whose content differs.
    *
    * Change detection never compares rows across the table: each side
    * collapses to a numBuckets-row fingerprint (order-independent
    * bit_xor of a 64-bit (keys, version) row hash, plus a row count —
    * xor instead of sum so ANSI overflow cannot strike, and keys are
    * unique per bucket on both sides so xor self-cancellation cannot)
    * via one map-side-combinable aggregate scan per side; a tiny
    * full-outer join on bucket picks the drift set. An unchanged
    * 100 TB table re-pushed costs two aggregate scans and writes
    * nothing. Buckets the sync EMPTIES are deleted explicitly —
    * dynamic partition overwrite never touches a partition the new
    * data lacks.
    *
    * `versionCol` resolves duplicates WITHIN the snapshot
    * (latest-wins); the snapshot is otherwise authoritative — an older
    * snapshot version replaces a newer stored row, because a reindex's
    * contract is "the table now equals the source". Change detection
    * is keyed on (keys, version): a payload edit without a version
    * bump is invisible, the same contract upsert's latest-wins merge
    * already imposes. Same single-writer rule as [[upsert]].
    */
  def sync(snapshot: DataFrame, path: String, keyCols: Seq[String],
      versionCol: String, numBuckets: Int = 64): Unit =
    withWriteLock(snapshot.sparkSession, path) {
      doSync(snapshot, path, keyCols, versionCol, numBuckets)
    }

  private def doSync(snapshot: DataFrame, path: String, keyCols: Seq[String],
      versionCol: String, numBuckets: Int): Unit = {
    val spark = snapshot.sparkSession
    if (!tableExists(spark, path)) {
      doUpsert(snapshot, path, keyCols, versionCol, numBuckets)
      return
    }
    val buckets = readBucketCount(spark, path)
    val desired = dedupLatest(withBucket(snapshot, keyCols, buckets),
      keyCols, versionCol).localCheckpoint() // fingerprint + rewrite both read it
    def fingerprint(df: DataFrame, tag: String) = df
      .withColumn("__h", xxhash64((keyCols :+ versionCol).map(col): _*))
      .groupBy(col(bucketCol))
      .agg(bit_xor(col("__h")).as(s"fp_$tag"), count(lit(1)).as(s"n_$tag"))
    val fpE = fingerprint(readRaw(spark, path), "e")
    val fpD = fingerprint(desired, "d")
    val drift = fpE.join(fpD, Seq(bucketCol), "full_outer")
      .where(!(col("fp_e") <=> col("fp_d")) || !(col("n_e") <=> col("n_d")))
      .select(col(bucketCol), col("n_d").isNotNull.as("has_rows"))
      .collect()
    if (drift.nonEmpty) {
      val changed = drift.map(_.getInt(0))
      val rewrite = desired.where(col(bucketCol).isin(changed.toSeq: _*))
      writeBuckets(rewrite.localCheckpoint(), path)
      // buckets the snapshot no longer populates: delete their dirs
      val root = new org.apache.hadoop.fs.Path(path)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      drift.filter(!_.getBoolean(1)).foreach { r =>
        fs.delete(new org.apache.hadoop.fs.Path(root, s"$bucketCol=${r.getInt(0)}"), true)
      }
    }
  }

  /** Bulk keyed DELETE, bucket-pruned: only buckets containing a
    * requested key are read, anti-joined, and rewritten — delete cost
    * is proportional to the delete footprint, never the table. `keys`
    * carries the key columns plus `versionCol`; a stored row is
    * removed only when its version is <= the delete's version (the
    * latest-wins mirror of [[upsert]] — a delete never clobbers a
    * newer write, and redelivering the same delete batch is a no-op).
    * Buckets the delete EMPTIES have their partition dirs removed
    * explicitly, same as [[sync]] (dynamic overwrite cannot drop a
    * partition the rewrite set lacks).
    *
    * No tombstone memory: after a physical delete, a LATER redelivery
    * of an upsert OLDER than the delete would reinstate the row. The
    * sink's single-writer serial contract (see the class doc) already
    * forbids that interleaving — within one serial writer, each
    * batch's deletes are recomputed from current state, so redelivery
    * of a whole batch converges.
    */
  def delete(keys: DataFrame, path: String, keyCols: Seq[String],
      versionCol: String): Unit =
    withWriteLock(keys.sparkSession, path) {
      doDelete(keys, path, keyCols, versionCol)
    }

  private def doDelete(keys: DataFrame, path: String, keyCols: Seq[String],
      versionCol: String): Unit = {
    val spark = keys.sparkSession
    if (!tableExists(spark, path)) return
    val buckets = readBucketCount(spark, path)
    val del = dedupLatest(
        withBucket(keys.select((keyCols :+ versionCol).map(col): _*),
          keyCols, buckets),
        keyCols, versionCol)
      .withColumnRenamed(versionCol, "__delv")
      .localCheckpoint() // touched-bucket probe + anti-join both read it
    val touched = del.select(col(bucketCol)).distinct().collect().map(_.getInt(0))
    if (touched.isEmpty) return
    val existing = readRaw(spark, path)
      .where(col(bucketCol).isin(touched.toSeq: _*)) // partition-pruned scan
    val cond = keyCols.map(k => existing(k) === del(k)).reduce(_ && _) &&
      existing(versionCol) <= del("__delv")
    val remaining = existing.join(del, cond, "left_anti").localCheckpoint()
    val still = remaining.select(col(bucketCol)).distinct()
      .collect().map(_.getInt(0)).toSet
    if (still.nonEmpty) writeBuckets(remaining, path)
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    touched.filterNot(still).foreach { b =>
      fs.delete(new org.apache.hadoop.fs.Path(root, s"$bucketCol=$b"), true)
    }
    // a delete that empties the WHOLE table drops the bucket sidecar
    // too (a fresh first write may pick a new bucket count). NEVER
    // delete the table ROOT here: we are inside withWriteLock, and
    // removing the root would remove our own held _graft_lock — a
    // concurrent writer could then acquire a "fresh" lock that OUR
    // finally-delete would destroy, reopening the multi-writer
    // interleave the lock exists to prevent. tableExists keys on
    // bucket dirs, so a root holding only sidecars reads as "no
    // table".
    if (!fs.listStatus(root).exists(_.getPath.getName.startsWith(s"$bucketCol=")))
      fs.delete(metaPath(path), false)
  }

  private val lockName = "_graft_lock"

  /** Enforce the sink's SINGLE-WRITER contract instead of just
    * documenting it: every mutation ([[upsert]]/[[sync]]/[[delete]])
    * runs under an exclusive lock sidecar, acquired by the atomic
    * create-if-absent of `_graft_lock` at the table root (HDFS/local
    * `create(overwrite=false)` — one filesystem RPC, no read-check
    * race). A second concurrent writer fails LOUDLY at acquisition —
    * before touching a byte — rather than interleaving dynamic
    * partition-overwrite bucket rewrites with the first (the silent-
    * corruption mode dynamic overwrite permits; ES gets this for free
    * from per-doc versioning, a shared-filesystem store has to bring
    * its own fence). The underscore prefix keeps Spark's parquet
    * reader from seeing the sidecar as data.
    *
    * Crash behavior: a writer that dies mid-mutation leaves its lock
    * behind, and every later writer fails with the holder's identity
    * until an operator confirms the holder is dead and calls
    * [[forceUnlock]] (or removes the file). Deliberately NOT a TTL —
    * auto-expiring a lock under a live-but-slow writer would
    * re-create exactly the two-writer interleave the lock exists to
    * prevent.
    */
  private def withWriteLock[A](spark: SparkSession, path: String)(body: => A): A = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) fs.mkdirs(root)
    val lock = new org.apache.hadoop.fs.Path(root, lockName)
    val holder = s"pid=${ProcessHandle.current().pid()} " +
      s"host=${java.net.InetAddress.getLocalHost.getHostName} " +
      s"ts=${java.time.Instant.now()}"
    val out =
      try fs.create(lock, false)
      catch {
        case _: java.io.IOException =>
          val heldBy =
            try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(
              fs.open(lock)), java.nio.charset.StandardCharsets.UTF_8)
            catch { case _: Exception => "<unreadable>" }
          sys.error(s"$path is locked by another writer [$heldBy]. " +
            "The parquet upsert sink is single-writer: concurrent merges " +
            "would interleave bucket rewrites and corrupt the store. If " +
            s"the holder crashed, remove $path/$lockName " +
            "(ParquetUpsertSink.forceUnlock) and rerun.")
      }
    // from here the lock EXISTS: everything — including the tiny
    // holder-info write — runs under the finally-delete, so a
    // transient failure writing the holder string cannot strand a
    // lock that blocks every future writer until manual forceUnlock
    try {
      try out.write(holder.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      body
    } finally fs.delete(lock, false)
  }

  /** Operator override for a crashed writer's abandoned lock. Returns
    * true when a lock file was actually removed.
    */
  def forceUnlock(spark: SparkSession, path: String): Boolean = {
    val lock = new org.apache.hadoop.fs.Path(path, lockName)
    val fs = lock.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(lock, false)
  }

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
    // only DATA makes a table: the _graft_lock/_graft_buckets sidecars
    // (and Spark's _SUCCESS etc.) don't — withWriteLock creates the
    // root dir + lock before a first write, and that must still read
    // as "no table yet"
    fs.exists(p) && fs.listStatus(p).exists(_.getPath.getName.startsWith(s"$bucketCol="))
  }
}
