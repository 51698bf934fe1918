package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** The object-store primitive a conditional manifest commit needs —
  * the common core of S3 conditional writes (`If-Match` /
  * `If-None-Match`), GCS generation preconditions and ABFS ETags: an
  * opaque per-object version tag, a put that succeeds only when the
  * live tag still equals the one the caller observed, and the
  * matching conditional delete. Everything here is about ONE small
  * object (the sink's manifest pointer); data files are immutable
  * generation directories and never need conditions.
  */
trait ConditionalObjectStore {

  /** The current version tag of the object at `key`, or None if the
    * object does not exist.
    */
  def etag(conf: Configuration, key: String): Option[String]

  /** Write `body` at `key` iff the object's live tag still equals
    * `ifMatch` (None = the object must not exist — `If-None-Match:
    * *`). Returns the NEW tag on success, None on precondition
    * failure. Atomic with respect to other putIf/deleteIf calls on
    * the same store.
    */
  def putIf(conf: Configuration, key: String, body: Array[Byte],
      ifMatch: Option[String]): Option[String]

  /** Delete the object at `key` iff its live tag equals `ifMatch`
    * (None = already absent, trivially true). False on precondition
    * failure.
    */
  def deleteIf(conf: Configuration, key: String, ifMatch: Option[String]): Boolean
}

/** [[ParquetUpsertSink.CommitIO]] for object stores: the manifest
  * swap is a CONDITIONAL PUT anchored at mutation start. `begin`
  * (called by the sink when it resolves the live manifest, under the
  * write lock) records the manifest object's current tag; `publish`/
  * `retract` then condition on exactly that tag — so a manifest that
  * changed between a mutation's read and its commit (a second writer
  * that slipped past the lock: an expired lease, a partitioned
  * operator force-unlocking a live holder, any split-brain) fails the
  * LOSING writer loudly with nothing published, and the winning
  * writer's manifest stays exactly as it committed it. This is the
  * lost-update protection overwrite-rename cannot give on S3-class
  * stores (see [[ParquetUpsertSink.RenameCommitIO]]'s atomicity
  * note): rename-based publish makes the LAST writer win, silently
  * discarding the first writer's buckets from the manifest.
  *
  * Two companion guarantees make the loser's failure actually
  * harmless (r16 review fixes): the precondition is observed BEFORE
  * the mutation reads the manifest (a swap inside the window can only
  * cause a spurious loud failure, never a stale publish under a fresh
  * etag), and generation ids are unique per attempt
  * ([[ParquetUpsertSink.nextGen]]), so the loser's data write can
  * never land in — or dynamically overwrite — the winner's committed
  * generation directory.
  *
  * One instance serves many tables: preconditions are tracked per
  * manifest key. A publish without a begin is a wiring bug and
  * throws.
  */
class ConditionalPutCommitIO(store: ConditionalObjectStore)
    extends ParquetUpsertSink.CommitIO {

  private val observed =
    new java.util.concurrent.ConcurrentHashMap[String, Option[String]]()

  override def begin(conf: Configuration, dst: Path): Unit =
    observed.put(dst.toString, store.etag(conf, dst.toString))

  private def precondition(key: String): Option[String] = {
    val pre = observed.remove(key)
    require(pre != null,
      s"ConditionalPutCommitIO: commit of $key without a begin() — the " +
        "precondition must be observed when the mutation resolves the live " +
        "manifest, not invented at publish time")
    pre
  }

  private def lost(key: String, what: String): Nothing =
    throw new java.util.ConcurrentModificationException(
      s"$what of $key lost a commit race: the manifest changed after this " +
        "mutation read it — a second writer got past the single-writer " +
        "lock (expired lease or forced unlock under a live holder). " +
        "Nothing was published; the winning writer's manifest is intact. " +
        "This mutation's generation directories are invisible orphans — " +
        "re-run the mutation (it will re-read current state); vacuum " +
        "reclaims the orphans.")

  override def publish(conf: Configuration, dst: Path, body: Array[Byte]): Unit = {
    val key = dst.toString
    if (store.putIf(conf, key, body, precondition(key)).isEmpty)
      lost(key, "manifest publish")
  }

  override def retract(conf: Configuration, dst: Path): Unit = {
    val key = dst.toString
    if (!store.deleteIf(conf, key, precondition(key)))
      lost(key, "manifest retract")
  }
}

/** In-process [[ConditionalObjectStore]] with S3 conditional-write
  * semantics over the local/Hadoop filesystem: objects live at their
  * Hadoop path (so every reader — `readManifest`, plain `fs.open` —
  * sees them unchanged), and version tags live in a JVM-wide
  * registry. `putIf`/`deleteIf` are atomic (one lock per store, like
  * a region's strong-consistency frontend) and REJECT ON TAG
  * MISMATCH — the exact reject-on-etag behavior S3 `If-Match` gives.
  *
  * Scope: the tag registry is process-local, so conditional
  * protection spans writers in ONE JVM (exactly what the local[n]
  * harness and the spec's split-brain replay need). A real S3/GCS/
  * ABFS deployment implements the same three methods against the
  * service's conditional headers; nothing else in the sink changes.
  * An object written OUTSIDE the store (e.g. a pre-existing manifest
  * from the rename era) is adopted on first sight with a
  * content-derived tag, so switching a live table to conditional
  * commits needs no migration.
  */
object LocalEtagStore extends ConditionalObjectStore {

  private val tags = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val gen = new java.util.concurrent.atomic.AtomicLong()

  override def etag(conf: Configuration, key: String): Option[String] =
    this.synchronized {
      val p = new Path(key)
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) { tags.remove(key); None }
      else Some(tags.computeIfAbsent(key, _ => {
        val in = fs.open(p)
        val bytes =
          try org.apache.hadoop.io.IOUtils.readFullyToByteArray(in)
          finally in.close()
        "adopted-" + java.util.Base64.getEncoder.encodeToString(
          java.security.MessageDigest.getInstance("MD5").digest(bytes))
      }))
    }

  override def putIf(conf: Configuration, key: String, body: Array[Byte],
      ifMatch: Option[String]): Option[String] = this.synchronized {
    if (etag(conf, key) != ifMatch) None
    else {
      val p = new Path(key)
      val fs = p.getFileSystem(conf)
      val tmp = new Path(p.getParent, s".${p.getName}.condput.tmp")
      val out = fs.create(tmp, true)
      try out.write(body) finally out.close()
      val fc = org.apache.hadoop.fs.FileContext
        .getFileContext(fs.makeQualified(p.getParent).toUri, conf)
      fc.rename(fs.makeQualified(tmp), fs.makeQualified(p),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      val t = s"g${gen.incrementAndGet()}"
      tags.put(key, t)
      Some(t)
    }
  }

  override def deleteIf(conf: Configuration, key: String,
      ifMatch: Option[String]): Boolean = this.synchronized {
    if (etag(conf, key) != ifMatch) false
    else {
      val p = new Path(key)
      p.getFileSystem(conf).delete(p, false)
      tags.remove(key)
      true
    }
  }
}
