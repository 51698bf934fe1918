package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions.{col, concat_ws, to_json, struct}
import org.apache.spark.sql.types.StructType

/** [[DocumentStore]] speaking the REAL Elasticsearch 7/8 REST wire
  * format — the reference's push_to_es.py talks to an actual ES
  * cluster, and this store lets a deployment point the whole pipeline
  * (EtlPipeline, sync/reindex, mappings) at one with only connection
  * config. Where [[HttpDocumentStore]] carries the engine's OWN
  * reduced protocol (still the right seam for non-ES HTTP stores and
  * the DSv2/streaming connector), this class emits and consumes ES's
  * actual request/response shapes:
  *
  *  - **Bulk upsert** — `POST /_bulk` (`Content-Type:
  *    application/x-ndjson`) with action-and-metadata lines:
  *    `{"index":{"_index":i,"_id":k,"version":v,"version_type":
  *    "external_gte"}}` + source line per doc. External versioning IS
  *    the engine's latest-wins contract: the server keeps the highest
  *    version per key, losers come back as per-item 409s — expected
  *    outcomes of redelivery, not errors. Any other non-2xx item
  *    status fails the task loudly (a partial bulk must never drop
  *    documents silently).
  *  - **Bulk delete** — same `_bulk` body with `delete` actions under
  *    the same external versioning: a stored doc is removed only when
  *    its version <= the delete's, redelivery idempotent. (Real ES
  *    remembers deleted-doc versions for `index.gc_deletes` — 60 s by
  *    default; a deployment relying on very-late stale upserts being
  *    rejected raises that setting, as the reference deployment did.)
  *  - **Sliced scroll scan** — `POST /{index}/_search?scroll=1m` with
  *    `{"slice":{"id":i,"max":n},"size":pageSize,"sort":["_doc"],
  *    "query":...}`, then `POST /_search/scroll` per page, `DELETE
  *    /_search/scroll` at exhaustion. Each Spark partition walks its
  *    own slice's cursor chain executor-side — the driver never sees
  *    a document, and the optional watermark bracket becomes a server-
  *    side `range` query inside the scroll.
  *  - **Zero-downtime reindex** — [[sync]] bulks the snapshot into a
  *    fresh physical index `{alias}-{epoch}` and cuts over with ONE
  *    atomic `POST /_aliases` `{"actions":[{"remove":...},{"add":...}]}`
  *    call: readers serve the old index until the swap, a crash before
  *    the swap leaves the live index untouched (the abandoned staging
  *    index is inert), and rerunning the sync is the recovery.
  *  - **Mappings** — `GET/PUT /{index}/_mapping`; [[ensureMapping]]
  *    is the reference's idempotent ensure-index step.
  *  - **Existence** — `HEAD /{index}` (404 = absent), matching how ES
  *    reports missing indices/aliases.
  *
  * Addressing model (the push_to_es.py deployment pattern): `alias`
  * is the STABLE name readers and writers use; physical indices are
  * `{alias}-{epoch}` generations behind it. The first push creates
  * generation 1 and the alias; [[sync]] rolls the generation. Keys:
  * the document `_id` is the `keyCols` values joined with `":"` (ES
  * ids are strings); `versionCol` must be a non-negative long (ES
  * external versions are unsigned).
  *
  * Reference: MoDevETL push_to_es.py (bulk index with external
  * versioning, ensure-mapping, batch push); extract.py (scroll read).
  */
final case class EsDocumentStore(base: String, alias: String,
    keyCols: Seq[String], versionCol: String, schema: StructType,
    slices: Int = 8, pageSize: Int = 500, batchSize: Int = 500)
    extends DocumentStore {
  import EsDocumentStore._

  override def scan(spark: SparkSession): DataFrame =
    scanSince(spark, None, None)

  /** Scan with an optional server-side watermark bracket on `wmField`
    * (since < wm <= until) — the range-query-inside-scroll that keeps
    * an incremental extract's filter on the server.
    */
  def scanSince(spark: SparkSession, wmField: Option[String],
      since: Option[Long], until: Option[Long] = None): DataFrame = {
    val (b, a, n, ps) = (base, alias, slices, pageSize)
    val (wf, lo, hi) = (wmField, since, until)
    val lines = spark.createDataset(
      spark.sparkContext.parallelize(0 until n, n)
        .flatMap(slice => scrollSlice(b, a, slice, n, ps, wf, lo, hi)))(
      Encoders.STRING)
    spark.read.schema(schema).json(lines)
  }

  override def push(updates: DataFrame): Unit = {
    ensureIndex()
    bulkTo(alias, "index", updates)
  }

  override def delete(keys: DataFrame): Unit = {
    ensureIndex()
    val (b, bs, kc, vc) = (base, batchSize, keyCols, versionCol)
    val target = alias
    keys
      .select(concat_ws(":", kc.map(c => col(c).cast("string")): _*).as("__id"),
        col(vc).cast("long").as("__v"))
      .foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
        it.grouped(bs).foreach { chunk =>
          val body = chunk.map { r =>
            actionLine("delete", target, r.getString(0), r.getLong(1))
          }.mkString("", "\n", "\n")
          checkBulkResponse(postBulk(b, body))
        }
      }
  }

  override def sync(snapshot: DataFrame): Unit = {
    val staging = s"$alias-${System.currentTimeMillis()}"
    // carry the live generation's EXPLICIT mapping onto the staging
    // index — without this every reindex silently downgrades pinned
    // field types to whatever dynamic mapping the bulk infers, and
    // ensureMapping never notices (the dynamic mapping is non-empty)
    val createBody = getMapping match {
      case Some(m) => s"""{"mappings":$m}"""
      case None => "{}"
    }
    request("PUT", s"$base/$staging", createBody, jsonHeaders)
    bulkTo(staging, "index", snapshot)
    // atomic cutover: one _aliases call removes the old generation
    // from the alias and adds the staging one — readers never see a
    // half-synced store, and a crash before this line leaves the old
    // generation live (the abandoned staging index is inert)
    val old = resolveAlias()
    val actions =
      old.map(o => s"""{"remove":{"index":"$o","alias":"$alias"}}""").toSeq :+
        s"""{"add":{"index":"$staging","alias":"$alias"}}"""
    request("POST", s"$base/_aliases",
      s"""{"actions":[${actions.mkString(",")}]}""", jsonHeaders)
    old.foreach(o => request("DELETE", s"$base/$o", "", Map.empty))
  }

  override def exists(spark: SparkSession): Boolean = headOk(s"$base/$alias")

  /** PUT the index mapping (creating generation 1 if absent) — the
    * reference's put-mapping-before-push step, driver-side.
    */
  def putMapping(mapping: String): Unit = {
    ensureIndex()
    request("PUT", s"$base/$alias/_mapping", mapping, jsonHeaders); ()
  }

  /** The stored mapping, or None when the index doesn't exist or has
    * an empty mapping. ES replies `{"<index>":{"mappings":{...}}}`;
    * this returns the inner mappings document.
    */
  def getMapping: Option[String] =
    if (!headOk(s"$base/$alias")) None
    else {
      val body = request("GET", s"$base/$alias/_mapping", "", Map.empty)
      val root = mapper.readTree(body)
      val inner = root.elements()
      if (!inner.hasNext) None
      else Option(inner.next().get("mappings"))
        .filter(m => m.fieldNames().hasNext)
        .map(_.toString)
    }

  /** Idempotent create-if-absent (never overwrites a live mapping —
    * remapping a live index is a deliberate [[putMapping]]).
    */
  def ensureMapping(mapping: String): Boolean =
    getMapping match {
      case Some(_) => false
      case None => putMapping(mapping); true
    }

  /** Max value of `field` over the store (empty → None) via a
    * server-side max aggregation — the watermark poll.
    */
  def maxWatermark(field: String): Option[Long] =
    EsDocumentStore.maxWatermarkAt(base, alias, field)

  private def ensureIndex(): Unit =
    if (!headOk(s"$base/$alias")) {
      val gen1 = s"$alias-1"
      request("PUT", s"$base/$gen1",
        s"""{"aliases":{"$alias":{}}}""", jsonHeaders)
      ()
    }

  private def resolveAlias(): Option[String] = {
    if (!headOk(s"$base/$alias")) return None
    val body = request("GET", s"$base/_alias/$alias", "", Map.empty)
    val names = mapper.readTree(body).fieldNames()
    if (names.hasNext) Some(names.next()) else None
  }

  /** Executor-side bulk of `df` into `target` as `action` docs: the
    * action-and-metadata line carries the composed `_id` and the
    * external version; the source line is the row's JSON.
    */
  private def bulkTo(target: String, action: String, df: DataFrame): Unit = {
    val (b, bs, kc, vc) = (base, batchSize, keyCols, versionCol)
    df
      .select(concat_ws(":", kc.map(c => col(c).cast("string")): _*).as("__id"),
        col(vc).cast("long").as("__v"),
        to_json(struct(df.columns.map(col): _*)).as("__src"))
      .foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
        it.grouped(bs).foreach { chunk =>
          val body = chunk.map { r =>
            actionLine(action, target, r.getString(0), r.getLong(1)) + "\n" +
              r.getString(2)
          }.mkString("", "\n", "\n")
          checkBulkResponse(postBulk(b, body))
        }
      }
  }
}

object EsDocumentStore {
  private val mapper = new ObjectMapper()
  private val jsonHeaders = Map("Content-Type" -> "application/json")

  /** Static watermark poll (max aggregation) — shared by the store's
    * instance method and the DSv2 streaming source's latestOffset.
    */
  private[sources] def maxWatermarkAt(base: String, index: String,
      field: String): Option[Long] = {
    if (!headOk(s"$base/$index")) return None
    val body = request("POST", s"$base/$index/_search",
      s"""{"size":0,"aggs":{"wm":{"max":{"field":"$field"}}}}""", jsonHeaders)
    Option(mapper.readTree(body).at("/aggregations/wm/value"))
      .filter(v => v.isNumber).map(_.asLong())
  }

  private def actionLine(action: String, index: String, id: String,
      version: Long): String = {
    require(version >= 0, s"ES external versions are unsigned; got $version")
    s"""{"$action":{"_index":"${escape(index)}","_id":"${escape(id)}",""" +
      s""""version":$version,"version_type":"external_gte"}}"""
  }

  private def escape(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  private def postBulk(base: String, body: String): String =
    HttpDocumentStore.request("POST", s"$base/_bulk", body,
      Map("Content-Type" -> "application/x-ndjson"))

  /** Walk one ES bulk response: `errors:false` is wholesale success;
    * otherwise per-item statuses decide — 2xx ok, 409 is a version
    * conflict (the latest-wins LOSER under external versioning: an
    * expected outcome of redelivery/stale events, exactly like the
    * parquet sink's dedupLatest dropping the older row), 404 on a
    * delete is a missing key (contractual no-op). Anything else is a
    * real per-document failure and must kill the task — Spark retries
    * it, and the bulk is idempotent under external versioning.
    */
  private[sources] def checkBulkResponse(body: String): Unit = {
    val root = mapper.readTree(body)
    if (!root.path("errors").asBoolean(false)) return
    val items = root.path("items")
    val it = items.elements()
    while (it.hasNext) {
      val item: JsonNode = it.next()
      val op = item.elements().next() // {"index":{...}} or {"delete":{...}}
      val status = op.path("status").asInt(200)
      val isDelete = item.has("delete")
      val ok = (status >= 200 && status < 300) || status == 409 ||
        (isDelete && status == 404)
      if (!ok)
        sys.error(s"bulk item failed: status=$status ${op.path("error")}")
    }
  }

  /** Existence probe: ONLY 404 means absent. Any other non-200 —
    * including transient 5xx/429 — retries and then fails LOUDLY: an
    * exists() that silently answered false on a server hiccup would
    * make the pipeline treat a populated store as empty (an
    * edge-state scan skipped mid-CRUD-batch loses closure deletes
    * permanently — the exact class of bug the crash-matrix work
    * exists to prevent).
    */
  private def headOk(url: String): Boolean =
    HttpDocumentStore.withRetry(s"HEAD $url") {
      val conn = new java.net.URL(url).openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      try {
        conn.setRequestMethod("HEAD")
        conn.getResponseCode match {
          case 200 => true
          case 404 => false
          case code => throw HttpDocumentStore.HttpStatusException(
            code, s"HEAD $url -> HTTP $code")
        }
      } finally conn.disconnect()
    }

  private def request(method: String, url: String, body: String,
      headers: Map[String, String]): String =
    HttpDocumentStore.request(method, url, body, headers)

  /** Best-effort release of a server-side scroll context — scroll
    * contexts pin index segments until their keepalive expires, and a
    * default cluster caps them (max_open_scroll_context=500), so an
    * early-terminated read must free its context instead of leaking
    * it for the keepalive window.
    */
  private[sources] def releaseScroll(base: String, scrollId: String): Unit =
    try {
      request("DELETE", s"$base/_search/scroll",
        s"""{"scroll_id":["${escape(scrollId)}"]}""", jsonHeaders); ()
    } catch { case _: Exception => () }

  /** Lazy page walk of one scroll slice — executor-side; each `next`
    * fetches at most one page (a downstream `limit` stops early), and
    * the scroll context is released at exhaustion. `onScrollId` fires
    * on every server-assigned scroll id so a caller with a close()
    * hook (the DSv2 reader) can [[releaseScroll]] when it stops
    * early — the iterator itself only reaches its cleanup when fully
    * consumed.
    */
  private[sources] def scrollSlice(base: String, index: String, slice: Int,
      slices: Int, pageSize: Int, wmField: Option[String],
      since: Option[Long], until: Option[Long],
      onScrollId: String => Unit = _ => ()): Iterator[String] = {
    val query = (wmField, since, until) match {
      case (Some(f), lo, hi) if lo.isDefined || hi.isDefined =>
        val bounds = lo.map(v => s""""gt":$v""").toSeq ++
          hi.map(v => s""""lte":$v""").toSeq
        s"""{"range":{"$f":{${bounds.mkString(",")}}}}"""
      case _ => """{"match_all":{}}"""
    }
    val sliceClause =
      if (slices > 1) s""""slice":{"id":$slice,"max":$slices},""" else ""
    val first = s"""{$sliceClause"size":$pageSize,"sort":["_doc"],"query":$query}"""

    // state: Some(None) = initial search, Some(Some(id)) = continue
    // scroll id, None = exhausted
    Iterator.unfold(Some(None): Option[Option[String]]) {
      case None => None
      case Some(cursor) =>
        val body = cursor match {
          case None => request("POST",
            s"$base/$index/_search?scroll=1m", first, jsonHeaders)
          case Some(id) => request("POST", s"$base/_search/scroll",
            s"""{"scroll":"1m","scroll_id":"${escape(id)}"}""", jsonHeaders)
        }
        val root = mapper.readTree(body)
        val scrollId = Option(root.get("_scroll_id")).map(_.asText())
        scrollId.foreach(onScrollId)
        val hits = root.at("/hits/hits")
        val docs = (0 until hits.size()).map(i => hits.get(i).get("_source").toString)
        if (docs.isEmpty) {
          scrollId.foreach(releaseScroll(base, _))
          Some((Seq.empty[String], None))
        } else Some((docs, scrollId.map(id => Some(id))))
    }.flatten
  }
}
