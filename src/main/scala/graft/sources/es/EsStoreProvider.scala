package graft.sources.es

import com.fasterxml.jackson.databind.ObjectMapper
import graft.sources.EsDocumentStore
import graft.sources.http.HttpRows
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 connector for a REAL Elasticsearch endpoint — the
  * [[graft.sources.http.HttpStoreProvider]] design speaking
  * [[graft.sources.EsDocumentStore]]'s wire format, so Catalyst
  * drives what reaches the cluster:
  *
  *  - **watermark pushdown**: an extract's `wm > bookmark` predicate
  *    becomes a `range` query INSIDE the sliced scroll body —
  *    evaluated by ES, exactly the reference's incremental pull.
  *    Pushed filters stay residual (Spark re-checks them), so a
  *    mapping where the field isn't indexed costs bandwidth, never
  *    correctness.
  *  - **column pruning**: only requested fields parse out of each
  *    hit's `_source`.
  *  - **slice-per-partition**: one `InputPartition` per scroll slice
  *    (`"slice":{"id":i,"max":n}`), each task walking its own scroll
  *    cursor with the per-page retry underneath.
  *  - **streaming**: `readStream` polls the max-aggregation watermark
  *    and reads the half-open `(lastOffset, maxWm]` bracket
  *    server-side per micro-batch — the reference's ES polling loop
  *    as a real Structured Streaming source, with the same
  *    server-assigned-monotone-watermark contract as the HTTP
  *    source's scaladoc spells out.
  *
  * Usage:
  * {{{
  *   spark.read.format("graft.sources.es.EsStoreProvider")
  *     .schema(schema)                       // configuration, never inferred
  *     .option("base", "http://es:9200")
  *     .option("index", "bugs")              // index or alias
  *     .option("wmcol", "modified_ts")       // range-pushdown field
  *     .option("slices", "8")
  *     .load()
  * }}}
  */
class EsStoreProvider extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new IllegalArgumentException(
      "graft es source: schema is required (.schema(...)) — a store's schema " +
        "is configuration, and inferring it would read data on the driver")
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val base = properties.get("base")
    val index = properties.get("index")
    require(base != null && base.nonEmpty, "graft es source: 'base' option is required")
    require(index != null && index.nonEmpty, "graft es source: 'index' option is required")
    schema.fields.foreach(f => require(HttpRows.supported(f.dataType),
      s"graft es source: unsupported field type ${f.name}: ${f.dataType.simpleString} " +
        "(supported: long, int, double, string, boolean; send timestamps as epoch longs)"))
    EsStoreTable(schema, base, index,
      Option(properties.get("wmcol")).filter(_.nonEmpty),
      Option(properties.get("slices")).map(_.toInt).getOrElse(8),
      Option(properties.get("pagesize")).map(_.toInt).getOrElse(500),
      EsStoreProvider.headerOptions(properties))
  }
}

object EsStoreProvider {
  /** `option("header.Authorization", "ApiKey ...")`-style options
    * become request headers on EVERY exchange the connector makes
    * (search, scroll page, scroll release, watermark poll) — the auth
    * seam. Names arrive lowercased through Spark's case-insensitive
    * option map; HTTP header names are case-insensitive, so that is
    * harmless. Values are credentials and never logged.
    */
  private[sources] def headerOptions(
      properties: java.util.Map[String, String]): Map[String, String] = {
    val out = Map.newBuilder[String, String]
    properties.forEach((k, v) =>
      if (k.toLowerCase.startsWith("header.")) out += (k.substring(7) -> v))
    out.result()
  }
}

case class EsStoreTable(tableSchema: StructType, base: String, index: String,
    wmCol: Option[String], slices: Int, pageSize: Int,
    headers: Map[String, String] = Map.empty)
    extends Table with SupportsRead {
  override def name(): String = s"graft-es($base/$index)"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new EsScanBuilder(tableSchema, base, index, wmCol, slices, pageSize, headers)
}

class EsScanBuilder(schema: StructType, base: String, index: String,
    wmCol: Option[String], slices: Int, pageSize: Int,
    headers: Map[String, String] = Map.empty)
  extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var since: Option[Long] = None
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = schema

  /** Same pushdown contract as the HTTP provider: watermark lower
    * bounds fold into the scroll's range query (`>` exact, `>=` via
    * v−1 for integral watermarks); everything stays residual.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    wmCol.foreach { wc =>
      filters.foreach {
        case GreaterThan(c, v: Long) if c == wc =>
          since = Some(since.fold(v)(math.max(_, v)))
          pushed :+= GreaterThan(c, v)
        case GreaterThanOrEqual(c, v: Long) if c == wc && v != Long.MinValue =>
          // v−1 would WRAP at Long.MinValue, pushing a range that
          // excludes every row — the filter is a tautology anyway, so
          // it stays residual-only (the guard skips the pushdown)
          since = Some(since.fold(v - 1)(math.max(_, v - 1)))
          pushed :+= GreaterThanOrEqual(c, v)
        case _ => ()
      }
    }
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    EsScanDef(base, index, slices, pageSize, wmCol, since, required, headers)
}

case class EsScanDef(base: String, index: String, slices: Int, pageSize: Int,
    wmCol: Option[String], since: Option[Long], required: StructType,
    headers: Map[String, String] = Map.empty)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-es scan $base/$index slices=$slices" +
      since.fold("")(v => s" since=$v (pushed range)")
  override def planInputPartitions(): Array[InputPartition] =
    (0 until slices).map(i =>
      EsSlicePartition(i, since, None): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    EsReaderFactory(base, index, slices, pageSize, wmCol, required, headers)
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new EsMicroBatchStream(base, index, slices, pageSize, wmCol, since,
      required, headers)
}

/** Streaming micro-batch source over the ES wire: latestOffset is the
  * max-aggregation watermark poll; each batch reads the (since, until]
  * bracket as a server-side range inside the sliced scroll. Requires
  * `wmcol` (there is no bracket without a watermark field).
  */
class EsMicroBatchStream(base: String, index: String, slices: Int,
    pageSize: Int, wmCol: Option[String], startSince: Option[Long],
    required: StructType, headers: Map[String, String] = Map.empty)
  extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
  with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}

  require(wmCol.nonEmpty,
    "graft es source: streaming reads need the 'wmcol' option (the watermark " +
      "field that brackets each micro-batch server-side)")

  private case class WmOffset(wm: Long) extends Offset {
    override def json(): String = wm.toString
  }

  override def initialOffset(): Offset =
    WmOffset(startSince.getOrElse(Long.MinValue))
  override def latestOffset(): Offset =
    EsDocumentStore.maxWatermarkAt(base, index, wmCol.get, headers)
      .map(WmOffset(_)).getOrElse(initialOffset())

  /** Trigger.AvailableNow drains to the watermark observed at QUERY
    * START and terminates — without this, a store whose writers keep
    * advancing the watermark would keep an "available now" drain
    * alive forever (Spark otherwise falls back to one unbounded
    * batch with a warning).
    */
  @volatile private var availableNowTarget: Option[Offset] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(latestOffset())
  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    availableNowTarget.getOrElse(latestOffset())

  override def deserializeOffset(json: String): Offset = WmOffset(json.toLong)
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (s0, e0) = (start.asInstanceOf[WmOffset].wm, end.asInstanceOf[WmOffset].wm)
    if (s0 >= e0) Array.empty
    else (0 until slices).map(i =>
      EsSlicePartition(i, Some(s0), Some(e0)): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    EsReaderFactory(base, index, slices, pageSize, wmCol, required, headers)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

case class EsSlicePartition(slice: Int, since: Option[Long],
    until: Option[Long]) extends InputPartition

case class EsReaderFactory(base: String, index: String, slices: Int,
    pageSize: Int, wmCol: Option[String], required: StructType,
    headers: Map[String, String] = Map.empty)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[EsSlicePartition]
    new EsPartitionReader(base, index, p.slice, slices, pageSize, wmCol,
      p.since, p.until, required, headers)
  }
}

/** Executor-side reader: one scroll slice walked lazily, `_source`
  * parsed to the pruned schema. close() releases the slice's live
  * scroll context — an early-terminated read (LIMIT, task abort)
  * must not pin index segments for the keepalive window (default
  * clusters cap open scroll contexts at 500).
  */
class EsPartitionReader(base: String, index: String, slice: Int, slices: Int,
    pageSize: Int, wmCol: Option[String], since: Option[Long],
    until: Option[Long], required: StructType,
    headers: Map[String, String] = Map.empty)
  extends PartitionReader[InternalRow] {

  private val mapper = new ObjectMapper()
  @volatile private var liveScrollId: String = _
  private val lines = EsDocumentStore.scrollSlice(base, index, slice, slices,
    pageSize, wmCol, since, until, onScrollId = id => liveScrollId = id,
    headers = headers)
  private var current: InternalRow = _

  override def next(): Boolean =
    if (!lines.hasNext) false
    else {
      current = HttpRows.parse(mapper.readTree(lines.next()), required)
      true
    }
  override def get(): InternalRow = current
  override def close(): Unit = {
    val id = liveScrollId
    if (id != null) EsDocumentStore.releaseScroll(base, id, headers)
  }
}
