package graft.sources.http

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.sources.HttpDocumentStore
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 connector for the HTTP document store — the scan
  * half of [[graft.sources.HttpDocumentStore]] lifted into Spark's
  * connector API so CATALYST, not the caller, decides what reaches
  * the server:
  *
  *  - **watermark filter pushdown**: an extract's `wm > bookmark`
  *    predicate (what [[graft.sources.ExtractBookmark.extractSince]]
  *    plans) is translated to the scroll protocol's `since` parameter
  *    and evaluated SERVER-SIDE — the reference pushes the same range
  *    query into its ES scroll, and at 100 TB this is the difference
  *    between shipping a nightly delta and re-shipping the index.
  *    Pushed filters stay residual too (Spark re-checks them), so a
  *    server that ignores `since` costs bandwidth, never correctness.
  *  - **column pruning**: only requested fields are parsed out of the
  *    NDJSON (`SupportsPushDownRequiredColumns`).
  *  - **slice-per-partition planning**: one `InputPartition` per
  *    scroll slice; each task walks its own cursor chain with the
  *    store's per-page retry.
  *
  * Usage (schema is configuration, never inferred — a driver-side
  * sniff of page one is exactly what a distributed scan must not do):
  * {{{
  *   spark.read.format("graft.sources.http.HttpStoreProvider")
  *     .schema(schema)
  *     .option("base", "http://store:9200/idx")
  *     .option("wmcol", "m")        // watermark field for pushdown
  *     .option("slices", "8")
  *     .load()
  * }}}
  *
  * Supported field types: LONG/INT/DOUBLE/STRING/BOOLEAN (the document
  * store contract's scalar payload; timestamps travel as epoch longs
  * — the jx date family consumes them via timestamp_seconds). Missing
  * fields and explicit JSON nulls read as SQL NULL.
  */
class HttpStoreProvider extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new IllegalArgumentException(
      "graft http source: schema is required (.schema(...)) — a store's schema " +
        "is configuration, and inferring it would read data on the driver")
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val base = properties.get("base")
    require(base != null && base.nonEmpty, "graft http source: 'base' option is required")
    schema.fields.foreach(f => require(HttpRows.supported(f.dataType),
      s"graft http source: unsupported field type ${f.name}: ${f.dataType.simpleString} " +
        "(supported: long, int, double, string, boolean; send timestamps as epoch longs)"))
    HttpStoreTable(schema, base,
      Option(properties.get("wmcol")).filter(_.nonEmpty),
      Option(properties.get("slices")).map(_.toInt).getOrElse(8))
  }
}

case class HttpStoreTable(tableSchema: StructType, base: String,
    wmCol: Option[String], slices: Int) extends Table with SupportsRead {
  override def name(): String = s"graft-http($base)"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new HttpScanBuilder(tableSchema, base, wmCol, slices)
}

class HttpScanBuilder(schema: StructType, base: String,
    wmCol: Option[String], slices: Int)
  extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var since: Option[Long] = None
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = schema

  /** Consume watermark lower bounds into the scroll's `since`
    * (exclusive). `wm > v` → since=v; `wm >= v` → since=v−1 (exact
    * for integral watermarks). EVERY filter is also returned as
    * residual: the server prune is an optimization the engine never
    * has to trust — Spark re-applies the predicate over what arrives.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    wmCol.foreach { wc =>
      filters.foreach {
        case GreaterThan(c, v: Long) if c == wc =>
          since = Some(since.fold(v)(math.max(_, v)))
          pushed :+= GreaterThan(c, v)
        case GreaterThanOrEqual(c, v: Long) if c == wc =>
          since = Some(since.fold(v - 1)(math.max(_, v - 1)))
          pushed :+= GreaterThanOrEqual(c, v)
        case _ => ()
      }
    }
    filters // all residual — see above
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = HttpScanDef(base, slices, since, required)
}

case class HttpScanDef(base: String, slices: Int, since: Option[Long],
    required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-http scan base=$base slices=$slices" +
      since.fold("")(v => s" since=$v (pushed)")
  override def planInputPartitions(): Array[InputPartition] =
    (0 until slices).map(i => HttpSlicePartition(i): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    HttpReaderFactory(base, slices, since, required)
}

case class HttpSlicePartition(slice: Int) extends InputPartition

case class HttpReaderFactory(base: String, slices: Int, since: Option[Long],
    required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new HttpPartitionReader(base,
      partition.asInstanceOf[HttpSlicePartition].slice, slices, since, required)
}

/** Executor-side reader: walks one slice's cursor chain lazily (one
  * page in memory at a time) and parses only the pruned fields.
  */
class HttpPartitionReader(base: String, slice: Int, slices: Int,
    since: Option[Long], required: StructType)
  extends PartitionReader[InternalRow] {

  private val mapper = new ObjectMapper()
  private val lines = HttpDocumentStore.slicePages(base, slice, slices, since)
  private var current: InternalRow = _

  override def next(): Boolean =
    if (!lines.hasNext) false
    else {
      current = HttpRows.parse(mapper.readTree(lines.next()), required)
      true
    }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}

private[http] object HttpRows {
  def supported(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | DoubleType | StringType | BooleanType => true
    case _ => false
  }

  def parse(node: JsonNode, schema: StructType): InternalRow = {
    val values = new Array[Any](schema.length)
    var i = 0
    while (i < schema.length) {
      val f = schema.fields(i)
      val n = node.get(f.name)
      values(i) =
        if (n == null || n.isNull) null
        else f.dataType match {
          case LongType => n.asLong()
          case IntegerType => n.asInt()
          case DoubleType => n.asDouble()
          case BooleanType => n.asBoolean()
          case StringType => UTF8String.fromString(
            if (n.isTextual) n.asText() else n.toString)
          case other => throw new IllegalStateException(
            s"unreachable: ${f.name}: $other rejected at getTable")
        }
      i += 1
    }
    new GenericInternalRow(values)
  }
}
