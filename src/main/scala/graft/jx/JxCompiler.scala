package graft.jx

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.Tables
import graft.util.dsum
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Compiler for the reference's jx / Qb JSON query language (the
  * embedded pyLibrary query layer every MoDevETL data access goes
  * through): declarative
  * `{from, select, where, groupby, edges, window, sort, limit}`
  * documents compiled to DataFrame plans.
  *
  * Spark-first: the compiler is a thin translation layer — every jx
  * clause becomes a Catalyst expression or a DataFrame transformation,
  * so pushdown, pruning, join strategy and codegen come from Catalyst,
  * not from this code. No interpretation happens per-row.
  *
  * Determinism policy: jx `sum`/`average` aggregate through
  * DECIMAL(18,4) (order-independent addition, then one double cast),
  * matching the engine-wide oracle policy (SURVEY.md §5).
  *
  * Supported subset (the operators the reference's own hierarchy/push
  * queries use, plus arithmetic):
  *  - where: and, or, not, eq, ne, gt, gte, lt, lte, in, missing,
  *    exists, prefix, regex; nested arithmetic add/sub/mult/div;
  *    literal
  *  - select: "*", "field", {name, value, aggregate} with aggregate in
  *    count, sum, average, minimum, maximum, cardinality, and
  *    value-less count
  *  - groupby / edges: field list (edges = jx's pivot axes; default
  *    domains map to plain grouping)
  *  - window: {name, value, aggregate, edges, sort} with aggregate in
  *    sum, count, min, max, rownum
  *  - sort: field or {value, sort: 1|-1}; limit: int
  */
object JxCompiler {

  private val mapper = new ObjectMapper()

  def parse(json: String): JsonNode = mapper.readTree(json)

  /** Compile and run a jx query against the testdata tables in `dir`. */
  def query(spark: SparkSession, dir: String, json: String): DataFrame =
    compile(spark, dir, parse(json))

  private def compile(spark: SparkSession, dir: String, q: JsonNode): DataFrame = {
    // jx `from` is a table name or a nested query document (the
    // reference pipelines queries: an inner aggregation feeding an
    // outer filter/sort). Compilation recurses; Catalyst flattens the
    // nesting into one plan, so there is no materialization boundary.
    val fromNode = req(q, "from")
    var df =
      if (fromNode.isTextual) Tables.load(spark, dir, fromNode.asText())
      else compile(spark, dir, fromNode)

    if (q.has("where")) df = df.where(compileExpr(q.get("where")))

    if (q.has("window")) df = q.get("window") match {
      case arr if arr.isArray => arr.asScala.foldLeft(df)(applyWindow)
      case one => applyWindow(df, one)
    }

    val groupFields = if (q.has("groupby")) asList(q.get("groupby")).map(fieldName) else Nil
    val edgeNodes = if (q.has("edges")) asList(q.get("edges")) else Nil

    if (q.has("select") || groupFields.nonEmpty || edgeNodes.nonEmpty) {
      val sel = if (q.has("select")) asList(q.get("select")) else Nil
      val aggSel = sel.filter(n => n.isObject && n.has("aggregate"))
      val plainSel = sel.filterNot(n => n.isObject && n.has("aggregate"))
      if (edgeNodes.nonEmpty) {
        df = edgeAggregate(df, edgeNodes, aggSel,
          plainSel.filterNot(_.asText() == "*"))
      } else if (aggSel.nonEmpty || groupFields.nonEmpty) {
        val aggs = aggSel.map(compileAggregate)
        val agged =
          if (groupFields.nonEmpty)
            df.groupBy(groupFields.map(col): _*)
              .agg(aggs.headOption.getOrElse(count(lit(1)).as("count")), aggs.drop(1): _*)
          else df.agg(aggs.head, aggs.tail: _*)
        df = agged
      } else if (plainSel.nonEmpty && !plainSel.exists(_.asText() == "*")) {
        df = df.select(plainSel.map(compileSelect): _*)
      }
    }

    if (q.has("sort")) {
      val orders = asList(q.get("sort")).map {
        case s if s.isTextual => col(s.asText()).asc
        case o =>
          val c = compileExpr(req(o, "value"))
          if (o.has("sort") && o.get("sort").asInt() < 0) c.desc else c.asc
      }
      df = df.orderBy(orders: _*)
    }

    if (q.has("limit")) df = df.limit(q.get("limit").asInt())
    df
  }

  /** jx expression → Catalyst Column. */
  def compileExpr(n: JsonNode): Column = n match {
    case t if t.isTextual => col(t.asText())
    case v if v.isNumber => lit(v.numberValue())
    case b if b.isBoolean => lit(b.asBoolean())
    case nl if nl.isNull => lit(null)
    case o if o.isObject =>
      val (op, arg) = single(o)
      op match {
        case "and" => arg.asScala.map(compileExpr).reduce(_ && _)
        case "or" => arg.asScala.map(compileExpr).reduce(_ || _)
        case "not" => !compileExpr(arg)
        case "eq" => fieldCompares(arg, _ === _)
        case "ne" | "neq" => fieldCompares(arg, _ =!= _)
        case "gt" => fieldCompares(arg, _ > _)
        case "gte" => fieldCompares(arg, _ >= _)
        case "lt" => fieldCompares(arg, _ < _)
        case "lte" => fieldCompares(arg, _ <= _)
        case "in" =>
          val (f, vs) = firstField(arg)
          col(f).isin(vs.asScala.toSeq.map(jvalue): _*)
        case "missing" => col(arg.asText()).isNull
        case "exists" => col(arg.asText()).isNotNull
        case "prefix" =>
          val (f, v) = firstField(arg)
          col(f).startsWith(jvalue(v).toString)
        case "find" | "contains" => // substring containment
          val (f, v) = firstField(arg)
          col(f).contains(jvalue(v).toString)
        case "regex" | "regexp" =>
          val (f, v) = firstField(arg)
          col(f).rlike(jvalue(v).toString)
        case "add" => arg.asScala.map(compileExpr).reduce(_ + _)
        case "sub" | "subtract" => arg.asScala.map(compileExpr).reduce(_ - _)
        case "mult" | "mul" => arg.asScala.map(compileExpr).reduce(_ * _)
        case "div" => arg.asScala.map(compileExpr).reduce(_ / _)
        case "length" => length(compileExpr(arg))
        case "lower" => lower(compileExpr(arg))
        case "upper" => upper(compileExpr(arg))
        case "left" => // {"left": {field: n}} — first n chars
          val (f, v) = firstField(arg)
          substring(col(f), 1, v.asInt())
        case "coalesce" => coalesce(arg.asScala.toSeq.map(compileExpr): _*)
        case "between" => // {"between": {field: [lo, hi]}} — inclusive
          val (f, v) = firstField(arg)
          val bounds = v.asScala.toSeq
          col(f) >= lit(jvalue(bounds.head)) && col(f) <= lit(jvalue(bounds(1)))
        case "literal" => lit(jvalue(arg))
        case other => throw new IllegalArgumentException(s"jx operator not supported: $other")
      }
    case other => throw new IllegalArgumentException(s"jx expression not supported: $other")
  }

  /** One compiled pivot axis: the grouping expression, its name in the
    * output, the domain builder (every cell the axis must emit, given
    * the filtered source), and an optional row filter (range domains
    * drop out-of-range rows).
    */
  private case class Edge(name: String, expr: Column,
      domain: DataFrame => DataFrame, rowFilter: Option[Column])

  /** jx `edges` semantics (vs `groupby`): the result is CELL-COMPLETE —
    * one row per cell of the cross product of each edge's domain, with
    * count aggregates 0 and value aggregates NULL for cells no row
    * landed in. groupby only emits populated cells.
    *
    * Domains: a bare field edge's default domain is the distinct
    * values present in the filtered source; a range-domain edge
    * (`{value, domain: {type: "range", min, max, interval}}`) buckets
    * a numeric expression into fixed intervals labeled by their left
    * endpoint, the domain is EVERY interval in [min, max) whether
    * populated or not, and out-of-range rows are dropped.
    *
    * Plan shape: per-edge distinct or generated range (tiny
    * dimensions), cross-join of the domains (broadcast all the way),
    * one grouped aggregate over the facts, then a left join of cells
    * onto the aggregate. At scale the only wide stage is the fact
    * aggregate.
    */
  private def edgeAggregate(df: DataFrame, edgeNodes: Seq[JsonNode],
      aggSel: Seq[JsonNode], plainSel: Seq[JsonNode]): DataFrame = {
    // jx semantics: with edges, every select must be an aggregate (a
    // plain field has no meaning in a pivot cell) — error loudly, the
    // silent alternative returns a wrong-shaped result
    require(plainSel.isEmpty,
      s"jx edges query: non-aggregate select not allowed: " +
        plainSel.map(_.toString).mkString(", "))
    val edges = edgeNodes.map(compileEdge(df, _))
    val (aggs, names, countNames) =
      if (aggSel.nonEmpty)
        (aggSel.map(compileAggregate), aggSel.map(aggName),
          aggSel.filter(isCountAgg).map(aggName))
      else (Seq(count(lit(1)).as("count")), Seq("count"), Seq("count"))
    // range filters apply BEFORE categorical domains are sampled: the
    // documented contract (and the oracle mirror) is "distinct values
    // present in the FILTERED source"
    val filtered = edges.flatMap(_.rowFilter)
      .foldLeft(df)((d, f) => d.where(f))
    val keyed = edges.foldLeft(filtered)((d, e) => d.withColumn(e.name, e.expr))
    val agged = keyed.groupBy(edges.map(e => col(e.name)): _*).agg(aggs.head, aggs.tail: _*)
    val cells = edges.map(_.domain(filtered)).reduce(_.crossJoin(_))
    val outCols = edges.map(e => col(e.name)) ++ names.map { n =>
      if (countNames.contains(n)) coalesce(col(n), lit(0L)).as(n) else col(n)
    }
    cells.join(agged, edges.map(_.name), "left").select(outCols: _*)
  }

  private def compileEdge(df: DataFrame, n: JsonNode): Edge =
    if (!n.isTextual && n.has("domain") &&
        req(n.get("domain"), "type").asText() == "range") {
      val d = n.get("domain")
      val name = if (n.has("name")) n.get("name").asText() else fieldName(n)
      val mn = req(d, "min").asLong()
      val mx = req(d, "max").asLong()
      val iv = req(d, "interval").asLong()
      val v = compileExpr(req(n, "value"))
      val bucket = floor((v - mn) / iv).cast("long") * iv + mn
      val nCells = (mx - mn + iv - 1) / iv
      Edge(name, bucket,
        _ => df.sparkSession.range(nCells).select((col("id") * iv + mn).as(name)),
        Some(v >= mn && v < mx))
    } else {
      val f = fieldName(n)
      Edge(f, col(f), filtered => filtered.select(col(f)).distinct(), None)
    }

  private def isCountAgg(n: JsonNode): Boolean =
    Seq("count", "cardinality").contains(n.get("aggregate").asText())

  private def aggName(n: JsonNode): String =
    if (n.has("name")) n.get("name").asText()
    else if (n.has("value") && n.get("value").isTextual) n.get("value").asText()
    else "count"

  private def compileAggregate(n: JsonNode): Column = {
    val name = aggName(n)
    val value = if (n.has("value")) Some(compileExpr(n.get("value"))) else None
    val agg = n.get("aggregate").asText() match {
      case "count" => value.map(count).getOrElse(count(lit(1)))
      case "sum" => dsum(value.get, 4)
      case "average" | "avg" => dsum(value.get, 4) / count(value.get)
      case "minimum" | "min" => min(value.get)
      case "maximum" | "max" => max(value.get)
      case "cardinality" => countDistinct(value.get)
      // jx percentile/median: the mergeable t-digest sketch (exact
      // percentile buffers whole groups — engine-wide policy, see
      // q18/q47). Optional "percentile" parameter, default median.
      case "median" => graft.functions.approxPercentile(value.get, 0.5)
      case "percentile" =>
        val p = if (n.has("percentile")) n.get("percentile").asDouble() else 0.5
        graft.functions.approxPercentile(value.get, p)
      case other => throw new IllegalArgumentException(s"jx aggregate not supported: $other")
    }
    agg.as(name)
  }

  private def compileSelect(n: JsonNode): Column = n match {
    case t if t.isTextual => col(t.asText())
    case o if o.isObject =>
      val c = compileExpr(req(o, "value"))
      if (o.has("name")) c.as(o.get("name").asText()) else c
    case other => throw new IllegalArgumentException(s"jx select not supported: $other")
  }

  private def applyWindow(df: DataFrame, w: JsonNode): DataFrame = {
    val name = req(w, "name").asText()
    val parts = if (w.has("edges")) asList(w.get("edges")).map(n => col(fieldName(n))) else Nil
    val sorts = if (w.has("sort")) asList(w.get("sort")).map {
      case s if s.isTextual => col(s.asText()).asc
      case o =>
        val c = compileExpr(req(o, "value"))
        if (o.has("sort") && o.get("sort").asInt() < 0) c.desc else c.asc
    } else Nil
    var spec: WindowSpec = Window.partitionBy(parts: _*)
    if (sorts.nonEmpty) spec = spec.orderBy(sorts: _*)
    val value = if (w.has("value")) Some(compileExpr(w.get("value"))) else None
    val agg = w.get("aggregate").asText() match {
      case "rownum" | "rank" => row_number()
      // Running sum through DECIMAL(18,4): window frames may be
      // accumulated differently by different engines; decimal addition
      // is exact either way (engine-wide policy, SURVEY.md §5).
      case "sum" => sum(graft.util.dsumCast(value.get, 4))
        .over(spec.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
      case "count" => count(value.getOrElse(lit(1))).over(spec.rowsBetween(Window.unboundedPreceding, Window.currentRow))
      case "min" => min(value.get).over(spec.rowsBetween(Window.unboundedPreceding, Window.currentRow))
      case "max" => max(value.get).over(spec.rowsBetween(Window.unboundedPreceding, Window.currentRow))
      case other => throw new IllegalArgumentException(s"jx window aggregate not supported: $other")
    }
    val column = w.get("aggregate").asText() match {
      case "rownum" | "rank" => row_number().over(spec)
      case _ => agg
    }
    df.withColumn(name, column)
  }

  private def fieldName(n: JsonNode): String =
    if (n.isTextual) n.asText() else req(n, "value").asText()

  /** {f1: v1, f2: v2} → cmp(f1,v1) AND cmp(f2,v2); [e1, e2] → cmp(e1,e2). */
  private def fieldCompares(arg: JsonNode, cmp: (Column, Column) => Column): Column =
    if (arg.isArray) {
      val es = arg.asScala.map(compileExpr).toSeq
      cmp(es.head, es(1))
    } else {
      arg.properties().asScala.map { e =>
        cmp(col(e.getKey), lit(jvalue(e.getValue)))
      }.reduce(_ && _)
    }

  private def firstField(o: JsonNode): (String, JsonNode) = {
    val e = o.properties().asScala.head
    (e.getKey, e.getValue)
  }

  private def single(o: JsonNode): (String, JsonNode) = {
    val e = o.properties().asScala.head
    (e.getKey, e.getValue)
  }

  private def jvalue(n: JsonNode): Any =
    if (n.isTextual) n.asText()
    else if (n.isIntegralNumber) n.asLong()
    else if (n.isNumber) n.asDouble()
    else if (n.isBoolean) n.asBoolean()
    else if (n.isNull) null
    else throw new IllegalArgumentException(s"jx literal not supported: $n")

  private def asList(n: JsonNode): Seq[JsonNode] =
    if (n.isArray) n.asScala.toSeq else Seq(n)

  private def req(o: JsonNode, k: String): JsonNode = {
    require(o.has(k), s"jx query missing required field '$k'")
    o.get(k)
  }
}
