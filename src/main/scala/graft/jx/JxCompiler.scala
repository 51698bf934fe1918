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
  *  - from: table name; dotted leaf path into nested documents
  *    ("orders.lines" explodes the inner array, one row per inner
  *    document, leaf fields dot-named); or a nested query document
  *  - where: and, or, not, eq, ne, gt, gte, lt, lte, in, missing,
  *    exists, prefix, regex; nested arithmetic add/sub/mult/div,
  *    mod, floor (incl. floor-to-calendar-unit on timestamps);
  *    date/unix/date_diff/date_add scalar ops (pyLibrary
  *    Date/Duration); when/then/else and case conditionals; literal
  *  - select: "*", "field", {name, value, aggregate} with aggregate in
  *    count, sum, average, minimum, maximum, cardinality, median,
  *    percentile, union (sorted distinct set), and value-less count
  *  - groupby / edges: field list (edges = jx's pivot axes; default
  *    domains map to plain grouping; range domains = numeric
  *    histograms; time domains = calendar day/week/month histograms)
  *  - window: {name, value, aggregate, edges, sort} with aggregate in
  *    sum, count, min, max, rownum
  *  - sort: field or {value, sort: 1|-1}; limit: int
  *  - format: "list" (default, flat rows), "nested" (dotted names
  *    re-assembled into documents), "table" (header + data arrays),
  *    "cube" (edge domain arrays + per-aggregate nested data arrays)
  *
  * Numeric contract: jx arithmetic runs on the engine's 64-bit types
  * under ANSI semantics — an integer product that exceeds Long range
  * FAILS LOUDLY (ARITHMETIC_OVERFLOW) instead of wrapping or silently
  * widening. This is a deliberate divergence from pyLibrary's
  * arbitrary-precision Python ints: at engine scale a silent bigint
  * promotion does not exist, and a loud failure beats a wrapped
  * wrong answer. Epoch-scale values (`unix`) belong in differences
  * and unit divisions, not raw products.
  */
object JxCompiler {

  private val mapper = new ObjectMapper()

  def parse(json: String): JsonNode = mapper.readTree(json)

  /** Compile and run a jx query against the testdata tables in `dir`.
    *
    * `lenient = true` restores the reference's missing-field
    * semantics: jx treats an unknown field as `missing` (null) rather
    * than erroring, so filters on it match nothing, `missing` matches
    * everything, selects emit a null column and groupbys one null
    * group. Strict (analyzer error) stays the default — silent nulls
    * hide typos, so leniency is an explicit opt-in for porting
    * reference queries verbatim.
    */
  def query(spark: SparkSession, dir: String, json: String,
      lenient: Boolean = false): DataFrame =
    compile(spark, dir, parse(json), Map.empty, lenient)

  /** Like `query`, with extra named DataFrames visible to `from` —
    * the route for querying nested documents built in-plan (and for
    * NDJSON reads via [[graft.sources.JsonLinesSource]]).
    */
  def queryOn(spark: SparkSession, dir: String, json: String,
      tables: Map[String, DataFrame], lenient: Boolean = false): DataFrame =
    compile(spark, dir, parse(json), tables, lenient)

  /** Compile a jx query against a STREAMING DataFrame — jx dashboards
    * over live data, which the reference (batch queries over a pushed
    * index) cannot serve. Supported subset = the streaming-executable
    * core:
    *
    *  - `where` + non-aggregate `select`: a stateless filter/project
    *    pipeline (any jx expression; no watermark needed).
    *  - `groupby` + aggregate `select`s: a streaming aggregation.
    *    With `eventTime` set, the stream is watermarked and any
    *    floor-to-calendar groupby term on that column — the jx
    *    time-bucket idiom, e.g. `{"name":"day","value":{"floor":
    *    ["ts","day"]}}` — compiles to a streaming `window()` bucket
    *    (emitted as its start instant, matching the batch
    *    date_trunc), so aggregation state is EVICTED as the
    *    watermark passes: the 100 TB-stream shape. Other group terms
    *    compile as in batch but their state never expires — fine for
    *    low-cardinality keys, the caller's call.
    *
    * Whole-result clauses (`edges` cell-completeness, `window`,
    * `sort`, `limit`, the transport formats `table`/`cube`) and
    * whole-group aggregates (cardinality/median/percentile/union)
    * have no incremental semantics and are rejected loudly — run
    * those as a batch jx query over the sink table. `format:
    * "nested"` IS allowed: a stateless per-row struct assembly
    * composes with any output mode. Output mode/trigger stay with
    * the caller's writeStream.
    */
  def queryStream(stream: DataFrame, json: String,
      eventTime: String = "", delay: String = "10 minutes"): DataFrame = {
    val q = parse(json)
    for (k <- Seq("edges", "window", "sort", "limit"))
      require(!q.has(k),
        s"jx streaming: '$k' has no incremental semantics — run it as a batch query on the sink table")
    val fmt = q.path("format").asText("list")
    require(fmt == "list" || fmt == "nested",
      s"jx streaming: format '$fmt' collapses the whole result (no incremental " +
        "semantics) — run it as a batch query on the sink table")
    if (q.has("from")) require(q.get("from").isTextual,
      "jx streaming: nested from is batch-only; pass the stream directly")
    var df = stream
    if (q.has("where")) df = df.where(compileExpr(q.get("where")))
    val sel = if (q.has("select")) asList(q.get("select")) else Nil
    val aggSel = sel.filter(n => n.isObject && n.has("aggregate"))
    val plainSel = sel.filterNot(n => n.isObject && n.has("aggregate"))
    val gbNodes = if (q.has("groupby")) asList(q.get("groupby")) else Nil
    if (aggSel.isEmpty && gbNodes.isEmpty) {
      if (isLeavesSelect(plainSel)) {
        require(plainSel.length == 1, // same contract as the batch path
          "jx select: 'leaves' selects every leaf — combine via a pipelined query, not a mixed list")
        df = leavesOf(df) // stateless projection
      }
      else if (plainSel.nonEmpty && !plainSel.exists(n => n.isTextual && n.asText() == "*"))
        df = df.select(plainSel.map(compileSelect): _*)
      if (fmt == "nested") toNested(df) else df
    } else {
      aggSel.foreach { n =>
        val k = req(n, "aggregate").asText()
        require(!Set("cardinality", "median", "percentile", "union", "list").contains(k),
          s"jx streaming: aggregate '$k' needs the whole group (no mergeable streaming state) — " +
            "use the batch path on the sink table")
      }
      if (eventTime.nonEmpty) df = df.withWatermark(eventTime, delay)
      // (output name, post-agg projection) for window-bucket keys
      var post = List.empty[(String, Column)]
      val keys = gbNodes.map {
        case t if t.isTextual => fcol(t.asText())
        case o if o.isObject =>
          require(o.has("name") || req(o, "value").isTextual,
            s"jx groupby: a computed term needs an explicit name: $o")
          val name = if (o.has("name")) o.get("name").asText()
          else req(o, "value").asText()
          val v = req(o, "value")
          val fl = if (v.isObject && v.has("floor")) Some(v.get("floor")) else None
          val evBucket = eventTime.nonEmpty && fl.exists(f => f.isArray &&
            f.size() == 2 && f.get(0).isTextual && f.get(0).asText() == eventTime &&
            calendarUnits.contains(f.get(1).asText()))
          if (evBucket) {
            val unit = fl.get.get(1).asText()
            val iv = if (unit == "week") "7 days" else s"1 $unit"
            post ::= (name -> col(s"__jxw_$name").getField("start"))
            window(col(eventTime), iv).as(s"__jxw_$name")
          } else compileExpr(v).as(name)
        case other => throw new IllegalArgumentException(
          s"jx groupby term not supported: $other")
      }
      val aggs = aggSel.map(compileAggregate)
      val agged = df.groupBy(keys: _*)
        .agg(aggs.headOption.getOrElse(count(lit(1)).as("count")), aggs.drop(1): _*)
      // project window structs back to their named bucket starts,
      // preserving groupby-then-aggregate column order
      val postMap = post.toMap
      val keyCols = gbNodes.map {
        case t if t.isTextual => fcol(t.asText())
        case o =>
          val name = if (o.has("name")) o.get("name").asText()
          else req(o, "value").asText()
          postMap.get(name).map(_.as(name)).getOrElse(col(s"`$name`"))
      }
      val aggCols = if (aggSel.isEmpty) Seq(col("count"))
      else aggSel.map(n => col(s"`${aggName(n)}`"))
      val out = agged.select(keyCols ++ aggCols: _*)
      if (fmt == "nested") toNested(out) else out
    }
  }

  private def compile(spark: SparkSession, dir: String, q: JsonNode,
      tables: Map[String, DataFrame], lenient: Boolean = false): DataFrame = {
    // jx `from` is a table name, a dotted path to nested inner
    // documents, or a nested query document (the reference pipelines
    // queries: an inner aggregation feeding an outer filter/sort).
    // Compilation recurses; Catalyst flattens the nesting into one
    // plan, so there is no materialization boundary.
    val fromNode = req(q, "from")
    var df =
      if (fromNode.isTextual) resolveFrom(spark, dir, fromNode.asText(), tables)
      else compile(spark, dir, fromNode, tables, lenient)

    if (lenient) {
      // reference semantics: an unresolved field IS the missing value.
      // Inject absent referenced fields as typed null columns BEFORE
      // compilation so every clause sees them; names the query itself
      // defines (select/window/aggregate outputs) resolve against the
      // query output, not the source, and are never injected.
      val absent = referencedFields(q) -- df.columns -- definedNames(q)
      df = absent.foldLeft(df)((d, f) => d.withColumn(f, lit(null).cast("string")))
    }

    if (q.has("where")) df = df.where(compileExpr(q.get("where")))

    if (q.has("window")) df = applyWindows(df, asList(q.get("window")))

    // groupby accepts bare field names or {name, value} expression
    // objects (pyLibrary groups on computed domains — a floor'd bucket,
    // a substring — not just stored columns); the computed column is
    // named in the output like any grouping key
    val groupCols: Seq[Column] =
      if (q.has("groupby")) asList(q.get("groupby")).map {
        case t if t.isTextual => fcol(t.asText())
        case o if o.isObject =>
          // an expression-valued term with no name would emit an
          // unnamed ("") output column — refuse loudly
          require(o.has("name") || req(o, "value").isTextual,
            s"jx groupby: a computed term needs an explicit name: $o")
          val c = compileExpr(req(o, "value"))
          c.as(if (o.has("name")) o.get("name").asText()
          else req(o, "value").asText())
        case other => throw new IllegalArgumentException(
          s"jx groupby term not supported: $other")
      } else Nil
    val edgeNodes = if (q.has("edges")) asList(q.get("edges")) else Nil
    val sel = if (q.has("select")) asList(q.get("select")) else Nil
    val aggSel = sel.filter(n => n.isObject && n.has("aggregate"))

    // groupby emits populated cells, edges the full domain cross
    // product — one query mixing them has no defined cell set; error
    // loudly instead of silently preferring one
    require(groupCols.isEmpty || edgeNodes.isEmpty,
      "jx query: groupby and edges are mutually exclusive (edges ARE the grouping axes)")

    if (q.has("select") || groupCols.nonEmpty || edgeNodes.nonEmpty) {
      val plainSel = sel.filterNot(n => n.isObject && n.has("aggregate"))
      if (edgeNodes.nonEmpty) {
        df = edgeAggregate(df, edgeNodes, aggSel,
          plainSel.filterNot(_.asText() == "*"))
      } else if (aggSel.nonEmpty || groupCols.nonEmpty) {
        val aggs = aggSel.map(compileAggregate)
        val agged =
          if (groupCols.nonEmpty)
            df.groupBy(groupCols: _*)
              .agg(aggs.headOption.getOrElse(count(lit(1)).as("count")), aggs.drop(1): _*)
          else df.agg(aggs.head, aggs.tail: _*)
        df = agged
      } else if (isLeavesSelect(plainSel)) {
        require(plainSel.length == 1,
          "jx select: 'leaves' selects every leaf — combine via a pipelined query, not a mixed list")
        df = leavesOf(df)
      } else if (plainSel.nonEmpty && !plainSel.exists(_.asText() == "*")) {
        df = df.select(plainSel.map(compileSelect): _*)
      }
    }

    val orders =
      if (q.has("sort")) asList(q.get("sort")).map {
        case s if s.isTextual => fcol(s.asText()).asc
        case o =>
          val c = compileExpr(req(o, "value"))
          if (o.has("sort") && o.get("sort").asInt() < 0) c.desc else c.asc
      } else Nil
    if (orders.nonEmpty) df = df.orderBy(orders: _*)

    if (q.has("limit")) df = df.limit(q.get("limit").asInt())

    q.path("format").asText("list") match {
      case "list" => df // flat rows — the default (and Spark-native) shape
      case "nested" => toNested(df) // dotted names re-assembled into documents
      case "table" => toTable(df, orders)
      case "cube" =>
        require(edgeNodes.nonEmpty, "jx cube format requires edges")
        val aggNames = if (aggSel.nonEmpty) aggSel.map(aggName) else Seq("count")
        toCube(df, edgeNodes.map(edgeName), aggNames)
      case other => throw new IllegalArgumentException(s"jx format not supported: $other")
    }
  }

  /** `from` resolution: an exact table (or injected frame) name, else
    * a dotted leaf path into nested documents — the first segment
    * names the table, each further segment descends: a struct column
    * flattens in place, an array of inner documents EXPLODES (one
    * result row per inner document — jx's nested-document query),
    * with leaf fields dot-named `<path>.<field>` and parent columns
    * retained. Explosion is a narrow transformation: no shuffle, rows
    * fan out within their partition, so a 100 TB parent scan streams.
    */
  private def resolveFrom(spark: SparkSession, dir: String, path: String,
      tables: Map[String, DataFrame]): DataFrame = {
    def table(n: String): DataFrame =
      tables.getOrElse(n, Tables.load(spark, dir, n))
    if (tables.contains(path) || !path.contains(".")) table(path)
    else {
      // split on UNESCAPED dots only: `a\.b` is one literal segment
      // (a key containing a dot), not a descent step
      val segs = path.split("(?<!\\\\)\\.").toSeq.map(unescapeDots)
      var df = table(segs.head)
      var prefix = ""
      segs.tail.foreach { seg =>
        val full = prefix + seg
        df = explodeInto(df, full)
        prefix = full + "."
      }
      df
    }
  }

  /** One descent step of a nested-document `from` path. */
  private def explodeInto(df: DataFrame, name: String): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, StructType}
    val field = df.schema.fields.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"jx from: no column '$name' (have: ${df.columns.mkString(", ")})"))
    val others = df.columns.filterNot(_ == name).map(c => col(s"`$c`")).toSeq
    field.dataType match {
      case ArrayType(st: StructType, _) =>
        val ex = df.select(others :+ explode(col(s"`$name`")).as("__jx_inner"): _*)
        ex.select(others ++ st.fields.toSeq.map(f =>
          col("__jx_inner").getField(f.name).as(s"$name.${f.name}")): _*)
      case ArrayType(_, _) =>
        df.select(others :+ explode(col(s"`$name`")).as(name): _*)
      case st: StructType =>
        df.select(others ++ st.fields.toSeq.map(f =>
          col(s"`$name`").getField(f.name).as(s"$name.${f.name}")): _*)
      case other => throw new IllegalArgumentException(
        s"jx from: '$name' is not a nested document (got $other)")
    }
  }

  /** jx `format: "nested"`: re-assemble dot-named flat columns into
    * nested DOCUMENTS — the inverse of the dotted flattening the
    * engine applies everywhere else. pyLibrary's `select` with dotted
    * `name`s re-nests results before returning them to document
    * consumers; the engine's native result shape is flat dot-named
    * columns (joins/filters/aggregates all compose better flat), so
    * the re-nest is a FORMAT, applied once at the result boundary:
    * `a.b`, `a.c`, `d` → (a: struct(b, c), d), recursively for deeper
    * paths, sibling order preserved from the flat column order.
    *
    * A pure struct-assembly projection: codegen'd, no shuffle, no
    * state — scale-free at any result size (unlike `table`/`cube`,
    * which collapse to transport rows). Ambiguity (one name both a
    * leaf and a prefix, e.g. `a` and `a.b`) fails loudly — silently
    * preferring one would drop data.
    */
  private[graft] def toNested(df: DataFrame): DataFrame = {
    def assemble(cols: Seq[(String, Column)]): Seq[Column] = {
      val split = cols.map { case (n, c) => (n.split("\\.", 2), c) }
      split.map(_._1(0)).distinct.map { seg =>
        val members = split.filter(_._1(0) == seg)
        val (leaves, nested) = members.partition(_._1.length == 1)
        require(leaves.isEmpty || nested.isEmpty,
          s"jx format nested: '$seg' is both a leaf column and a nested prefix")
        require(leaves.length <= 1,
          s"jx format nested: duplicate column '$seg'")
        if (nested.isEmpty) leaves.head._2.as(seg)
        else struct(assemble(nested.map { case (p, c) => (p(1), c) }): _*).as(seg)
      }
    }
    df.select(assemble(df.columns.toSeq.map(n => n -> col(s"`$n`"))): _*)
  }

  /** jx `format: "table"`: one row holding the column header and the
    * data rows — the reference's transport shape for query results. A
    * final-mile format: the whole result lands in one row, so use it
    * on aggregated results, not raw scans (same contract as the
    * reference's HTTP responses).
    *
    * Fidelity (r7, replacing the r5 stringify-everything shape): data
    * cells keep their NATIVE types — each row is a struct whose fields
    * mirror the header, so longs stay longs and nulls stay nulls
    * through any JSON serialization, exactly like the reference's
    * transport. Row order honors the query's `sort` clause when one is
    * present (rows are rank-tagged by the sort BEFORE the single-row
    * collapse, then assembled by rank — collect_list alone has no
    * order guarantee). An unsorted jx result is observation order,
    * which a distributed engine does not have; those results are
    * canonically sorted by their own cell values so the format stays
    * deterministic across engines and runs.
    *
    * Scale note: the rank window is single-partition BY DESIGN — the
    * format's contract is "the whole result in one transport row", so
    * the result must already be aggregate-sized; the window input is
    * the final result set, never raw facts. That contract is ENFORCED,
    * not advisory: a lazy in-plan row-count guard
    * ([[graft.util.guardMaxRows]]) fails the job when the input
    * exceeds `graft.jx.tableMaxRows` (default 1,000,000) — a
    * `format:"table"` over a raw 100 TB scan dies loudly instead of
    * hanging one task. Set the conf to 0 to opt out.
    *
    * Rows are ordered by a KEY-ONLY comparator (the sort rank when a
    * `sort` clause exists, else the row's JSON text for a canonical
    * deterministic order): sort_array over the whole row struct would
    * fail analysis when a cell carries an unorderable type (MapType),
    * and the payload never needs comparing — the key is unique (rank)
    * or ties are byte-identical rows (JSON).
    */
  private def toTable(df0: DataFrame, orders: Seq[Column]): DataFrame = {
    val maxRows =
      df0.sparkSession.conf.get("graft.jx.tableMaxRows", "1000000").toLong
    val df = graft.util.guardMaxRows(df0, maxRows,
      "jx format:\"table\" collapses the whole result into one transport row; " +
        "aggregate or limit first (or raise graft.jx.tableMaxRows)")
    val header = array(df.columns.toSeq.map(lit): _*).as("header")
    val rowStruct = struct(df.columns.toSeq.map(c => col(s"`$c`")): _*)
    def packed(key: Column): Column = {
      val byKey = (a: Column, b: Column) =>
        when(a.getField("k") < b.getField("k"), -1)
          .when(a.getField("k") > b.getField("k"), 1)
          .otherwise(0)
      transform(
        array_sort(collect_list(struct(key.as("k"), rowStruct.as("r"))), byKey),
        x => x.getField("r")).as("data")
    }
    if (orders.nonEmpty)
      df.withColumn("_jxord",
          row_number().over(Window.orderBy(orders: _*)).cast("long"))
        .agg(packed(col("_jxord")))
        .select(header, col("data"))
    else
      df.agg(packed(to_json(rowStruct)))
        .select(header, col("data"))
  }

  /** jx `format: "cube"`: per edge a sorted domain array, per
    * aggregate a nested data array (dimension order = edge order,
    * innermost = last edge), cells aligned with the domain arrays —
    * the shape MoDevETL's dashboards consume. Assembled entirely with
    * distributed aggregates (collect_list of (key, value) structs,
    * sorted, then projected), never a driver-side pivot; like
    * `toTable` it is a final-mile delivery format.
    */
  private def toCube(df: DataFrame, edges: Seq[String], aggs: Seq[String]): DataFrame = {
    // materialize the flat cube once (lazy persist): the pack chain
    // and every domain aggregate consume it (without this the whole
    // fact aggregate + cells join would re-execute once per consumer)
    val flat = graft.util.reused(df)
    var d = flat
    for (e <- edges.reverse) {
      val groupCols = edges.takeWhile(_ != e).map(c => col(s"`$c`"))
      // struct sort is lexicographic and (group, edge-value) is unique
      // after aggregation, so the pack order is the domain order; null
      // cell values survive inside the struct (collect_list would drop
      // bare nulls and misalign cells against the domain)
      val packs = aggs.map { a =>
        transform(
          sort_array(collect_list(struct(col(s"`$e`").as("k"), col(s"`$a`").as("v")))),
          s => s.getField("v")).as(a)
      }
      d = if (groupCols.nonEmpty) d.groupBy(groupCols: _*).agg(packs.head, packs.tail: _*)
      else d.agg(packs.head, packs.tail: _*)
    }
    // domain arrays via struct-WRAPPED collect_set: a bare collect_set
    // drops a NULL domain value while the packs keep its cell,
    // shifting every later cell by one — the struct wrapper keeps the
    // null key and sorts it first, exactly matching the pack order
    val domains = edges.map(e =>
      flat.agg(transform(sort_array(collect_set(struct(col(s"`$e`").as("k")))),
        s => s.getField("k")).as(s"domain_$e")))
    domains.reduce(_.crossJoin(_)).crossJoin(d)
  }

  private def edgeName(n: JsonNode): String =
    if (!n.isTextual && n.has("name")) n.get("name").asText() else fieldName(n)

  /** pyLibrary's escaped-dot syntax: `a\.b` (JSON `"a\\.b"`) names a
    * LITERAL key containing a dot, vs `a.b` the nested path. In this
    * engine's flat model both resolve to the dot-named column `a.b` —
    * the record bridge names a descended path and a literal dotted
    * key identically — so resolution just strips the escapes; the
    * place the distinction is LOAD-BEARING is [[resolveFrom]], which
    * must not descend through an escaped dot.
    */
  private def unescapeDots(name: String): String = name.replace("\\.", ".")

  /** Field reference: names containing dots target the flattened
    * dot-named columns the record bridge produces (backquoted so the
    * analyzer does not re-parse them as struct paths); `\.` escapes
    * resolve to the same literal dotted name.
    */
  private def fcol(name: String): Column = {
    val n = unescapeDots(name)
    if (n.contains(".")) col(s"`$n`") else col(n)
  }

  /** `select: "leaves"`: every LEAF of the record, struct columns
    * recursively expanded to their dot-named leaf fields — pyLibrary's
    * deep select (`.leaves()`), the inverse of `format: "nested"`
    * (spec pins the round-trip). Arrays stay values (jx descends into
    * inner-document ARRAYS only via `from` paths, where the row
    * multiplicity change is explicit). A pure projection: codegen'd,
    * no shuffle, scale-free.
    */
  private[graft] def leavesOf(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.StructType
    def expand(c: Column, dt: org.apache.spark.sql.types.DataType,
        name: String): Seq[Column] = dt match {
      case st: StructType => st.fields.toSeq.flatMap(f =>
        expand(c.getField(f.name), f.dataType, s"$name.${f.name}"))
      case _ => Seq(c.as(name))
    }
    df.select(df.schema.fields.toSeq.flatMap(f =>
      expand(col(s"`${f.name}`"), f.dataType, f.name)): _*)
  }

  private def isLeavesSelect(sel: Seq[JsonNode]): Boolean =
    sel.exists(n => n.isTextual && n.asText() == "leaves")

  /** jx expression → Catalyst Column. */
  def compileExpr(n: JsonNode): Column = n match {
    case t if t.isTextual => fcol(t.asText())
    case v if v.isNumber => lit(v.numberValue())
    case b if b.isBoolean => lit(b.asBoolean())
    case nl if nl.isNull => lit(null)
    // {"when": cond, "then": a, "else": b} — the one multi-key
    // expression object in jx; then/else optional (missing → null)
    case o if o.isObject && o.has("when") =>
      val thenC = if (o.has("then")) compileExpr(o.get("then")) else lit(null)
      val elseC = if (o.has("else")) compileExpr(o.get("else")) else lit(null)
      when(compileExpr(o.get("when")), thenC).otherwise(elseC)
    case o if o.isObject =>
      val (op, arg) = single(o)
      op match {
        case "and" => arg.asScala.map(compileExpr).reduce(_ && _)
        case "or" => arg.asScala.map(compileExpr).reduce(_ || _)
        case "not" => !compileExpr(arg)
        case "eq" => fieldComparesEq(arg, negate = false)
        case "ne" | "neq" => fieldComparesEq(arg, negate = true)
        case "gt" => fieldCompares(arg, _ > _)
        case "gte" => fieldCompares(arg, _ >= _)
        case "lt" => fieldCompares(arg, _ < _)
        case "lte" => fieldCompares(arg, _ <= _)
        case "in" =>
          val (f, vs) = firstField(arg)
          fcol(f).isin(vs.asScala.toSeq.map(jvalue): _*)
        case "missing" => fcol(arg.asText()).isNull
        case "exists" => fcol(arg.asText()).isNotNull
        case "prefix" =>
          val (f, v) = firstField(arg)
          fcol(f).startsWith(jvalue(v).toString)
        case "suffix" => // pyLibrary SuffixOp — prefix's mirror
          val (f, v) = firstField(arg)
          fcol(f).endsWith(jvalue(v).toString)
        case "find" | "contains" => // substring containment
          val (f, v) = firstField(arg)
          fcol(f).contains(jvalue(v).toString)
        case "regex" | "regexp" =>
          val (f, v) = firstField(arg)
          fcol(f).rlike(jvalue(v).toString)
        case "add" => arg.asScala.map(compileExpr).reduce(_ + _)
        case "sub" | "subtract" => arg.asScala.map(compileExpr).reduce(_ - _)
        case "mult" | "mul" => arg.asScala.map(compileExpr).reduce(_ * _)
        case "div" => arg.asScala.map(compileExpr).reduce(_ / _)
        // jx mod is python %: pmod matches it for the (positive
        // modulus) cases jx queries use; Spark's % truncates by sign
        case "mod" =>
          val es = arg.asScala.toSeq.map(compileExpr)
          pmod(es.head, es(1))
        // {"floor": v} → floor(v); {"floor": [v, interval]} → greatest
        // multiple of interval <= v (pyLibrary floor(value, mod)).
        // A TEXTUAL calendar-unit second argument is pyLibrary's
        // floor(date, Duration): {"floor": ["ts", "week"]} truncates
        // the timestamp to its enclosing calendar bucket (date_trunc;
        // weeks start Monday, months on the 1st — same alignment as
        // the time domain). Unit keywords win over a column named
        // like one (floor-to-a-column-interval stays available by
        // wrapping the interval: {"floor": ["x", {"add": ["day", 0]}]}).
        case "floor" =>
          if (arg.isArray) {
            val parts = arg.asScala.toSeq
            if (parts.size == 2 && parts(1).isTextual &&
                calendarUnits.contains(parts(1).asText()))
              date_trunc(parts(1).asText(),
                compileExpr(parts.head).cast("timestamp"))
            else {
              val es = parts.map(compileExpr)
              floor(es.head / es(1)) * es(1)
            }
          } else floor(compileExpr(arg))
        // ---- date/time scalar expressions (pyLibrary Date/Duration
        // ops — MoDevETL queries are bug-timestamp-centric: ages,
        // latencies, derived date buckets). Engine-wide nanosecond
        // policy (SURVEY §5): second-resolution ops truncate the
        // timestamp to whole seconds, mirrored exactly by the oracle.
        // {"date": v}: a timestamp VALUE — textual arg is a literal
        // datetime string (pyLibrary {"date": "2024-01-15"}), numeric
        // arg is unix seconds, an expression arg casts to timestamp.
        case "date" =>
          if (arg.isTextual) to_timestamp(lit(arg.asText()))
          else if (arg.isNumber) timestamp_seconds(lit(arg.numberValue()))
          else compileExpr(arg).cast("timestamp")
        // {"unix": ts}: seconds since epoch, truncated to whole
        // seconds (pyLibrary Date.unix)
        case "unix" => tsSeconds(arg)
        // {"date_diff": [a, b]} → a - b in whole SECONDS (pyLibrary
        // date - date = Duration, measured in seconds);
        // {"date_diff": [a, b, unit]} → exact double division of the
        // second difference by the fixed-width unit (pyLibrary
        // Duration / Duration = float) — 36 hours is 1.5 days, not 1
        case "date_diff" =>
          val parts = arg.asScala.toSeq
          require(parts.size == 2 || parts.size == 3,
            s"jx date_diff wants [a, b] or [a, b, unit], got ${parts.size} args")
          val diff = tsSeconds(parts.head) - tsSeconds(parts(1))
          if (parts.size == 2) diff
          else diff.cast("double") / lit(fixedUnitSeconds(parts(2).asText()))
        // {"date_add": [ts, amount, unit]} (unit optional, default
        // seconds): shift a timestamp by a fixed-width duration;
        // amount may be any numeric expression. Result is truncated
        // to whole seconds (the §5 policy); calendar-width shifts
        // (months) are a floor/date_trunc concern, not a duration.
        // A shift landing outside Spark's timestamp range fails the
        // job loudly (ANSI overflow) — pinned by JxPropertySpec's
        // bounded-amount generator note.
        case "date_add" =>
          val parts = arg.asScala.toSeq
          require(parts.size == 2 || parts.size == 3,
            s"jx date_add wants [ts, amount] or [ts, amount, unit], got ${parts.size} args")
          val amt = compileExpr(parts(1))
          val secs = if (parts.size == 3)
            amt * lit(fixedUnitSeconds(parts(2).asText())) else amt
          timestamp_seconds(tsSeconds(parts.head) + secs)
        // {"case": [{when,then}..., default?]} — first matching clause
        case "case" =>
          val clauses = arg.asScala.toSeq
          require(clauses.nonEmpty, "jx case: empty clause list")
          val (whens, default) =
            if (clauses.last.isObject && clauses.last.has("when"))
              (clauses, lit(null))
            else (clauses.dropRight(1), compileExpr(clauses.last))
          whens.foldRight(default) { (c, acc) =>
            when(compileExpr(req(c, "when")), compileExpr(req(c, "then"))).otherwise(acc)
          }
        case "length" => length(compileExpr(arg))
        case "lower" => lower(compileExpr(arg))
        case "upper" => upper(compileExpr(arg))
        case "left" => // {"left": {field: n}} — first n chars
          val (f, v) = firstField(arg)
          substring(fcol(f), 1, v.asInt())
        // right / not_left / not_right mirror pyLibrary's clamped
        // semantics: n beyond the string length keeps/drops the whole
        // string, never errors (Spark's fixed-int substring would
        // return "" for a negative start past the front)
        case "right" => // {"right": {field: n}} — last n chars
          val (f, v) = firstField(arg)
          val c = fcol(f); val n = lit(v.asInt())
          c.substr(greatest(length(c) - n + 1, lit(1)), n)
        case "not_left" => // {"not_left": {field: n}} — drop first n
          val (f, v) = firstField(arg)
          val c = fcol(f); val n = lit(v.asInt())
          c.substr(n + 1, greatest(length(c) - n, lit(0)))
        case "not_right" => // {"not_right": {field: n}} — drop last n
          val (f, v) = firstField(arg)
          val c = fcol(f); val n = lit(v.asInt())
          c.substr(lit(1), greatest(length(c) - n, lit(0)))
        // jx concat SKIPS missing values (pyLibrary joins the present
        // parts) — concat_ws ignores nulls, Spark's concat would null
        // the whole result
        case "concat" => concat_ws("", arg.asScala.toSeq.map(compileExpr): _*)
        case "abs" => abs(compileExpr(arg))
        case "number" => compileExpr(arg).cast("double")
        case "string" => compileExpr(arg).cast("string")
        case "coalesce" => coalesce(arg.asScala.toSeq.map(compileExpr): _*)
        // scalar clamp pair — pyLibrary's MaxOp/MinOp over expressions
        // ({"max": [a, b]} etc). greatest/least SKIP nulls (null only
        // when every operand is null), which is exactly jx's
        // missing-operands-are-ignored contract — NOT SQL's
        // null-poisoning comparison.
        case "max" =>
          val es = arg.asScala.toSeq.map(compileExpr)
          if (es.sizeIs == 1) es.head else greatest(es: _*)
        case "min" =>
          val es = arg.asScala.toSeq.map(compileExpr)
          if (es.sizeIs == 1) es.head else least(es: _*)
        case "between" => // {"between": {field: [lo, hi]}} — inclusive
          val (f, v) = firstField(arg)
          val bounds = v.asScala.toSeq
          fcol(f) >= lit(jvalue(bounds.head)) && fcol(f) <= lit(jvalue(bounds(1)))
        case "literal" => lit(jvalue(arg))
        case other => throw new IllegalArgumentException(s"jx operator not supported: $other")
      }
    case other => throw new IllegalArgumentException(s"jx expression not supported: $other")
  }

  /** date_trunc buckets — the calendar-aligned units `floor` accepts
    * (variable width: a month is 28–31 days, so they are truncation
    * targets, never arithmetic durations).
    */
  private val calendarUnits =
    Set("second", "minute", "hour", "day", "week", "month", "quarter", "year")

  /** Fixed-width duration units for date_diff/date_add — measured in
    * seconds, no calendar ambiguity.
    */
  private def fixedUnitSeconds(u: String): Long = u match {
    case "second" => 1L
    case "minute" => 60L
    case "hour" => 3600L
    case "day" => 86400L
    case "week" => 604800L
    case other => throw new IllegalArgumentException(
      s"jx duration unit not supported: $other " +
        "(want second|minute|hour|day|week; months are calendar units — use floor)")
  }

  /** Whole seconds since epoch of a timestamp-valued expression — the
    * engine-wide nanosecond policy (SURVEY §5): truncate, then
    * compare/diff, so both engines see identical integers.
    */
  private def tsSeconds(n: JsonNode): Column =
    unix_timestamp(compileExpr(n).cast("timestamp"))

  /** One compiled pivot axis: the grouping expression, its name in the
    * output, the domain builder (every cell the axis must emit, given
    * the filtered source), an optional row filter (range domains drop
    * out-of-range rows), and an optional in-plan remap (limited
    * domains rewrite overflow values to OTHER after the edge column
    * is attached; a remapped edge's cells are derived from the
    * aggregate itself, since every limited-domain cell is populated
    * by construction).
    */
  private case class Edge(name: String, expr: Column,
      domain: DataFrame => DataFrame, rowFilter: Option[Column],
      remap: Option[DataFrame => DataFrame] = None)

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
    val remapped = edges.foldLeft(keyed)((d, e) => e.remap.fold(d)(f => f(d)))
    val aggedRaw = remapped.groupBy(edges.map(e => fcol(e.name)): _*).agg(aggs.head, aggs.tail: _*)
    // a remapped (limited) edge makes the aggregate a DIAMOND: it
    // feeds both the cell derivation (distinct) and the left join
    // below, and the distinct's own exchange defeats ReuseExchange —
    // without a lazy persist the whole fact aggregation (and the
    // top-N + broadcast remap join above it) would execute twice
    val agged =
      if (edges.exists(_.remap.isDefined)) graft.util.reused(aggedRaw)
      else aggedRaw
    // remapped (limited) edges take their cells from the aggregate:
    // top-N values have rows by definition, null only appears when
    // null rows exist, OTHER only when overflow exists — so distinct
    // over the (already tiny) aggregate is both correct and free of
    // an extra fact scan
    val cells = edges.map { e =>
      if (e.remap.isDefined) agged.select(fcol(e.name)).distinct()
      else e.domain(filtered)
    }.reduce(_.crossJoin(_))
    val outCols = edges.map(e => fcol(e.name)) ++ names.map { n =>
      if (countNames.contains(n)) coalesce(fcol(n), lit(0L)).as(n) else fcol(n)
    }
    // NULL-SAFE cell join (jx allowNulls semantics): a categorical
    // domain sampled from the source can contain null (rows with a
    // missing edge value form their own partition, and pyLibrary
    // shows it). A plain equi-join drops exactly that group — its
    // aggregate row exists but null never matches the null cell — so
    // the counts would silently vanish. The aggregate's key columns
    // are renamed before the join (cells and agged descend from the
    // same plan; same-name columns would be ambiguous).
    val aggedR = edges.zipWithIndex.foldLeft(agged) { case (d, (e, i)) =>
      d.withColumnRenamed(e.name, s"__jxk$i")
    }
    val cond = edges.zipWithIndex
      .map { case (e, i) => fcol(e.name) <=> col(s"__jxk$i") }
      .reduce(_ && _)
    cells.join(aggedR, cond, "left").select(outCols: _*)
  }

  /** pyLibrary edges carry `allowNulls` (default true): the
    * missing-value rows form their own null partition. `allowNulls:
    * false` drops them BEFORE domain sampling and aggregation — no
    * null cell, no null counts — the axis a dashboard pins to known
    * values only. Range-family domains already drop nulls via their
    * bounds filter; this makes the categorical/set/limited family
    * honor the same opt-out.
    */
  private def compileEdge(df: DataFrame, n: JsonNode): Edge = {
    val e = compileEdgeBase(df, n)
    val allowNulls = n.isTextual || !n.has("allowNulls") ||
      n.get("allowNulls").asBoolean(true)
    if (allowNulls) e
    else e.copy(rowFilter =
      Some(e.rowFilter.fold(e.expr.isNotNull)(f => f && e.expr.isNotNull)))
  }

  private def compileEdgeBase(df: DataFrame, n: JsonNode): Edge =
    if (!n.isTextual && n.has("domain") &&
        req(n.get("domain"), "type").asText() == "time") {
      // jx time domain — the reference's dashboard axis (pyLibrary jx
      // date-histogram edges): calendar buckets labeled by their start
      // instant, the domain is EVERY interval start in [floor(min),
      // max) whether populated or not, out-of-range rows are dropped
      // (same contract as the range domain). Buckets are CALENDAR-
      // aligned (date_trunc: weeks start Monday, months on the 1st),
      // so an unaligned `min` falls inside its enclosing bucket.
      val d = n.get("domain")
      val name = if (n.has("name")) n.get("name").asText() else fieldName(n)
      val iv = req(d, "interval").asText()
      require(Seq("day", "week", "month").contains(iv),
        s"jx time domain interval not supported: $iv (want day|week|month)")
      val mn = to_timestamp(lit(req(d, "min").asText()))
      val mx = to_timestamp(lit(req(d, "max").asText()))
      val v = compileExpr(req(n, "value"))
      Edge(name, date_trunc(iv, v),
        // cell dimension generated in-plan (one row -> explode), tiny
        // and broadcastable like the range domain's spark.range
        _ => df.sparkSession.range(1)
          .select(explode(sequence(date_trunc(iv, mn), mx,
            expr(s"interval 1 $iv"))).as(name))
          .where(col(name) < mx),
        Some(v >= mn && v < mx))
    } else if (!n.isTextual && n.has("domain") &&
        req(n.get("domain"), "type").asText() == "set") {
      // jx set domain: an EXPLICIT partition whitelist — the cell set
      // is exactly the listed values (a listed-but-absent value still
      // emits zero-filled cells), rows with unlisted values are
      // dropped (pyLibrary routes them to the domain's `missing`
      // partition, which its dashboards omit — same visible result).
      val d = n.get("domain")
      val name = if (n.has("name")) n.get("name").asText() else fieldName(n)
      val allNodes = req(d, "partitions").asScala.toSeq
      require(allNodes.nonEmpty, "jx set domain: empty partitions list")
      // domain limit on an EXPLICIT partition list truncates it (the
      // author ordered the list; pyLibrary keeps the first `limit`
      // partitions) — rows with dropped values are filtered out like
      // any other unlisted value
      val partNodes =
        if (d.has("limit")) allNodes.take(d.get("limit").asInt()) else allNodes
      require(partNodes.nonEmpty, "jx set domain: limit must keep at least one partition")
      if (partNodes.exists(p => p.isObject && p.has("where"))) {
        // PREDICATE partitions (pyLibrary's full set-domain shape):
        // each partition is {name, where}; the edge value is the
        // FIRST matching partition's name (pyLibrary partitions are
        // ordered and first-match-wins, so overlap is well-defined),
        // rows matching none drop (the omitted `missing` partition),
        // and every listed name is a cell whether populated or not.
        require(partNodes.forall(p => p.isObject && p.has("where") && p.has("name")),
          "jx set domain: mix of predicate partitions and plain values is ambiguous — " +
            "use {name, where} objects for every partition")
        val named = partNodes.map(p =>
          (p.get("name").asText(), compileExpr(p.get("where"))))
        val v = named.reverse.foldLeft(lit(null).cast("string")) {
          case (acc, (pn, cond)) => when(cond, lit(pn)).otherwise(acc)
        }
        Edge(name, v,
          _ => df.sparkSession.range(1)
            .select(explode(array(named.map(p => lit(p._1)): _*)).as(name)),
          Some(named.map(_._2).reduce(_ || _)))
      } else {
        val parts = partNodes.map(jvalue)
        val v = compileExpr(req(n, "value"))
        Edge(name, v,
          _ => df.sparkSession.range(1)
            .select(explode(array(parts.map(lit): _*)).as(name)),
          Some(v.isin(parts: _*)))
      }
    } else if (!n.isTextual && n.has("domain") &&
        req(n.get("domain"), "type").asText() == "duration") {
      // jx duration domain: elapsed-time histogram axis — a range
      // domain measured in SECONDS whose interval may be a
      // calendar-free unit name (second|minute|hour|day are fixed
      // second widths; week/month are calendar concepts and belong to
      // the time domain). Bucket label = bucket start in seconds,
      // domain cell-complete in [min, max), out-of-range rows dropped
      // — same contract as range/time.
      val d = n.get("domain")
      val name = if (n.has("name")) n.get("name").asText() else fieldName(n)
      val units = Map("second" -> 1L, "minute" -> 60L,
        "hour" -> 3600L, "day" -> 86400L)
      val ivNode = req(d, "interval")
      val iv =
        if (ivNode.isTextual)
          units.getOrElse(ivNode.asText(), throw new IllegalArgumentException(
            s"jx duration domain interval not supported: ${ivNode.asText()} " +
              "(want second|minute|hour|day or a number of seconds)"))
        else ivNode.asLong()
      require(iv > 0, "jx duration domain: interval must be positive")
      val mn = req(d, "min").asLong()
      val mx = req(d, "max").asLong()
      val v = compileExpr(req(n, "value"))
      val bucket = floor((v - mn) / iv).cast("long") * iv + mn
      val nCells = (mx - mn + iv - 1) / iv
      Edge(name, bucket,
        _ => df.sparkSession.range(nCells).select((col("id") * iv + mn).as(name)),
        Some(v >= mn && v < mx))
    } else if (!n.isTextual && n.has("domain") &&
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
    } else if (!n.isTextual &&
        (n.has("limit") ||
          (n.has("domain") && req(n.get("domain"), "type").asText() == "default" &&
            n.get("domain").has("limit")))) {
      // jx limited value domain — top-N + OTHER, the dashboard axis at
      // scale (pyLibrary domains carry a partition `limit`; an
      // unlimited high-cardinality axis is unrenderable and, at 100 TB,
      // an unboundedly wide cell product). Contract:
      //   - keep the `limit` most frequent non-null values (ties break
      //     toward the SMALLER value — deterministic, oracle-mirrorable
      //     as ROW_NUMBER() OVER (ORDER BY n DESC, v ASC));
      //   - every other non-null value lands in the OTHER partition;
      //   - null keeps its own partition regardless of limit (jx
      //     allowNulls: the missing-value partition is not a value);
      //   - limit >= cardinality => no OTHER cell at all.
      // The edge value is cast to string: partition labels are names,
      // and OTHER must share the column's type. Plan shape: one counts
      // aggregate over the keyed facts (same shuffle width as the main
      // aggregate), a deterministic TakeOrdered for the top-N (tiny,
      // never a single-partition window over raw rows), and a
      // broadcast left join to remap — the fact stream is scanned, not
      // collected, and the only driver-side object is the plan.
      val name = if (n.has("name")) n.get("name").asText() else fieldName(n)
      val lim =
        if (n.has("limit")) n.get("limit").asInt()
        else n.get("domain").get("limit").asInt()
      require(lim > 0, s"jx domain limit must be positive: $lim")
      val v = compileExpr(req(n, "value")).cast("string")
      Edge(name, v,
        filtered => filtered.select(v.as(name)).distinct(), None,
        remap = Some { keyed =>
          val top = keyed.groupBy(fcol(name)).agg(count(lit(1)).as("_jxn"))
            .where(fcol(name).isNotNull)
            .orderBy(col("_jxn").desc, fcol(name).asc)
            .limit(lim)
            .select(fcol(name).as("_jxkeep"))
          keyed.join(broadcast(top), fcol(name) === col("_jxkeep"), "left")
            .withColumn(name,
              when(fcol(name).isNull || col("_jxkeep").isNotNull, fcol(name))
                .otherwise(lit("OTHER")))
            .drop("_jxkeep")
        })
    } else {
      // honor an explicit edge name on categorical edges too (range
      // edges already do) — edgeName/format code addresses edges by it
      val f = fieldName(n)
      val name = if (!n.isTextual && n.has("name")) n.get("name").asText() else f
      Edge(name, fcol(f), filtered => filtered.select(fcol(f).as(name)).distinct(), None)
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
    val aggKind = req(n, "aggregate").asText()
    require(value.nonEmpty || aggKind == "count",
      s"jx aggregate '$aggKind' requires a value (only count may omit it)")
    val agg = aggKind match {
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
      // jx union: the set union of the group's values. pyLibrary
      // returns an unordered set; emitted sorted so results are
      // deterministic (and hashable by the gate).
      case "union" => array_sort(collect_set(value.get))
      // jx list: the group's values with DUPLICATES preserved (vs
      // union's set). pyLibrary keeps arrival order; a distributed
      // group has no stable row order (collect_list order is
      // partition-layout-dependent), so the engine emits the MULTISET
      // sorted — duplicate counts intact, deterministic across
      // layouts/retries. Callers needing a meaningful order sort by a
      // real column and carry it in the values.
      case "list" => array_sort(collect_list(value.get))
      // jx stats moments (pyLibrary's stats aggregate): SAMPLE
      // variance/std from exact decimal sums — Spark's var_samp
      // accumulates doubles in partition order (non-associative
      // rounding → nondeterministic across partitionings), so derive
      // the moment from order-independent sums instead, in an
      // operation order a SQL oracle can mirror term for term:
      // (Σx² − Σx·Σx/n) / (n−1).
      case "variance" | "var" | "std" | "stddev" =>
        val nn = count(value.get)
        val sx = dsum(value.get, 4)
        val sxx = dsum(value.get * value.get, 4)
        val variance = (sxx - sx * sx / nn) / (nn - lit(1))
        // quantize the moment (engine float policy): when Σx² needs
        // more than double's 53 mantissa bits, the two engines'
        // decimal→double casts can disagree by ~1 ulp, and the
        // (Σx² − Σx·Σx/n) cancellation amplifies it into the last
        // couple of output digits
        val out = if (aggKind.startsWith("var")) variance else sqrt(variance)
        out.cast("decimal(18,4)").cast("double")
      case other => throw new IllegalArgumentException(s"jx aggregate not supported: $other")
    }
    agg.as(name)
  }

  private def compileSelect(n: JsonNode): Column = n match {
    case t if t.isTextual => fcol(t.asText())
    case o if o.isObject =>
      val c = compileExpr(req(o, "value"))
      if (o.has("name")) c.as(o.get("name").asText()) else c
    case other => throw new IllegalArgumentException(s"jx select not supported: $other")
  }

  /** The window clause list → chained `withColumn`s over Spark
    * windows.
    *
    * Partition edges accept the same shapes as groupby/edges: a bare
    * field name, a computed `{name, value}` term (partition by a
    * derived bucket), or a time-DOMAIN edge (`{name, value, domain:
    * {type: "time", interval}}` — partition by the calendar bucket;
    * min/max are cell concerns and ignored here: a window never
    * drops rows).
    *
    * Computed edges are pre-projected ONCE under a name canonical in
    * the edge's JSON text, then every window partitions by that
    * ATTRIBUTE: passing the expression to each `partitionBy` directly
    * plans one exchange PER WINDOW (Spark aliases the expression as a
    * fresh `_wN` projection each time, so semantically identical
    * partitionings never canonicalize equal), where same-keyed
    * windows should share one shuffle plus a sort. The helper columns
    * are dropped after the last window.
    */
  private def applyWindows(df: DataFrame, ws: Seq[JsonNode]): DataFrame = {
    val computed = scala.collection.mutable.LinkedHashMap.empty[String, Column]
    def partCol(n: JsonNode): Column = n match {
      case t if t.isTextual => fcol(t.asText())
      case o if o.isObject =>
        val expr =
          if (o.has("domain")) {
            val d = o.get("domain")
            req(d, "type").asText() match {
              case "time" =>
                val iv = req(d, "interval").asText()
                require(calendarUnits.contains(iv),
                  s"jx window time-domain edge interval not supported: $iv")
                date_trunc(iv, compileExpr(req(o, "value")).cast("timestamp"))
              case other => throw new IllegalArgumentException(
                s"jx window edge domain not supported: $other " +
                  "(want time; bucket with a computed {name, value} edge instead)")
            }
          } else compileExpr(req(o, "value"))
        val key = "__jxw" + java.lang.Integer.toHexString(o.toString.hashCode)
        computed.getOrElseUpdate(key, expr)
        col(key)
      case other => throw new IllegalArgumentException(
        s"jx window edge not supported: $other")
    }
    val partsPerW = ws.map(w =>
      if (w.has("edges")) asList(w.get("edges")).map(partCol) else Nil)
    val keyed = computed.foldLeft(df) { case (d, (k, c)) => d.withColumn(k, c) }
    val out = ws.lazyZip(partsPerW).foldLeft(keyed) {
      case (d, (w, parts)) => applyWindow(d, w, parts)
    }
    if (computed.isEmpty) out else out.drop(computed.keys.toSeq: _*)
  }

  /** One jx window clause (partition columns precomputed by
    * [[applyWindows]]) → one `withColumn`.
    */
  private def applyWindow(df: DataFrame, w: JsonNode, parts: Seq[Column]): DataFrame = {
    val name = req(w, "name").asText()
    val sorts = if (w.has("sort")) asList(w.get("sort")).map {
      case s if s.isTextual => fcol(s.asText()).asc
      case o =>
        val c = compileExpr(req(o, "value"))
        if (o.has("sort") && o.get("sort").asInt() < 0) c.desc else c.asc
    } else Nil
    var spec: WindowSpec = Window.partitionBy(parts: _*)
    if (sorts.nonEmpty) spec = spec.orderBy(sorts: _*)
    val value = if (w.has("value")) Some(compileExpr(w.get("value"))) else None
    val aggKind = req(w, "aggregate").asText()
    require(value.nonEmpty ||
      Seq("rownum", "rank", "count").contains(aggKind),
      s"jx window aggregate '$aggKind' requires a value")
    val isRank = Seq("rownum", "rank").contains(aggKind)
    // row numbering has no frame: a `range` on it would be silently
    // meaningless — reject loudly (compiler-wide contract on
    // ambiguous input), and require a sort (an unordered row number
    // is nondeterministic on a distributed engine)
    require(!(isRank && w.has("range")),
      s"jx window: range frame with aggregate '$aggKind' is meaningless — remove range")
    require(!isRank || sorts.nonEmpty,
      s"jx window aggregate '$aggKind' requires a sort clause")
    // median restrictions checked before the generic frame handling so
    // the user sees the median-specific contract, not a frame error
    require(!(aggKind == "median" && w.has("range")),
      "jx window median: range frame not supported — the window median is the whole-partition median")
    require(!(aggKind == "median" && sorts.nonEmpty),
      "jx window median: remove sort — a running median is not supported (the window median is the partition median)")
    // jx window `range`: a rows-relative sliding frame {min, max}
    // around the current row in the clause's sort order — pyLibrary
    // ranges are HALF-OPEN (min inclusive, max exclusive, the same
    // [min, max) convention as its domains), so {"min":-2,"max":1}
    // is the trailing-3 frame ending at the current row. Without
    // `range`, a SORTED aggregate keeps its running frame (unbounded
    // preceding → current row, the pre-r7 behavior); an UNSORTED one
    // spans the whole partition (pyLibrary: an unordered window is
    // the partition aggregate — the "share of group" shape), which is
    // also the only deterministic reading.
    val framed: WindowSpec =
      if (w.has("range")) {
        require(sorts.nonEmpty,
          "jx window range requires a sort clause (a sliding frame is meaningless unordered)")
        val r = w.get("range")
        val mn = req(r, "min").asLong()
        val mx = req(r, "max").asLong()
        require(mn < mx, s"jx window range: min must be < max ($mn >= $mx)")
        spec.rowsBetween(mn, mx - 1)
      } else if (sorts.nonEmpty)
        spec.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      else spec // no sort: default frame = the whole partition
    if (aggKind == "median") {
      // EXACT partition median via the two-window rank trick — the
      // groupby median goes through the mergeable t-digest sketch
      // (engine policy, q18/q47), but a WINDOW median replicates onto
      // every partition row, so approximation buys nothing while
      // costing oracle-exactness; here rank-by-value + two positional
      // picks stay on the partition's one exchange. Running/framed
      // medians are rejected loudly: a per-frame exact median is a
      // different op (order statistics over sliding frames), and a
      // silent sketch fallback would break the window contract
      // (requires enforced above, before the generic frame handling).
      val v = value.get
      val part = Window.partitionBy(parts: _*)
      val byVal = part.orderBy(v.asc_nulls_last)
      val rn = s"__jxmed_rn_$name"
      val lo = s"__jxmed_lo_$name"
      val hi = s"__jxmed_hi_$name"
      // Column `/` is double division — cast back to the integer rank
      // domain (exact: counts are far below 2^53)
      val staged = df
        .withColumn(rn, row_number().over(byVal))
        .withColumn(lo, ((count(v).over(part) + 1) / 2).cast("long"))
        .withColumn(hi, ((count(v).over(part) + 2) / 2).cast("long"))
      // (v_lo + v_hi) / 2 — odd partitions pick the same row twice, so
      // no interpolation-formula ambiguity; one double addition + one
      // division, mirrored term-for-term by the oracle. count(v)
      // excludes nulls and nulls rank last, so the picks are always
      // non-null (an all-null partition yields lo = 0 → median null).
      val vlo = max(when(col(rn) === col(lo), v)).over(part)
      val vhi = max(when(col(rn) === col(hi), v)).over(part)
      staged.withColumn(name, (vlo + vhi).cast("double") / 2.0)
        .drop(rn, lo, hi)
    } else {
      val column = aggKind match {
        case "rownum" | "rank" => row_number().over(spec)
        // Sums (and averages) through DECIMAL(18,4): window frames may
        // be accumulated differently by different engines; decimal
        // addition is exact either way (engine-wide policy, SURVEY §5).
        case "sum" => sum(graft.util.dsumCast(value.get, 4)).over(framed).cast("double")
        case "average" | "avg" =>
          sum(graft.util.dsumCast(value.get, 4)).over(framed).cast("double") /
            count(value.get).over(framed)
        case "count" => count(value.getOrElse(lit(1))).over(framed)
        case "minimum" | "min" => min(value.get).over(framed)
        case "maximum" | "max" => max(value.get).over(framed)
        case other => throw new IllegalArgumentException(s"jx window aggregate not supported: $other")
      }
      df.withColumn(name, column)
    }
  }

  private def fieldName(n: JsonNode): String =
    if (n.isTextual) n.asText() else req(n, "value").asText()

  /** {f1: v1, f2: v2} → cmp(f1,v1) AND cmp(f2,v2); [e1, e2] →
    * cmp(e1,e2). An OBJECT value is a nested expression (not a
    * literal): `{"gte": {"ts": {"date": "2024-01-08"}}}` compares the
    * field against the compiled expression — the shape reference
    * queries use for date-literal bounds.
    */
  private def fieldCompares(arg: JsonNode, cmp: (Column, Column) => Column): Column =
    if (arg.isArray) {
      val es = arg.asScala.map(compileExpr).toSeq
      cmp(es.head, es(1))
    } else {
      arg.properties().asScala.map { e =>
        cmp(fcol(e.getKey), rhs(e.getValue))
      }.reduce(_ && _)
    }

  /** Comparison right-hand side: object → nested expression, scalar →
    * literal.
    */
  private def rhs(n: JsonNode): Column =
    if (n.isObject) compileExpr(n) else lit(jvalue(n))

  /** jx eq/ne: like [[fieldCompares]], plus pyLibrary's list sugar —
    * `{"eq": {"f": [a, b]}}` matches ANY listed value (IN), `ne`
    * matches none; an EMPTY eq-list matches nothing (and its negation
    * everything), where a bare isin would error.
    *
    * Missing-value semantics (pyLibrary): a missing field is NOT any
    * value, so `ne` MATCHES missing docs — the negation goes through
    * `!coalesce(eq, false)` rather than SQL's three-valued `NOT`,
    * which would return NULL for null fields and silently drop
    * exactly the rows the reference keeps. The two-expression array
    * form uses the null-safe comparison for the same reason.
    */
  private def fieldComparesEq(arg: JsonNode, negate: Boolean): Column =
    if (arg.isArray) {
      val es = arg.asScala.map(compileExpr).toSeq
      if (negate) !(es.head <=> es(1)) else es.head === es(1)
    } else {
      arg.properties().asScala.map { e =>
        val base =
          if (e.getValue.isArray) {
            val vs = e.getValue.asScala.toSeq.map(jvalue)
            if (vs.isEmpty) lit(false) else fcol(e.getKey).isin(vs: _*)
          } else fcol(e.getKey) === rhs(e.getValue)
        if (negate) !coalesce(base, lit(false)) else base
      }.reduce(_ && _)
    }

  /** {field: spec} operator argument — exactly one property, loudly. */
  private def firstField(o: JsonNode): (String, JsonNode) = {
    val props = o.properties().asScala.toSeq
    require(props.size == 1,
      s"jx operator argument must have exactly one field, got: ${props.map(_.getKey).mkString(", ")}")
    (props.head.getKey, props.head.getValue)
  }

  /** {op: arg} operator object — exactly one property, loudly (a
    * second property is a typo the first-property read would silently
    * swallow; when/then/else objects are matched before this).
    */
  private def single(o: JsonNode): (String, JsonNode) = {
    val props = o.properties().asScala.toSeq
    require(props.size == 1,
      s"jx operator object must have exactly one property, got: ${props.map(_.getKey).mkString(", ")}")
    (props.head.getKey, props.head.getValue)
  }

  /** Every source field a query document references — the lenient
    * mode's injection set. Mirrors compileExpr's grammar (keep the two
    * in sync when adding operators): textual nodes in expression
    * position are fields; object keys of comparison/`firstField`
    * operators are fields; literals and operator names are not.
    */
  private[jx] def referencedFields(q: JsonNode): Set[String] = {
    def expr(n: JsonNode): Set[String] = n match {
      case t if t.isTextual => Set(t.asText())
      case o if o.isObject && o.has("when") =>
        expr(o.get("when")) ++
          (if (o.has("then")) expr(o.get("then")) else Set.empty) ++
          (if (o.has("else")) expr(o.get("else")) else Set.empty)
      case o if o.isObject =>
        val (op, arg) = single(o)
        op match {
          case "literal" => Set.empty
          case "missing" | "exists" => Set(arg.asText())
          case "eq" | "ne" | "neq" | "gt" | "gte" | "lt" | "lte" =>
            if (arg.isArray) arg.asScala.flatMap(expr).toSet
            else arg.properties().asScala.flatMap { e =>
              // object RHS = nested expression; scalars/lists are literals
              Set(e.getKey) ++
                (if (e.getValue.isObject) expr(e.getValue) else Set.empty)
            }.toSet
          // textual `date` arg is a literal datetime string, not a field
          case "date" => if (arg.isObject) expr(arg) else Set.empty
          // trailing unit keyword is grammar, not a field reference
          case "date_diff" | "date_add" =>
            arg.asScala.toSeq.take(2).flatMap(expr).toSet
          case "floor" if arg.isArray && arg.size() == 2 &&
              arg.get(1).isTextual && calendarUnits.contains(arg.get(1).asText()) =>
            expr(arg.get(0))
          case "in" | "prefix" | "suffix" | "find" | "contains" | "regex" |
               "regexp" | "left" | "right" | "not_left" | "not_right" |
               "between" =>
            Set(firstField(arg)._1)
          case "case" => arg.asScala.flatMap(expr).toSet
          case _ => // and/or/not/arithmetic/string/coalesce: args are exprs
            if (arg.isArray) arg.asScala.flatMap(expr).toSet else expr(arg)
        }
      case _ => Set.empty // numbers, booleans, nulls
    }
    def selOrField(n: JsonNode): Set[String] = n match {
      case t if t.isTextual => if (t.asText() == "*") Set.empty else Set(t.asText())
      case o if o.isObject && o.has("value") => expr(o.get("value"))
      case _ => Set.empty
    }
    def sortFields(n: JsonNode): Set[String] = asList(n).flatMap {
      case s if s.isTextual => Set(s.asText())
      case o if o.has("value") => expr(o.get("value"))
      case _ => Set.empty[String]
    }.toSet
    (if (q.has("where")) expr(q.get("where")) else Set.empty[String]) ++
      (if (q.has("select")) asList(q.get("select")).flatMap(selOrField) else Nil) ++
      (if (q.has("groupby")) asList(q.get("groupby")).flatMap(selOrField) else Nil) ++
      (if (q.has("edges")) asList(q.get("edges")).flatMap(selOrField) else Nil) ++
      (if (q.has("sort")) sortFields(q.get("sort")) else Set.empty[String]) ++
      (if (q.has("window")) asList(q.get("window")).flatMap { w =>
        (if (w.has("value")) expr(w.get("value")) else Set.empty[String]) ++
          (if (w.has("edges")) asList(w.get("edges")).flatMap {
            case t if t.isTextual => Set(t.asText())
            case o if o.isObject && o.has("value") => expr(o.get("value"))
            case _ => Set.empty[String]
          } else Nil) ++
          (if (w.has("sort")) sortFields(w.get("sort")) else Set.empty[String])
      } else Nil)
  }

  /** Output names the query itself defines (select/window/aggregate
    * names) — these resolve against the query result, never injected.
    */
  private[jx] def definedNames(q: JsonNode): Set[String] = {
    val sel = if (q.has("select")) asList(q.get("select")) else Nil
    val win = if (q.has("window")) asList(q.get("window")) else Nil
    val edg = if (q.has("edges")) asList(q.get("edges")) else Nil
    sel.collect { case o if o.isObject && o.has("name") => o.get("name").asText() }.toSet ++
      sel.collect { case o if o.isObject && o.has("aggregate") => aggName(o) } ++
      win.collect { case w if w.has("name") => w.get("name").asText() } ++
      edg.collect { case e if !e.isTextual && e.has("name") => e.get("name").asText() }
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
