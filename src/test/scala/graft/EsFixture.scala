package graft

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.sun.net.httpserver.{HttpExchange, HttpServer}

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import scala.collection.mutable

  /** ES-7 fixture: physical indices with external-versioned docs +
    * gc_deletes-style tombstones, aliases as one-name indirection,
    * server-side scroll contexts, shape validation on every endpoint.
    */
private[graft] class EsFixture(failEveryNth: Int = 0) {
    private val mapper = new ObjectMapper()
    // index -> id -> (version, sourceJson)
    val indices = mutable.Map.empty[String, mutable.Map[String, (Long, String)]]
    val tombstones = mutable.Map.empty[String, mutable.Map[String, Long]]
    val aliases = mutable.Map.empty[String, String] // alias -> index
    val mappings = mutable.Map.empty[String, String] // index -> mapping json
    // scrollId -> remaining pages (each page = seq of source docs)
    val scrolls = mutable.Map.empty[String, mutable.Queue[Seq[String]]]
    // pitId -> frozen (docId, source) snapshot taken at PIT open
    val pits = mutable.Map.empty[String, Seq[(String, String)]]
    var pitSearches = 0
    var searchRequests = 0
    // range specs received inside scroll bodies — lets a spec assert
    // that a watermark predicate really landed server-side
    val rangesSeen = mutable.Buffer.empty[String]
    var scrollContinuations = 0
    var bulkRequests = 0
    var failures = 0
    var badRequests = 0
    // per-item transient-rejection injection: the next bulk request
    // 429s its first N actions (not applied) — ES's rejected_execution
    // pushback shape; reset to 0 after firing
    var rejectNextBulkItems = 0
    var itemRejections = 0
    // ids that permanently 400 (mapper_parsing) on every bulk
    val failItemIds = mutable.Set.empty[String]
    // (method, path, Authorization header) per request — auth specs
    val requestsSeen = mutable.Buffer.empty[(String, String, Option[String])]
    private val lock = new Object

    private def resolve(name: String): Option[String] =
      if (indices.contains(name)) Some(name) else aliases.get(name)

    private def docsOf(name: String) =
      indices.getOrElseUpdate(name, mutable.Map.empty)
    private def tombsOf(name: String) =
      tombstones.getOrElseUpdate(name, mutable.Map.empty)

    private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)

    private def fail400(x: HttpExchange, why: String): Unit = {
      badRequests += 1
      val b = s"""{"error":"$why","status":400}""".getBytes(UTF_8)
      x.sendResponseHeaders(400, b.length)
      x.getResponseBody.write(b); x.close()
    }

    private def respond(x: HttpExchange, body: String, code: Int = 200): Unit = {
      val b = body.getBytes(UTF_8)
      x.sendResponseHeaders(code, if (b.isEmpty) -1 else b.length)
      if (b.nonEmpty) x.getResponseBody.write(b)
      x.close()
    }

    /** `POST /_bulk`: pairs of action+source (index) or lone action
      * (delete), external_gte versioning, per-item ES-shaped results.
      */
    private def handleBulk(x: HttpExchange): Unit = {
      bulkRequests += 1
      if (x.getRequestHeaders.getFirst("Content-Type") != "application/x-ndjson")
        return fail400(x, "bulk requires Content-Type application/x-ndjson")
      val lines = new String(x.getRequestBody.readAllBytes(), UTF_8)
        .linesIterator.filter(_.nonEmpty).toSeq
      val items = mutable.Buffer.empty[String]
      var i = 0
      var errors = false
      var rejectLeft = rejectNextBulkItems
      rejectNextBulkItems = 0
      while (i < lines.length) {
        val action = mapper.readTree(lines(i))
        val op =
          if (action.has("index")) "index"
          else if (action.has("delete")) "delete"
          else return fail400(x, s"unknown bulk action: ${lines(i)}")
        val meta = action.get(op)
        val idxName = Option(meta.get("_index")).map(_.asText())
          .getOrElse(return fail400(x, "action missing _index"))
        val id = Option(meta.get("_id")).map(_.asText())
          .getOrElse(return fail400(x, "action missing _id"))
        val vt = Option(meta.get("version_type")).map(_.asText()).getOrElse("")
        if (vt != "external" && vt != "external_gte")
          return fail400(x, s"version_type must be external/external_gte, got '$vt'")
        val version = Option(meta.get("version")).map(_.asLong())
          .getOrElse(return fail400(x, "action missing version"))
        val target = resolve(idxName)
          .getOrElse(return fail400(x, s"unknown index $idxName"))
        val docs = docsOf(target); val tombs = tombsOf(target)
        val gte = vt == "external_gte"
        def wins(stored: Long): Boolean =
          if (gte) version >= stored else version > stored
        if (rejectLeft > 0) {
          // transient per-item pushback: NOT applied, item status 429
          rejectLeft -= 1; itemRejections += 1; errors = true
          items += s"""{"$op":{"_index":"$target","_id":"$id","status":429,"error":{"type":"es_rejected_execution_exception"}}}"""
          if (op == "index") i += 1 // skip the unapplied source line
        } else if (failItemIds.contains(id)) {
          errors = true
          items += s"""{"$op":{"_index":"$target","_id":"$id","status":400,"error":{"type":"mapper_parsing_exception"}}}"""
          if (op == "index") i += 1
        } else op match {
          case "index" =>
            i += 1
            if (i >= lines.length)
              return fail400(x, "index action without source line")
            val src = lines(i)
            mapper.readTree(src) // must be valid JSON
            val ok = docs.get(id).forall(d => wins(d._1)) &&
              tombs.get(id).forall(tv => wins(tv) && version != tv)
            if (ok) {
              docs(id) = (version, src)
              items += s"""{"index":{"_index":"$target","_id":"$id","_version":$version,"status":200}}"""
            } else {
              errors = true
              items += s"""{"index":{"_index":"$target","_id":"$id","status":409,"error":{"type":"version_conflict_engine_exception"}}}"""
            }
          case "delete" =>
            if (!docs.contains(id) && !tombs.contains(id)) {
              errors = true
              items += s"""{"delete":{"_index":"$target","_id":"$id","status":404,"result":"not_found"}}"""
            } else if (docs.get(id).forall(d => wins(d._1))) {
              docs.remove(id)
              tombs(id) = math.max(version, tombs.getOrElse(id, Long.MinValue))
              items += s"""{"delete":{"_index":"$target","_id":"$id","_version":$version,"status":200}}"""
            } else {
              errors = true
              items += s"""{"delete":{"_index":"$target","_id":"$id","status":409,"error":{"type":"version_conflict_engine_exception"}}}"""
            }
        }
        i += 1
      }
      respond(x, s"""{"took":1,"errors":$errors,"items":[${items.mkString(",")}]}""")
    }

    /** `POST /{index}/_search?scroll=...`: validates the slice/sort/
      * size body, builds the server-side scroll context, returns the
      * first page ES-shaped.
      */
    private def handleSearch(x: HttpExchange, name: String): Unit = {
      searchRequests += 1
      if (failEveryNth > 0 && searchRequests % failEveryNth == 0) {
        failures += 1
        x.sendResponseHeaders(503, -1); x.close(); return
      }
      val target = resolve(name) match {
        case Some(t) => t
        case None => return respond(x,
          s"""{"error":{"type":"index_not_found_exception"},"status":404}""", 404)
      }
      val body = mapper.readTree(new String(x.getRequestBody.readAllBytes(), UTF_8))
      // aggregation search (watermark poll) — no scroll
      if (body.has("aggs")) {
        val field = body.at("/aggs/wm/max/field").asText()
        val vals = docsOf(target).values.flatMap { case (_, src) =>
          Option(mapper.readTree(src).get(field)).map(_.asLong()) }
        val v = if (vals.isEmpty) "null" else vals.max.toString
        return respond(x,
          s"""{"hits":{"total":{"value":${docsOf(target).size}}},"aggregations":{"wm":{"value":$v}}}""")
      }
      val q = Option(x.getRequestURI.getQuery).getOrElse("")
      if (!q.contains("scroll="))
        return fail400(x, "search without scroll= param")
      val size = Option(body.get("size")).map(_.asInt())
        .getOrElse(return fail400(x, "scroll search missing size"))
      if (body.at("/sort/0").asText() != "_doc")
        return fail400(x, "scroll search must sort by _doc")
      val (sliceId, sliceMax) =
        if (body.has("slice"))
          (body.at("/slice/id").asInt(), body.at("/slice/max").asInt())
        else (0, 1)
      if (sliceId < 0 || sliceMax < 1 || sliceId >= sliceMax)
        return fail400(x, "bad slice spec")
      val query = body.get("query")
      if (query == null) return fail400(x, "scroll search missing query")
      if (query.has("range")) rangesSeen += query.get("range").toString
      def inRange(src: String): Boolean =
        if (query.has("match_all")) true
        else if (query.has("range")) {
          val f = query.get("range").fieldNames().next()
          val spec = query.at(s"/range/$f")
          val v = Option(mapper.readTree(src).get(f)).map(_.asLong())
            .getOrElse(Long.MinValue)
          (!spec.has("gt") || v > spec.get("gt").asLong()) &&
            (!spec.has("lte") || v <= spec.get("lte").asLong())
        } else false
      // ES slices on a hash of _id; the fixture uses the same idea
      val mine = docsOf(target).toSeq
        .filter { case (id, _) => math.floorMod(id.hashCode, sliceMax) == sliceId }
        .filter { case (_, (_, src)) => inRange(src) }
        .sortBy(_._1)
        .map(_._2._2)
      val scrollId = java.util.UUID.randomUUID().toString
      val pages = mutable.Queue(mine.grouped(size).toSeq: _*)
      val first = if (pages.isEmpty) Seq.empty else pages.dequeue()
      scrolls(scrollId) = pages
      respond(x, hitsPage(scrollId, first, target))
    }

    /** `POST /_search` with a `pit` body — ES 8 PIT + search_after.
      * Validates the PIT-native shape: no index in the path, _shard_doc
      * sort, size present; slice/range/search_after honored against
      * the FROZEN snapshot (writes after PIT open are invisible, like
      * the real thing). Sort values are the doc ids; search_after
      * resumes strictly after them.
      */
    private def handlePitSearch(x: HttpExchange): Unit = {
      searchRequests += 1
      pitSearches += 1
      if (failEveryNth > 0 && searchRequests % failEveryNth == 0) {
        failures += 1
        x.sendResponseHeaders(503, -1); x.close(); return
      }
      val body = mapper.readTree(new String(x.getRequestBody.readAllBytes(), UTF_8))
      val pitId = body.at("/pit/id").asText("")
      if (pitId.isEmpty) return fail400(x, "pit search missing pit.id")
      val snap = pits.get(pitId) match {
        case Some(v) => v
        case None => return respond(x,
          """{"error":{"type":"search_context_missing_exception"},"status":404}""", 404)
      }
      if (!body.has("size")) return fail400(x, "pit search missing size")
      val size = body.get("size").asInt()
      if (body.at("/sort/0/_shard_doc").asText("") != "asc" &&
          body.at("/sort/0").asText("") != "_shard_doc")
        return fail400(x, "pit search must sort by _shard_doc")
      val (sliceId, sliceMax) =
        if (body.has("slice"))
          (body.at("/slice/id").asInt(), body.at("/slice/max").asInt())
        else (0, 1)
      if (sliceId < 0 || sliceMax < 1 || sliceId >= sliceMax)
        return fail400(x, "bad slice spec")
      val query = body.get("query")
      if (query == null) return fail400(x, "pit search missing query")
      if (query.has("range")) rangesSeen += query.get("range").toString
      def inRange(src: String): Boolean =
        if (query.has("match_all")) true
        else if (query.has("range")) {
          val f = query.get("range").fieldNames().next()
          val spec = query.at(s"/range/$f")
          val v = Option(mapper.readTree(src).get(f)).map(_.asLong())
            .getOrElse(Long.MinValue)
          (!spec.has("gt") || v > spec.get("gt").asLong()) &&
            (!spec.has("lte") || v <= spec.get("lte").asLong())
        } else false
      val after = Option(body.get("search_after")).map(_.get(0).asText())
      val mine = snap
        .filter { case (id, _) => math.floorMod(id.hashCode, sliceMax) == sliceId }
        .filter { case (_, src) => inRange(src) }
        .sortBy(_._1)
        .dropWhile { case (id, _) => after.exists(id <= _) }
        .take(size)
      val hits = mine.map { case (id, src) =>
        s"""{"_index":"pit","_id":"$id","_source":$src,"sort":["$id"]}"""
      }.mkString(",")
      respond(x, s"""{"pit_id":"$pitId","hits":{"total":{"value":0},"hits":[$hits]}}""")
    }

    private def hitsPage(scrollId: String, docs: Seq[String], index: String): String = {
      val hits = docs.map(src =>
        s"""{"_index":"$index","_id":"x","_source":$src}""").mkString(",")
      s"""{"_scroll_id":"$scrollId","hits":{"total":{"value":0},"hits":[$hits]}}"""
    }

    /** `POST /_aliases`: validate every action BEFORE applying any —
      * the swap is atomic, exactly like the real API.
      */
    private def handleAliases(x: HttpExchange): Unit = {
      val b = mapper.readTree(new String(x.getRequestBody.readAllBytes(), UTF_8))
      val actions = b.get("actions")
      if (actions == null || !actions.isArray)
        return fail400(x, "_aliases requires an actions array")
      val parsed = (0 until actions.size()).map { i =>
        val a = actions.get(i)
        val kind = a.fieldNames().next()
        if (kind != "add" && kind != "remove")
          return fail400(x, s"unknown alias action $kind")
        val idx = a.at(s"/$kind/index").asText()
        val al = a.at(s"/$kind/alias").asText()
        if (!indices.contains(idx))
          return fail400(x, s"alias action on unknown index $idx")
        (kind, idx, al)
      }
      parsed.foreach {
        case ("add", idx, al) => aliases(al) = idx
        case (_, idx, al) =>
          if (aliases.get(al).contains(idx)) { aliases.remove(al); () }
      }
      respond(x, """{"acknowledged":true}""")
    }

    server.createContext("/", (x: HttpExchange) => lock.synchronized {
      val path = x.getRequestURI.getPath.stripPrefix("/")
      val method = x.getRequestMethod
      requestsSeen +=
        ((method, s"/$path", Option(x.getRequestHeaders.getFirst("Authorization"))))
      try {
        (method, path.split("/").toList) match {
          // wildcard index listing — real ES expands the expression
          // and returns one field per matching concrete index (empty
          // object, 200, when nothing matches)
          case ("GET", name :: Nil) if name.contains("*") =>
            val re = java.util.regex.Pattern.compile(
              name.split("\\*", -1).map(java.util.regex.Pattern.quote)
                .mkString(".*"))
            val body = indices.keys.toSeq.sorted
              .filter(n => re.matcher(n).matches())
              .map { n =>
                val als = aliases.collect {
                  case (a, i) if i == n => s""""$a":{}""" }.mkString(",")
                s""""$n":{"aliases":{$als}}"""
              }.mkString(",")
            respond(x, s"{$body}")
          case ("POST", "_bulk" :: Nil) => handleBulk(x)
          case ("POST", "_search" :: "scroll" :: Nil) =>
            scrollContinuations += 1
            searchRequests += 1
            if (failEveryNth > 0 && searchRequests % failEveryNth == 0) {
              failures += 1
              x.sendResponseHeaders(503, -1); x.close()
            } else {
            val b = mapper.readTree(new String(x.getRequestBody.readAllBytes(), UTF_8))
            if (!b.has("scroll")) fail400(x, "scroll continuation missing keep-alive")
            else {
              val id = b.get("scroll_id").asText()
              scrolls.get(id) match {
                case None => respond(x,
                  """{"error":{"type":"search_context_missing_exception"},"status":404}""", 404)
                case Some(pages) =>
                  val page = if (pages.isEmpty) Seq.empty else pages.dequeue()
                  respond(x, hitsPage(id, page, ""))
              }
            }
            }
          case ("DELETE", "_search" :: "scroll" :: Nil) =>
            val b = mapper.readTree(new String(x.getRequestBody.readAllBytes(), UTF_8))
            val it = b.get("scroll_id").elements()
            while (it.hasNext) scrolls.remove(it.next().asText())
            respond(x, """{"succeeded":true}""")
          case ("POST", name :: "_pit" :: Nil) =>
            resolve(name) match {
              case None => respond(x,
                """{"error":{"type":"index_not_found_exception"},"status":404}""", 404)
              case Some(idx) =>
                val id = java.util.UUID.randomUUID().toString
                pits(id) = docsOf(idx).toSeq.map { case (k, (_, src)) => (k, src) }
                respond(x, s"""{"id":"$id"}""")
            }
          case ("POST", "_search" :: Nil) => handlePitSearch(x)
          case ("DELETE", "_point_in_time" :: Nil) =>
            val b = mapper.readTree(new String(x.getRequestBody.readAllBytes(), UTF_8))
            pits.remove(b.get("id").asText())
            respond(x, """{"succeeded":true}""")
          case ("POST", "_aliases" :: Nil) => handleAliases(x)
          case ("GET", "_alias" :: name :: Nil) =>
            aliases.get(name) match {
              case Some(idx) => respond(x, s"""{"$idx":{"aliases":{"$name":{}}}}""")
              case None => respond(x, """{"error":"alias missing","status":404}""", 404)
            }
          case ("HEAD", name :: Nil) =>
            val code = if (resolve(name).isDefined) 200 else 404
            x.sendResponseHeaders(code, -1); x.close()
          case ("PUT", name :: Nil) =>
            if (indices.contains(name)) fail400(x, s"index $name already exists")
            else {
              val b = new String(x.getRequestBody.readAllBytes(), UTF_8)
              docsOf(name) // create
              if (b.nonEmpty) {
                val spec = mapper.readTree(b)
                val als = spec.path("aliases").fieldNames()
                while (als.hasNext) aliases(als.next()) = name
                // create-with-mappings — the real API accepts the
                // mapping document inline at index creation
                if (spec.hasNonNull("mappings"))
                  mappings(name) = spec.get("mappings").toString
              }
              respond(x, s"""{"acknowledged":true,"index":"$name"}""")
            }
          case ("DELETE", name :: Nil) =>
            if (resolve(name).isEmpty)
              respond(x, """{"error":"missing","status":404}""", 404)
            else {
              indices.remove(name); tombstones.remove(name)
              aliases.filterInPlace((_, idx) => idx != name)
              respond(x, """{"acknowledged":true}""")
            }
          case ("POST", name :: "_search" :: Nil) => handleSearch(x, name)
          case ("GET", name :: "_mapping" :: Nil) =>
            resolve(name) match {
              case None => respond(x, """{"error":"missing","status":404}""", 404)
              case Some(idx) =>
                val m = mappings.getOrElse(idx, "{}")
                respond(x, s"""{"$idx":{"mappings":$m}}""")
            }
          case ("PUT", name :: "_mapping" :: Nil) =>
            resolve(name) match {
              case None => respond(x, """{"error":"missing","status":404}""", 404)
              case Some(idx) =>
                mappings(idx) = new String(x.getRequestBody.readAllBytes(), UTF_8)
                respond(x, """{"acknowledged":true}""")
            }
          case _ => fail400(x, s"unhandled $method /$path")
        }
      } catch {
        case e: Exception =>
          respond(x, s"""{"error":"${e.getClass.getSimpleName}"}""", 500)
      }
    })

    server.setExecutor(null)
    server.start()
    val base: String = s"http://127.0.0.1:${server.getAddress.getPort}"
    def stop(): Unit = server.stop(0)
    def liveDocs: Map[String, (Long, String)] =
      aliases.get("docs").map(idx => docsOf(idx).toMap).getOrElse(Map.empty)
  }


