package graft

import graft.sources.EsDocumentStore
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import java.nio.charset.StandardCharsets.UTF_8

/** The ES wire-format store against an in-process fixture that
  * implements — and VALIDATES — the Elasticsearch 7 REST shapes the
  * client emits: `_bulk` action-and-metadata NDJSON with
  * `version_type=external_gte`, sliced `_search?scroll` + follow-up
  * `_search/scroll` pages, atomic `_aliases` swaps, `_mapping`
  * GET/PUT, `HEAD /{index}`. A request the real ES would reject
  * (missing version_type, malformed action line, unpaired source
  * line) gets a 400 here too, so passing this suite means the bytes
  * on the wire are ES-shaped — pointing the store at a real ES 7/8
  * endpoint is connection config, not code.
  */
class EsDocumentStoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir() =
    java.nio.file.Files.createTempDirectory("graft-es").toString

  /** One raw HTTP exchange through the client's retry stack — used to
    * pin fail-fast on permanent 4xx without a store method in the way.
    */
  private def rawRequest(method: String, url: String, body: String,
      headers: Map[String, String]): String = {
    val conn = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    try {
      conn.setRequestMethod(method)
      headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
      if (body.nonEmpty) {
        conn.setDoOutput(true)
        conn.getOutputStream.write(body.getBytes(UTF_8))
      }
      val code = conn.getResponseCode
      if (code != 200) throw graft.sources.HttpDocumentStore
        .HttpStatusException(code, s"$method $url -> HTTP $code")
      new String(conn.getInputStream.readAllBytes(), UTF_8)
    } finally conn.disconnect()
  }

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType),
    StructField("rev", LongType)))

  private def store(f: EsFixture, slices: Int = 2, pageSize: Int = 2) =
    EsDocumentStore(f.base, "docs", Seq("id"), "rev", schema,
      slices = slices, pageSize = pageSize, batchSize = 3)

  test("bulk push + sliced scroll scan round-trip through the ES wire format") {
    val f = new EsFixture
    try {
      val s = store(f)
      s.exists(spark) shouldBe false
      s.push((1L to 9L).map(i => (i, s"v$i", 1L)).toDF("id", "v", "rev"))
      s.exists(spark) shouldBe true
      s.scan(spark).select($"id", $"v").as[(Long, String)].collect().toSet shouldBe
        (1L to 9L).map(i => (i, s"v$i")).toSet
      // the wire was genuinely ES: bulk bodies validated, scroll pages
      // continued via _search/scroll, nothing got a 400
      f.bulkRequests should be >= 3 // 9 docs / batchSize 3
      f.scrollContinuations should be >= 1 // pageSize 2 forces chains
      f.scrolls shouldBe empty // contexts released, not leaked to keepalive
      f.badRequests shouldBe 0
    } finally f.stop()
  }

  test("external_gte versioning: latest wins, stale rejected as 409, redelivery idempotent") {
    val f = new EsFixture
    try {
      val s = store(f)
      s.push(Seq((1L, "new", 5L)).toDF("id", "v", "rev"))
      // stale update loses as a per-item 409 — absorbed, not an error
      s.push(Seq((1L, "old", 3L)).toDF("id", "v", "rev"))
      s.scan(spark).select($"v").as[String].collect().toSeq shouldBe Seq("new")
      // exact redelivery is idempotent under external_gte
      s.push(Seq((1L, "new", 5L)).toDF("id", "v", "rev"))
      s.scan(spark).count() shouldBe 1
      f.liveDocs("1")._1 shouldBe 5L
      f.badRequests shouldBe 0
    } finally f.stop()
  }

  test("bulk delete: versioned removal, stale deletes ignored, tombstones block resurrection") {
    val f = new EsFixture
    try {
      val s = store(f)
      s.push(Seq((1L, "a", 10L), (2L, "b", 10L), (3L, "c", 10L))
        .toDF("id", "v", "rev"))
      // delete 1 at a newer rev, and 3 at an OLDER rev (must lose)
      s.delete(Seq((1L, 20L), (3L, 5L)).toDF("id", "rev"))
      s.scan(spark).select($"id").as[Long].collect().toSet shouldBe Set(2L, 3L)
      // a late stale upsert of the deleted key cannot resurrect it
      s.push(Seq((1L, "zombie", 15L)).toDF("id", "v", "rev"))
      s.scan(spark).select($"id").as[Long].collect().toSet shouldBe Set(2L, 3L)
      // redelivering the delete batch is a no-op
      s.delete(Seq((1L, 20L), (3L, 5L)).toDF("id", "rev"))
      s.scan(spark).select($"id").as[Long].collect().toSet shouldBe Set(2L, 3L)
      f.badRequests shouldBe 0
    } finally f.stop()
  }

  test("sync is a staged reindex behind one atomic _aliases swap; absent keys deleted") {
    val f = new EsFixture
    try {
      val s = store(f)
      s.push(Seq((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L))
        .toDF("id", "v", "rev"))
      val gen1 = f.aliases("docs")
      s.sync(Seq((2L, "b2", 2L), (4L, "d", 2L)).toDF("id", "v", "rev"))
      // the alias rolled to a NEW physical index; the old one is gone
      f.aliases("docs") should not be gen1
      f.indices.keySet should not contain gen1
      s.scan(spark).select($"id", $"v").as[(Long, String)].collect().toSet shouldBe
        Set((2L, "b2"), (4L, "d"))
      f.badRequests shouldBe 0
    } finally f.stop()
  }

  test("scroll retry absorbs transient 503s; ES-shape violations fail fast as 400") {
    val f = new EsFixture(failEveryNth = 3)
    try {
      val s = store(f)
      s.push((1L to 9L).map(i => (i, s"v$i", 1L)).toDF("id", "v", "rev"))
      s.scan(spark).select($"id").as[Long].collect().toSet shouldBe (1L to 9L).toSet
      f.failures should be >= 1
    } finally f.stop()
    // and a permanent 4xx is NOT retried: a bulk without the ndjson
    // content type dies on the first attempt
    val f2 = new EsFixture
    try {
      val before = System.nanoTime()
      an[Exception] should be thrownBy
        graft.sources.HttpDocumentStore.withRetry("bulk shape probe")(
          rawRequest("POST", s"${f2.base}/_bulk", "{}",
            Map("Content-Type" -> "application/json")))
      val elapsedMs = (System.nanoTime() - before) / 1000000
      f2.badRequests shouldBe 1 // one attempt, no retries
      elapsedMs should be < 1000L // no backoff sleeps
    } finally f2.stop()
  }

  test("mapping management over /_mapping: put/get round-trip, ensure is create-if-absent") {
    val f = new EsFixture
    try {
      val s = store(f)
      s.getMapping shouldBe None
      s.ensureMapping("""{"properties":{"id":{"type":"long"}}}""") shouldBe true
      s.getMapping shouldBe Some("""{"properties":{"id":{"type":"long"}}}""")
      s.ensureMapping("""{"properties":{}}""") shouldBe false
      s.getMapping shouldBe Some("""{"properties":{"id":{"type":"long"}}}""")
      s.putMapping("""{"properties":{"v":{"type":"keyword"}}}""")
      s.getMapping shouldBe Some("""{"properties":{"v":{"type":"keyword"}}}""")
      f.badRequests shouldBe 0
    } finally f.stop()
  }

  test("sync carries the pinned mapping onto the staging generation") {
    val f = new EsFixture
    try {
      val s = store(f)
      s.ensureMapping("""{"properties":{"id":{"type":"long"}}}""") shouldBe true
      s.push(Seq((1L, "a", 1L)).toDF("id", "v", "rev"))
      s.sync(Seq((2L, "b", 2L)).toDF("id", "v", "rev"))
      // the reindex rolled the physical index — the explicit mapping
      // must survive the roll, or every sync silently downgrades
      // pinned field types to dynamic inference
      s.getMapping shouldBe Some("""{"properties":{"id":{"type":"long"}}}""")
      s.ensureMapping("""{"properties":{}}""") shouldBe false // still create-if-absent
      f.badRequests shouldBe 0
    } finally f.stop()
  }

  test("watermark poll via max aggregation, and the bracketed incremental scan") {
    val f = new EsFixture
    try {
      val s = store(f)
      s.maxWatermark("rev") shouldBe None
      s.push(Seq((1L, "a", 3L), (2L, "b", 7L), (3L, "c", 5L))
        .toDF("id", "v", "rev"))
      s.maxWatermark("rev") shouldBe Some(7L)
      // server-side range-in-scroll: only 3 < rev <= 7
      s.scanSince(spark, Some("rev"), Some(3L), Some(7L))
        .select($"id").as[Long].collect().toSet shouldBe Set(2L, 3L)
      f.badRequests shouldBe 0
    } finally f.stop()
  }

  test("capstone: the reference's ETL loop against the ES-wire store") {
    import graft.sources.{EtlPipeline, ParquetStore}
    val f = new EsFixture
    try {
      val closureSchema = StructType(Seq(
        StructField("ancestor", LongType), StructField("descendant", LongType),
        StructField("depth", org.apache.spark.sql.types.IntegerType),
        StructField("rev", LongType)))
      val dest = EsDocumentStore(f.base, "docs",
        Seq("ancestor", "descendant"), "rev", closureSchema,
        slices = 2, pageSize = 2, batchSize = 3)
      val base = tmpDir()
      val edges = Seq((10L, 1L, 1L), (12L, 10L, 2L), (13L, 12L, 3L))
        .toDF("child", "parent", "m")
      val r = EtlPipeline.run(spark, edges, "m", dest, s"$base/wm")
      r.pushed should be > 0L
      dest.scan(spark).select($"ancestor", $"descendant", $"depth")
        .as[(Long, Long, Int)].collect().toSet shouldBe
        graft.operators.Hierarchy.closure(edges.select($"child", $"parent"))
          .as[(Long, Long, Int)].collect().toSet
      f.badRequests shouldBe 0
    } finally f.stop()
  }

  test("per-item 429 pushback mid-bulk: only the rejected actions are resent, push completes") {
    val f = new EsFixture
    try {
      val s = store(f)
      f.rejectNextBulkItems = 2
      s.push(Seq((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L))
        .toDF("id", "v", "rev").repartition(1))
      // the first bulk saw 2 transient rejections; the retry resent
      // ONLY those two and the push still completed — no task death
      f.itemRejections shouldBe 2
      s.scan(spark).select($"id", $"v").as[(Long, String)].collect().toSet shouldBe
        Set((1L, "a"), (2L, "b"), (3L, "c"))
      f.bulkRequests should be >= 2
      f.badRequests shouldBe 0
    } finally f.stop()
  }

  test("a permanent per-item 400 fails fast — no backoff delay for a document that stays bad") {
    val f = new EsFixture
    try {
      val s = store(f)
      f.failItemIds += "2"
      val t0 = System.nanoTime()
      intercept[Exception] {
        s.push(Seq((1L, "a", 1L), (2L, "bad", 1L)).toDF("id", "v", "rev")
          .repartition(1))
      }
      // failed without burning the 429 backoff schedule (200+400+800ms)
      (System.nanoTime() - t0) / 1e9 should be < 30.0
      f.itemRejections shouldBe 0
      // the good doc in the same bulk still landed (applied before the throw)
      f.liveDocs.keySet shouldBe Set("1")
    } finally f.stop()
  }

  test("composite _id is injective: colon/percent inside key values never collide; null key fails loudly") {
    val f = new EsFixture
    try {
      val sch = StructType(Seq(StructField("k1", StringType),
        StructField("k2", StringType), StructField("rev", LongType)))
      val s = EsDocumentStore(f.base, "docs", Seq("k1", "k2"), "rev", sch,
        slices = 2, pageSize = 2, batchSize = 3)
      // a raw ":"-join would merge the first two rows onto one _id
      s.push(Seq(("a:b", "c", 1L), ("a", "b:c", 1L), ("50%", "x:y", 1L))
        .toDF("k1", "k2", "rev"))
      s.scan(spark).count() shouldBe 3
      f.liveDocs.keySet shouldBe Set("a%3Ab:c", "a:b%3Ac", "50%25:x%3Ay")
      // NULL key: concat_ws would silently SKIP it, aliasing (a,NULL)
      // with (a) — the store must refuse instead
      val err = intercept[Exception] {
        s.push(Seq((null.asInstanceOf[String], "x", 9L)).toDF("k1", "k2", "rev"))
      }
      val msgs = Iterator.iterate(err: Throwable)(_.getCause).takeWhile(_ != null)
        .map(_.getMessage).mkString(" | ")
      msgs should include("null key column")
      s.scan(spark).count() shouldBe 3
    } finally f.stop()
  }

  test("sync sweeps orphaned generations; sibling stores' indices are never touched") {
    import scala.collection.mutable
    val f = new EsFixture
    try {
      val s = store(f)
      s.push(Seq((1L, "a", 1L)).toDF("id", "v", "rev")) // docs-1 + alias
      // a crashed earlier sync: staging generation that never cut over
      f.indices("docs-1699999999999-ab12cd34") =
        mutable.Map("9" -> (1L, """{"id":9,"v":"orphan","rev":1}"""))
      // a failed post-cutover DELETE: old generation no longer aliased
      f.indices("docs-7") =
        mutable.Map("8" -> (1L, """{"id":8,"v":"stale","rev":1}"""))
      // SIBLING stores whose alias merely starts with ours — including
      // the nasty NUMERIC sibling: alias "docs-2"'s gen-1 index
      // "docs-2-1" must not parse as docs' epoch "2" + uniq "1"
      f.indices("docs-v2-1") =
        mutable.Map("7" -> (1L, """{"id":7,"v":"keep","rev":1}"""))
      f.indices("docs-2-1") =
        mutable.Map("6" -> (1L, """{"id":6,"v":"keep","rev":1}"""))
      // a CONCURRENT sync's in-flight staging (fresh millis): matches
      // the generation shape but is younger than the sweep age gate
      val fresh = s"docs-${System.currentTimeMillis()}-0123abcd"
      f.indices(fresh) =
        mutable.Map("5" -> (1L, """{"id":5,"v":"inflight","rev":1}"""))
      s.sync(Seq((2L, "b", 2L)).toDF("id", "v", "rev"))
      f.indices.keySet should not contain "docs-1699999999999-ab12cd34"
      f.indices.keySet should not contain "docs-7"
      f.indices.keySet should not contain "docs-1" // post-cutover delete
      f.indices.keySet should contain("docs-v2-1")
      f.indices.keySet should contain("docs-2-1")
      f.indices.keySet should contain(fresh)
      s.scan(spark).select($"id", $"v").as[(Long, String)].collect().toSet shouldBe
        Set((2L, "b"))
      f.badRequests shouldBe 0
    } finally f.stop()
  }

  test("configured auth headers ride EVERY request type the store makes") {
    val f = new EsFixture
    try {
      val auth = "ApiKey c2VjcmV0MTIz"
      val s = EsDocumentStore(f.base, "docs", Seq("id"), "rev", schema,
        slices = 2, pageSize = 2, batchSize = 3,
        headers = Map("Authorization" -> auth))
      s.exists(spark) shouldBe false                       // HEAD
      s.ensureMapping("""{"properties":{"id":{"type":"long"}}}""") // PUT index + _mapping
      s.push((1L to 5L).map(i => (i, s"v$i", 1L)).toDF("id", "v", "rev")) // _bulk
      s.maxWatermark("rev") shouldBe Some(1L)              // _search agg
      s.scan(spark).count() shouldBe 5                     // scroll chain + DELETE scroll
      s.delete(Seq((5L, 2L)).toDF("id", "rev"))            // _bulk delete
      s.sync(Seq((1L, "a", 3L)).toDF("id", "v", "rev"))    // wildcard GET, _alias, _aliases, PUT, DELETE
      val unauthed = f.requestsSeen.filterNot(_._3.contains(auth))
      withClue(s"requests missing the auth header: $unauthed") {
        unauthed shouldBe empty
      }
      // and the sweep genuinely exercised the whole surface
      val kinds = f.requestsSeen.map(r => (r._1, r._2.takeWhile(_ != '?'))).toSet
      kinds should contain allOf (
        ("HEAD", "/docs"), ("POST", "/_bulk"), ("POST", "/docs/_search"),
        ("POST", "/_search/scroll"), ("DELETE", "/_search/scroll"),
        ("GET", "/docs/_mapping"), ("POST", "/_aliases"), ("GET", "/_alias/docs"),
        ("GET", "/docs-*"))
      f.badRequests shouldBe 0
    } finally f.stop()
  }

  test("PIT + search_after read mode: identical results to scroll, snapshot isolation, context released") {
    val f = new EsFixture
    try {
      store(f).push((1L to 9L).map(i => (i, s"v$i", i)).toDF("id", "v", "rev"))
      val sp = EsDocumentStore(f.base, "docs", Seq("id"), "rev", schema,
        slices = 2, pageSize = 2, batchSize = 3, readMode = "pit")
      sp.scan(spark).select($"id", $"v").as[(Long, String)].collect().toSet shouldBe
        (1L to 9L).map(i => (i, s"v$i")).toSet
      f.pitSearches should be >= 2 // pageSize 2 forces search_after chains
      f.pits shouldBe empty // released at exhaustion
      // watermark bracket rides inside the PIT search body too
      sp.scanSince(spark, Some("rev"), Some(3L), Some(7L))
        .select($"id").as[Long].collect().toSet shouldBe Set(4L, 5L, 6L, 7L)
      f.rangesSeen.exists(r => r.contains("\"gt\":3") && r.contains("\"lte\":7")) shouldBe true
      f.badRequests shouldBe 0
    } finally f.stop()
  }

  test("PIT read retries absorb transient 503s like the scroll path") {
    val f = new EsFixture(failEveryNth = 3)
    try {
      store(f).push((1L to 9L).map(i => (i, s"v$i", i)).toDF("id", "v", "rev"))
      val sp = EsDocumentStore(f.base, "docs", Seq("id"), "rev", schema,
        slices = 2, pageSize = 2, batchSize = 3, readMode = "pit")
      sp.scan(spark).select($"id").as[Long].collect().toSet shouldBe (1L to 9L).toSet
      f.failures should be >= 1
      f.pits shouldBe empty
    } finally f.stop()
  }
}
