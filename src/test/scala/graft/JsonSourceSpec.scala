package graft

import graft.sources.JsonLinesSource
import java.nio.file.Files

/** NDJSON source + jx dot-path flattening: nested documents read from
  * disk must surface as flat dot-named columns with intact values and
  * missing fields as NULL (jx "missing" semantics).
  */
class JsonSourceSpec extends SparkSpec {
  import spark.implicits._

  test("nested NDJSON flattens to dot-named columns") {
    val dir = Files.createTempDirectory("graft-ndjson").toFile
    dir.deleteOnExit()
    val f = new java.io.File(dir, "docs.json")
    val w = new java.io.PrintWriter(f)
    w.println("""{"id": 1, "bug": {"status": "open", "meta": {"votes": 7}}, "score": 1.5}""")
    w.println("""{"id": 2, "bug": {"status": "fixed", "meta": {"votes": 0}}}""")
    w.println("""{"id": 3, "bug": {"status": "open"}}""")
    w.close()

    val flat = JsonLinesSource.readFlat(spark, f.getPath)
    flat.columns.toSet shouldBe Set("id", "bug.status", "bug.meta.votes", "score")

    val rows = flat
      .select($"id", $"`bug.status`", $"`bug.meta.votes`", $"score")
      .as[(Long, String, Option[Long], Option[Double])]
      .collect().sortBy(_._1).toSeq
    rows shouldBe Seq(
      (1L, "open", Some(7L), Some(1.5)),
      (2L, "fixed", Some(0L), None),
      (3L, "open", None, None))
  }

  test("corrupt lines surface as nulls, valid lines survive (permissive)") {
    val dir = Files.createTempDirectory("graft-ndjson3").toFile
    dir.deleteOnExit()
    val f = new java.io.File(dir, "docs.json")
    val w = new java.io.PrintWriter(f)
    w.println("""{"id": 1, "v": 10}""")
    w.println("""{"id": 2, "v": """) // truncated — a partial bulk write
    w.println("""{"id": 3, "v": 30}""")
    w.close()

    val flat = JsonLinesSource.readFlat(spark, f.getPath)
    // permissive mode: good rows intact, the broken row null-padded
    flat.where($"id".isNotNull).count() shouldBe 2L
    flat.count() shouldBe 3L
  }

  test("flattened columns feed jx-style filters") {
    val dir = Files.createTempDirectory("graft-ndjson2").toFile
    dir.deleteOnExit()
    val f = new java.io.File(dir, "docs.json")
    val w = new java.io.PrintWriter(f)
    (1 to 10).foreach(i =>
      w.println(s"""{"id": $i, "bug": {"votes": ${i * 2}}}"""))
    w.close()

    val flat = JsonLinesSource.readFlat(spark, f.getPath)
    flat.where($"`bug.votes`" >= 10).count() shouldBe 6L
  }
}
