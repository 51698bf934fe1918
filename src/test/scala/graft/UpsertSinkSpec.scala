package graft

import graft.sources.ParquetUpsertSink
import java.nio.file.Files

/** Keyed upsert sink: initial load, then a second push with newer
  * revisions for some keys and brand-new keys — latest revision must
  * win, untouched keys must survive, and no key may duplicate.
  */
class UpsertSinkSpec extends SparkSpec {
  import spark.implicits._

  test("latest-revision-wins merge over two pushes") {
    val dir = Files.createTempDirectory("graft-upsert").toFile
    dir.deleteOnExit()
    val path = dir.getPath + "/table"

    val push1 = Seq(
      (1L, 1L, "a-v1"), (2L, 1L, "b-v1"), (3L, 2L, "c-v2"),
      (3L, 1L, "c-v1") // same batch carries two revisions of key 3
    ).toDF("id", "rev", "payload")
    ParquetUpsertSink.upsert(push1, path, Seq("id"), "rev", numBuckets = 8)

    val got1 = ParquetUpsertSink.read(spark, path)
      .as[(Long, Long, String)].collect().toSet
    got1 shouldBe Set((1L, 1L, "a-v1"), (2L, 1L, "b-v1"), (3L, 2L, "c-v2"))

    val push2 = Seq(
      (2L, 2L, "b-v2"),  // newer revision of existing key
      (2L, 0L, "b-v0"),  // stale revision: must lose to what's stored? no — loses to v2 in-batch
      (4L, 1L, "d-v1")   // new key
    ).toDF("id", "rev", "payload")
    ParquetUpsertSink.upsert(push2, path, Seq("id"), "rev", numBuckets = 8)

    val got2 = ParquetUpsertSink.read(spark, path)
      .as[(Long, Long, String)].collect().toSet
    got2 shouldBe Set(
      (1L, 1L, "a-v1"), (2L, 2L, "b-v2"), (3L, 2L, "c-v2"), (4L, 1L, "d-v1"))
  }

  test("stale update loses to the already-stored newer revision") {
    val dir = Files.createTempDirectory("graft-upsert2").toFile
    dir.deleteOnExit()
    val path = dir.getPath + "/table"

    ParquetUpsertSink.upsert(
      Seq((1L, 5L, "v5")).toDF("id", "rev", "payload"), path, Seq("id"), "rev")
    ParquetUpsertSink.upsert(
      Seq((1L, 3L, "v3")).toDF("id", "rev", "payload"), path, Seq("id"), "rev")

    ParquetUpsertSink.read(spark, path)
      .as[(Long, Long, String)].collect().toSeq shouldBe Seq((1L, 5L, "v5"))
  }
}
