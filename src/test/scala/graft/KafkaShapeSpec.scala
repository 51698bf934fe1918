package graft

import graft.streaming.StreamOps
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Pins the documented Kafka ingestion path WITHOUT the connector jar
  * (this build has no network; spark-sql-kafka ships separately from
  * Spark core): a file stream carrying the EXACT wire schema the
  * Kafka source emits — key/value binary, topic string, partition
  * int, offset long, timestamp, timestampType int — goes through
  * `StreamOps.decodeKafkaJson` into `streamingUpsertIngest`
  * unchanged. Since Spark's Kafka source is schema-fixed, swapping
  * this stand-in for `spark.readStream.format("kafka")` changes ONE
  * line (the source) and nothing downstream — which is the claim this
  * spec makes checkable.
  */
class KafkaShapeSpec extends SparkSpec {
  import spark.implicits._

  private val payloadSchema = StructType(Seq(
    StructField("user_id", LongType),
    StructField("event_id", LongType),
    StructField("action", StringType)))

  test("kafka-wire-shaped stream feeds decodeKafkaJson -> streamingUpsertIngest unchanged") {
    // records with key collisions and out-of-order versions, plus one
    // redelivered duplicate — the at-least-once transport shape
    val records = Seq(
      (1L, 10L, "open"), (2L, 10L, "open"), (1L, 12L, "click"),
      (3L, 11L, "open"), (2L, 9L, "stale"), (1L, 12L, "click"))
    val kafkaShaped = records.zipWithIndex.map { case ((u, v, a), i) =>
      (s"$u".getBytes("UTF-8"),
        s"""{"user_id":$u,"event_id":$v,"action":"$a"}""".getBytes("UTF-8"),
        "events", i % 3, i.toLong, new java.sql.Timestamp(1700000000000L + i), 0)
    }.toDF("key", "value", "topic", "partition", "offset", "timestamp", "timestampType")

    // stage as files; the file stream is the kafka stand-in (identical
    // schema, multiple micro-batches via maxFilesPerTrigger)
    val srcDir = Files.createTempDirectory("graft-kafka-src").toString
    kafkaShaped.repartition(3).write.mode("append").parquet(srcDir)
    val table = Files.createTempDirectory("graft-kafka-out").toString + "/table"
    val ckpt = Files.createTempDirectory("graft-kafka-ck").toString

    val wire = spark.readStream.schema(spark.read.parquet(srcDir).schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    // the documented kafka recipe: decode, then the SAME ingest writer
    val query = StreamOps
      .streamingUpsertIngest(StreamOps.decodeKafkaJson(wire, payloadSchema),
        table, keyCols = Seq("user_id"), versionCol = "event_id", numBuckets = 4)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination(120000)

    val got = graft.sources.ParquetUpsertSink.read(spark, table)
      .select($"user_id", $"event_id", $"action")
      .as[(Long, Long, String)].collect().toSet
    got shouldBe Set((1L, 12L, "click"), (2L, 10L, "open"), (3L, 11L, "open"))
  }

  test("decodeKafkaJson keeps unparseable payloads as null rows rather than dropping") {
    val rows = Seq(
      ("ok".getBytes("UTF-8"), """{"user_id":1,"event_id":2,"action":"a"}""".getBytes("UTF-8")),
      ("bad".getBytes("UTF-8"), "not json".getBytes("UTF-8")))
      .toDF("key", "value")
    val got = StreamOps.decodeKafkaJson(rows, payloadSchema)
      .as[(Option[Long], Option[Long], Option[String])].collect().toSet
    got shouldBe Set(
      (Some(1L), Some(2L), Some("a")),
      (None, None, None))
  }
}
