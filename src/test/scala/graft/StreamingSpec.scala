package graft

import graft.streaming.StreamOps
import graft.Tables
import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.streaming.Trigger

/** The streaming side of q42: the same windowedCounts transformation
  * applied through readStream + watermark must agree with the batch
  * application (which the DuckDB oracle verifies) on the same files.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streaming windowed counts equal batch windowed counts") {
    // stage events parquet into a fresh source dir (file streams want a dir)
    val tmp = Files.createTempDirectory("graft-stream").toFile
    tmp.deleteOnExit()
    val src = Paths.get(sfDir, "events.parquet")
    if (Files.isDirectory(src)) {
      Files.list(src).forEach { p =>
        Files.copy(p, Paths.get(tmp.getPath, p.getFileName.toString),
          StandardCopyOption.REPLACE_EXISTING)
      }
    } else {
      Files.copy(src, Paths.get(tmp.getPath, "events.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }

    val schema = spark.read.parquet(src.toString).schema
    val stream = StreamOps.streamingWindowedCounts(
      StreamOps.readEventStream(spark, tmp.getPath, schema))

    val query = stream.writeStream
      .format("memory")
      .queryName("q42_stream_test")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination(120000)

    val streamed = spark.table("q42_stream_test")
      .select($"win_start", $"event_type", $"n_events", $"total_value")
    val batch = StreamOps.windowedCounts(Tables.events(spark, sfDir))
      .select($"win_start", $"event_type", $"n_events", $"total_value")

    streamed.count() shouldBe batch.count()
    streamed.except(batch).count() shouldBe 0L
    batch.except(streamed).count() shouldBe 0L
  }
}
