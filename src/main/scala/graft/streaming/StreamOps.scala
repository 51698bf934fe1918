package graft.streaming

import graft.{Q, QueryPack, Tables}
import graft.util.dsum
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

/** Structured Streaming operators. The transformation is defined ONCE
  * over an unbound DataFrame and applied identically to batch and
  * stream inputs — the Spark idiom that makes a batch oracle a valid
  * check of streaming logic (q42's DuckDB oracle verifies the batch
  * application; StreamingSpec verifies the stream application agrees
  * with batch on the same files).
  */
object StreamOps extends QueryPack {

  /** Hour-windowed counts + value totals per event type. On a real
    * stream pair with `withWatermark` (see [[streamingWindowedCounts]])
    * so state for closed windows is dropped instead of growing forever.
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
      .select(
        col("w.start").as("win_start"), col("w.end").as("win_end"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Streaming variant: 1-hour watermark bounds state. */
  def streamingWindowedCounts(events: DataFrame): DataFrame =
    windowedCounts(events.withWatermark("ts", "1 hour"))

  /** File-source stream of the events table (schema must be supplied
    * for streaming reads; ts normalized exactly like the batch loader).
    */
  def readEventStream(spark: SparkSession, dir: String, schema: StructType): DataFrame = {
    val raw = spark.readStream.schema(schema).parquet(dir)
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }

  val q42 = Q(
    "q42_stream_window",
    (s, d) => windowedCounts(Tables.events(s, d)),
    Some("""SELECT date_trunc('hour', ts) AS win_start,
           |  date_trunc('hour', ts) + INTERVAL 1 HOUR AS win_end,
           |  event_type, COUNT(*) AS n_events,
           |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
           |FROM events GROUP BY 1, 2, 3""".stripMargin),
    "hour-windowed counts w/ watermark (batch-equivalent of the stream)")

  val all: Seq[Q] = Seq(q42)
}
