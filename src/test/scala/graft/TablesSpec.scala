package graft

import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Loader schema contract: whatever timestamp flavor the generator
  * writes (UTC-adjusted micros, legacy nanos-as-long, or
  * isAdjustedToUTC=false → TIMESTAMP_NTZ — the round-8 regeneration),
  * every loaded table must expose session-zoned TimestampType, because
  * engine expressions (to_timestamp literals, date_trunc, window(),
  * watermarks) all produce/require it and mixing the two fails
  * analysis. The session tz is pinned UTC so the normalization is
  * value-preserving.
  */
class TablesSpec extends SparkSpec {

  test("no loaded gate table exposes TIMESTAMP_NTZ columns") {
    for (t <- Tables.names) {
      val ntz = Tables.load(spark, sfDir, t).schema.fields
        .filter(_.dataType == TimestampNTZType).map(_.name)
      withClue(s"$t: ") { ntz shouldBe empty }
    }
  }

  test("timestamp columns land as session-zoned TimestampType") {
    Tables.events(spark, sfDir).schema("ts").dataType shouldBe TimestampType
    Tables.orders(spark, sfDir).schema("o_orderdate").dataType shouldBe TimestampType
    Tables.lineitem(spark, sfDir).schema("l_shipdate").dataType shouldBe TimestampType
  }

  test("NTZ normalization preserves wall-clock values (UTC session)") {
    // raw NTZ read vs normalized read: identical naive instants
    val raw = spark.read.parquet(Tables.path(sfDir, "events"))
      .selectExpr("cast(ts as string) s").orderBy("s").limit(5)
      .collect().map(_.getString(0)).toSeq
    val norm = Tables.events(spark, sfDir)
      .selectExpr("cast(ts as string) s").orderBy("s").limit(5)
      .collect().map(_.getString(0)).toSeq
    norm shouldBe raw
  }
}
