package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Newline-delimited JSON source — the interchange shape the reference
  * consumes (ES scroll/bulk emits one JSON document per line) — plus
  * the jx record-model bridge: jx addresses nested documents by
  * dot-path, so `flatten` rewrites arbitrarily nested struct columns
  * into flat dot-named columns that every graft operator (and the jx
  * compiler's field references) can use directly.
  *
  * Scale notes: Spark's json reader is splittable on line boundaries,
  * so a single huge NDJSON file still fans out across executors.
  * Always pass an explicit schema in production — schema inference is
  * a full extra pass over the data; the option exists here for
  * exploration parity with the reference's schemaless reads.
  */
object JsonLinesSource {

  def read(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame = {
    val reader = schema.fold(spark.read)(s => spark.read.schema(s))
    reader.json(path)
  }

  /** Recursively flatten struct columns to dot-named leaf columns
    * (`{"a": {"b": 1}}` → column `a.b`). Arrays and maps stay opaque —
    * jx treats them as values, not axes, until exploded explicitly.
    */
  def flatten(df: DataFrame): DataFrame = {
    def leaves(schema: StructType, prefix: String): Seq[Column] =
      schema.fields.flatMap { f =>
        val path = prefix + f.name
        f.dataType match {
          case s: StructType => leaves(s, path + ".")
          case _ => Seq(col(path).as(path))
        }
      }.toSeq
    df.select(leaves(df.schema, ""): _*)
  }

  /** read + flatten in one step: the jx-ready view of an NDJSON dump. */
  def readFlat(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame =
    flatten(read(spark, path, schema))
}
