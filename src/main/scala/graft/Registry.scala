package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One coverage-checklist entry from SURVEY.md §2: a Spark query builder
  * plus (when SQL-expressible) an equivalent DuckDB oracle. Column names
  * and types must match between the two — the driver sorts columns by
  * name and hash-compares values.
  */
final case class Q(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

trait QueryPack {
  def all: Seq[Q]
}
