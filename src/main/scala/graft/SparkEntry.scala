package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are contributed by QueryPacks (one per SURVEY.md §2 theme);
  * each entry pairs a Spark DataFrame builder with a DuckDB oracle.
  */
object SparkEntry {

  def packs: Seq[QueryPack] = Seq(
    operators.Relational,
    operators.Hierarchy,
    operators.Etl,
    operators.Text,
    operators.Pack,
    operators.Dedup,
    operators.Dsir,
    operators.Cluster,
    operators.Ann,
    operators.Jx,
    operators.Multimodal,
    operators.Bpe,
    streaming.StreamOps)

  private lazy val registry: Seq[Q] = {
    val qs = packs.flatMap(_.all)
    val dups = qs.groupBy(_.name).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    qs
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q05.build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
