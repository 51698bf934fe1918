package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

package object util {

  /** Exact (order-independent) sum of a money/quantity double column.
    *
    * Doubles summed in parallel are order-dependent, so a distributed
    * Spark sum would drift from a single-threaded oracle. Casting to
    * DECIMAL first makes addition exact and associative: Spark's
    * parallel aggregation then matches DuckDB bit-for-bit. Mirror in
    * oracle SQL as CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE).
    */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType)

  /** Exact average: exact decimal sum divided once in double precision.
    * Mirror: CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE) / COUNT(x).
    */
  def davg(c: Column, scale: Int = 2): Column =
    dsum(c, scale) / count(c)

  /** Decimal windowed sum (running totals): same determinism argument —
    * window frames may be accumulated in different orders / tree shapes
    * by different engines; decimal addition is exact either way.
    */
  def dsumCast(c: Column, scale: Int = 2): Column =
    c.cast(DecimalType(18, scale))

  /** Standard session builder config shared by Verify / Bench / specs. */
  def configure(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.enableVectorizedReader", "true")
      // Object-typed aggregates (SimHashAgg) plan as
      // ObjectHashAggregate, whose map side falls back to SORT-based
      // aggregation after this many distinct groups per task (default
      // 128 — i.e. always, on real data). 512-byte buffers × 64k
      // groups ≈ 32 MB per task: cheap insurance against sorting every
      // exploded token row by group key.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.ui.enabled", "false")
}
