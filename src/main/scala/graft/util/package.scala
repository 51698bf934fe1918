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

  /** Exact quantile_cont as an ordinary AGGREGATE over rank-prepped
    * rows — the engine's distributed percentile pattern (q18/q62):
    * rows carry `rn` (0-based rank of `value` within the group, from
    * a row_number window) and `n` (group size, from a count window);
    * this aggregate picks the two rows bracketing position (n-1)*p
    * and interpolates. No per-group value buffering anywhere — the
    * scale-safe replacement for Spark's exact `percentile`.
    */
  def quantileCont(value: Column, p: Double): Column = {
    val pos = (col("n") - 1) * p
    val lo = floor(pos)
    val vl = max(when(col("rn") === lo, value))
    val vu = max(when(col("rn") === lo + 1, value))
    vl + max(pos - lo) * (coalesce(vu, vl) - vl)
  }

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
