package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation helpers.
  *
  * AQE's skew-join handling (on by default, see `graft.util.configure`)
  * splits oversized sort-merge partitions at runtime, and Spark's
  * partial aggregation absorbs group-by skew for mergeable aggregates.
  * What neither covers is a shuffle join where one side's hot key
  * floods a single reducer and the other side is too big to broadcast
  * outright but small enough to replicate per salt — the classic
  * salted join. This helper implements that pattern explicitly so
  * pipelines can opt in deterministically rather than relying on
  * runtime re-planning.
  */
object Skew {

  /** Join `big` to `small` on `key`, spreading each hot key of `big`
    * across `salts` reducers. `big` rows get a DETERMINISTIC salt
    * from their whole-row hash; `small` rows are replicated once per
    * salt value. Result equals the plain inner join (spec-tested),
    * cost is `salts`× the small side's shuffle volume.
    *
    * Why not a positional salt (monotonically_increasing_id % salts):
    * a nondeterministic salt is WRONG under partial stage retry —
    * when a lost map task recomputes, rows can land on different
    * salts than the copies some reducers already fetched, silently
    * duplicating or dropping join rows (the SPARK-23207 class of
    * bug). Determinism costs one documented limitation: byte-
    * identical duplicate rows on the hot key share a salt. If that is
    * your actual skew shape, dedup-with-count first (identical rows
    * are one logical row × multiplicity) — spreading them is a
    * counting problem, not a routing problem.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int = 16): DataFrame = {
    // xxhash64 rejects MapType (anywhere in a column's type) — salt
    // from the hashable columns only; the join key is always hashable
    // (it just shuffled), so the fallback set is never empty
    def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => hashable(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hashable(a.elementType)
      case _ => true
    }
    val saltCols = big.schema.fields.filter(f => hashable(f.dataType)).map(f => col(f.name))
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(struct(saltCols.toSeq: _*)), lit(salts)).cast("int"))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
