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
    * across `salts` reducers. `big` rows are salted round-robin by
    * row position (monotonically_increasing_id mod salts) — NOT by a
    * row-content hash, which would send *identical duplicate rows* on
    * the hot key to a single salt, exactly the one skew shape a
    * content hash cannot fix. The salt only routes rows (the join key
    * is unchanged), so any salt assignment yields the same result as
    * the plain inner join (spec-tested); task retries may re-salt
    * rows differently, which is harmless for the same reason. Cost is
    * `salts`× the small side's shuffle volume.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int = 16): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts)).cast("int"))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
