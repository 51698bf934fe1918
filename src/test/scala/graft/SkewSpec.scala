package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

/** Salted join must equal the plain join, including on a heavily
  * skewed key distribution (one key carrying most rows).
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join on skewed data") {
    // 90% of fact rows share key 1 — the hot-reducer shape
    val big = spark.range(10000)
      .select(when($"id" % 10 =!= 0, 1L).otherwise($"id").as("k"), $"id".as("payload"))
    val small = Seq((1L, "hot"), (10L, "a"), (20L, "b"), (30L, "c"))
      .toDF("k", "name")

    val plain = big.join(small, "k")
      .groupBy($"k", $"name").agg(count(lit(1)).as("n"), sum($"payload").as("s"))
    val salted = Skew.saltedJoin(big, small, "k", salts = 8)
      .groupBy($"k", $"name").agg(count(lit(1)).as("n"), sum($"payload").as("s"))

    salted.except(plain).count() shouldBe 0L
    plain.except(salted).count() shouldBe 0L
    salted.count() shouldBe plain.count()
  }

  test("salt actually spreads the hot key across partitions") {
    val big = spark.range(1000).select(lit(1L).as("k"), $"id".as("payload"))
    val salted = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(8)).cast("int"))
    salted.select($"__salt").distinct().count() shouldBe 8L
  }
}
