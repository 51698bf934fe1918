package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Direct tests of the distributed rank prep (graft.util.rankPrep) —
  * the q18/q62 threshold engine — against the single-window
  * row_number formulation it replaces, on adversarial inputs the
  * gate corpus does not exercise: heavy ties, all-equal groups
  * (span=0 bucket branch), negatives, nulls, singletons, and bucket
  * counts smaller than the distinct-value count.
  */
class RankPrepSpec extends SparkSpec {
  import spark.implicits._

  /** Reference ranks: per (group, value) the covered 0-based rank
    * range from a plain per-group sort, plus the group size.
    */
  private def reference(df: org.apache.spark.sql.DataFrame) = {
    val w = Window.partitionBy($"g").orderBy($"v")
    df.where($"v".isNotNull)
      .withColumn("rn", row_number().over(w) - 1)
      .groupBy($"g", $"v")
      .agg(min($"rn").as("lo_rn"), max($"rn").as("hi_rn"))
      .join(df.where($"v".isNotNull).groupBy($"g").agg(count(lit(1)).as("n")), "g")
      .select($"g", $"v", $"lo_rn", $"hi_rn", $"n")
      .as[(String, Double, Long, Long, Long)].collect().toSet
  }

  private def prep(df: org.apache.spark.sql.DataFrame, buckets: Int) =
    graft.util.rankPrep(df, "g", "v", buckets)
      .as[(String, Double, Long, Long, Long)].collect().toSet

  test("rank ranges equal the single-window reference on ties, negatives, skew") {
    val df = Seq(
      // group a: heavy ties + negatives
      "a" -> -5.0, "a" -> -5.0, "a" -> -5.0, "a" -> 0.0, "a" -> 0.0,
      "a" -> 2.5, "a" -> 100.0,
      // group b: all-equal values (span = 0 -> single bucket branch)
      "b" -> 7.0, "b" -> 7.0, "b" -> 7.0,
      // group c: singleton
      "c" -> 42.0
    ).toDF("g", "v")
    for (buckets <- Seq(1, 2, 4, 32)) {
      withClue(s"buckets=$buckets: ") { prep(df, buckets) shouldBe reference(df) }
    }
  }

  test("nulls are excluded (SQL quantile_cont semantics), not ranked first") {
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)), ("a", None))
      .toDF("g", "v")
    prep(df, 4) shouldBe Set(("a", 1.0, 0L, 0L, 2L), ("a", 3.0, 1L, 1L, 2L))
  }

  test("quantileCont over rank ranges matches Spark's exact percentile") {
    val df = (1 to 997).map(i => ("g" + (i % 3), (i * 37 % 101).toDouble))
      .toDF("g", "v")
    val got = graft.util.rankPrep(df, "g", "v")
      .groupBy($"g")
      .agg(graft.util.quantileCont($"v", 0.5).as("p50"),
        graft.util.quantileCont($"v", 0.9).as("p90"))
      .as[(String, Double, Double)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    val want = df.groupBy($"g")
      .agg(expr("percentile(v, 0.5)").as("p50"), expr("percentile(v, 0.9)").as("p90"))
      .as[(String, Double, Double)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    got.keySet shouldBe want.keySet
    got.foreach { case (g, (p50, p90)) =>
      p50 shouldBe want(g)._1 +- 1e-9
      p90 shouldBe want(g)._2 +- 1e-9
    }
  }

  test("quantileDisc is the ceil(n*p)-th smallest value, ties and duplicates included") {
    val rnd = new scala.util.Random(20260813L)
    (1 to 10).foreach { trial =>
      val n = 1 + rnd.nextInt(60)
      val vals = (0 until n).map(_ => rnd.nextInt(12).toLong)
      val df = vals.map(("g", _)).toDF("g", "v")
      val got = graft.util.rankPrep(df, "g", "v")
        .groupBy($"g")
        .agg(graft.util.quantileDisc($"v", 0.25).as("q1"),
          graft.util.quantileDisc($"v", 0.50).as("q2"),
          graft.util.quantileDisc($"v", 0.75).as("q3"))
        .as[(String, Long, Long, Long)].collect().head
      val sorted = vals.sorted
      def want(p: Double) = sorted(math.ceil(n * p).toInt - 1)
      withClue(s"trial $trial (n=$n): ") {
        (got._2, got._3, got._4) shouldBe ((want(0.25), want(0.5), want(0.75)))
      }
    }
  }
}
