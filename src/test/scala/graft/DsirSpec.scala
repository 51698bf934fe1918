package graft

import graft.operators.Dsir
import org.apache.spark.sql.functions._

/** DSIR importance resampling: the ln/Gumbel consumers are pinned here
  * against first-principles recomputes (the gate q151 covers the
  * integer facts; these specs cover the float formula and the sampler,
  * which a hash-compared gate row cannot carry).
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private def crafted = spark.createDataFrame(Seq(
    (0L, "cat cat cat purr", "t"),
    (1L, "cat purr cat cat", "t"),
    (2L, "dog dog woof dog", "r"),
    (3L, "dog woof dog dog", "r"),
    (4L, "cat purr cat", "r"), // target-like doc sitting in the raw pool
    (5L, "dog woof", "r"),
    (6L, "", "r") // featureless
  )).toDF("doc_id", "text", "src")

  test("weights: target-like raw doc outweighs raw-like doc; featureless doc is exactly 0") {
    val w = Dsir.importanceWeights(crafted, $"src" === "t", 4096)
      .select($"doc_id", $"log_w").as[(Long, Double)].collect().toMap
    w(4L) should be > w(5L) // the selection signal DSIR exists for
    w(4L) should be > 0.0   // cat-mass: target model likes it more
    w(5L) should be < 0.0   // dog-mass: raw model likes it more
    w(6L) shouldBe 0.0
    w.keySet shouldBe Set(0L, 1L, 2L, 3L, 4L, 5L, 6L) // totality
  }

  test("weights ≡ first-principles recompute from the feature table (testdata corpus)") {
    val docsDf = Tables.documents(spark, sfDir)
    val isT = substring($"source", 4, 10).cast("int") >= 15
    val B = 256 // forced-collision regime: the formula must hold anyway
    val feats = Dsir.hashedFeatures(docsDf, isT, B)
      .select($"doc_id", $"is_target", $"b", $"cnt")
      .as[(Long, Boolean, Long, Long)].collect()
    val ct = feats.filter(_._2).groupBy(_._3).map { case (b, xs) => b -> xs.map(_._4).sum }
    val cr = feats.filterNot(_._2).groupBy(_._3).map { case (b, xs) => b -> xs.map(_._4).sum }
    val (tt, tr) = (ct.values.sum.toDouble, cr.values.sum.toDouble)
    val expected = feats.groupBy(_._1).map { case (id, xs) =>
      val n = xs.map(_._4).sum.toDouble
      val s = xs.map { case (_, _, b, c) =>
        c * (math.log(ct.getOrElse(b, 0L) + 1.0) - math.log(cr.getOrElse(b, 0L) + 1.0))
      }.sum
      id -> (s - n * (math.log(tt + B) - math.log(tr + B)))
    }
    val got = Dsir.importanceWeights(docsDf, isT, B)
      .select($"doc_id", $"log_w").as[(Long, Double)].collect().toMap
    got.size.toLong shouldBe docsDf.count()
    expected.foreach { case (id, e) =>
      withClue(s"doc $id: ") {
        math.abs(got(id) - e) should be < 1e-9 * math.max(1.0, math.abs(e))
      }
    }
  }

  test("weights and gate facts are invariant under repartitioning") {
    val isT = $"src" === "t"
    val a = Dsir.importanceWeights(crafted, isT, 4096)
      .select($"doc_id", $"log_w").as[(Long, Double)].collect().toMap
    val b = Dsir.importanceWeights(crafted.repartition(7), isT, 4096)
      .select($"doc_id", $"log_w").as[(Long, Double)].collect().toMap
    a.keySet shouldBe b.keySet
    a.foreach { case (id, v) =>
      math.abs(v - b(id)) should be < 1e-12 * math.max(1.0, math.abs(v))
    }
  }

  test("gumbel top-k resample: deterministic, k-sized, weight-responsive") {
    val base = (1L to 50L).map(i => (i, 0.0)).toDF("doc_id", "log_w")
    val one = Dsir.resampleTopK(base, 5).select($"doc_id").as[Long].collect().toSeq
    val two = Dsir.resampleTopK(base.repartition(9), 5).select($"doc_id").as[Long].collect().toSeq
    one shouldBe two // no RNG: hash-keyed Gumbel is reproducible
    one.size shouldBe 5
    // a dominant weight always survives the noise
    val boosted = base.union(Seq((99L, 1e6)).toDF("doc_id", "log_w"))
    Dsir.resampleTopK(boosted, 5).select($"doc_id").as[Long].collect() should contain(99L)
  }

  test("q151 gate: integer dot products ≡ recompute from features; totals pinned") {
    val feats = Dsir.hashedFeatures(
      Tables.documents(spark, sfDir),
      substring($"source", 4, 10).cast("int") >= 15, 10000)
      .select($"doc_id", $"is_target", $"b", $"cnt")
      .as[(Long, Boolean, Long, Long)].collect()
    val ct = feats.filter(_._2).groupBy(_._3).map { case (b, xs) => b -> xs.map(_._4).sum }
    val cr = feats.filterNot(_._2).groupBy(_._3).map { case (b, xs) => b -> xs.map(_._4).sum }
    val rows = Dsir.q151.build(spark, sfDir)
      .select($"doc_id", $"n_feats", $"dot_t", $"dot_r", $"tot_t", $"tot_r")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    rows.foreach { case (id, n, dt, dr, tt, tr) =>
      val xs = feats.filter(_._1 == id)
      withClue(s"doc $id: ") {
        n shouldBe xs.map(_._4).sum
        dt shouldBe xs.map { case (_, _, b, c) => c * ct.getOrElse(b, 0L) }.sum
        dr shouldBe xs.map { case (_, _, b, c) => c * cr.getOrElse(b, 0L) }.sum
        tt shouldBe ct.values.sum
        tr shouldBe cr.values.sum
      }
    }
    rows.length.toLong shouldBe Tables.documents(spark, sfDir).count()
  }
  test("countsIncrement: delta fold \u2261 full recount (exact integers)") {
    val docsDf = Tables.documents(spark, sfDir)
    val isT = substring($"source", 4, 10).cast("int") >= 15
    val base = docsDf.where($"doc_id" % 10 =!= 0)
    val delta = docsDf.where($"doc_id" % 10 === 0)
    val folded = Dsir.countsIncrement(
      Dsir.bucketCounts(Dsir.hashedFeatures(base, isT, 512)), delta, isT, 512)
      .as[(Long, Long, Long)].collect().toSet
    val full = Dsir.bucketCounts(Dsir.hashedFeatures(docsDf, isT, 512))
      .as[(Long, Long, Long)].collect().toSet
    folded shouldBe full
  }

  test("frozen-model scoring \u2261 self-trained weights; unseen vocabulary scores as count-0") {
    val isT = $"src" === "t"
    val counts = Dsir.bucketCounts(Dsir.hashedFeatures(crafted, isT, 4096))
    val a = Dsir.importanceWeightsUnder(crafted, counts, 4096)
      .select($"doc_id", $"log_w").as[(Long, Double)].collect().toMap
    val b = Dsir.importanceWeights(crafted, isT, 4096)
      .select($"doc_id", $"log_w").as[(Long, Double)].collect().toMap
    a.keySet shouldBe b.keySet
    a.foreach { case (id, v) =>
      math.abs(v - b(id)) should be < 1e-12 * math.max(1.0, math.abs(v))
    }
    // a doc the models never saw still scores: every bucket count-0
    // under the smoothing, weight = -n * (ln(Ct+B) - ln(Cr+B)) exactly
    val fresh = Seq((100L, "zz yy xx")).toDF("doc_id", "text")
    val (n, w) = Dsir.importanceWeightsUnder(fresh, counts, 4096)
      .select($"n_feats", $"log_w").as[(Long, Double)].head()
    n shouldBe 5L // 3 unigrams + 2 bigrams
    val Seq((tt, tr)) = counts
      .agg(sum($"ct"), sum($"cr")).as[(Long, Long)].collect().toSeq
    math.abs(w - (-5.0 * (math.log(tt + 4096.0) - math.log(tr + 4096.0)))) should be < 1e-12
  }
  test("NULL isTarget counts as raw, never dropped (review fix)") {
    val df = spark.createDataFrame(Seq(
      (0L, "cat cat", "t"), (1L, "cat dog", null.asInstanceOf[String])
    )).toDF("doc_id", "text", "src")
    val feats = Dsir.hashedFeatures(df, $"src" === "t", 4096)
    // doc 1's predicate is NULL: its mass must land on the RAW side,
    // not vanish from both models
    feats.where($"doc_id" === 1L).count() should be > 0L
    feats.where($"doc_id" === 1L && $"is_target").count() shouldBe 0L
    val counts = Dsir.bucketCounts(feats)
    counts.agg(sum($"ct") + sum($"cr")).as[Long].head() shouldBe
      feats.agg(sum($"cnt")).as[Long].head()
  }
}
