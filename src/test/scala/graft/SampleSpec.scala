package graft

import graft.operators.Text
import org.apache.spark.sql.functions._

/** Token-budget stratified sampling (q59): per-source budget fill in
  * deterministic priority order — the mixture-balancing contract.
  */
class SampleSpec extends SparkSpec {
  import spark.implicits._

  private lazy val documents = Tables.documents(spark, sfDir)

  test("every source fills its budget with at most one-document overshoot") {
    val budget = 500L
    val sample = Text.tokenBudgetSample(documents, budget)
      .select($"source", $"n_tok", $"cum_tok").collect()
    val bySource = sample.groupBy(_.getString(0))
    bySource.foreach { case (_, rows) =>
      val maxCum = rows.map(_.getLong(2)).max
      val lastTok = rows.maxBy(_.getLong(2)).getLong(1)
      // admission rule: the last doc STARTED under budget
      (maxCum - lastTok) should be < budget
    }
    // sources with more than `budget` tokens available must fill it
    val totals = documents
      .select($"source", org.apache.spark.sql.functions.size(graft.functions.words($"text")).cast("long").as("t"))
      .groupBy($"source").agg(sum($"t").as("total"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    bySource.foreach { case (src, rows) =>
      if (totals(src) >= budget) rows.map(_.getLong(2)).max should be >= budget
    }
  }

  test("bucketed take-while equals the single-window formulation at several budgets") {
    for (budget <- Seq(1L, 137L, 500L, 100000L)) {
      val bucketed = Text.tokenBudgetSample(documents, budget, buckets = 8)
        .collect().map(_.toSeq).toSet
      val single = Text.tokenBudgetSampleSingleSort(documents, budget)
        .collect().map(_.toSeq).toSet
      withClue(s"budget=$budget: ") { bucketed shouldBe single }
    }
  }

  test("sample is deterministic and independent of partitioning") {
    val a = Text.tokenBudgetSample(documents, 500L)
      .select($"doc_id").as[Long].collect().toSet
    val b = Text.tokenBudgetSample(documents.repartition(13), 500L)
      .select($"doc_id").as[Long].collect().toSet
    a shouldBe b
  }

  test("salted two-phase per-key cap equals the single whole-key window (q76)") {
    // Crafted skew: one hot key with 300 rows, two small keys — the
    // shape where the single-window formulation funnels the hot key
    // through one task. The two-phase result must be IDENTICAL.
    import org.apache.spark.sql.expressions.Window
    val rows = (0 until 300).map(i => (i.toLong, "hot")) ++
      (300 until 310).map(i => (i.toLong, "warm")) ++
      (310 until 313).map(i => (i.toLong, "cold"))
    val df = spark.createDataFrame(rows).toDF("id", "k")
      .withColumn("pri", pmod(xxhash64(col("id"), lit(7)), lit(1000)))
    val twoPhase = graft.operators.Pack.capPerKey(df, "k", "pri", "id", k = 5, salts = 8)
      .select($"id").as[Long].collect().toSet
    val single = df.withColumn("rn", row_number().over(
        Window.partitionBy($"k").orderBy($"pri".asc, $"id".asc)))
      .where($"rn" <= 5).select($"id").as[Long].collect().toSet
    twoPhase shouldBe single
    twoPhase.size shouldBe 5 + 5 + 3 // cold keeps all 3
  }

  test("preparePretrainingCorpus equals the hand-composed stages and is deterministic") {
    val docs = graft.Tables.documents(spark, sfDir)
    val got = graft.operators.Pack.preparePretrainingCorpus(docs, 0.5, 128L)
    val rows = got.select($"doc_id", $"seq_id", $"seq_off")
      .as[(Long, Long, Long)].collect().toSet
    // hand-compose the same stages
    val gated = docs.join(graft.operators.Text.qualityGate(docs)
      .where($"keep").select($"doc_id"), Seq("doc_id"), "left_semi")
    val deduped = graft.operators.Cluster.dedupCorpus(gated, 0.5)
    val sampled = deduped.join(graft.operators.Pack.applyMixture(deduped)
      .select($"doc_id"), Seq("doc_id"), "left_semi")
    val want = graft.operators.Pack.packSequences(sampled, 128L)
      .select($"doc_id", $"seq_id", $"seq_off")
      .as[(Long, Long, Long)].collect().toSet
    rows shouldBe want
    rows.size should be > 0
    // deterministic end to end
    graft.operators.Pack.preparePretrainingCorpus(docs, 0.5, 128L)
      .select($"doc_id", $"seq_id", $"seq_off")
      .as[(Long, Long, Long)].collect().toSet shouldBe rows
    // the funnel only narrows: packed docs ⊆ sampled ⊆ deduped ⊆ gated
    val packedIds = rows.map(_._1)
    val sampledIds = sampled.select($"doc_id").as[Long].collect().toSet
    val gatedIds = gated.select($"doc_id").as[Long].collect().toSet
    packedIds shouldBe sampledIds // packing drops nothing
    assert(sampledIds.subsetOf(gatedIds))
  }

  test("a tiny budget keeps exactly one document per source") {
    val one = Text.tokenBudgetSample(documents, 1L)
    val perSrc = one.groupBy($"source").count().select($"count").as[Long].collect()
    all(perSrc) shouldBe 1L // first doc always admitted (cum - n_tok = 0 < 1)
  }

  test("temperature mixture (q122): rates in (0,1], rarest whole, sampled mass ∝ sqrt(n)") {
    val m = graft.operators.Pack.mixtureTemperature(documents)
      .select($"source", $"n_tokens", $"share", $"rate")
      .as[(String, Long, Double, Double)].collect()
    m.length should be > 1
    val nMin = m.map(_._2).min
    m.foreach { case (_, n, share, rate) =>
      rate should be > 0.0
      rate should be <= 1.0
      // sampled mass n·rate = sqrt(n_min·n): squared over n gives n_min
      val mass = n * rate
      (mass * mass / n) shouldBe nMin.toDouble +- 1e-6
      share shouldBe (n.toDouble / m.map(_._2).sum) +- 1e-12
    }
    // the rarest source is kept whole
    m.filter(_._2 == nMin).foreach(_._4 shouldBe 1.0)
    // flattening: rare sources get HIGHER sampled share than raw share
    val tot = m.map(_._2).sum.toDouble
    val sampledTot = m.map(r => r._2 * r._4).sum
    m.foreach { case (_, n, _, rate) =>
      if (n < tot / m.length) (n * rate / sampledTot) should be > (n / tot)
    }
  }

  test("trigram language ID (q125): crafted languages classify correctly, short docs drop") {
    import graft.operators.Text
    // two synthetic "languages" with disjoint character inventories
    def aa(n: Int) = Seq.fill(n)("alpha beta gamma").mkString(" ")
    def bb(n: Int) = Seq.fill(n)("zulu yankee xray").mkString(" ")
    val corpus = (
      (1L to 8L).map(i => (i, aa(3), "aa")) ++
      (11L to 18L).map(i => (i, bb(3), "bb")) ++
      Seq((21L, aa(2), "aa"), (22L, bb(2), "bb"), // held-out style rows
        (23L, "xy", "aa"))) // < 3 chars: no trigrams, drops out
      .toDF("doc_id", "text", "lang")
    val profiles = Text.langProfiles(corpus.where($"doc_id" <= 18))
    val pred = Text.langClassify(corpus, profiles)
      .select($"doc_id", $"lang", $"predicted")
      .as[(Long, String, String)].collect()
    pred.map(_._1).toSet shouldBe ((1L to 8L) ++ (11L to 18L) ++ Seq(21L, 22L)).toSet
    pred.foreach { case (id, lang, p) =>
      withClue(s"doc $id: ") { p shouldBe lang }
    }
  }

  test("incremental corpus stats equal the full recompute on any split") {
    val full = Text.corpusStatsReport(Text.corpusStatsBase(documents))
      .as[(String, Long, Long, Long, Int, Int, Double)].collect().toSet
    // a different split than the gate's mod-3 thirds: hash-based 70/30
    val base = documents.where(xxhash64($"doc_id") % 10 < 7)
    val delta = documents.where(xxhash64($"doc_id") % 10 >= 7)
    val incr = Text.corpusStatsReport(
      Text.corpusStatsIncrement(Text.corpusStatsBase(base), delta))
      .as[(String, Long, Long, Long, Int, Int, Double)].collect().toSet
    incr shouldBe full
    // brand-new sources in a delta appear with their own rows
    val renamed = delta.withColumn("source", concat(lit("new_"), $"source"))
    val withNew = Text.corpusStatsIncrement(Text.corpusStatsBase(base), renamed)
    withNew.where($"source".startsWith("new_")).count() should be > 0L
  }
}
