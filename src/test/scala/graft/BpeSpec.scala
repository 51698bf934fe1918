package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

/** Pins the BPE merge training (Sennrich 2016) on the paper's own
  * hand-computable corpus, the driver/distributed encode equivalence,
  * and training determinism under repartitioning.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // the Sennrich 2016 example dictionary
  private val dict = Seq(
    "low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)

  // Hand computation (count-max, ties to the lexicographically
  // smallest pair; </w> is a separate trailing symbol):
  //   round 1: (e,s)=9 ties (s,t)=9 (t,</w>)=9 -> (e,s)
  //   round 2: (es,t)=9 ties (t,</w>)=9        -> (es,t)
  //   round 3: (est,</w>)=9                     -> (est,</w>)
  //   round 4: (l,o)=7 ties (o,w)=7             -> (l,o)
  //   round 5: (lo,w)=7                         -> (lo,w)
  private val expected5 = Seq(
    ("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w"))

  test("trainMerges reproduces the hand-computed Sennrich merges") {
    Bpe.trainMerges(dict, 5) shouldBe expected5
  }

  test("trainMerges stops when no pair repeats and never crosses word boundaries") {
    val merges = Bpe.trainMerges(Seq("ab" -> 1L), 100)
    // a b </w>: (a,b)=1 then (ab,</w>)=1 then one symbol left — 2 merges
    merges shouldBe Seq(("a", "b"), ("ab", "</w>"))
  }

  test("encodeWord applies merges by rank, lowest first") {
    Bpe.encodeWord("lowest", expected5) shouldBe Seq("low", "est</w>")
    Bpe.encodeWord("low", expected5) shouldBe Seq("low", "</w>")
    Bpe.encodeWord("newest", expected5) shouldBe Seq("n", "e", "w", "est</w>")
    // unseen characters stay as single symbols
    Bpe.encodeWord("xyz", expected5) shouldBe Seq("x", "y", "z", "</w>")
  }

  private def corpus() = Seq(
    (1L, "low low low low low"),
    (2L, "lower lower"),
    (3L, "newest newest newest newest newest newest"),
    (4L, "widest widest widest")).toDF("doc_id", "text")

  test("distributed train equals the driver loop on the aggregated dict") {
    val merges = Bpe.train(corpus(), "text", numMerges = 5)
      .orderBy($"rank").select($"left", $"right")
      .as[(String, String)].collect().toSeq
    merges shouldBe expected5
  }

  test("training is deterministic under repartitioning") {
    val shuffled = corpus().repartition(7)
    val merges = Bpe.train(shuffled, "text", numMerges = 5)
      .orderBy($"rank").select($"left", $"right")
      .as[(String, String)].collect().toSeq
    merges shouldBe expected5
  }

  test("distributed tokenCounts equals per-word driver encoding") {
    val docs = Seq(
      (1L, "the lowest low"),
      (2L, "newest widest lower"),
      (3L, "  low   newest  "), // whitespace runs collapse
      (4L, "zzz")).toDF("doc_id", "text")
    val got = Bpe.tokenCounts(docs, "text", "doc_id", expected5)
      .as[(Long, Int)].collect().toMap
    val want = Map(
      1L -> Seq("the", "lowest", "low"),
      2L -> Seq("newest", "widest", "lower"),
      3L -> Seq("low", "newest"),
      4L -> Seq("zzz")
    ).map { case (id, ws) =>
      id -> ws.map(w => Bpe.encodeWord(w, expected5).length).sum
    }
    got shouldBe want
  }

  test("tokenCountsFrom round-trips the persisted merges table") {
    val docs = Seq((1L, "lowest")).toDF("doc_id", "text")
    val mergesTable = Bpe.train(corpus(), "text", numMerges = 5)
    val got = Bpe.tokenCountsFrom(docs, "text", "doc_id", mergesTable)
      .as[(Long, Int)].head()
    got shouldBe ((1L, 2)) // ["low", "est</w>"]
  }

  test("bpeTokenize exposes the token array itself") {
    val docs = Seq((1L, "lowest low")).toDF("doc_id", "text")
    val toks = docs.select(
        graft.functions.bpeTokenize($"text", expected5).as("t"))
      .as[Seq[String]].head()
    toks shouldBe Seq("low", "est</w>", "low", "</w>")
  }

  test("dict capping keeps the most frequent words deterministically") {
    val capped = Bpe.wordDict(corpus(), "text", 2)
      .as[(String, Long)].collect().toSeq
    capped shouldBe Seq("newest" -> 6L, "low" -> 5L)
  }

  test("incremental dict fold ≡ full recount, and retraining under it reproduces the merges") {
    val documents = Tables.documents(spark, sfDir)
    val base = documents.where($"doc_id" % 10 =!= 0)
    val delta = documents.where($"doc_id" % 10 === 0)
    val folded = Bpe.dictIncrement(Bpe.wordCounts(base, "text"), delta)
    val full = Bpe.wordCounts(documents, "text")
    folded.except(full).count() shouldBe 0L
    full.except(folded).count() shouldBe 0L
    full.count() should be > 0L
    // the consumer step: cap at read time + driver retrain — same
    // merges as training on the full corpus in one shot
    val viaFold = Bpe.trainMerges(
      Bpe.capDict(folded, 200000).as[(String, Long)].collect().toSeq, 50)
    val oneShot = Bpe.trainMerges(
      Bpe.wordDict(documents, "text", 200000).as[(String, Long)].collect().toSeq, 50)
    viaFold shouldBe oneShot
  }

  test("q148 gate verdicts hold and BPE counts strictly exceed word counts") {
    val out = Bpe.q148.build(spark, sfDir)
      .agg(min($"reconstructs".cast("int")), min($"all_in_vocab".cast("int")),
        min(($"n_bpe_tokens" > $"n_words").cast("int")), count(lit(1)))
      .as[(Int, Int, Int, Long)].head()
    out._1 shouldBe 1 // every doc reconstructs
    out._2 shouldBe 1 // every token in the merges-closure vocab
    out._3 shouldBe 1 // real subword counts, not degenerate whole words
    out._4 should be > 0L
  }

  test("token-budget operators under the BPE counter: exact per-doc counts, same corpus totals") {
    import graft.operators.{Pack, Text}
    val documents = Tables.documents(spark, sfDir)
    val merges = Bpe.storedMerges(spark, sfDir)
    val nTok = org.apache.spark.sql.functions
      .size(graft.functions.bpeTokenize($"text", merges)).cast("long")
    val exact = Bpe.tokenCounts(documents, "text", "doc_id", merges)
    // q59's budget fill accounts in exact BPE tokens when asked to
    val sampled = Text.tokenBudgetSample(documents, 2000L, nTok = nTok)
    sampled.count() should be > 0L
    sampled.join(exact, "doc_id")
      .where($"n_tok" =!= $"n_bpe_tokens".cast("long")).count() shouldBe 0L
    // q67/q122's per-source masses sum the same exact counts
    val wTot = Pack.mixtureWeights(documents, nTok)
      .agg(sum($"src_tok")).as[Long].head()
    val tTot = Pack.mixtureTemperature(documents, nTok)
      .agg(sum($"n_tokens")).as[Long].head()
    val want = exact.agg(sum($"n_bpe_tokens".cast("long"))).as[Long].head()
    wTot shouldBe want
    tTot shouldBe want
  }
  test("q153 fertility: language rollup \u2261 q148 per-doc counts joined to lang") {
    val per = Bpe.q148.build(spark, sfDir)
      .select($"doc_id", $"n_words", $"n_bpe_tokens")
    val want = per
      .join(Tables.documents(spark, sfDir).select($"doc_id", $"lang"), "doc_id")
      .groupBy($"lang")
      .agg(count(lit(1)), sum($"n_words"), sum($"n_bpe_tokens"))
      .as[(String, Long, Long, Long)].collect().toSet
    val rows = Bpe.q153.build(spark, sfDir)
      .select($"lang", $"n_docs", $"n_words", $"n_bpe_tokens", $"fertility")
      .as[(String, Long, Long, Long, Double)].collect()
    rows.map(r => (r._1, r._2, r._3, r._4)).toSet shouldBe want
    // the 20-merge gate budget keeps words multi-token: fertility > 1
    // everywhere, and the division is exactly sum(nt)/sum(nw)
    rows.foreach { r =>
      r._5 shouldBe r._4.toDouble / r._3.toDouble
      r._5 should be > 1.0
    }
  }
}
