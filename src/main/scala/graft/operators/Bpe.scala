package graft.operators

import graft.functions.words
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training and tokenization (Sennrich,
  * Haddow & Birch 2016, "Neural Machine Translation of Rare Words
  * with Subword Units" — the public BPE algorithm every modern
  * tokenizer derives from). Real pretraining budgets are counted in
  * BPE tokens, not whitespace tokens; this closes the gap q38's
  * whitespace/regex heuristics leave.
  *
  * Scale split (the same sample-trained-model pattern as the ANN
  * quantizers): BPE training operates on the WORD-FREQUENCY
  * DICTIONARY, not the corpus — that is the published algorithm, and
  * it is what makes 100 TB training tractable. Stage 1 is one
  * distributed aggregation (explode words → groupBy → count → top-K
  * by frequency), collapsing the corpus to a model-sized dict whose
  * coverage loss is explicit (`maxDictWords`, default 200k — the same
  * cap as the quantizer training samples). Stage 2, the inherently
  * sequential merge loop, runs driver-side over that dict with
  * incremental pair-count maintenance (only words containing the
  * merged pair are re-counted). Stage 3, tokenization under the
  * trained merges, is fully distributed again — a native Catalyst
  * expression ([[graft.expressions.BpeTokenize]]) carrying the
  * model-sized merge ranks, one scan, no shuffle.
  *
  * Determinism (required by the spec and by incremental re-training):
  * the best pair each round is max by count, ties broken by the
  * lexicographically smallest (left, right); a word's occurrences of
  * the winning pair merge left-to-right, non-overlapping. Any corpus
  * partitioning yields the same dict (exact counts) and therefore the
  * same merges.
  */
object Bpe {

  /** End-of-word marker appended as a separate final symbol (Sennrich
    * 2016 §3.2) so merges cannot cross word boundaries and a trained
    * token knows whether it ends a word.
    */
  val Eow = "</w>"

  /** Stage 1 (distributed): corpus → word-frequency dictionary, capped
    * to the `maxDictWords` most frequent words (TakeOrdered top-K —
    * never a full sort). One shuffle on the word; partial aggregation
    * makes the map side emit one row per distinct word per task.
    */
  def wordDict(docs: DataFrame, textCol: String, maxDictWords: Int): DataFrame =
    docs
      .select(explode(words(col(textCol))).as("word"))
      .where(length(col("word")) > 0)
      .groupBy(col("word"))
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("word").asc)
      .limit(maxDictWords)

  /** Stage 2 (driver, model-sized input): the Sennrich merge loop over
    * a word-frequency dict. Incremental: pair counts and a
    * pair→words index are maintained across rounds, so each merge
    * re-scans only the words that contain the merged pair. Returns
    * the merges in training order (rank = position).
    */
  def trainMerges(dict: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    import scala.collection.mutable
    // dict words as symbol sequences: chars + the end-of-word marker
    val syms = mutable.ArrayBuffer.from(
      dict.map { case (w, f) => (w.map(_.toString).toVector :+ Eow, f) })
    val pairCount = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    def addWord(wid: Int, sign: Long): Unit = {
      val (s, f) = syms(wid)
      var i = 0
      while (i < s.length - 1) {
        val p = (s(i), s(i + 1))
        val c = pairCount.getOrElse(p, 0L) + sign * f
        if (c == 0L) pairCount.remove(p) else pairCount(p) = c
        if (sign > 0) pairWords.getOrElseUpdate(p, mutable.Set.empty) += wid
        i += 1
      }
    }
    syms.indices.foreach(addWord(_, 1L))
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    while (merges.length < numMerges && pairCount.nonEmpty) {
      // max by count, ties to the lexicographically smallest pair —
      // one linear scan (the map is dict-sized, not corpus-sized)
      val best = pairCount.iterator.reduce { (a, b) =>
        if (a._2 > b._2) a
        else if (a._2 < b._2) b
        else if (implicitly[Ordering[(String, String)]].lt(a._1, b._1)) a else b
      }._1
      merges += best
      pairWords.remove(best).getOrElse(mutable.Set.empty).foreach { wid =>
        addWord(wid, -1L) // retract the word's old pair counts
        syms(wid) = (mergeAll(syms(wid)._1, best), syms(wid)._2)
        addWord(wid, 1L) // and count its new ones
      }
    }
    merges.toSeq
  }

  /** Merge every left-to-right non-overlapping occurrence of `pair`. */
  private def mergeAll(s: Vector[String], pair: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < s.length) {
      if (i < s.length - 1 && s(i) == pair._1 && s(i + 1) == pair._2) {
        out += s(i) + s(i + 1); i += 2
      } else { out += s(i); i += 1 }
    }
    out.result()
  }

  /** Full training pipeline: distributed dict, driver merge loop,
    * merges table `(rank int, left string, right string)` — the
    * model artifact a tokenization deployment persists and ships.
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
      maxDictWords: Int = 200000): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val dict = wordDict(docs, textCol, maxDictWords)
      .as[(String, Long)].collect().toSeq // model-sized by construction
    trainMerges(dict, numMerges).zipWithIndex
      .map { case ((l, r), i) => (i, l, r) }
      .toDF("rank", "left", "right")
  }

  /** Encode one word under trained merges: greedily apply the
    * LOWEST-RANKED applicable merge until none applies (the standard
    * BPE apply step — training order is priority order). Driver-side
    * mirror of the distributed expression; the spec pins them equal.
    */
  def encodeWord(word: String, merges: Seq[(String, String)]): Seq[String] =
    encodeWith(word, merges.zipWithIndex.toMap)

  private[graft] def encodeWith(word: String,
      rank: Map[(String, String), Int]): Seq[String] = {
    var s = word.map(_.toString).toVector :+ Eow
    var done = false
    while (!done && s.length > 1) {
      var bestRank = Int.MaxValue
      var best: (String, String) = null
      var i = 0
      while (i < s.length - 1) {
        rank.get((s(i), s(i + 1))).foreach { r =>
          if (r < bestRank) { bestRank = r; best = (s(i), s(i + 1)) }
        }
        i += 1
      }
      if (best == null) done = true
      else s = mergeAll(s, best)
    }
    s
  }

  /** Stage 3 (distributed consumer): exact BPE token count per
    * document under a trained merges table — one codegen-adjacent
    * scan projection, the merges broadcast inside the expression
    * (model-sized, same driver-traffic budget as the ANN codebooks).
    */
  def tokenCounts(docs: DataFrame, textCol: String, idCol: String,
      merges: Seq[(String, String)]): DataFrame =
    docs.select(
      col(idCol),
      size(graft.functions.bpeTokenize(col(textCol), merges)).as("n_bpe_tokens"))

  /** [[tokenCounts]] reading the merges from a persisted model table. */
  def tokenCountsFrom(docs: DataFrame, textCol: String, idCol: String,
      mergesTable: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val merges = mergesTable.orderBy(col("rank"))
      .select(col("left"), col("right"))
      .as[(String, String)].collect().toSeq
    tokenCounts(docs, textCol, idCol, merges)
  }
}
