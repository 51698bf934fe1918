package graft.tools

import org.apache.spark.sql.SparkSession

/** One recorded production-scale BPE training run (the r15 verdict's
  * open measurement): train a real merge count (default 32768 — the
  * 32k-vocab regime) over the capped dictionary, timing the two
  * stages separately — the distributed dict build (corpus-
  * proportional) and the driver merge loop (dict-proportional,
  * corpus-size-independent by design). Prints one JSON line; the
  * result is recorded in BASELINE.md.
  *
  * The synthetic corpus has a ~31-word vocabulary (replica corpora
  * add copies, never words), which exhausts BPE after ~100 merges —
  * far from the 32k regime. `dictSource=grams5` builds the dict from
  * the corpus's distinct word 5-grams instead (~240k entries at
  * sf0.1, ~25-char strings — the long-compound-word regime), giving
  * the driver loop a production-shaped input drawn from the same
  * testdata, with frequencies that are real corpus counts.
  *
  * Usage: runMain graft.tools.BpeTrainBench <sfDir> [numMerges]
  *        [maxDictWords] [words|grams5]
  */
object BpeTrainBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val numMerges = args.lift(1).map(_.toInt).getOrElse(32768)
    val maxDict = args.lift(2).map(_.toInt).getOrElse(200000)
    val dictSource = args.lift(3).getOrElse("words")
    val spark = graft.util.configureLocalHarness(SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import org.apache.spark.sql.functions._

    val docs = graft.Tables.documents(spark, sfDir)
    val t0 = System.nanoTime()
    val dictDf = dictSource match {
      case "words" => graft.operators.Bpe.wordDict(docs, "text", maxDict)
      case "grams5" => graft.operators.Bpe.capDict(
        graft.operators.Dedup.ngrams(docs, 5)
          .groupBy(col("shingle").as("word"))
          .agg(count(lit(1)).as("freq")), maxDict)
      case other => sys.error(s"unknown dictSource '$other' (words | grams5)")
    }
    val dict = dictDf.as[(String, Long)].collect().toSeq
    val tDict = (System.nanoTime() - t0) / 1e9

    val rt = Runtime.getRuntime
    rt.gc()
    val heapBefore = rt.totalMemory() - rt.freeMemory()
    val t1 = System.nanoTime()
    val merges = graft.operators.Bpe.trainMerges(dict, numMerges)
    val tTrain = (System.nanoTime() - t1) / 1e9
    val heapAfter = rt.totalMemory() - rt.freeMemory()

    println(s"""{"metric":"bpe_train","sf":"$sfDir","dict_words":${dict.size},""" +
      s""""requested_merges":$numMerges,"trained_merges":${merges.size},""" +
      s""""dict_sec":${f"$tDict%.2f"},"train_sec":${f"$tTrain%.2f"},""" +
      s""""heap_delta_mb":${(heapAfter - heapBefore) / (1 << 20)}}""")
    spark.stop()
  }
}
