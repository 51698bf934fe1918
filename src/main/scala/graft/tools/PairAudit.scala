package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Answer-size audit for the pair family: prints one JSON line with
  * the OUTPUT row count of each near-dup query against a dataset dir.
  *
  * Companion to the fresh-vs-replica scale methodology (BASELINE.md):
  * `tools/gen_sf.py` replica corpora make the TRUE pair answer grow
  * quadratically in the copy count, `tools/gen_fresh.py` corpora pin
  * it at the planted ~5% rate — comparing runtime (Bench) AND answer
  * size (this tool) across the two separates answer-driven growth
  * from plan-driven growth. Usage:
  * {{{ runMain graft.tools.PairAudit /tmp/sf3fresh [q31,q33] }}}
  */
object PairAudit {
  private val defaultQueries =
    Seq("q31_dedup_jaccard", "q32_dedup_minhash", "q33_dedup_simhash",
      "q105_semdedup")

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PairAudit <sfDir> [q31,q33,...]")
    val dir = args(0)
    val names =
      if (args.length > 1) {
        val prefixes = args(1).split(",").toSeq
        SparkEntry.queries.keys.filter(n => prefixes.exists(n.startsWith)).toSeq.sorted
      } else defaultQueries
    val spark = graft.util.configureLocalHarness(SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val counts = names.map { n =>
      val t0 = System.nanoTime()
      val c = SparkEntry.queries(n)(spark, dir).count()
      val secs = (System.nanoTime() - t0) / 1e9
      // Locale.ROOT: a comma-decimal default locale would break the JSON
      val secStr = String.format(java.util.Locale.ROOT, "%.2f", Double.box(secs))
      s""""$n":{"rows":$c,"sec":$secStr}"""
    }
    println(s"""{"dir":"$dir",${counts.mkString(",")}}""")
  }
}
