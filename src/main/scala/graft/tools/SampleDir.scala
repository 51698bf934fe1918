package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}

/** Build a SAMPLED testdata dir for the pair-graph oracle protocol.
  *
  * The 7 pair-graph gate queries (q52/q61/q80/q86/q89/q119/q128) have
  * recursive-CTE DuckDB oracles that are single-node-infeasible at
  * sf1 (47 CPU-min, >53 GB spill — the r17 incident). The r8/r9
  * fallback verified them at sf0.3; this tool lifts the certification
  * to sf1 the same way IncrAudit certifies rebuild-infeasible checks
  * at sf10: a DETERMINISTIC 1/K document subset (xxhash64(doc_id)
  * mod K = 0 — the IncrAudit sampling contract, content-independent),
  * drawn FROM THE sf1 CORPUS itself, so both engines run the exact
  * same query on the exact same (sampled) input and the compare stays
  * a bit-exact equality — while the oracle's pair CTE cost drops ~K².
  *
  * Usage: runMain graft.tools.SampleDir <srcDir> <outDir> <K>
  * — writes outDir/documents.parquet (single file, so DuckDB's plain
  * read path works) and hardlinks every other table from srcDir.
  */
object SampleDir {
  def main(args: Array[String]): Unit = {
    val Array(src, out, kStr) = args
    val spark = graft.util.configureLocalHarness(SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, src, out, kStr.toInt)
    spark.stop()
  }

  /** The testable core: build `out` from `src` with the 1/K document
    * stride (SampleDirSpec pins the exact sample and the linked
    * tables).
    */
  def run(spark: SparkSession, src: String, out: String, k: Int): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
    val others = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "embeddings")
    for (t <- others) {
      val srcP = java.nio.file.Paths.get(s"$src/$t.parquet")
      if (!java.nio.file.Files.isRegularFile(srcP))
        throw new IllegalArgumentException(
          s"SampleDir: $srcP is not a single parquet FILE (Spark-written " +
            "directory tables aren't supported — the oracle protocol " +
            "needs gen_sf.py-style one-file tables)")
      val dst = java.nio.file.Paths.get(s"$out/$t.parquet")
      java.nio.file.Files.deleteIfExists(dst)
      // hardlink when src and out share a filesystem (free, the normal
      // /tmp-to-/tmp usage); fall back to a copy across filesystems
      try java.nio.file.Files.createLink(dst, srcP)
      catch {
        case _: java.nio.file.FileSystemException | _: UnsupportedOperationException =>
          java.nio.file.Files.copy(srcP, dst)
      }
    }
    val tmp = s"$out/_docs_sample"
    val sampled = spark.read.parquet(s"$src/documents.parquet")
      .where(pmod(xxhash64(col("doc_id")), lit(k)) === 0)
    sampled.coalesce(1).write.mode("overwrite").parquet(tmp)
    // single part file → the plain documents.parquet FILE both engines read
    val part = java.nio.file.Files.list(java.nio.file.Paths.get(tmp))
      .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
    val dst = java.nio.file.Paths.get(s"$out/documents.parquet")
    java.nio.file.Files.deleteIfExists(dst)
    java.nio.file.Files.move(part, dst)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    val n = spark.read.parquet(s"$out/documents.parquet").count()
    println(s"""{"sampled_docs":$n,"k":$k,"src":"$src","out":"$out"}""")
  }
}
