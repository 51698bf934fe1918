package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Same-JVM interleaved A/B harness for QUERY-SHAPE adjudication
  * (r19): when the box is too noisy for stash/pop bench pairs (the
  * sentinel discipline rejects the window), run both formulations of
  * a disputed shape ALTERNATING in one session — noise hits both arms
  * equally, so the ratio survives contention even when absolute
  * seconds do not. The DecodeBench precedent, lifted to plan shapes.
  *
  * Usage: runMain graft.tools.AbShapes <sfDir> <case> [reps]
  * Cases: q131 (r18 window+dropDup form vs r19 occ form),
  *        q125 (row_number window argmax vs min_by aggregate).
  * Output: one line per rep per arm + a min-of summary.
  */
object AbShapes {

  private def timeNoop(df: DataFrame): Double = {
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  /** The RETIRED r18 n-gram producer (explode → per-doc window lead),
    * inlined here verbatim so the old shapes stay re-runnable. */
  private def windowNgrams(df: DataFrame, n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byPos = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val leads = (1 until n).map(i => lead(col("w"), i).over(byPos))
    df.select(col("doc_id"),
      posexplode(graft.functions.words(col("text"))).as(Seq("pos", "w")))
      .select(col("doc_id"), col("pos"),
        concat_ws(" ", col("w") +: leads: _*).as("shingle"),
        leads.last.as("wlast"))
      .where(col("wlast").isNotNull)
      .select(col("doc_id"), col("shingle"))
  }

  private def q131Old(s: SparkSession, d: String): DataFrame = {
    val g8 = windowNgrams(graft.Tables.documents(s, d), 8)
      .select(col("doc_id"), xxhash64(col("shingle")).as("gh"))
    val gramDf = g8.dropDuplicates("gh", "doc_id")
      .groupBy(col("gh")).agg(count(lit(1)).as("df"))
    g8.join(gramDf, "gh")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("df") >= 2, lit(1L)).otherwise(lit(0L))).as("dup_spans"))
      .where(col("dup_spans") > 0)
      .withColumn("mostly_copied", col("dup_spans") * lit(4L) >= col("n_spans"))
  }

  /** The RETIRED r18 pair fanout (nested transform∘slice HOFs) on the
    * full q110 pipeline. */
  private def q110Old(s: SparkSession, d: String): DataFrame = {
    val raw = graft.Tables.lineitem(s, d).groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
    val baskets = graft.util.reused(raw)
    val partCnt = baskets.select(explode(col("ps")).as("l_partkey"))
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("c"))
    val nOrders = baskets.agg(count(lit(1)).as("n_orders_total"))
    val pairs = baskets
      .select(explode(expr(
        "flatten(transform(ps, (x, i) -> " +
          "transform(slice(ps, i + 2, size(ps)), y -> struct(x AS p1, y AS p2))))"))
        .as("pr"))
      .select(col("pr.p1"), col("pr.p2"))
      .groupBy(col("p1"), col("p2"))
      .agg(count(lit(1)).as("n_pair"))
      .where(col("n_pair") >= 2)
    pairs
      .join(broadcast(partCnt.select(col("l_partkey").as("p1"), col("c").as("c1"))), Seq("p1"))
      .join(broadcast(partCnt.select(col("l_partkey").as("p2"), col("c").as("c2"))), Seq("p2"))
      .crossJoin(broadcast(nOrders))
      .withColumn("lift",
        (col("n_pair") * col("n_orders_total")).cast("double") / (col("c1") * col("c2")))
      .select(col("p1"), col("p2"), col("n_pair"), col("c1"), col("c2"), col("lift"))
  }

  /** The RETIRED r18 char-trigram tf stream (transform∘sequence∘substr
    * HOF) vs the native char_ngrams form — the trigram_tf build's hot
    * pass, compared as the tf aggregate itself. */
  private def tfOld(s: SparkSession, d: String): DataFrame =
    graft.Tables.documents(s, d)
      .where(length(col("text")) >= 3)
      .select(col("doc_id"), col("lang"),
        explode(transform(sequence(lit(1), length(col("text")) - 2),
          i => col("text").substr(i, lit(3)))).as("tg"))
      .groupBy(col("doc_id"), col("lang"), col("tg"))
      .agg(count(lit(1)).as("tf"))

  private def tfNew(s: SparkSession, d: String): DataFrame =
    graft.Tables.documents(s, d)
      .where(length(col("text")) >= 3)
      .select(col("doc_id"), col("lang"),
        explode(graft.functions.charNgrams(col("text"), 3)).as("tg"))
      .groupBy(col("doc_id"), col("lang"), col("tg"))
      .agg(count(lit(1)).as("tf"))

  private def q125Old(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = graft.operators.Text.storedTrigramTf(s, d)
    val profiles = tf.where(col("doc_id") % 10 < 8)
      .groupBy(col("lang"), col("tg")).agg(sum(col("tf")).as("cnt"))
    val scored = tf
      .join(broadcast(profiles.withColumnRenamed("lang", "cand")), Seq("tg"))
      .groupBy(col("doc_id"), col("lang"), col("cand"))
      .agg(sum(col("tf") * col("cnt")).as("score"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("cand").asc)
    scored.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1)
      .select(col("doc_id"), col("lang"), col("cand").as("predicted"))
      .groupBy(col("lang"), col("predicted"))
      .agg(count(lit(1)).as("n_docs"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val which = if (args.length > 1) args(1) else "q131"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.util.configureLocalHarness(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val (oldF, newF): (() => DataFrame, () => DataFrame) = which match {
      case "q131" => (() => q131Old(spark, sfDir),
        () => graft.operators.Dedup.q131.build(spark, sfDir))
      case "q125" => (() => q125Old(spark, sfDir),
        () => graft.operators.Text.q125.build(spark, sfDir))
      case "q110" => (() => q110Old(spark, sfDir),
        () => graft.operators.Relational.q110.build(spark, sfDir))
      case "tf" => (() => tfOld(spark, sfDir), () => tfNew(spark, sfDir))
      case other => sys.error(s"unknown case $other")
    }
    // equality first: both arms must compute the same rows
    val diff = oldF().exceptAll(newF()).count() + newF().exceptAll(oldF()).count()
    println(s"[ab] $which rows-diff old<->new: $diff")
    require(diff == 0, "arms disagree — not a valid A/B")
    var oldT = List.empty[Double]; var newT = List.empty[Double]
    (1 to reps).foreach { r =>
      val a = timeNoop(oldF()); oldT ::= a
      val b = timeNoop(newF()); newT ::= b
      println(f"[ab] $which rep $r: old $a%.2fs new $b%.2fs")
    }
    println(f"[ab] $which MIN old ${oldT.min}%.2fs new ${newT.min}%.2fs " +
      f"ratio ${newT.min / oldT.min}%.2f")
    spark.stop()
  }
}
