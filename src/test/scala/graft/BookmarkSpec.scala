package graft

import graft.sources.ExtractBookmark
import org.apache.spark.sql.functions._

/** Persisted extract bookmark: the reference's extract.py stores the
  * last-run watermark and resumes from it across process runs — a
  * second run must extract ONLY rows newer than the first run's max.
  */
class BookmarkSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-bm").toString + "/wm"

  test("first run extracts everything; second run only newer rows") {
    val bm = tmp()
    val run1 = Tables.events(spark, sfDir) // real ns-normalized timestamps
    val batch1 = ExtractBookmark.extractSince(run1, "ts", bm)
    batch1.count() shouldBe run1.count() // no bookmark yet → full extract
    val wm1 = ExtractBookmark.commit(batch1, "ts", bm)
    wm1 shouldBe defined

    // source grows: everything again, plus strictly newer rows
    val newer = run1.orderBy($"ts".desc).limit(10)
      .withColumn("ts", $"ts" + expr("INTERVAL 1 DAY"))
      .withColumn("event_id", $"event_id" + 1000000)
    val run2src = run1.unionByName(newer)
    val batch2 = ExtractBookmark.extractSince(run2src, "ts", bm)
    batch2.count() shouldBe 10L // exactly the appended rows
    batch2.select("event_id").as[Long].collect().toSet shouldBe
      newer.select("event_id").as[Long].collect().toSet

    val wm2 = ExtractBookmark.commit(batch2, "ts", bm)
    wm2.get should be > wm1.get
    // third run over an unchanged source extracts nothing
    ExtractBookmark.extractSince(run2src, "ts", bm).count() shouldBe 0L
  }

  test("empty batch commit keeps the bookmark (no regress, no clear)") {
    val bm = tmp()
    val src = Seq((1L, 100L), (2L, 200L)).toDF("id", "v")
    ExtractBookmark.commit(ExtractBookmark.extractSince(src, "v", bm), "v", bm) shouldBe Some(200L)
    val empty = ExtractBookmark.extractSince(src, "v", bm)
    empty.count() shouldBe 0L
    ExtractBookmark.commit(empty, "v", bm) shouldBe Some(200L) // unchanged
    ExtractBookmark.read(spark, bm) shouldBe Some(200L)
  }

  test("numeric watermark columns work and the filter is strict >") {
    val bm = tmp()
    val src = Seq((1L, 5L), (2L, 7L), (3L, 7L)).toDF("id", "v")
    ExtractBookmark.commit(src, "v", bm) shouldBe Some(7L)
    // ties with the stored watermark are NOT re-extracted
    ExtractBookmark.extractSince(src, "v", bm).count() shouldBe 0L
    val grown = src.union(Seq((4L, 8L)).toDF("id", "v"))
    ExtractBookmark.extractSince(grown, "v", bm).as[(Long, Long)].collect().toSeq shouldBe
      Seq((4L, 8L))
  }

  test("timestamp watermark filter is pushed down to the parquet scan") {
    val bm = tmp()
    // a native timestamp parquet column (the driver's events.ts is
    // nanosecond parquet normalized IN-PLAN, so filters on it cannot
    // push; an extract source at rest stores real timestamps)
    val dir = java.nio.file.Files.createTempDirectory("graft-bm-pq").toString
    Tables.events(spark, sfDir).write.mode("overwrite").parquet(dir)
    val src = spark.read.parquet(dir)
    ExtractBookmark.commit(src, "ts", bm)
    val resumed = ExtractBookmark.extractSince(src, "ts", bm)
    val scan = resumed.queryExecution.executedPlan.toString
    // the comparison must reach the scan as a pushed predicate — the
    // resume-at-scale contract (only new row groups are read)
    scan should include("PushedFilters: [IsNotNull(ts), GreaterThan(ts")
  }
}
