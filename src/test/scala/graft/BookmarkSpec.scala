package graft

import graft.sources.ExtractBookmark
import org.apache.spark.sql.functions._

/** Persisted extract bookmark: the reference's extract.py stores the
  * last-run watermark and resumes from it across process runs — a
  * second run must extract ONLY rows newer than the first run's max,
  * and rows arriving between processing and commit must not be
  * skipped (the snapshot-bounded window contract).
  */
class BookmarkSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-bm").toString + "/wm"

  test("first run extracts everything; second run only newer rows") {
    val bm = tmp()
    val run1 = Tables.events(spark, sfDir) // real ns-normalized timestamps
    val e1 = ExtractBookmark.extractSince(run1, "ts", bm)
    e1.batch.count() shouldBe run1.count() // no bookmark yet → full extract
    val wm1 = ExtractBookmark.commit(e1, bm)
    wm1 shouldBe defined

    // source grows: everything again, plus strictly newer rows
    val newer = run1.orderBy($"ts".desc).limit(10)
      .withColumn("ts", $"ts" + expr("INTERVAL 1 DAY"))
      .withColumn("event_id", $"event_id" + 1000000)
    val run2src = run1.unionByName(newer)
    val e2 = ExtractBookmark.extractSince(run2src, "ts", bm)
    e2.batch.count() shouldBe 10L // exactly the appended rows
    e2.batch.select("event_id").as[Long].collect().toSet shouldBe
      newer.select("event_id").as[Long].collect().toSet

    val wm2 = ExtractBookmark.commit(e2, bm)
    wm2.get should be > wm1.get // the watermark actually advanced
    ExtractBookmark.read(spark, bm) shouldBe wm2 // and was persisted
    // third run over an unchanged source extracts nothing
    ExtractBookmark.extractSince(run2src, "ts", bm).batch.count() shouldBe 0L
  }

  test("rows arriving between extract and commit are never skipped (snapshot bound)") {
    val bm = tmp()
    val dir = java.nio.file.Files.createTempDirectory("graft-bm-grow").toString
    Seq((1L, 100L), (2L, 200L)).toDF("id", "v")
      .write.mode("overwrite").parquet(dir)
    val src = spark.read.parquet(dir)
    val e = ExtractBookmark.extractSince(src, "v", bm)
    e.batch.count() shouldBe 2L
    // source grows AFTER the snapshot, BEFORE commit — the classic race
    Seq((3L, 300L)).toDF("id", "v").write.mode("append").parquet(dir)
    ExtractBookmark.commit(e, bm) shouldBe Some(200L) // snapshot, not live max
    // next run picks up the late row — nothing lost
    val e2 = ExtractBookmark.extractSince(spark.read.parquet(dir), "v", bm)
    e2.batch.select($"id").as[Long].collect().toSeq shouldBe Seq(3L)
  }

  test("empty batch commit keeps the bookmark (no regress, no clear)") {
    val bm = tmp()
    val src = Seq((1L, 100L), (2L, 200L)).toDF("id", "v")
    ExtractBookmark.commit(ExtractBookmark.extractSince(src, "v", bm), bm) shouldBe Some(200L)
    val e = ExtractBookmark.extractSince(src, "v", bm)
    e.batch.count() shouldBe 0L
    ExtractBookmark.commit(e, bm) shouldBe Some(200L) // unchanged
    ExtractBookmark.read(spark, bm) shouldBe Some(200L)
  }

  test("numeric watermark columns work and the filter is strict >") {
    val bm = tmp()
    val src = Seq((1L, 5L), (2L, 7L), (3L, 7L)).toDF("id", "v")
    ExtractBookmark.commit(ExtractBookmark.extractSince(src, "v", bm), bm) shouldBe Some(7L)
    // ties with the stored watermark are NOT re-extracted
    ExtractBookmark.extractSince(src, "v", bm).batch.count() shouldBe 0L
    val grown = src.union(Seq((4L, 8L)).toDF("id", "v"))
    ExtractBookmark.extractSince(grown, "v", bm).batch
      .as[(Long, Long)].collect().toSeq shouldBe Seq((4L, 8L))
  }

  test("fractional watermark columns are rejected (truncation would lose rows)") {
    val bm = tmp()
    val src = Seq((1L, 1.5), (2L, 2.5)).toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      ExtractBookmark.extractSince(src, "v", bm)
    }
    e.getMessage should include("integral")
  }

  test("corrupt sidecar fails loudly instead of silently re-extracting the world") {
    val bm = tmp()
    java.nio.file.Files.writeString(java.nio.file.Paths.get(bm), "garbage")
    val e = intercept[IllegalStateException] {
      ExtractBookmark.read(spark, bm)
    }
    e.getMessage should include("corrupt bookmark sidecar")
  }

  test("interrupted commit (sidecar deleted, complete tmp) is promoted on read") {
    val bm = tmp()
    // simulate a crash in the delete→rename window: no sidecar, the
    // committed value lives only in the completed tmp
    java.nio.file.Files.writeString(java.nio.file.Paths.get(bm + ".tmp"), "12345")
    ExtractBookmark.read(spark, bm) shouldBe Some(12345L)
    // read() must FINISH the commit, not just return the value —
    // otherwise the next commit's tmp overwrite can clobber the only
    // copy (r4 advice: second crash mid-tmp-write lost the bookmark)
    java.nio.file.Files.exists(java.nio.file.Paths.get(bm)) shouldBe true
    java.nio.file.Files.exists(java.nio.file.Paths.get(bm + ".tmp")) shouldBe false
    // a PARTIAL tmp with no sidecar still fails loudly, never promoted
    val bm2 = tmp()
    java.nio.file.Files.writeString(java.nio.file.Paths.get(bm2 + ".tmp"), "12x45")
    intercept[IllegalStateException] { ExtractBookmark.read(spark, bm2) }
    java.nio.file.Files.exists(java.nio.file.Paths.get(bm2)) shouldBe false
  }

  test("double-crash window: delete→rename crash then crash mid-NEXT-tmp-write loses nothing") {
    // crash 1 interrupts commit(100) between delete and rename:
    // no sidecar, the only copy of 100 is the completed tmp.
    // The NEXT commit's write() promotes that tmp to the sidecar
    // BEFORE creating its own tmp — so when crash 2 hits mid-write,
    // the surviving state is sidecar=100 + a partial tmp. Emulate
    // that end state and require read() to return 100: the promoted
    // sidecar shields the torn tmp, nothing is lost and nothing
    // throws (r5 carry: with read-side-only recovery this sequence
    // clobbered the bookmark's only copy).
    val bm = tmp()
    java.nio.file.Files.writeString(java.nio.file.Paths.get(bm), "100")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(bm + ".tmp"), "2x")
    ExtractBookmark.read(spark, bm) shouldBe Some(100L)

    // a TORN tmp that still parses (prefix "2" of a larger value)
    // must also be ignored next to a healthy sidecar — promoting it
    // would silently regress the watermark and re-extract the world
    val bm2 = tmp()
    java.nio.file.Files.writeString(java.nio.file.Paths.get(bm2), "5000")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(bm2 + ".tmp"), "2")
    ExtractBookmark.read(spark, bm2) shouldBe Some(5000L)
  }

  test("commit over a crash-interrupted commit rescues the stranded tmp first") {
    // full recovery path end-to-end: crash-1 state (no sidecar,
    // complete tmp=100), then a real commit of a newer watermark —
    // the committed value wins, the stranded tmp is gone, and at no
    // point was 100 the only copy inside an overwritten tmp
    val bm = tmp()
    java.nio.file.Files.writeString(java.nio.file.Paths.get(bm + ".tmp"), "100")
    val src = Seq((1L, 200L)).toDF("id", "wm")
    val e = ExtractBookmark.extractSince(src, "wm", bm)
    // the stranded 100 was promoted during extract's read, so the
    // window is (100, 200]
    e.batch.count() shouldBe 1L
    ExtractBookmark.commit(e, bm) shouldBe Some(200L)
    ExtractBookmark.read(spark, bm) shouldBe Some(200L)
    java.nio.file.Files.exists(java.nio.file.Paths.get(bm + ".tmp")) shouldBe false
  }

  test("timestamp watermark filter is pushed down to the parquet scan") {
    val bm = tmp()
    // a native timestamp parquet column (the driver's events.ts is
    // nanosecond parquet normalized IN-PLAN, so filters on it cannot
    // push; an extract source at rest stores real timestamps)
    val dir = java.nio.file.Files.createTempDirectory("graft-bm-pq").toString
    Tables.events(spark, sfDir).write.mode("overwrite").parquet(dir)
    val src = spark.read.parquet(dir)
    // bookmark a MID-range watermark (older half), so the resumed
    // window (wm, hi] is non-degenerate — with wm == hi the optimizer
    // (correctly) folds the contradiction to an empty relation and
    // there is no scan left to inspect
    val n = src.count()
    val older = src.orderBy($"ts").limit((n / 2).toInt)
    ExtractBookmark.commit(ExtractBookmark.extractSince(older, "ts", bm), bm)
    val resumed = ExtractBookmark.extractSince(src, "ts", bm).batch
    resumed.count() should be > 0L
    val scan = resumed.queryExecution.executedPlan.toString
    // the comparison must reach the scan as a pushed predicate — the
    // resume-at-scale contract (only new row groups are read)
    scan should include("PushedFilters: [IsNotNull(ts), GreaterThan(ts")
  }
}
