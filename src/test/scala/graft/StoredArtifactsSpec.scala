package graft

import graft.operators.{Ann, Hierarchy}

/** Lifecycle of the session-scoped stored artifacts: clear evicts,
  * the next touch rebuilds the same content, and a second clear with
  * nothing warmed is a no-op. (The memory-release half of the
  * contract — ContextCleaner freeing checkpoint blocks after GC — is
  * asynchronous by design and not assertable from here.)
  */
class StoredArtifactsSpec extends SparkSpec {

  test("clear evicts warmed artifacts; next touch rebuilds identical content") {
    // warm one artifact of each value shape: a loaded table, a
    // localCheckpointed derived frame, a driver-side model array,
    // and a lazy-persist reused frame
    Tables.load(spark, sfDir, "nation")
    val closureBefore = Hierarchy.storedClosure(spark, sfDir)
    val rowsBefore = closureBefore.count()
    val centsBefore = Ann.storedCentroids(spark, sfDir, 4, 2)
    util.reused(Tables.load(spark, sfDir, "region"))

    val evicted = StoredArtifacts.clear(spark)
    evicted should be >= 4

    // rebuilt on next touch: a NEW frame (the memo entry is gone),
    // same logical content, and the model retrains deterministically
    val closureAfter = Hierarchy.storedClosure(spark, sfDir)
    (closureAfter eq closureBefore) shouldBe false
    closureAfter.count() shouldBe rowsBefore
    closureAfter.except(closureBefore).count() shouldBe 0L
    val centsAfter = Ann.storedCentroids(spark, sfDir, 4, 2)
    centsAfter.map(_.toSeq).toSeq shouldBe centsBefore.map(_.toSeq).toSeq
  }

  test("clear with nothing warmed is a counted no-op") {
    StoredArtifacts.clear(spark)
    StoredArtifacts.clear(spark) shouldBe 0
  }
}
