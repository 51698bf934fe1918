package graft

import graft.operators.{MediaFeatures, MediaRecord, Multimodal}

/** The multimodal decode seam: operators own the Spark plumbing, a
  * deployment's codec drops in through [[Multimodal.FrameDecoder]].
  */
object MultimodalSpec {
  // local[n] shares the JVM, so executor-side batch shapes can be
  // recorded in a static queue — the one thing the seam must prove
  // is that implementations see BATCHES, bounded by batchSize
  val batchSizes = new java.util.concurrent.ConcurrentLinkedQueue[Integer]()

  class UppercaseDecoder extends Multimodal.FrameDecoder {
    def decode(batch: Seq[MediaRecord]): Seq[MediaFeatures] = {
      batchSizes.add(batch.size)
      batch.map { r =>
        MediaFeatures(r.doc_id, r.format.toUpperCase, r.width, r.height,
          r.payload.length.toLong, 0.5)
      }
    }
  }
}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("a custom FrameDecoder drops into decodeFeatures; batches are bounded by batchSize") {
    MultimodalSpec.batchSizes.clear()
    val media = Multimodal.mediaTable(spark, sfDir)
    val got = Multimodal
      .decodeFeatures(media, new MultimodalSpec.UppercaseDecoder)
      .collect()
    // the custom decoder's output came through the same plumbing
    got should not be empty
    got.map(_.format).toSet should contain allOf ("PNG", "JPEG", "WAV")
    all(got.map(_.luma)) shouldBe 0.5
    // batch semantics: every call saw a non-empty batch of at most
    // batchSize records, and the batches cover every record exactly once
    import scala.jdk.CollectionConverters._
    val sizes = MultimodalSpec.batchSizes.asScala.map(_.toInt).toSeq
    sizes should not be empty
    all(sizes) should be > 0
    all(sizes) should be <= Multimodal.batchSize
    sizes.sum shouldBe got.length
  }

  test("the default decoder is the deterministic stub (q40's oracle contract)") {
    // deterministic subset (limit() may pick different rows per evaluation)
    val media = Multimodal.mediaTable(spark, sfDir).where($"doc_id" % 10 === 0)
    val viaDefault = Multimodal.decodeFeatures(media).collect().toSet
    val viaStub = Multimodal
      .decodeFeatures(media, Multimodal.StubDecoder).collect().toSet
    viaDefault shouldBe viaStub
    viaDefault.foreach { f =>
      f.luma shouldBe (f.n_bytes % 251) / 250.0
    }
  }
}
