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

  test("PpmDecoder decodes REAL P6 image bytes: exact luma, header truth, loud corruption") {
    def ppm(header: String, px: Array[Int]): Array[Byte] =
      header.getBytes("US-ASCII") ++ px.map(_.toByte)
    // 2x1: one white pixel, one black — mean Rec.601 luma = 0.5 exactly
    val img = ppm("P6\n# a comment\n2 1\n255\n",
      Array(255, 255, 255, 0, 0, 0))
    val media = Seq(MediaRecord(7L, "ppm", 0, 0, img)) // metadata dims wrong on purpose
    val out = Multimodal.PpmDecoder.decode(media)
    out should have size 1
    out.head.width shouldBe 2 // decoded truth, not the metadata
    out.head.height shouldBe 1
    out.head.luma shouldBe 0.5 +- 1e-12
    // a pure-green pixel: luma = 0.587
    val g = ppm("P6 1 1 255\n", Array(0, 255, 0))
    Multimodal.PpmDecoder.decode(Seq(MediaRecord(8L, "ppm", 1, 1, g)))
      .head.luma shouldBe 0.587 +- 1e-12
    // corruption is LOUD, with the doc id
    val bad = intercept[IllegalArgumentException] {
      Multimodal.PpmDecoder.decode(Seq(MediaRecord(9L, "ppm", 1, 1,
        "JFIF....".getBytes("US-ASCII"))))
    }
    bad.getMessage should include("doc 9")
    intercept[IllegalArgumentException] {
      Multimodal.PpmDecoder.decode(Seq(MediaRecord(10L, "ppm", 1, 1,
        ppm("P6 4 4 255\n", Array(1, 2, 3))))) // truncated pixels
    }.getMessage should include("truncated")
    // and it rides the same Spark plumbing as any decoder
    val df = spark.createDataFrame(Seq((7L, "ppm", 0, 0, img)))
      .toDF("doc_id", "format", "width", "height", "payload")
    val viaSpark = Multimodal.decodeFeatures(df, Multimodal.PpmDecoder).collect()
    viaSpark.head.luma shouldBe 0.5 +- 1e-12
  }

  test("WavDecoder decodes REAL PCM16 WAV bytes: exact RMS, format metadata, loud corruption") {
    def wav(channels: Int, rate: Int, samples: Array[Short]): Array[Byte] = {
      val dataSz = samples.length * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataSz)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSz)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(channels.toShort).putInt(rate)
        .putInt(rate * channels * 2).putShort((channels * 2).toShort).putShort(16)
        .put("data".getBytes("US-ASCII")).putInt(dataSz)
      samples.foreach(bb.putShort)
      bb.array()
    }
    // constant half-scale samples: rms = 16384/32768 = 0.5 exactly
    val b = wav(2, 16000, Array.fill(8)(16384.toShort))
    val out = Multimodal.WavDecoder.decode(
      Seq(MediaRecord(11L, "wav", 0, 0, b))).head
    out.width shouldBe 2 // channels
    out.height shouldBe 16 // sample rate in kHz
    out.luma shouldBe 0.5 +- 1e-12
    // silence is rms 0
    Multimodal.WavDecoder.decode(
      Seq(MediaRecord(12L, "wav", 0, 0, wav(1, 8000, Array.fill(4)(0.toShort)))))
      .head.luma shouldBe 0.0
    // a compressed or malformed payload is LOUD
    intercept[IllegalArgumentException] {
      Multimodal.WavDecoder.decode(Seq(MediaRecord(13L, "wav", 0, 0,
        "OggS....".getBytes("US-ASCII") ++ Array.fill(40)(0.toByte))))
    }.getMessage should include("doc 13")
    // a corrupt chunk size ≥ 2^31 narrows to a NEGATIVE Int; before the
    // guard, `o += 8 + sz + (sz & 1)` advanced by zero or backwards — an
    // infinite loop on the executor. Must fail loudly, never hang.
    val evil = wav(1, 8000, Array.fill(4)(0.toShort))
    // overwrite the fmt chunk's size field (offset 16) with 0xFFFFFFFF
    evil(16) = -1; evil(17) = -1; evil(18) = -1; evil(19) = -1
    intercept[IllegalArgumentException] {
      Multimodal.WavDecoder.decode(Seq(MediaRecord(14L, "wav", 0, 0, evil)))
    }.getMessage should include("invalid chunk size")
  }

  /** Encode a w×h image with per-pixel RGB from `px(x, y)` through the
    * JDK's own ImageIO writers — REAL compressed PNG/JPEG bytes, built
    * in-memory with zero external tooling.
    */
  private def enc(fmt: String, w: Int, h: Int)(px: (Int, Int) => Int): Array[Byte] = {
    val bi = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) bi.setRGB(x, y, px(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(bi, fmt, bos), s"no $fmt writer")
    bos.toByteArray
  }

  private def gray(v: Int): Int = (v << 16) | (v << 8) | v

  test("ImageIoDecoder decodes REAL PNG and JPEG bytes: luma truth, decoded dimensions, loud corruption") {
    // PNG is lossless: an all-white 16x12 decodes to luma exactly 1.0,
    // all-black to 0.0, and dimensions come from the PAYLOAD, not the
    // metadata columns (passed as 0x0 to prove they are ignored)
    val white = Multimodal.ImageIoDecoder.decode(
      Seq(MediaRecord(1L, "png", 0, 0, enc("png", 16, 12)((_, _) => gray(255))))).head
    white.width shouldBe 16
    white.height shouldBe 12
    white.luma shouldBe 1.0 +- 1e-12
    Multimodal.ImageIoDecoder.decode(
      Seq(MediaRecord(2L, "png", 0, 0, enc("png", 16, 12)((_, _) => gray(0)))))
      .head.luma shouldBe 0.0 +- 1e-12
    // mid-gray 128/255 exactly (0.299+0.587+0.114 = 1 by construction)
    Multimodal.ImageIoDecoder.decode(
      Seq(MediaRecord(3L, "png", 0, 0, enc("png", 8, 8)((_, _) => gray(128)))))
      .head.luma shouldBe 128.0 / 255.0 +- 1e-9
    // JPEG is lossy but a flat field survives quantization nearly exactly
    val jpg = Multimodal.ImageIoDecoder.decode(
      Seq(MediaRecord(4L, "jpeg", 0, 0, enc("jpg", 16, 12)((_, _) => gray(128))))).head
    jpg.width shouldBe 16
    jpg.luma shouldBe 128.0 / 255.0 +- 0.02
    // batch semantics: mixed formats in one batch, order preserved
    val batch = Multimodal.ImageIoDecoder.decode(Seq(
      MediaRecord(5L, "png", 0, 0, enc("png", 8, 8)((_, _) => gray(255))),
      MediaRecord(6L, "jpeg", 0, 0, enc("jpg", 8, 8)((_, _) => gray(0))))).map(_.doc_id)
    batch shouldBe Seq(5L, 6L)
    // corruption is LOUD with the doc id: ImageIO.read returns null on
    // unclaimed bytes — that must become an exception, not fake features
    intercept[IllegalArgumentException] {
      Multimodal.ImageIoDecoder.decode(Seq(MediaRecord(7L, "png", 0, 0,
        Array.fill[Byte](64)(0x5a))))
    }.getMessage should include("doc 7")
    // a TRUNCATED png (valid magic, cut body) must also fail loudly,
    // whether ImageIO throws or returns a null/partial decode
    val cut = enc("png", 16, 12)((x, _) => gray(x * 15)).take(24)
    intercept[IllegalArgumentException] {
      Multimodal.ImageIoDecoder.decode(Seq(MediaRecord(8L, "png", 0, 0, cut)))
    }.getMessage should include("doc 8")
  }

  test("translucent ARGB PNG decodes with alpha DISCARDED (Src composite), not composited toward black") {
    // a half-transparent white PNG: getRGB-style semantics return the
    // raw color channels (luma 1.0); the SrcOver regression would
    // alpha-multiply onto the black canvas (luma ~0.5)
    def encArgb(alpha: Int, v: Int): Array[Byte] = {
      val bi = new java.awt.image.BufferedImage(
        16, 12, java.awt.image.BufferedImage.TYPE_INT_ARGB)
      for (y <- 0 until 12; x <- 0 until 16)
        bi.setRGB(x, y, (alpha << 24) | gray(v))
      val bos = new java.io.ByteArrayOutputStream()
      require(javax.imageio.ImageIO.write(bi, "png", bos), "no png writer")
      bos.toByteArray
    }
    Multimodal.ImageIoDecoder.decode(
      Seq(MediaRecord(9L, "png", 0, 0, encArgb(128, 255))))
      .head.luma shouldBe 1.0 +- 1e-12
    // fully transparent mid-gray still reads its color channels
    Multimodal.ImageIoDecoder.decode(
      Seq(MediaRecord(9L, "png", 0, 0, encArgb(0, 128))))
      .head.luma shouldBe 128.0 / 255.0 +- 1e-9
    // and the dHash over a translucent gradient matches the opaque one
    val opq = Multimodal.ImageIoDecoder.read(9L,
      enc("png", 64, 64)((x, _) => gray((x * 255) / 63)))
    val bi = new java.awt.image.BufferedImage(
      64, 64, java.awt.image.BufferedImage.TYPE_INT_ARGB)
    for (y <- 0 until 64; x <- 0 until 64)
      bi.setRGB(x, y, (64 << 24) | gray((x * 255) / 63))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "png", bos)
    val trn = Multimodal.ImageIoDecoder.read(9L, bos.toByteArray)
    Multimodal.ImageIoDecoder.dHash48(9L, trn) shouldBe
      Multimodal.ImageIoDecoder.dHash48(9L, opq)
  }

  test("decoded dHash routes q88's machinery over real pixels: a PNG/JPEG re-encode of the same image is a near-dup pair") {
    // a strong horizontal gradient: every adjacent dHash cell pair
    // differs by ~36 luma levels, far above JPEG quantization noise, so
    // the decoded fingerprint is re-encode-stable by construction
    def grad(x: Int, y: Int) = gray((x * 255) / 63)
    def revGrad(x: Int, y: Int) = gray(((63 - x) * 255) / 63)
    val media = Seq(
      MediaRecord(10L, "png", 0, 0, enc("png", 64, 64)(grad)),
      MediaRecord(20L, "jpeg", 0, 0, enc("jpg", 64, 64)(grad)), // same pixels, lossy re-encode
      MediaRecord(30L, "png", 0, 0, enc("png", 64, 64)(revGrad)) // mirrored: hamming 48 from both
    ).toDS().toDF()
    val pairs = Multimodal.mediaPhashPairsDecoded(media)
      .as[(Long, Long, Long)].collect().toSeq
    pairs.map(p => (p._1, p._2)) shouldBe Seq((10L, 20L))
    pairs.head._3 should be <= 3L // re-encode noise, not identity, is the test
    // the fingerprint itself: gradient = all 48 comparison bits set,
    // reverse gradient = none (block-mean dHash truth, not just pair truth)
    val img = Multimodal.ImageIoDecoder.read(10L, enc("png", 64, 64)(grad))
    Multimodal.ImageIoDecoder.dHash48(10L, img) shouldBe (1L << 48) - 1
    val rev = Multimodal.ImageIoDecoder.read(30L, enc("png", 64, 64)(revGrad))
    Multimodal.ImageIoDecoder.dHash48(30L, rev) shouldBe 0L
    // too-small images cannot be fingerprinted: loud, with the doc id
    intercept[IllegalArgumentException] {
      Multimodal.ImageIoDecoder.dHash48(40L,
        Multimodal.ImageIoDecoder.read(40L, enc("png", 6, 6)((_, _) => gray(9))))
    }.getMessage should include("smaller than")
  }

  test("q160 gate table: real deterministic PNG/JPEG payloads, planted cross-codec pairs recovered at hamming 0") {
    // payloads are REAL compressed bytes: PNG magic on base rows, JFIF
    // on planted rows, and ImageIO decodes every one of them
    val media = Multimodal.realMediaTable(spark, sfDir)
      .as[MediaRecord].collect().toSeq
    val base = media.filter(_.doc_id < 10000000L)
    val planted = media.filter(_.doc_id >= 10000000L)
    planted.size shouldBe base.count(_.doc_id % 10 == 0)
    base.head.payload.take(4).map(_ & 0xff) shouldBe Seq(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt)
    planted.head.payload.take(2).map(_ & 0xff) shouldBe Seq(0xff, 0xd8) // JPEG SOI
    // encode is deterministic: the same doc id yields byte-identical
    // payloads across evaluations (the oracle-consistency contract)
    Multimodal.encodeImage(Multimodal.syntheticImage(42L), "png") shouldBe
      Multimodal.encodeImage(Multimodal.syntheticImage(42L), "png")
    // the gate query recovers EVERY planted (d, d+10M) cross-codec pair
    // at hamming 0: the >=28-level cell margins survive JPEG
    val pairs = SparkEntry.queries("q160_phash_decoded")(spark, sfDir)
      .as[(Long, Long, Long)].collect().toSeq
    val plantedPairs = pairs.filter(p => p._2 == p._1 + 10000000L)
    plantedPairs.map(_._1).toSet shouldBe
      base.map(_.doc_id).filter(_ % 10 == 0).toSet
    all(plantedPairs.map(_._3)) shouldBe 0L
  }

  test("audio block-energy fingerprint: a resampled + regained WAV re-encode is a near-dup pair through the shared banding") {
    def wav(channels: Int, rate: Int, samples: Array[Short]): Array[Byte] = {
      val dataSz = samples.length * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataSz)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSz)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(channels.toShort).putInt(rate)
        .putInt(rate * channels * 2).putShort((channels * 2).toShort).putShort(16)
        .put("data".getBytes("US-ASCII")).putInt(dataSz)
      samples.foreach(bb.putShort)
      bb.array()
    }
    // seeded 49-block amplitude envelope, adjacent blocks distinct;
    // amplitudes are even so a 0.5 gain stays EXACT in 16-bit samples
    def envelope(seed: Long): Array[Int] = {
      var prev = -1
      (0 until 49).map { k =>
        var lv = (((seed + 31L * k) * 2654435761L >>> 33) % 8).toInt
        if (lv == prev) lv = (lv + 1) % 8
        prev = lv
        (lv + 1) * 4000
      }.toArray
    }
    // square-ish wave: |sample| = block amplitude, alternating sign —
    // per-block RMS IS the amplitude, exactly
    def pcm(env: Array[Int], perBlock: Int, upsample: Int, gain: Double): Array[Short] =
      env.flatMap { a =>
        (0 until perBlock).flatMap { i =>
          val s = ((if (i % 2 == 0) a else -a) * gain).toInt.toShort
          Seq.fill(upsample)(s)
        }
      }
    val env1 = envelope(100L); val env2 = envelope(200L)
    val media = Seq(
      // base: 8 kHz
      MediaRecord(100L, "wav", 0, 0, wav(1, 8000, pcm(env1, 20, 1, 1.0))),
      // the planted re-encode: 16 kHz (2x zero-order-hold resample) at
      // half the level — same energy ENVELOPE, different bytes
      MediaRecord(10000100L, "wav", 0, 0, wav(1, 16000, pcm(env1, 20, 2, 0.5))),
      // a different recording: no pair
      MediaRecord(200L, "wav", 0, 0, wav(1, 8000, pcm(env2, 20, 1, 1.0)))
    ).toDS().toDF()
    val pairs = Multimodal.audioPhashPairs(media)
      .as[(Long, Long, Long)].collect().toSeq
    pairs.map(p => (p._1, p._2)) shouldBe Seq((100L, 10000100L))
    // resample + gain preserve every RMS comparison: hamming exactly 0
    pairs.head._3 shouldBe 0L
    // too-short audio has no envelope to fingerprint: loud, with doc id
    intercept[IllegalArgumentException] {
      Multimodal.wavEnergy48(9L, wav(1, 8000, Array.fill(10)(1000.toShort)))
    }.getMessage should include("doc 9")
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
