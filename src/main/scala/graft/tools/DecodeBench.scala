package graft.tools

import graft.operators.{MediaRecord, Multimodal}

/** Micro-benchmark for the [[Multimodal.ImageIoDecoder]] hot loops
  * (mean-luma decode + 48-bit dHash) on synthetic megapixel images —
  * the A/B harness for the r17→r18 bulk-pixel-read change. No Spark:
  * the loops under test are pure per-record executor code, so a JVM
  * micro-bench isolates exactly what a 100 TB image scan pays per
  * record.
  *
  * Usage: `sbt "runMain graft.tools.DecodeBench [nImages] [side] [reps] [png|jpg]"`
  * — prints one JSON line with decode and dHash wall times.
  */
object DecodeBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 16
    val side = if (args.length > 1) args(1).toInt else 1024
    val reps = if (args.length > 2) args(2).toInt else 3
    val fmt = if (args.length > 3) args(3) else "png"

    // seeded smooth-gradient images (deterministic; PNG-encoded once,
    // outside the timed region — encode is not the loop under test)
    val batch: Seq[MediaRecord] = (0 until n).map { i =>
      val img = new java.awt.image.BufferedImage(
        side, side, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < side) {
        var x = 0
        while (x < side) {
          val v = ((x * 7 + y * 13 + i * 31) % 256)
          img.setRGB(x, y, (v << 16) | (v << 8) | v)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      MediaRecord(i.toLong, fmt, side, side, bos.toByteArray)
    }

    def time[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }

    // warm-up (JIT) then best-of-reps for each loop under test
    Multimodal.ImageIoDecoder.decode(batch.take(2))
    val decodeSecs = (1 to reps).map(_ => time(Multimodal.ImageIoDecoder.decode(batch))._1)
    val imgs = batch.map(r => Multimodal.ImageIoDecoder.read(r.doc_id, r.payload))
    val hashSecs = (1 to reps).map(_ =>
      time(imgs.zipWithIndex.map { case (im, i) =>
        Multimodal.ImageIoDecoder.dHash48(i.toLong, im) })._1)

    println(s"""{"bench":"decode","images":$n,"side":$side,"format":"$fmt",""" +
      s""""decode_best_sec":${decodeSecs.min},"dhash_best_sec":${hashSecs.min},""" +
      s""""decode_all":[${decodeSecs.mkString(",")}],"dhash_all":[${hashSecs.mkString(",")}]}""")
  }
}
