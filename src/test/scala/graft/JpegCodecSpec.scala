package graft

import org.scalatest.funsuite.AnyFunSuite

import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import graft.multimodal.JpegCodec

/** Conformance pins for the pure-JVM baseline JPEG codec.
  *
  * The JPEG standard (ISO/IEC 10918-1 Annex A) specifies IDCT ACCURACY
  * bounds, not bit-exact output, so two correct decoders may differ by
  * a pixel step or two. The interop tests therefore pin our decoder
  * against the JDK's independent ImageIO (libjpeg-derived) decoder
  * within a ±2 per-pixel band, in BOTH directions:
  *   1. files WE write are decoded by ImageIO (proves the writer emits
  *      standard baseline JPEG, not a private format), and
  *   2. files IMAGEIO writes (its own quant + Huffman tables, JFIF
  *      headers) are decoded by US (proves the decoder reads foreign
  *      tables and markers, not just its own synth layout).
  * The closed-form test is exact: our decoder on our writer replays
  * dequantize→IDCT→clamp with the same integer basis the mm12 oracle
  * inlines, so that path has ONE right answer.
  */
class JpegCodecSpec extends AnyFunSuite {

  /** The mm12 oracle arithmetic, restated independently in Scala:
    * natural positions of the 4 live zigzag slots are 0, 1, 8, 2.
    */
  private def closedFormSum(id: Long, wb: Int, hb: Int): Long = {
    val slots = Array(0, 1, 2, 5)
    var sum = 0L
    for (b <- 0 until wb * hb; y <- 0 until 8; x <- 0 until 8) {
      var acc = 0L
      for (k <- slots) {
        val n = JpegCodec.Zigzag(k)
        val deq = JpegCodec.synthCoeff(id, b, k).toLong * JpegCodec.synthQuant(k)
        acc += deq * JpegCodec.IdctBasis((n << 6) | (y * 8 + x))
      }
      val px = 128L + ((acc + (1L << 19)) >> 20)
      sum += math.max(0L, math.min(255L, px))
    }
    sum
  }

  test("synth → parse equals the closed form exactly (the mm12 oracle contract)") {
    for (id <- Seq(0L, 1L, 7L, 19L, 44L, 101L); (wb, hb) <- Seq((1, 1), (3, 2), (2, 4))) {
      val info = JpegCodec.parseJpeg(JpegCodec.synthJpeg(id, wb, hb))
        .getOrElse(fail(s"synthJpeg($id,$wb,$hb) did not parse"))
      assert(info.width == wb * 8 && info.height == hb * 8)
      assert(info.nPx == wb.toLong * hb * 64)
      assert(info.sumPx == closedFormSum(id, wb, hb), s"id=$id wb=$wb hb=$hb")
    }
  }

  test("restart markers (DRI + RSTn + DC reset) decode to identical pixels") {
    for (id <- Seq(3L, 19L, 57L); ri <- Seq(1, 2, 5)) {
      val plain = JpegCodec.parseJpeg(JpegCodec.synthJpeg(id, 4, 3)).get
      val rst = JpegCodec.parseJpeg(JpegCodec.synthJpeg(id, 4, 3, restartInterval = ri))
        .getOrElse(fail(s"restart variant ri=$ri did not parse"))
      assert(rst == plain, s"id=$id ri=$ri")
    }
  }

  test("our files decode identically under ImageIO within the IDCT accuracy band") {
    for (id <- Seq(2L, 19L, 88L)) {
      val bytes = JpegCodec.synthJpeg(id, 3, 2)
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      assert(img != null, "ImageIO rejected our baseline file")
      assert(img.getWidth == 24 && img.getHeight == 16)
      val (w, h, ours) = JpegCodec.decodeImage(bytes).get
      var maxDiff = 0
      for (y <- 0 until h; x <- 0 until w) {
        val theirs = img.getRaster.getSample(x, y, 0)
        maxDiff = math.max(maxDiff, math.abs(theirs - ours(y * w + x)))
      }
      assert(maxDiff <= 2, s"id=$id max per-pixel gap vs ImageIO = $maxDiff")
    }
  }

  test("ImageIO-written grayscale files (foreign tables, odd sizes) decode within ±2") {
    for ((w, h, seed) <- Seq((13, 9, 5L), (32, 32, 11L), (17, 24, 29L))) {
      val src = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
      val rnd = new scala.util.Random(seed)
      for (y <- 0 until h; x <- 0 until w)
        src.getRaster.setSample(x, y, 0, rnd.nextInt(256))
      val out = new ByteArrayOutputStream()
      assert(ImageIO.write(src, "jpg", out), "ImageIO could not write grayscale JPEG")
      val bytes = out.toByteArray
      val (dw, dh, ours) = JpegCodec.decodeImage(bytes)
        .getOrElse(fail(s"foreign ${w}x$h file did not parse"))
      assert(dw == w && dh == h)
      val ref = ImageIO.read(new ByteArrayInputStream(bytes))
      var maxDiff = 0
      for (y <- 0 until h; x <- 0 until w) {
        val theirs = ref.getRaster.getSample(x, y, 0)
        maxDiff = math.max(maxDiff, math.abs(theirs - ours(y * w + x)))
      }
      assert(maxDiff <= 2, s"${w}x$h max per-pixel gap vs ImageIO = $maxDiff")
    }
  }

  test("color, truncated, and non-JPEG payloads are data, not exceptions (None)") {
    val color = new BufferedImage(16, 16, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16) color.setRGB(x, y, (x * 16 + y) * 1025)
    val out = new ByteArrayOutputStream()
    ImageIO.write(color, "jpg", out)
    assert(JpegCodec.parseJpeg(out.toByteArray).isEmpty, "3-component file must be refused")
    val good = JpegCodec.synthJpeg(7L, 2, 2)
    assert(JpegCodec.parseJpeg(good.take(good.length / 2)).isEmpty)
    assert(JpegCodec.parseJpeg(Array[Byte](1, 2, 3)).isEmpty)
    assert(JpegCodec.parseJpeg(Array.empty[Byte]).isEmpty)
  }
}
