package graft

import org.scalatest.funsuite.AnyFunSuite

import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import graft.multimodal.PngCodec

/** Conformance pins for the pure-JVM PNG codec. PNG is LOSSLESS, so
  * unlike the JPEG band there is no tolerance anywhere: every pin is
  * exact pixel identity.
  *
  *   1. files WE write are decoded by ImageIO pixel-identically
  *      (proves the writer emits standard PNG — correct CRCs, a real
  *      zlib stream, correctly APPLIED filters — not a private
  *      format), and
  *   2. files IMAGEIO writes (its own filter choices and IDAT
  *      splitting) are decoded by US pixel-identically (proves the
  *      reconstruction paths against an independent encoder's filter
  *      decisions, not just our own y-mod-5 cycle).
  */
class PngCodecSpec extends AnyFunSuite {

  private def closedFormSum(id: Long, w: Int, h: Int): Long = {
    var sum = 0L
    for (y <- 0 until h; x <- 0 until w) sum += PngCodec.synthPixel(id, x, y)
    sum
  }

  test("synth → parse equals the closed form exactly (the mm13 oracle contract)") {
    for (id <- Seq(0L, 3L, 28L, 53L, 128L, 1003L); (w, h) <- Seq((1, 1), (6, 5), (18, 14))) {
      val info = PngCodec.parsePng(PngCodec.synthPng(id, w, h))
        .getOrElse(fail(s"synthPng($id,$w,$h) did not parse"))
      assert(info.width == w && info.height == h && info.nPx == w.toLong * h)
      assert(info.sumPx == closedFormSum(id, w, h), s"id=$id ${w}x$h")
    }
  }

  test("split-IDAT files decode identically to single-IDAT (and really have two chunks)") {
    val id = 28L
    val split = PngCodec.synthPng(id, 10, 8, splitIdat = true)
    val plain = PngCodec.synthPng(id, 10, 8)
    def idatCount(b: Array[Byte]): Int =
      b.sliding(4).count(_.sameElements("IDAT".getBytes("US-ASCII")))
    assert(idatCount(split) == 2 && idatCount(plain) == 1)
    assert(PngCodec.parsePng(split).get == PngCodec.parsePng(plain).get)
  }

  test("our files decode pixel-identically under ImageIO (standard PNG, not private)") {
    for ((id, w, h) <- Seq((3L, 6, 5), (28L, 13, 11), (53L, 18, 14))) {
      val bytes = PngCodec.synthPng(id, w, h, splitIdat = id % 2 == 0)
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      assert(img != null, "ImageIO rejected our PNG")
      assert(img.getWidth == w && img.getHeight == h)
      for (y <- 0 until h; x <- 0 until w)
        assert(img.getRaster.getSample(x, y, 0) == PngCodec.synthPixel(id, x, y),
          s"id=$id ($x,$y)")
    }
  }

  test("ImageIO-written files (foreign filter choices) decode pixel-identically by us") {
    for ((w, h, seed) <- Seq((13, 9, 5L), (64, 48, 11L), (1, 7, 29L))) {
      val src = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
      val rnd = new scala.util.Random(seed)
      val expect = Array.tabulate(h, w)((_, _) => rnd.nextInt(256))
      for (y <- 0 until h; x <- 0 until w) src.getRaster.setSample(x, y, 0, expect(y)(x))
      val out = new ByteArrayOutputStream()
      assert(ImageIO.write(src, "png", out), "ImageIO could not write grayscale PNG")
      val (dw, dh, ours) = PngCodec.decodeImage(out.toByteArray)
        .getOrElse(fail(s"foreign ${w}x$h PNG did not parse"))
      assert(dw == w && dh == h)
      for (y <- 0 until h; x <- 0 until w)
        assert(ours(y * w + x) == expect(y)(x), s"${w}x$h ($x,$y)")
    }
  }

  test("color, 16-bit, corrupt-CRC, truncated, and non-PNG payloads are None") {
    val color = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) color.setRGB(x, y, (x * 8 + y) * 1025)
    val cOut = new ByteArrayOutputStream()
    ImageIO.write(color, "png", cOut)
    assert(PngCodec.parsePng(cOut.toByteArray).isEmpty, "RGB PNG must be refused")

    val deep = new BufferedImage(8, 8, BufferedImage.TYPE_USHORT_GRAY)
    for (y <- 0 until 8; x <- 0 until 8) deep.getRaster.setSample(x, y, 0, x * 256 + y)
    val dOut = new ByteArrayOutputStream()
    ImageIO.write(deep, "png", dOut)
    assert(PngCodec.parsePng(dOut.toByteArray).isEmpty, "16-bit PNG must be refused")

    val good = PngCodec.synthPng(7L, 6, 6)
    val corrupt = good.clone()
    corrupt(corrupt.length - 1) = (corrupt(corrupt.length - 1) ^ 0x40).toByte // IEND CRC
    assert(PngCodec.parsePng(corrupt).isEmpty, "CRC mismatch must be refused")
    assert(PngCodec.parsePng(good.take(good.length / 2)).isEmpty)
    assert(PngCodec.parsePng(Array[Byte](1, 2, 3)).isEmpty)
    assert(PngCodec.parsePng(Array.empty[Byte]).isEmpty)
  }
}
