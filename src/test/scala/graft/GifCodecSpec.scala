package graft

import org.scalatest.funsuite.AnyFunSuite

import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import graft.multimodal.GifCodec

/** Conformance pins for the pure-JVM GIF/LZW codec. Palette indexing
  * is lossless, so — like PNG and unlike JPEG — every pin is exact
  * pixel identity:
  *   1. files WE write decode pixel-identically under ImageIO (the
  *      writer's LZW streams, sub-blocking, and code-width schedule
  *      are standard, not private), and
  *   2. files IMAGEIO writes (its own LZW phrasing and clear-code
  *      policy) decode pixel-identically by US — the direction that
  *      exercises decoder paths our own encoder may never emit.
  * Plus a planted constant image driving the KwKwK corner (a code
  * that references the dictionary entry being defined), which the
  * structured synth pixels never hit.
  */
class GifCodecSpec extends AnyFunSuite {

  private def closedFormSum(id: Long, w: Int, h: Int): Long = {
    var sum = 0L
    for (y <- 0 until h; x <- 0 until w) sum += GifCodec.synthPixel(id, x, y)
    sum
  }

  test("synth → parse equals the closed form exactly (the mm14 oracle contract)") {
    for (id <- Seq(0L, 11L, 36L, 61L, 111L, 1011L); (w, h) <- Seq((1, 1), (7, 5), (23, 17))) {
      val info = GifCodec.parseGif(GifCodec.synthGif(id, w, h))
        .getOrElse(fail(s"synthGif($id,$w,$h) did not parse"))
      assert(info.width == w && info.height == h && info.nPx == w.toLong * h)
      assert(info.sumPx == closedFormSum(id, w, h), s"id=$id ${w}x$h")
    }
  }

  test("KwKwK corner: constant and run-heavy images round-trip exactly") {
    // constant image: second phrase is always code == next (KwKwK)
    val flat = GifCodec.synthGifWith(9, 7, (_, _) => 77)
    val (fw, fh, fpx) = GifCodec.decodeImage(flat).getOrElse(fail("flat gif did not parse"))
    assert(fw == 9 && fh == 7 && fpx.forall(_ == 77))
    // two-value runs: stresses repeated phrase growth across rows
    val runs = GifCodec.synthGifWith(31, 11, (x, _) => if (x < 16) 10 else 200)
    val (_, _, rpx) = GifCodec.decodeImage(runs).getOrElse(fail("run gif did not parse"))
    assert(rpx.grouped(31).forall(row =>
      row.take(16).forall(_ == 10) && row.drop(16).forall(_ == 200)))
  }

  test("a big image crosses code-width growth (and a table reset) and still round-trips") {
    // 120x90 structured pixels push the dictionary past 512/1024/2048
    // entries — every width step 9→10→11→12 is exercised
    val bytes = GifCodec.synthGif(5L, 120, 90)
    val info = GifCodec.parseGif(bytes).getOrElse(fail("big gif did not parse"))
    assert(info.nPx == 120L * 90 && info.sumPx == closedFormSum(5L, 120, 90))
    // random-ish pixels exhaust the 4096-entry table -> CLEAR restart path
    val noisy = GifCodec.synthGifWith(200, 160,
      (x, y) => ((x * 7919 + y * 104729) >> 3) & 0xff)
    val (_, _, npx) = GifCodec.decodeImage(noisy).getOrElse(fail("noisy gif did not parse"))
    var ok = true
    for (y <- 0 until 160; x <- 0 until 200)
      ok &&= npx(y * 200 + x) == (((x * 7919 + y * 104729) >> 3) & 0xff)
    assert(ok, "table-reset round-trip corrupted pixels")
  }

  test("our files decode pixel-identically under ImageIO") {
    for ((id, w, h) <- Seq((11L, 7, 5), (36L, 23, 17), (61L, 40, 30))) {
      val bytes = GifCodec.synthGif(id, w, h)
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      assert(img != null, "ImageIO rejected our GIF")
      assert(img.getWidth == w && img.getHeight == h)
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = img.getRGB(x, y)
        assert((rgb & 0xff) == GifCodec.synthPixel(id, x, y), s"id=$id ($x,$y)")
        assert(((rgb >> 8) & 0xff) == (rgb & 0xff), "palette not gray")
      }
    }
  }

  test("ImageIO-written files (foreign LZW phrasing) decode pixel-identically by us") {
    for ((w, h, seed) <- Seq((13, 9, 5L), (64, 48, 11L), (1, 7, 29L))) {
      val src = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
      val rnd = new scala.util.Random(seed)
      val expect = Array.tabulate(h, w)((_, _) => rnd.nextInt(256))
      for (y <- 0 until h; x <- 0 until w) src.getRaster.setSample(x, y, 0, expect(y)(x))
      val out = new ByteArrayOutputStream()
      assert(ImageIO.write(src, "gif", out), "ImageIO could not write GIF")
      val (dw, dh, ours) = GifCodec.decodeImage(out.toByteArray)
        .getOrElse(fail(s"foreign ${w}x$h GIF did not parse"))
      assert(dw == w && dh == h)
      val ref = ImageIO.read(new ByteArrayInputStream(out.toByteArray))
      for (y <- 0 until h; x <- 0 until w)
        assert(ours(y * w + x) == ((ref.getRGB(x, y) >> 16) & 0xff), s"${w}x$h ($x,$y)")
    }
  }

  test("truncated, trailerless, and non-GIF payloads are None") {
    val good = GifCodec.synthGif(7L, 8, 8)
    assert(GifCodec.parseGif(good.take(good.length / 2)).isEmpty)
    assert(GifCodec.parseGif(good.dropRight(1)).isEmpty, "missing trailer must be refused")
    assert(GifCodec.parseGif("GIF87a".getBytes("US-ASCII")).isEmpty)
    assert(GifCodec.parseGif(Array[Byte](1, 2, 3)).isEmpty)
    assert(GifCodec.parseGif(Array.empty[Byte]).isEmpty)
  }
}
