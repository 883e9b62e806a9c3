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

  test("progressive synth → parse equals the closed form exactly (the mm19 oracle contract)") {
    for (id <- Seq(0L, 1L, 7L, 19L, 44L, 101L); (wb, hb) <- Seq((1, 1), (3, 2), (2, 4))) {
      val bytes = JpegCodec.synthJpegProgressive(id, wb, hb)
      // the payload is genuinely SOF2: the frame marker is in the file
      assert(bytes.sliding(2).exists(p => (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc2),
        "no SOF2 marker — not a progressive file")
      val info = JpegCodec.parseJpeg(bytes)
        .getOrElse(fail(s"synthJpegProgressive($id,$wb,$hb) did not parse"))
      assert(info.width == wb * 8 && info.height == hb * 8)
      assert(info.sumPx == closedFormSum(id, wb, hb), s"id=$id wb=$wb hb=$hb")
    }
  }

  test("progressive and baseline codings decode to bit-identical pixels") {
    for (id <- 0L until 60L; (wb, hb) <- Seq((1, 1), (2, 1), (3, 2), (4, 3))) {
      val prog = JpegCodec.decodeImage(JpegCodec.synthJpegProgressive(id, wb, hb))
        .getOrElse(fail(s"progressive $id/$wb/$hb did not parse"))
      val base = JpegCodec.decodeImage(JpegCodec.synthJpeg(id, wb, hb))
        .getOrElse(fail(s"baseline $id/$wb/$hb did not parse"))
      assert(prog._3.sameElements(base._3), s"pixel mismatch id=$id wb=$wb hb=$hb")
    }
  }

  test("our progressive files decode identically under ImageIO within the accuracy band") {
    for (id <- Seq(3L, 18L, 77L); (wb, hb) <- Seq((2, 2), (3, 1))) {
      val bytes = JpegCodec.synthJpegProgressive(id, wb, hb)
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      assert(img != null, "ImageIO rejected our progressive file")
      val (w, h, ours) = JpegCodec.decodeImage(bytes).get
      assert(img.getWidth == w && img.getHeight == h)
      var maxDiff = 0
      for (y <- 0 until h; x <- 0 until w) {
        val theirs = img.getRaster.getSample(x, y, 0)
        maxDiff = math.max(maxDiff, math.abs(theirs - ours(y * w + x)))
      }
      assert(maxDiff <= 2, s"id=$id max per-pixel gap vs ImageIO = $maxDiff")
    }
  }

  test("ImageIO-written progressive files (foreign scan script, odd sizes) decode within ±2") {
    for ((w, h, seed) <- Seq((13, 9, 5L), (32, 32, 11L), (24, 17, 43L))) {
      val src = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
      val rnd = new scala.util.Random(seed)
      for (y <- 0 until h; x <- 0 until w)
        src.getRaster.setSample(x, y, 0, rnd.nextInt(256))
      val writer = ImageIO.getImageWritersByFormatName("jpg").next()
      val param = writer.getDefaultWriteParam
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
      val out = new ByteArrayOutputStream()
      val ios = ImageIO.createImageOutputStream(out)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(src, null, null), param)
      writer.dispose(); ios.close()
      val bytes = out.toByteArray
      // the JDK writer's default progressive script (multiple AC bands,
      // Ah=2→1→0 approximation) is a FOREIGN scan order for our decoder
      assert(bytes.sliding(2).exists(p => (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc2),
        "ImageIO did not write a progressive (SOF2) file")
      val (dw, dh, ours) = JpegCodec.decodeImage(bytes)
        .getOrElse(fail(s"foreign progressive ${w}x$h file did not parse"))
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

  // ------------------------------------------------------------- color

  private def clampL(v: Long): Long = math.max(0L, math.min(255L, v))

  /** The mm16 oracle arithmetic, restated independently in Scala:
    * Y from the mm12 closed form over the global Y-block raster, chroma
    * from [[JpegCodec.synthChroma]] at the box-upsampled position, then
    * libjpeg's fixed-point YCbCr→RGB (arithmetic ≫ = floor).
    */
  private def colorClosedForm(id: Long, wm: Int, hm: Int): (Long, Long, Long) = {
    val ySlots = Array(0, 1, 2, 5)
    var sr = 0L
    var sg = 0L
    var sb = 0L
    for (y <- 0 until hm * 16; x <- 0 until wm * 16) {
      val ybIdx = (y / 8) * (wm * 2) + (x / 8)
      val p = (y % 8) * 8 + (x % 8)
      var acc = 0L
      for (k <- ySlots) {
        val n = JpegCodec.Zigzag(k)
        acc += JpegCodec.synthCoeff(id, ybIdx, k).toLong * JpegCodec.synthQuant(k) *
          JpegCodec.IdctBasis((n << 6) | p)
      }
      val yv = clampL(128L + ((acc + (1L << 19)) >> 20))
      val cbB = (y / 16) * wm + (x / 16)
      val cp = ((y / 2) % 8) * 8 + ((x / 2) % 8)
      def chroma(comp: Int): Long = {
        var a = 0L
        for (k <- Array(0, 1)) {
          val n = JpegCodec.Zigzag(k)
          a += JpegCodec.synthChroma(id, comp, cbB, k).toLong * JpegCodec.synthQuantC(k) *
            JpegCodec.IdctBasis((n << 6) | cp)
        }
        clampL(128L + ((a + (1L << 19)) >> 20))
      }
      val cbd = chroma(1) - 128L
      val crd = chroma(2) - 128L
      sr += clampL(yv + ((91881L * crd + 32768L) >> 16))
      sg += clampL(yv + ((-22554L * cbd - 46802L * crd + 32768L) >> 16))
      sb += clampL(yv + ((116130L * cbd + 32768L) >> 16))
    }
    (sr, sg, sb)
  }

  test("color 4:2:0 synth → parse equals the closed form exactly (the mm16 oracle contract)") {
    for (id <- Seq(0L, 5L, 30L, 55L, 105L); (wm, hm) <- Seq((1, 1), (2, 1), (2, 2))) {
      val info = JpegCodec.parseJpegColor(
        JpegCodec.synthJpegColor(id, wm, hm, subsample = true))
        .getOrElse(fail(s"synthJpegColor($id,$wm,$hm) did not parse"))
      assert(info.width == wm * 16 && info.height == hm * 16)
      assert(info.nPx == wm.toLong * hm * 256)
      val (sr, sg, sb) = colorClosedForm(id, wm, hm)
      assert((info.sumR, info.sumG, info.sumB) == ((sr, sg, sb)), s"id=$id wm=$wm hm=$hm")
    }
  }

  test("color restart markers (MCU-level, 3 DC resets) decode to identical pixels") {
    for (id <- Seq(5L, 30L, 80L); ri <- Seq(1, 2, 3)) {
      val plain = JpegCodec.parseJpegColor(
        JpegCodec.synthJpegColor(id, 2, 2, subsample = true)).get
      val rst = JpegCodec.parseJpegColor(
        JpegCodec.synthJpegColor(id, 2, 2, subsample = true, restartInterval = ri))
        .getOrElse(fail(s"color restart variant ri=$ri did not parse"))
      assert(rst == plain, s"id=$id ri=$ri")
    }
  }

  test("our 4:4:4 color files decode identically under ImageIO within the accuracy band") {
    // 4:4:4 has NO upsampling step, so the only decoder freedoms are
    // IDCT rounding (±2 per component) and the color-convert tables we
    // share with libjpeg — the band is the grayscale one amplified by
    // the convert's chroma gains (≈ |Δy| + 1.772·|Δc|).
    for (id <- Seq(5L, 30L, 105L)) {
      val bytes = JpegCodec.synthJpegColor(id, 2, 2, subsample = false)
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      assert(img != null, "ImageIO rejected our 4:4:4 baseline color file")
      assert(img.getWidth == 16 && img.getHeight == 16)
      val (w, h, ours) = JpegCodec.decodeColorImage(bytes).get
      var maxDiff = 0
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
        val theirs = (img.getRGB(x, y) >> ((2 - c) * 8)) & 0xff
        val mine = (ours(y * w + x) >> ((2 - c) * 8)) & 0xff
        maxDiff = math.max(maxDiff, math.abs(theirs - mine))
      }
      assert(maxDiff <= 6, s"id=$id max per-channel gap vs ImageIO = $maxDiff")
    }
  }

  test("our 4:2:0 flat-chroma files decode identically under ImageIO (upsampling-agnostic)") {
    // constant chroma planes: libjpeg's fancy (triangle) upsampler and
    // our box replication provably agree on a constant, so the pin
    // isolates the subsampled MCU walk + convert from filter choice
    for (id <- Seq(5L, 30L, 105L)) {
      val bytes = JpegCodec.synthJpegColor(id, 2, 2, subsample = true, flatChroma = true)
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      assert(img != null, "ImageIO rejected our 4:2:0 baseline color file")
      assert(img.getWidth == 32 && img.getHeight == 32)
      val (w, h, ours) = JpegCodec.decodeColorImage(bytes).get
      var maxDiff = 0
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
        val theirs = (img.getRGB(x, y) >> ((2 - c) * 8)) & 0xff
        val mine = (ours(y * w + x) >> ((2 - c) * 8)) & 0xff
        maxDiff = math.max(maxDiff, math.abs(theirs - mine))
      }
      assert(maxDiff <= 6, s"id=$id max per-channel gap vs ImageIO = $maxDiff")
    }
  }

  test("ImageIO-written color files (foreign tables, JFIF, 4:2:0) decode within the band") {
    // piecewise-constant 16×16 color cells aligned to the MCU grid:
    // chroma is constant within every upsampling neighborhood except
    // the cell seams, so fancy-vs-box differences are confined there —
    // compare away from the seams, where any correct decoder agrees
    for (seed <- Seq(1L, 9L)) {
      val w = 48
      val h = 32
      val src = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val rnd = new scala.util.Random(seed)
      val cells = Array.fill((h / 16) * (w / 16))(rnd.nextInt(0xffffff))
      for (y <- 0 until h; x <- 0 until w)
        src.setRGB(x, y, cells((y / 16) * (w / 16) + x / 16))
      val out = new ByteArrayOutputStream()
      assert(ImageIO.write(src, "jpg", out), "ImageIO could not write color JPEG")
      val bytes = out.toByteArray
      val (dw, dh, ours) = JpegCodec.decodeColorImage(bytes)
        .getOrElse(fail("foreign ImageIO color file did not parse"))
      assert(dw == w && dh == h)
      val ref = ImageIO.read(new ByteArrayInputStream(bytes))
      var maxDiff = 0
      for (y <- 0 until h; x <- 0 until w
           if (x % 16) >= 2 && (x % 16) < 14 && (y % 16) >= 2 && (y % 16) < 14;
           c <- 0 until 3) {
        val theirs = (ref.getRGB(x, y) >> ((2 - c) * 8)) & 0xff
        val mine = (ours(y * dw + x) >> ((2 - c) * 8)) & 0xff
        maxDiff = math.max(maxDiff, math.abs(theirs - mine))
      }
      assert(maxDiff <= 6, s"seed=$seed max interior gap vs ImageIO = $maxDiff")
    }
  }

  test("color path refuses grayscale, truncated, and junk payloads (None)") {
    assert(JpegCodec.parseJpegColor(JpegCodec.synthJpeg(7L, 2, 2)).isEmpty,
      "1-component file must be refused by the color path")
    val good = JpegCodec.synthJpegColor(7L, 2, 2, subsample = true)
    assert(JpegCodec.parseJpegColor(good.take(good.length / 2)).isEmpty)
    assert(JpegCodec.parseJpegColor(Array[Byte](1, 2, 3)).isEmpty)
    assert(JpegCodec.parseJpegColor(Array.empty[Byte]).isEmpty)
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
