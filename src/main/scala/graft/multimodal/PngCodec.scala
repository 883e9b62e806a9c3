package graft.multimodal

/** Pure-JVM PNG codec (8-bit grayscale, non-interlaced) — the
  * DICTIONARY/LZ codec class beside [[JpegCodec]]'s transform class:
  * PNG is zlib DEFLATE (RFC 1950/1951, via the JVM's built-in
  * `java.util.zip` inflater — no external library) under a per-row
  * predictive filter layer the decoder must INVERT byte-by-byte.
  *
  * Decoder ([[parsePng]]): signature check, chunk walk with CRC-32
  * verification on every chunk, IHDR validation (8-bit grayscale,
  * deflate, filter method 0, non-interlaced only — anything else is
  * None: undecodable payloads are data), multi-IDAT concatenation (the
  * spec allows the compressed stream to be split arbitrarily), one
  * exact-length inflate, then per-scanline filter reconstruction —
  * None(0), Sub(1), Up(2), Average(3), Paeth(4) — over the decoded
  * bytes. Unlike JPEG's approximate IDCT, PNG is BIT-EXACT by spec, so
  * PngCodecSpec pins pixel-identity (not ±tolerance) against the JDK's
  * independent ImageIO codec in both interop directions.
  *
  * Encoder ([[synthPng]]): writes real PNG files from the closed-form
  * pixel function [[synthPixel]], cycling the row filter type through
  * all five (y mod 5) so every gate payload with h ≥ 5 exercises every
  * reconstruction path, optionally splitting the compressed stream
  * across two IDAT chunks. Because filtering is lossless, the decoded
  * pixels equal [[synthPixel]] exactly — which is what lets the mm13
  * oracle restate the decode as pure arithmetic over (id, x, y) while
  * the engine runs the full inflate + defilter machinery.
  */
object PngCodec {

  case class PngInfo(width: Int, height: Int, nPx: Long, sumPx: Long)

  private val Signature: Array[Int] = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  /** Closed-form pixel value for seed `id` at (x, y) — full 0..255
    * range so the filter deltas wrap mod 256 in every row.
    */
  private[graft] def synthPixel(id: Long, x: Int, y: Int): Int =
    ((id * 31 + y.toLong * 17 + x.toLong * 7) % 256).toInt

  // ------------------------------------------------------------ decoder

  /** Decode an 8-bit grayscale non-interlaced PNG. None on any other
    * color type / bit depth / interlace, a CRC mismatch, a truncated
    * stream, or an inflate length mismatch. Streams a pixel sum —
    * O(two scanlines) state.
    */
  def parsePng(bytes: Array[Byte]): Option[PngInfo] = {
    var sum = 0L
    walk(bytes)((_, _) => v => sum += v)
      .map { case (w, h) => PngInfo(w, h, w.toLong * h, sum) }
  }

  /** Full pixel decode (row-major w×h, values 0–255) — the spec's
    * conformance surface against ImageIO.
    */
  private[graft] def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    val px = Array.newBuilder[Int]
    walk(bytes)((_, _) => v => px += v).map { case (w, h) => (w, h, px.result()) }
  }

  /** One chunk walk + inflate + defilter; `mkSink(w, h)` is invoked
    * once after IHDR and receives every pixel in row-major order.
    */
  private def walk(bytes: Array[Byte])(mkSink: (Int, Int) => Int => Unit): Option[(Int, Int)] = {
    if (bytes.length < 8 + 25) return None
    var i = 0
    while (i < 8) { if ((bytes(i) & 0xff) != Signature(i)) return None; i += 1 }
    def u32(p: Int): Long =
      ((bytes(p) & 0xffL) << 24) | ((bytes(p + 1) & 0xffL) << 16) |
        ((bytes(p + 2) & 0xffL) << 8) | (bytes(p + 3) & 0xffL)

    var pos = 8
    var w = 0
    var h = 0
    var seenIhdr = false
    var seenIend = false
    val idat = new java.io.ByteArrayOutputStream()
    while (!seenIend) {
      if (pos + 12 > bytes.length) return None // length + type + CRC minimum
      val len = u32(pos)
      if (len > Int.MaxValue - 12 || pos + 12 + len > bytes.length) return None
      val n = len.toInt
      val ctype = new String(bytes, pos + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val crc = new java.util.zip.CRC32()
      crc.update(bytes, pos + 4, 4 + n)
      if (crc.getValue != u32(pos + 8 + n)) return None
      val seg = pos + 8
      ctype match {
        case "IHDR" =>
          if (seenIhdr || n != 13) return None
          val ww = u32(seg)
          val hh = u32(seg + 4)
          if (ww <= 0 || hh <= 0 || ww > (1 << 24) || hh > (1 << 24)) return None
          // Raw-buffer cap computed in Long BEFORE the Int allocation at
          // the inflate step: a corrupt-but-CRC-valid IHDR (e.g.
          // 65535×40000) would overflow h*(1+w) to a negative Int size and
          // throw instead of returning None (mirrors GifCodec's pixel cap).
          if (hh * (1L + ww) > (1L << 26)) return None
          // 8-bit grayscale, deflate, filter method 0, non-interlaced only
          if ((bytes(seg + 8) & 0xff) != 8 || (bytes(seg + 9) & 0xff) != 0 ||
            (bytes(seg + 10) & 0xff) != 0 || (bytes(seg + 11) & 0xff) != 0 ||
            (bytes(seg + 12) & 0xff) != 0) return None
          w = ww.toInt; h = hh.toInt
          seenIhdr = true
        case "IDAT" =>
          if (!seenIhdr) return None
          idat.write(bytes, seg, n)
        case "IEND" =>
          if (!seenIhdr || n != 0) return None
          seenIend = true
        case _ =>
          if (!seenIhdr) return None // ancillary chunks only after IHDR
      }
      pos = seg + n + 4
    }

    // exact-length inflate: h scanlines of (1 filter byte + w samples)
    val raw = new Array[Byte](h * (1 + w))
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    try {
      var off = 0
      while (off < raw.length && !inf.finished()) {
        val k = try inf.inflate(raw, off, raw.length - off)
        catch { case _: java.util.zip.DataFormatException => return None }
        if (k == 0 && inf.needsInput()) return None // truncated stream
        off += k
      }
      if (off != raw.length) return None
      // drain: a longer-than-expected stream is structurally invalid
      if (!inf.finished() && inf.inflate(new Array[Byte](1)) != 0) return None
    } finally inf.end()

    val sink = mkSink(w, h)
    val prior = new Array[Int](w) // reconstructed previous scanline
    val cur = new Array[Int](w)
    var y = 0
    while (y < h) {
      val rowAt = y * (1 + w)
      val filter = raw(rowAt) & 0xff
      var x = 0
      while (x < w) {
        val f = raw(rowAt + 1 + x) & 0xff
        val a = if (x > 0) cur(x - 1) else 0 // left (bpp = 1)
        val b = prior(x) // up
        val c = if (x > 0) prior(x - 1) else 0 // up-left
        val v = filter match {
          case 0 => f
          case 1 => (f + a) & 0xff
          case 2 => (f + b) & 0xff
          case 3 => (f + ((a + b) >> 1)) & 0xff
          case 4 => (f + paeth(a, b, c)) & 0xff
          case _ => return None
        }
        cur(x) = v
        sink(v)
        x += 1
      }
      System.arraycopy(cur, 0, prior, 0, w)
      y += 1
    }
    Some((w, h))
  }

  /** Paeth predictor (PNG spec §9.4): the neighbor closest to
    * a + b − c, ties broken a, then b, then c.
    */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a)
    val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  // ------------------------------------------------------------ encoder

  /** Synthesize an 8-bit grayscale PNG of `w`×`h` [[synthPixel]]
    * pixels. Row y is written under filter type y mod 5, so any image
    * with h ≥ 5 exercises all five reconstruction paths; `splitIdat`
    * halves the compressed stream across two IDAT chunks (the legal
    * arbitrary split the decoder must concatenate).
    */
  def synthPng(id: Long, w: Int, h: Int, splitIdat: Boolean = false): Array[Byte] = {
    require(w > 0 && h > 0, s"degenerate geometry ${w}x$h")
    val raw = new Array[Byte](h * (1 + w))
    for (y <- 0 until h) {
      val filter = y % 5
      raw(y * (1 + w)) = filter.toByte
      for (x <- 0 until w) {
        val v = synthPixel(id, x, y)
        val a = if (x > 0) synthPixel(id, x - 1, y) else 0
        val b = if (y > 0) synthPixel(id, x, y - 1) else 0
        val c = if (x > 0 && y > 0) synthPixel(id, x - 1, y - 1) else 0
        val f = filter match {
          case 0 => v
          case 1 => v - a
          case 2 => v - b
          case 3 => v - ((a + b) >> 1)
          case 4 => v - paeth(a, b, c)
        }
        raw(y * (1 + w) + 1 + x) = (f & 0xff).toByte
      }
    }
    val def_ = new java.util.zip.Deflater()
    def_.setInput(raw)
    def_.finish()
    val zout = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!def_.finished()) zout.write(buf, 0, def_.deflate(buf))
    def_.end()
    val z = zout.toByteArray

    val out = new java.io.ByteArrayOutputStream()
    Signature.foreach(out.write)
    def chunk(ctype: String, data: Array[Byte]): Unit = {
      def u32(v: Long): Unit = {
        out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
        out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
      }
      u32(data.length.toLong)
      val tb = ctype.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      out.write(tb, 0, 4)
      out.write(data, 0, data.length)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      u32(crc.getValue)
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(w).putInt(h).put(8.toByte).put(0.toByte) // grayscale
      .put(0.toByte).put(0.toByte).put(0.toByte)
    chunk("IHDR", ihdr.array())
    if (splitIdat && z.length >= 2) {
      chunk("IDAT", z.take(z.length / 2))
      chunk("IDAT", z.drop(z.length / 2))
    } else chunk("IDAT", z)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }
}
