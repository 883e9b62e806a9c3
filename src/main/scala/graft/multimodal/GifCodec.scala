package graft.multimodal

/** Pure-JVM GIF codec (8-bit grayscale palette; 87a/89a, interlace
  * supported as the row-order permutation it is) —
  * the VARIABLE-CODE-WIDTH LZW codec class, the third compression
  * family beside [[JpegCodec]]'s transform coding and [[PngCodec]]'s
  * zlib (LZ77 + Huffman): GIF's LZW builds its dictionary on the fly
  * in BOTH encoder and decoder, widens the code size as the dictionary
  * grows (9 → 12 bits), resets on CLEAR codes, and packs codes
  * LSB-FIRST (the opposite bit order of JPEG's entropy stream) inside
  * length-prefixed sub-blocks.
  *
  * Decoder ([[parseGif]]): header + logical-screen walk, global
  * grayscale palette, image descriptor (no local table — that is
  * None), interlace row-permutation, sub-block reassembly, and a full LZW
  * decode: dictionary rebuild from the root codes, the KwKwK corner
  * (a code referencing the entry being defined), code-width growth at
  * dictionary size 2^width, CLEAR resets, EOI. Pixels are palette
  * red-channel values (r = g = b by construction). PngCodecSpec-style
  * conformance: GifCodecSpec pins pixel identity against the JDK's
  * independent ImageIO GIF codec in BOTH interop directions (palette
  * indexing is lossless, so identity is exact).
  *
  * Encoder ([[synthGif]]): a REAL LZW compressor (hash-map dictionary,
  * emits multi-pixel phrases, widens codes, restarts on table-full
  * via CLEAR) writing the closed-form [[synthPixel]] image — so the
  * mm14 oracle restates the decode as pure arithmetic over (id, x, y)
  * while the engine runs genuine dictionary decompression.
  */
object GifCodec {

  case class GifInfo(width: Int, height: Int, nPx: Long, sumPx: Long)

  /** Closed-form pixel value for seed `id` at (x, y) — distinct
    * mixing constants from the PNG/BMP functions so a copy-paste
    * cross-wiring of media tables fails its oracle.
    */
  private[graft] def synthPixel(id: Long, x: Int, y: Int): Int =
    ((id * 29 + y.toLong * 13 + x.toLong * 11) % 256).toInt

  // ------------------------------------------------------------ decoder

  def parseGif(bytes: Array[Byte]): Option[GifInfo] = {
    var sum = 0L
    walk(bytes)(v => sum += v)
      .map { case (w, h) => GifInfo(w, h, w.toLong * h, sum) }
  }

  private[graft] def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    val px = Array.newBuilder[Int]
    walk(bytes)(v => px += v).map { case (w, h) => (w, h, px.result()) }
  }

  private def walk(bytes: Array[Byte])(sink: Int => Unit): Option[(Int, Int)] = {
    if (bytes.length < 14) return None
    def u8(i: Int) = bytes(i) & 0xff
    def u16(i: Int) = u8(i) | (u8(i + 1) << 8) // little-endian
    val sig = new String(bytes, 0, 6, java.nio.charset.StandardCharsets.US_ASCII)
    if (sig != "GIF87a" && sig != "GIF89a") return None
    val packed = u8(10)
    if ((packed & 0x80) == 0) return None // need a global color table
    val gctSize = 2 << (packed & 7)
    var pos = 13
    if (pos + 3 * gctSize > bytes.length) return None
    val palette = Array.tabulate(gctSize)(i => u8(pos + 3 * i)) // red channel
    pos += 3 * gctSize

    // skip 89a extension blocks; find the image descriptor
    while (pos < bytes.length && u8(pos) == 0x21) {
      pos += 2 // extension introducer + label
      while (pos < bytes.length && u8(pos) != 0) pos += 1 + u8(pos)
      pos += 1
    }
    if (pos >= bytes.length || u8(pos) != 0x2c) return None
    if (pos + 10 > bytes.length) return None
    val w = u16(pos + 5)
    val h = u16(pos + 7)
    val ipacked = u8(pos + 9)
    if (w <= 0 || h <= 0 || w.toLong * h > (1L << 26)) return None
    if ((ipacked & 0x80) != 0) return None // local color table unsupported
    // interlace (bit 6) is a pure ROW-ORDER permutation: decode order
    // visits rows 0,8,16… then 4,12… then 2,6… then 1,3,5… — ImageIO's
    // GIF writer interlaces by default, so the foreign-file direction
    // needs it
    val interlaced = (ipacked & 0x40) != 0
    val rowOrder: Array[Int] =
      if (!interlaced) Array.range(0, h)
      else (Seq(0 -> 8, 4 -> 8, 2 -> 4, 1 -> 2)
        .flatMap { case (start, step) => start until h by step }).toArray
    pos += 10

    if (pos >= bytes.length) return None
    val minCode = u8(pos)
    pos += 1
    if (minCode < 2 || minCode > 8) return None
    // reassemble the sub-blocks into one code stream
    val data = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done) {
      if (pos >= bytes.length) return None
      val n = u8(pos)
      pos += 1
      if (n == 0) done = true
      else {
        if (pos + n > bytes.length) return None
        data.write(bytes, pos, n)
        pos += n
      }
    }
    if (pos >= bytes.length || u8(pos) != 0x3b) return None // trailer

    // LZW decode, LSB-first bit order
    val stream = data.toByteArray
    val clear = 1 << minCode
    val eoi = clear + 1
    var codeSize = minCode + 1
    // dictionary: prefix link + final byte per code (4096 max)
    val prefix = new Array[Int](4096)
    val suffix = new Array[Int](4096)
    var next = eoi + 1
    var bitPos = 0
    var prev = -1
    var emitted = 0L
    val total = w.toLong * h
    val buf = new Array[Int](4096)
    val image = new Array[Int](w * h) // decode-order → raster via rowOrder

    def readCode(): Int = {
      if (bitPos + codeSize > stream.length * 8) return -1
      var v = 0
      var i = 0
      while (i < codeSize) {
        val b = bitPos + i
        if ((stream(b >> 3) & (1 << (b & 7))) != 0) v |= 1 << i
        i += 1
      }
      bitPos += codeSize
      v
    }

    def place(v: Int): Unit = {
      val i = emitted.toInt
      image(rowOrder(i / w) * w + i % w) = v
      emitted += 1
    }

    def emit(code: Int): Boolean = { // expand a code; false on corruption
      var c = code
      var n = 0
      while (c >= clear) { // dictionary entries only (roots are < clear)
        if (n >= buf.length || c >= next) return false
        buf(n) = suffix(c); n += 1
        c = prefix(c)
      }
      if (c >= gctSize) return false
      if (emitted + n + 1 > total) return false
      place(palette(c))
      var i = n - 1
      while (i >= 0) { place(palette(buf(i))); i -= 1 }
      true
    }

    def firstByte(code: Int): Int = {
      var c = code
      while (c >= clear) c = prefix(c)
      c
    }

    var running = true
    while (running) {
      val code = readCode()
      if (code < 0) return None
      if (code == clear) {
        next = eoi + 1
        codeSize = minCode + 1
        prev = -1
      } else if (code == eoi) {
        running = false
      } else if (prev < 0) {
        if (code >= clear) return None // first code after clear must be a root
        if (!emit(code)) return None
        prev = code
      } else {
        if (code > next) return None
        val defined = code < next
        // new entry: prev + first byte of (code if defined else prev) — KwKwK
        if (next < 4096) {
          prefix(next) = prev
          suffix(next) = firstByte(if (defined) code else prev)
          next += 1
          if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
        } else if (!defined) return None // KwKwK needs a free slot
        if (!emit(if (defined) code else next - 1)) return None
        prev = code
      }
    }
    if (emitted != total) return None
    var i = 0
    while (i < image.length) { sink(image(i)); i += 1 }
    Some((w, h))
  }

  // ------------------------------------------------------------ encoder

  /** Synthesize a GIF87a of `w`×`h` [[synthPixel]] pixels through a
    * real LZW compression pass (fresh dictionary per CLEAR, code-width
    * growth, table-full restart).
    */
  def synthGif(id: Long, w: Int, h: Int): Array[Byte] =
    synthGifWith(w, h, (x, y) => synthPixel(id, x, y))

  /** Arbitrary-pixel-function variant — lets the spec force decoder
    * corners the synth function never hits (a constant image drives
    * the KwKwK code-equals-next case on the second phrase).
    */
  private[graft] def synthGifWith(w: Int, h: Int, f: (Int, Int) => Int): Array[Byte] = {
    require(w > 0 && h > 0 && w < 65536 && h < 65536, s"degenerate geometry ${w}x$h")
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF87a".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    u16(w); u16(h)
    out.write(0x80 | 0x07) // global table, 256 entries
    out.write(0); out.write(0)
    for (i <- 0 until 256) { out.write(i); out.write(i); out.write(i) } // gray palette
    out.write(0x2c); u16(0); u16(0); u16(w); u16(h); out.write(0) // image descriptor
    val minCode = 8
    out.write(minCode)

    // LZW compress, LSB-first. Code WIDTH follows a SHADOW of the
    // decoder's state, not the encoder's own dictionary counter: the
    // decoder defines each entry one code LATER than the encoder (it
    // learns the entry only from the following code), so the width at
    // which code k is emitted must reflect the definitions triggered by
    // codes 1..k−1 only. putCode emits at the shadow width, THEN
    // advances the shadow exactly as the decoder will.
    val codes = new java.io.ByteArrayOutputStream()
    var acc = 0L
    var nbits = 0
    val clear = 1 << minCode
    val eoi = clear + 1
    var dCodeSize = minCode + 1 // decoder-shadow width
    var dNext = eoi + 1 // decoder-shadow next free entry
    var firstAfterClear = true
    def putCode(code: Int): Unit = {
      acc |= code.toLong << nbits
      nbits += dCodeSize
      while (nbits >= 8) { codes.write((acc & 0xff).toInt); acc >>= 8; nbits -= 8 }
      if (code == clear) {
        dCodeSize = minCode + 1; dNext = eoi + 1; firstAfterClear = true
      } else if (code != eoi) {
        if (firstAfterClear) firstAfterClear = false
        else if (dNext < 4096) {
          dNext += 1
          if (dNext == (1 << dCodeSize) && dCodeSize < 12) dCodeSize += 1
        }
      }
    }
    var dict = scala.collection.mutable.HashMap.empty[(Int, Int), Int] // (prefixCode, byte)
    var next = eoi + 1
    putCode(clear)
    var prev = -1
    for (y <- 0 until h; x <- 0 until w) {
      val px = f(x, y) & 0xff
      if (prev < 0) prev = px
      else dict.get((prev, px)) match {
        case Some(code) => prev = code
        case None =>
          putCode(prev)
          if (next < 4096) {
            dict((prev, px)) = next
            next += 1
          } else {
            putCode(clear) // table full: reset both sides
            dict = scala.collection.mutable.HashMap.empty
            next = eoi + 1
          }
          prev = px
      }
    }
    if (prev >= 0) putCode(prev)
    putCode(eoi)
    if (nbits > 0) codes.write((acc & 0xff).toInt)

    val stream = codes.toByteArray
    var off = 0
    while (off < stream.length) {
      val n = math.min(255, stream.length - off)
      out.write(n)
      out.write(stream, off, n)
      off += n
    }
    out.write(0) // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }
}
