package graft.multimodal

/** Pure-JVM BASELINE SEQUENTIAL JPEG codec (grayscale) — the
  * transform/entropy codec the seam doc claimed needed a native
  * library: it does not. Baseline JPEG is Huffman entropy coding +
  * dequantization + an 8×8 inverse DCT, all integer-expressible.
  *
  * Decoder ([[parseJpeg]]): full marker walk (APPn/COM skip, DQT with
  * 8- or 16-bit tables, SOF0, DHT with canonical Annex-C code
  * construction, DRI/RSTn restart handling, SOS), entropy decode with
  * 0xFF00 byte-stuffing removal and standard EXTEND sign decoding,
  * differential DC prediction, dequantize + de-zigzag, and a
  * fixed-point inverse DCT: pixel = clamp(128 + (Σ coeff·B + 2¹⁹) ≫ 20)
  * with B the 64×64 integer basis round(2²⁰·c(u)c(v)/4·cosᵤₓ·cosᵥᵧ).
  * The JPEG standard specifies IDCT ACCURACY, not bit-exactness
  * (ISO/IEC 10918-1 Annex A; conformance in 10918-2), so any decoder's
  * rounding differs slightly from any other's — JpegCodecSpec pins this
  * one within ±2 of the JDK's ImageIO (libjpeg-derived) decode in both
  * interop directions. [[parseJpeg]] is the single-component
  * (grayscale) path and handles BOTH frame types: SOF0 baseline and
  * SOF2 PROGRESSIVE (spectral selection + successive approximation,
  * all four scan types incl. AC refinement with EOB runs —
  * [[walkProgressive]]). [[parseJpegColor]]/[[walkColor]] decode
  * 3-component baseline YCbCr (4:2:0 and 4:4:4) with MCU-interleaved
  * scans, per-component DC prediction, box chroma upsampling and
  * libjpeg's exact fixed-point color convert. 12-bit precision,
  * arithmetic coding, progressive color and other samplings return
  * None (undecodable payloads are data).
  *
  * Encoder ([[synthJpeg]]): writes real baseline files — DQT, SOF0,
  * DHT (custom but fully canonical tables the decoder must build from
  * the file, like any real decoder), SOS, entropy-coded data with byte
  * stuffing — from CLOSED-FORM quantized coefficients, so the mm12
  * oracle replays dequantize→IDCT→clamp→sum arithmetically in SQL from
  * the same literal basis/zigzag/quant tables. ImageIO decodes these
  * files (spec-pinned), proving they are standard JPEG, not a private
  * format.
  */
object JpegCodec {

  case class JpegInfo(width: Int, height: Int, nPx: Long, sumPx: Long)

  /** Natural-order index of each zigzag position (the standard JPEG
    * zigzag sequence).
    */
  private[graft] val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Fixed-point 2-D IDCT basis: B((v·8+u)·64 + (y·8+x)) =
    * round(2²⁰ · c(u)c(v)/4 · cos((2x+1)uπ/16) · cos((2y+1)vπ/16)),
    * c(0)=1/√2, c(k)=1. One rounding step per pixel keeps the decoder
    * SQL-restatable with pure integer arithmetic.
    */
  private[graft] val IdctBasis: Array[Long] = {
    val b = new Array[Long](4096)
    for (v <- 0 until 8; u <- 0 until 8; y <- 0 until 8; x <- 0 until 8) {
      val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
      val cv = if (v == 0) 1.0 / math.sqrt(2.0) else 1.0
      val w = cu * cv / 4.0 *
        math.cos((2 * x + 1) * u * math.Pi / 16.0) *
        math.cos((2 * y + 1) * v * math.Pi / 16.0)
      b((v * 8 + u) * 64 + y * 8 + x) = math.round(w * (1L << 20)).toLong
    }
    b
  }

  /** The synth quant table, ZIGZAG order: q(k) = 8 + (7k mod 17). */
  private[graft] def synthQuant(k: Int): Int = 8 + (7 * k) % 17

  /** Closed-form QUANTIZED coefficient of block `b` at zigzag slot `k`
    * for seed `id`: DC swings blocks 0/1 to the clamp rails (the gate
    * must exercise saturation), ACs live at slots 1, 2 and 5 (zero
    * sometimes — run-length paths execute).
    */
  private[graft] def synthCoeff(id: Long, b: Int, k: Int): Int = k match {
    case 0 => if (b == 0) 120 else if (b == 1) -120 else (((id * 7 + b * 3) % 61) - 30).toInt
    case 1 => (((id * 5 + b) % 7) - 3).toInt
    case 2 => (((id * 3 + 2 * b) % 5) - 2).toInt
    case 5 => (((id + b) % 3) - 1).toInt
    case _ => 0
  }

  // ------------------------------------------------------------ decoder

  /** Canonical Huffman table: decode one symbol by accumulating bits
    * against per-length first-code/first-index (Annex C/F construction).
    */
  private final class Huff(bits: Array[Int], vals: Array[Int]) {
    // mincode(l), maxcode(l) (exclusive), valptr(l) for code length l+1
    val minc = new Array[Int](16)
    val maxc = new Array[Int](16)
    val vptr = new Array[Int](16)
    locally {
      var code = 0
      var p = 0
      var l = 0
      while (l < 16) {
        minc(l) = code; vptr(l) = p
        code += bits(l); p += bits(l)
        maxc(l) = code
        code <<= 1
        l += 1
      }
    }
    def value(i: Int): Int = vals(i)
  }

  /** MSB-first bit reader over the entropy-coded segment with 0xFF00
    * unstuffing; RSTn markers are consumed only via [[restart]].
    */
  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    var broken = false // structural error (marker mid-stream, overrun)

    private def fill(): Unit = {
      if (pos >= bytes.length) { broken = true; return }
      val b = bytes(pos) & 0xff
      if (b == 0xff) {
        if (pos + 1 >= bytes.length) { broken = true; return }
        val m = bytes(pos + 1) & 0xff
        if (m == 0x00) { pos += 2; acc = (acc << 8) | 0xff; nbits += 8 }
        else { broken = true } // marker: scan data ended unexpectedly
      } else { pos += 1; acc = (acc << 8) | b; nbits += 8 }
    }

    def bit(): Int = {
      if (nbits == 0) fill()
      if (broken) return 0
      nbits -= 1
      (acc >>> nbits) & 1
    }

    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }

    def decode(h: Huff): Int = {
      var code = 0
      var l = 0
      while (l < 16) {
        code = (code << 1) | bit()
        if (broken) return -1
        if (code < h.maxc(l)) return h.value(h.vptr(l) + code - h.minc(l))
        l += 1
      }
      broken = true; -1
    }

    /** Byte-align and consume an expected RSTn marker. */
    def restart(): Boolean = {
      acc = 0; nbits = 0
      if (pos + 2 > bytes.length) return false
      if ((bytes(pos) & 0xff) != 0xff) return false
      val m = bytes(pos + 1) & 0xff
      if (m < 0xd0 || m > 0xd7) return false
      pos += 2
      true
    }
  }

  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  /** First SOFn marker of the stream (the frame TYPE decides the
    * decode path), or −1 on anything structurally off before a frame
    * header. DHT (0xc4), JPG (0xc8) and DAC (0xcc) share the 0xCn
    * range but are not frame markers.
    */
  private def sofMarker(bytes: Array[Byte]): Int = {
    if (bytes.length < 4) return -1
    def u8(i: Int) = bytes(i) & 0xff
    def u16(i: Int) = (u8(i) << 8) | u8(i + 1)
    if (u16(0) != 0xffd8) return -1
    var pos = 2
    while (pos + 4 <= bytes.length) {
      if (u8(pos) != 0xff) return -1
      val m = u8(pos + 1)
      if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7)) pos += 2
      else if (m == 0xd9 || m == 0xda) return -1 // SOS/EOI before any SOF
      else {
        if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) return m
        val len = u16(pos + 2)
        if (len < 2 || pos + 2 + len > bytes.length) return -1
        pos += 2 + len
      }
    }
    -1
  }

  /** Decode a GRAYSCALE JPEG — baseline sequential (SOF0) or
    * progressive (SOF2, spectral selection + successive approximation).
    * None on anything the decoder does not cover (color via this
    * entry point, 12-bit, arithmetic coding) or any structural
    * mismatch. The baseline gate path streams a sum (O(1) state beyond
    * one 8×8 block); progressive decode holds the full coefficient
    * plane by the format's nature (every scan revisits every block).
    */
  def parseJpeg(bytes: Array[Byte]): Option[JpegInfo] = {
    var sum = 0L
    dispatch(bytes)((_, _) => (_, _, v) => sum += v)
      .map { case (w, h) => JpegInfo(w, h, w.toLong * h, sum) }
  }

  /** Route on the frame marker: SOF0 → [[walk]], SOF2 →
    * [[walkProgressive]]. Dispatching BEFORE decode (not try-and-
    * fall-back) keeps the sink single-shot: a sink never sees pixels
    * from an abandoned walk.
    */
  private def dispatch(bytes: Array[Byte])(
      mkSink: (Int, Int) => (Int, Int, Int) => Unit): Option[(Int, Int)] =
    sofMarker(bytes) match {
      case 0xc0 => walk(bytes)(mkSink)
      case 0xc2 => walkProgressive(bytes)(mkSink)
      case _ => None
    }

  /** Position-weighted pixel signature Σ (y·w + x + 1)·v — the frame
    * fingerprint for video near-dup (mm17). The plain pixel sum
    * concentrates (the synth fixture's DC term dominates), so distinct
    * frames collide on it routinely; weighting by image position keeps
    * the signature order-independent (restatable as SQL aggregation)
    * while making cross-content collisions vanishingly unlikely.
    */
  def parseJpegSig(bytes: Array[Byte]): Option[(Int, Int, Long)] = {
    var sig = 0L
    var ww = 0
    dispatch(bytes) { (w, _) =>
      ww = w
      (x, y, v) => sig += (y.toLong * ww + x + 1) * v
    }.map { case (w, h) => (w, h, sig) }
  }

  /** Full pixel decode (row-major w×h, values 0–255) — the spec's
    * conformance surface against ImageIO.
    */
  private[graft] def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    var px: Array[Int] = null
    var ww = 0
    dispatch(bytes) { (w, h) =>
      px = new Array[Int](w * h); ww = w
      (x, y, v) => px(y * ww + x) = v
    }.map { case (w, h) => (w, h, px) }
  }

  /** One full marker+entropy walk; `mkSink(w, h)` is invoked once after
    * SOF0 and receives every in-image pixel as (x, y, value).
    */
  private def walk(bytes: Array[Byte])(
      mkSink: (Int, Int) => (Int, Int, Int) => Unit): Option[(Int, Int)] = {
    if (bytes.length < 4) return None
    def u8(i: Int) = bytes(i) & 0xff
    def u16(i: Int) = (u8(i) << 8) | u8(i + 1)
    if (u16(0) != 0xffd8) return None
    var pos = 2
    val quant = Array.fill(4)(null: Array[Int]) // natural order
    val dcTab = Array.fill(4)(null: Huff)
    val acTab = Array.fill(4)(null: Huff)
    var w = 0
    var h = 0
    var qSel = -1
    var restartInterval = 0
    var dcSel = -1
    var acSel = -1
    var scanAt = -1

    while (scanAt < 0) {
      if (pos + 4 > bytes.length) return None
      if (u8(pos) != 0xff) return None
      val marker = u8(pos + 1)
      if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) { pos += 2 }
      else {
        val len = u16(pos + 2)
        if (len < 2 || pos + 2 + len > bytes.length) return None
        val seg = pos + 4
        val end = pos + 2 + len
        marker match {
          case 0xdb => // DQT: possibly several tables per segment
            var p = seg
            while (p < end) {
              val pq = u8(p) >> 4
              val tq = u8(p) & 15
              if (tq > 3 || pq > 1) return None
              val n = if (pq == 0) 64 else 128
              if (p + 1 + n > end) return None
              val t = new Array[Int](64)
              var k = 0
              while (k < 64) {
                t(Zigzag(k)) = if (pq == 0) u8(p + 1 + k) else u16(p + 1 + 2 * k)
                k += 1
              }
              quant(tq) = t
              p += 1 + n
            }
          case 0xc4 => // DHT: possibly several tables per segment
            var p = seg
            while (p < end) {
              val tc = u8(p) >> 4
              val th = u8(p) & 15
              if (tc > 1 || th > 3 || p + 17 > end) return None
              val bits17 = Array.tabulate(16)(i => u8(p + 1 + i))
              val n = bits17.sum
              if (n == 0 || n > 256 || p + 17 + n > end) return None
              val vals = Array.tabulate(n)(i => u8(p + 17 + i))
              val huff = new Huff(bits17, vals)
              if (tc == 0) dcTab(th) = huff else acTab(th) = huff
              p += 17 + n
            }
          case 0xc0 => // SOF0 baseline
            // single-component SOF0: len is exactly 11 (9 payload bytes +
            // the 2-byte length field, the SOS comment's convention); a
            // smaller len would let the fixed-offset reads below run past
            // `end` (and, at EOF, past the array) instead of returning None
            if (len < 11) return None
            if (u8(seg) != 8) return None // 8-bit precision only
            h = u16(seg + 1); w = u16(seg + 3)
            if (u8(seg + 5) != 1) return None // GRAYSCALE only
            if (u8(seg + 7) != 0x11) return None // 1x1 sampling
            qSel = u8(seg + 8)
            if (qSel > 3) return None // table ids are 0..3
            if (w <= 0 || h <= 0) return None
          case 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 |
               0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
            return None // non-baseline / arithmetic frames
          case 0xdd =>
            if (len != 4) return None
            restartInterval = u16(seg)
          case 0xda => // SOS
            if (len < 8) return None // 1-component SOS payload is 6 bytes
            if (u8(seg) != 1) return None
            dcSel = u8(seg + 2) >> 4
            acSel = u8(seg + 2) & 15
            if (dcSel > 3 || acSel > 3) return None // table ids are 0..3
            scanAt = end
          case 0xd9 => return None // EOI before any scan
          case _ => () // APPn, COM, others: skip
        }
        pos = end
      }
    }

    if (w == 0 || qSel < 0 || quant(qSel) == null ||
      dcTab(dcSel) == null || acTab(acSel) == null) return None
    val q = quant(qSel)
    val dc = dcTab(dcSel)
    val ac = acTab(acSel)
    val sink = mkSink(w, h)
    val wb = (w + 7) / 8
    val hb = (h + 7) / 8
    val r = new BitReader(bytes, scanAt)
    val deq = new Array[Long](64)
    var pred = 0
    var blk = 0
    val nBlocks = wb * hb
    while (blk < nBlocks) {
      if (restartInterval > 0 && blk > 0 && blk % restartInterval == 0) {
        if (!r.restart()) return None
        pred = 0
      }
      java.util.Arrays.fill(deq, 0L)
      val t = r.decode(dc)
      if (r.broken || t < 0 || t > 15) return None
      pred += extend(r.bits(t), t)
      deq(0) = pred.toLong * q(0)
      var k = 1
      var open = true
      while (open && k < 64) {
        val rs = r.decode(ac)
        if (r.broken || rs < 0) return None
        val run = rs >> 4
        val size = rs & 15
        if (size == 0) {
          if (run == 15) k += 16 // ZRL
          else open = false // EOB
        } else {
          k += run
          if (k > 63) return None
          val n = Zigzag(k)
          deq(n) = extend(r.bits(size), size).toLong * q(n)
          k += 1
        }
      }
      if (r.broken) return None
      // fixed-point IDCT + level shift + clamp, clipped to the image
      val bx = (blk % wb) * 8
      val by = (blk / wb) * 8
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          if (bx + x < w && by + y < h) {
            var acc = 0L
            var n = 0
            while (n < 64) {
              val c = deq(n)
              if (c != 0L) acc += c * IdctBasis((n << 6) | (y * 8 + x))
              n += 1
            }
            val px = 128L + ((acc + (1L << 19)) >> 20)
            sink(bx + x, by + y, math.max(0L, math.min(255L, px)).toInt)
          }
          x += 1
        }
        y += 1
      }
      blk += 1
    }
    Some((w, h))
  }

  // ------------------------------------------------- progressive decoder

  /** PROGRESSIVE (SOF2) grayscale decode — spectral selection +
    * successive approximation per ITU T.81 §G.2. The coefficient plane
    * persists across scans (zigzag order, one Int[64] per block);
    * each SOS is one of the four scan types:
    *
    *   - DC first  (Ss=Se=0, Ah=0): differential DC, values << Al;
    *   - DC refine (Ah>0): one raw bit per block, OR'd into bit Al;
    *   - AC first  (Ss>0, Ah=0): run/size decode over the band with
    *     EOB-RUN codes (EOBn = symbol n<<4: 2ⁿ + n-extra-bits blocks
    *     end here), values << Al;
    *   - AC refine (Ss>0, Ah>0): newly-significant coefficients arrive
    *     as run/1 symbols (sign bit → ±2^Al, the run counting only
    *     ZERO-history positions), while every already-nonzero
    *     coefficient crossed en route consumes one correction bit that
    *     moves it one bit of magnitude toward its true value; EOB runs
    *     carry correction bits for the blocks they cover.
    *
    * Single component, 8-bit, no restart markers in progressive scope
    * (the synth writer never emits DRI; a DRI segment refuses).
    * Undecodable payloads are data: any structural mismatch → None.
    */
  private def walkProgressive(bytes: Array[Byte])(
      mkSink: (Int, Int) => (Int, Int, Int) => Unit): Option[(Int, Int)] = {
    if (bytes.length < 4) return None
    def u8(i: Int) = bytes(i) & 0xff
    def u16(i: Int) = (u8(i) << 8) | u8(i + 1)
    if (u16(0) != 0xffd8) return None
    var pos = 2
    val quant = Array.fill(4)(null: Array[Int]) // natural order
    val dcTab = Array.fill(4)(null: Huff)
    val acTab = Array.fill(4)(null: Huff)
    var w = 0
    var h = 0
    var qSel = -1
    var coefs: Array[Array[Int]] = null // per block, ZIGZAG order
    var nBlocks = 0
    var sawEoi = false

    while (!sawEoi) {
      if (pos + 2 > bytes.length) return None
      if (u8(pos) != 0xff) return None
      val marker = u8(pos + 1)
      if (marker == 0xd8) { pos += 2 }
      else if (marker == 0xd9) { sawEoi = true; pos += 2 }
      else if (marker >= 0xd0 && marker <= 0xd7) return None // RST outside a scan
      else {
        if (pos + 4 > bytes.length) return None
        val len = u16(pos + 2)
        if (len < 2 || pos + 2 + len > bytes.length) return None
        val seg = pos + 4
        val end = pos + 2 + len
        marker match {
          case 0xdb =>
            var p = seg
            while (p < end) {
              val pq = u8(p) >> 4
              val tq = u8(p) & 15
              if (tq > 3 || pq > 1) return None
              val n = if (pq == 0) 64 else 128
              if (p + 1 + n > end) return None
              val t = new Array[Int](64)
              var k = 0
              while (k < 64) {
                t(Zigzag(k)) = if (pq == 0) u8(p + 1 + k) else u16(p + 1 + 2 * k)
                k += 1
              }
              quant(tq) = t
              p += 1 + n
            }
          case 0xc4 =>
            var p = seg
            while (p < end) {
              val tc = u8(p) >> 4
              val th = u8(p) & 15
              if (tc > 1 || th > 3 || p + 17 > end) return None
              val bits17 = Array.tabulate(16)(i => u8(p + 1 + i))
              val n = bits17.sum
              if (n == 0 || n > 256 || p + 17 + n > end) return None
              val vals = Array.tabulate(n)(i => u8(p + 17 + i))
              val huff = new Huff(bits17, vals)
              if (tc == 0) dcTab(th) = huff else acTab(th) = huff
              p += 17 + n
            }
          case 0xc2 =>
            if (coefs != null) return None // one frame per stream
            if (len < 11) return None // 9 payload bytes + 2 length bytes
            if (u8(seg) != 8) return None // 8-bit precision only
            h = u16(seg + 1); w = u16(seg + 3)
            if (u8(seg + 5) != 1) return None // GRAYSCALE only
            if (u8(seg + 7) != 0x11) return None // 1x1 sampling
            qSel = u8(seg + 8)
            if (qSel > 3) return None
            if (w <= 0 || h <= 0) return None
            nBlocks = ((w + 7) / 8) * ((h + 7) / 8)
            coefs = Array.fill(nBlocks)(new Array[Int](64))
          case 0xc0 | 0xc1 | 0xc3 | 0xc5 | 0xc6 | 0xc7 |
               0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
            return None // this walk is SOF2-only
          case 0xdd => return None // restarts out of progressive scope
          case 0xda =>
            if (coefs == null) return None // SOS before SOF2
            if (len < 8 || u8(seg) != 1) return None
            val dcSel = u8(seg + 2) >> 4
            val acSel = u8(seg + 2) & 15
            if (dcSel > 3 || acSel > 3) return None
            val ss = u8(seg + 3)
            val se = u8(seg + 4)
            val ah = u8(seg + 5) >> 4
            val al = u8(seg + 5) & 15
            val r = new BitReader(bytes, end)
            if (!decodeProgressiveScan(r, coefs, nBlocks, ss, se, ah, al,
                dcTab(dcSel), acTab(acSel))) return None
            pos = r.pos
            // fall through to the shared `pos = end` below would rewind
            // into the entropy data — skip it by continuing directly
            if (pos >= bytes.length || u8(pos) != 0xff) return None // scans end at a marker
            // loop continues from the marker after the entropy data
          case _ => () // APPn, COM: skip
        }
        if (marker != 0xda) pos = end
      }
    }

    if (coefs == null || qSel < 0 || quant(qSel) == null) return None
    val q = quant(qSel)
    val sink = mkSink(w, h)
    val wb = (w + 7) / 8
    val deq = new Array[Long](64)
    var blk = 0
    while (blk < nBlocks) {
      var k = 0
      while (k < 64) { // dequantize + de-zigzag
        val n = Zigzag(k)
        deq(n) = coefs(blk)(k).toLong * q(n)
        k += 1
      }
      val bx = (blk % wb) * 8
      val by = (blk / wb) * 8
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          if (bx + x < w && by + y < h) {
            var acc = 0L
            var n = 0
            while (n < 64) {
              val c = deq(n)
              if (c != 0L) acc += c * IdctBasis((n << 6) | (y * 8 + x))
              n += 1
            }
            val px = 128L + ((acc + (1L << 19)) >> 20)
            sink(bx + x, by + y, math.max(0L, math.min(255L, px)).toInt)
          }
          x += 1
        }
        y += 1
      }
      blk += 1
    }
    Some((w, h))
  }

  /** One progressive scan's entropy decode over every block (single
    * component → non-interleaved, blocks in raster order). Returns
    * false on any structural mismatch. `coefs` is in ZIGZAG order.
    */
  private def decodeProgressiveScan(r: BitReader, coefs: Array[Array[Int]],
      nBlocks: Int, ss: Int, se: Int, ah: Int, al: Int,
      dc: Huff, ac: Huff): Boolean = {
    if (al > 13) return false // point transforms beyond coef range
    if (ss == 0) {
      if (se != 0) return false // DC scans never carry a band
      if (ah == 0) { // DC first
        if (dc == null) return false
        var pred = 0
        var b = 0
        while (b < nBlocks) {
          val t = r.decode(dc)
          if (r.broken || t < 0 || t > 15) return false
          pred += extend(r.bits(t), t)
          coefs(b)(0) = pred << al
          b += 1
        }
      } else { // DC refine: one raw bit per block
        var b = 0
        while (b < nBlocks) {
          coefs(b)(0) |= r.bit() << al
          b += 1
        }
      }
      !r.broken
    } else { // AC scans
      if (se > 63 || ss > se || ac == null) return false
      if (ah == 0) { // AC first
        var eobrun = 0
        var b = 0
        while (b < nBlocks) {
          val c = coefs(b)
          if (eobrun > 0) eobrun -= 1
          else {
            var k = ss
            var open = true
            while (open && k <= se) {
              val rs = r.decode(ac)
              if (r.broken || rs < 0) return false
              val run = rs >> 4
              val s = rs & 15
              if (s == 0) {
                if (run == 15) k += 16 // ZRL
                else {
                  eobrun = (1 << run) - 1 // this block ends here;
                  if (run > 0) eobrun += r.bits(run) // the rest skip whole blocks
                  open = false
                }
              } else {
                k += run
                if (k > se) return false
                c(k) = extend(r.bits(s), s) << al
                k += 1
              }
            }
          }
          if (r.broken) return false
          b += 1
        }
        true
      } else { // AC refine (T.81 G.1.2.3)
        val p1 = 1 << al
        val m1 = -1 << al
        // one correction bit moves an already-nonzero coefficient one
        // bit of magnitude toward its true value; bit 0 = no change
        def correct(c: Array[Int], k: Int): Unit =
          if (r.bit() == 1 && (c(k) & p1) == 0) {
            if (c(k) >= 0) c(k) += p1 else c(k) += m1
          }
        var eobrun = 0
        var b = 0
        while (b < nBlocks) {
          val c = coefs(b)
          var k = ss
          if (eobrun == 0) {
            var ended = false
            while (!ended && k <= se) {
              val rs = r.decode(ac)
              if (r.broken || rs < 0) return false
              var run = rs >> 4
              val s = rs & 15
              var ins = 0
              if (s == 0) {
                if (run < 15) { // EOBn: correction bits then block ends
                  eobrun = 1 << run
                  if (run > 0) eobrun += r.bits(run)
                  ended = true
                }
                // run == 15 (ZRL): skip 16 zero-HISTORY positions below
              } else {
                if (s != 1) return false // new coefficients are ±2^Al
                ins = if (r.bit() == 1) p1 else m1
              }
              if (!ended) {
                // advance: already-nonzero coefficients consume
                // correction bits and do NOT count against `run`; the
                // (run+1)-th zero-history position receives `ins`
                var placed = false
                while (!placed && k <= se) {
                  if (c(k) != 0) correct(c, k)
                  else if (run == 0) {
                    if (ins != 0) c(k) = ins
                    placed = true
                  } else run -= 1
                  k += 1
                }
                if (!placed && ins != 0) return false // band overrun
                if (r.broken) return false
              }
            }
          }
          if (eobrun > 0) {
            // inside an EOB run: remaining nonzero-history coefficients
            // of this block still take correction bits
            while (k <= se) {
              if (c(k) != 0) correct(c, k)
              k += 1
            }
            eobrun -= 1
          }
          if (r.broken) return false
          b += 1
        }
        true
      }
    }
  }

  // ------------------------------------------------------- color decoder

  case class JpegColorInfo(
      width: Int, height: Int, nPx: Long, sumR: Long, sumG: Long, sumB: Long)

  /** Decode a baseline sequential 3-component YCbCr JPEG (interleaved
    * single scan; 4:2:0 — Y 2×2, chroma 1×1 — or 4:4:4). The gate path
    * streams channel sums with O(MCU) state: a 4:2:0 MCU is a
    * SELF-CONTAINED 16×16 region (4 Y blocks + 1 Cb + 1 Cr), so chroma
    * upsample + color convert happen per MCU — no frame buffer, the
    * same O(1)-beyond-a-block posture as the grayscale path.
    */
  def parseJpegColor(bytes: Array[Byte]): Option[JpegColorInfo] = {
    var sr = 0L
    var sg = 0L
    var sb = 0L
    walkColor(bytes)((_, _) => (_, _, r, g, b) => { sr += r; sg += g; sb += b })
      .map { case (w, h) => JpegColorInfo(w, h, w.toLong * h, sr, sg, sb) }
  }

  /** Full RGB decode (row-major w×h, 0xRRGGBB) — the conformance
    * surface against ImageIO.
    */
  private[graft] def decodeColorImage(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    var px: Array[Int] = null
    var ww = 0
    walkColor(bytes) { (w, h) =>
      px = new Array[Int](w * h); ww = w
      (x, y, r, g, b) => px(y * ww + x) = (r << 16) | (g << 8) | b
    }.map { case (w, h) => (w, h, px) }
  }

  private def clamp8(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  /** Entropy-decode one 8×8 block (DC diff + AC runs), dequantize by
    * `q` (natural order), fixed-point IDCT, level-shift and clamp into
    * `out` (row-major 0–255, NO image clipping — callers clip).
    * Returns the new DC predictor, or Int.MinValue on a broken stream.
    * `deq` is caller-owned scratch (one allocation per scan, not per
    * block).
    */
  private def entropyBlock(r: BitReader, dc: Huff, ac: Huff, q: Array[Int],
      pred0: Int, deq: Array[Long], out: Array[Int]): Int = {
    java.util.Arrays.fill(deq, 0L)
    val t = r.decode(dc)
    if (r.broken || t < 0 || t > 15) return Int.MinValue
    val pred = pred0 + extend(r.bits(t), t)
    deq(0) = pred.toLong * q(0)
    var k = 1
    var open = true
    while (open && k < 64) {
      val rs = r.decode(ac)
      if (r.broken || rs < 0) return Int.MinValue
      val run = rs >> 4
      val size = rs & 15
      if (size == 0) {
        if (run == 15) k += 16 // ZRL
        else open = false // EOB
      } else {
        k += run
        if (k > 63) return Int.MinValue
        val n = Zigzag(k)
        deq(n) = extend(r.bits(size), size).toLong * q(n)
        k += 1
      }
    }
    if (r.broken) return Int.MinValue
    var pi = 0
    while (pi < 64) {
      var acc = 0L
      var n = 0
      while (n < 64) {
        val c = deq(n)
        if (c != 0L) acc += c * IdctBasis((n << 6) | pi)
        n += 1
      }
      out(pi) = clamp8((128L + ((acc + (1L << 19)) >> 20)).toInt)
      pi += 1
    }
    pred
  }

  /** Marker walk + MCU-interleaved scan for 3-component baseline YCbCr;
    * `mkSink(w, h)` receives every in-image pixel as (x, y, r, g, b).
    * Chroma upsample is box replication (each chroma sample covers its
    * hs×vs luma cell); the fixed-point YCbCr→RGB is libjpeg's integer
    * arithmetic EXACTLY (FIX(1.40200)=91881, FIX(0.34414)=22554,
    * FIX(0.71414)=46802, FIX(1.77200)=116130, one +2¹⁵ rounding bias,
    * arithmetic ≫16 = floor) — so the SQL oracle restates it verbatim
    * and ImageIO conformance holds to the same tolerance class as the
    * grayscale pin. None on anything uncovered: progressive, 12-bit,
    * arithmetic coding, sampling other than 4:2:0/4:4:4, non-interleaved
    * color scans.
    */
  private def walkColor(bytes: Array[Byte])(
      mkSink: (Int, Int) => (Int, Int, Int, Int, Int) => Unit): Option[(Int, Int)] = {
    if (bytes.length < 4) return None
    def u8(i: Int) = bytes(i) & 0xff
    def u16(i: Int) = (u8(i) << 8) | u8(i + 1)
    if (u16(0) != 0xffd8) return None
    var pos = 2
    val quant = Array.fill(4)(null: Array[Int]) // natural order
    val dcTab = Array.fill(4)(null: Huff)
    val acTab = Array.fill(4)(null: Huff)
    var w = 0
    var h = 0
    var hs = 0 // luma sampling (chroma fixed 1×1)
    val compQ = new Array[Int](3)
    val compDc = new Array[Int](3)
    val compAc = new Array[Int](3)
    val compId = new Array[Int](3)
    var restartInterval = 0
    var scanAt = -1

    while (scanAt < 0) {
      if (pos + 4 > bytes.length) return None
      if (u8(pos) != 0xff) return None
      val marker = u8(pos + 1)
      if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) { pos += 2 }
      else {
        val len = u16(pos + 2)
        if (len < 2 || pos + 2 + len > bytes.length) return None
        val seg = pos + 4
        val end = pos + 2 + len
        marker match {
          case 0xdb => // DQT (several tables per segment possible)
            var p = seg
            while (p < end) {
              val pq = u8(p) >> 4
              val tq = u8(p) & 15
              if (tq > 3 || pq > 1) return None
              val n = if (pq == 0) 64 else 128
              if (p + 1 + n > end) return None
              val t = new Array[Int](64)
              var k = 0
              while (k < 64) {
                t(Zigzag(k)) = if (pq == 0) u8(p + 1 + k) else u16(p + 1 + 2 * k)
                k += 1
              }
              quant(tq) = t
              p += 1 + n
            }
          case 0xc4 => // DHT (several tables per segment possible)
            var p = seg
            while (p < end) {
              val tc = u8(p) >> 4
              val th = u8(p) & 15
              if (tc > 1 || th > 3 || p + 17 > end) return None
              val bits17 = Array.tabulate(16)(i => u8(p + 1 + i))
              val n = bits17.sum
              if (n == 0 || n > 256 || p + 17 + n > end) return None
              val vals = Array.tabulate(n)(i => u8(p + 17 + i))
              val huff = new Huff(bits17, vals)
              if (tc == 0) dcTab(th) = huff else acTab(th) = huff
              p += 17 + n
            }
          case 0xc0 => // SOF0 baseline: 3 components (len = 2 + 15)
            if (len < 17) return None
            if (u8(seg) != 8) return None // 8-bit precision only
            h = u16(seg + 1); w = u16(seg + 3)
            if (u8(seg + 5) != 3) return None // COLOR path: 3 components
            var ci = 0
            while (ci < 3) {
              val o = seg + 6 + 3 * ci
              compId(ci) = u8(o)
              val samp = u8(o + 1)
              if (ci == 0) {
                if (samp != 0x11 && samp != 0x22) return None // 4:4:4 / 4:2:0
                hs = samp >> 4
              } else if (samp != 0x11) return None // chroma must be 1×1
              compQ(ci) = u8(o + 2)
              if (compQ(ci) > 3) return None
              ci += 1
            }
            if (w <= 0 || h <= 0) return None
          case 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 |
               0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
            return None // non-baseline / arithmetic frames
          case 0xdd =>
            if (len != 4) return None
            restartInterval = u16(seg)
          case 0xda => // SOS: interleaved, all 3 components
            if (len < 12) return None // 3-component SOS payload is 10 bytes
            if (u8(seg) != 3) return None
            var ci = 0
            while (ci < 3) {
              val id = u8(seg + 1 + 2 * ci)
              // scan order must match frame order (baseline interleave)
              if (id != compId(ci)) return None
              val sel = u8(seg + 2 + 2 * ci)
              compDc(ci) = sel >> 4
              compAc(ci) = sel & 15
              if (compDc(ci) > 3 || compAc(ci) > 3) return None
              ci += 1
            }
            scanAt = end
          case 0xd9 => return None // EOI before any scan
          case _ => () // APPn, COM, others: skip
        }
        pos = end
      }
    }

    if (w == 0 || hs == 0) return None
    var ci = 0
    while (ci < 3) {
      if (quant(compQ(ci)) == null || dcTab(compDc(ci)) == null ||
        acTab(compAc(ci)) == null) return None
      ci += 1
    }
    val sink = mkSink(w, h)
    val mcuW = 8 * hs
    val mcuH = 8 * hs
    val mcusX = (w + mcuW - 1) / mcuW
    val mcusY = (h + mcuH - 1) / mcuH
    val r = new BitReader(bytes, scanAt)
    val deq = new Array[Long](64)
    val yBlocks = Array.fill(hs * hs)(new Array[Int](64))
    val cbPix = new Array[Int](64)
    val crPix = new Array[Int](64)
    val preds = new Array[Int](3)
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        if (!r.restart()) return None
        preds(0) = 0; preds(1) = 0; preds(2) = 0
      }
      var i = 0
      while (i < hs * hs) { // Y blocks, raster order within the MCU
        val p = entropyBlock(r, dcTab(compDc(0)), acTab(compAc(0)),
          quant(compQ(0)), preds(0), deq, yBlocks(i))
        if (p == Int.MinValue) return None
        preds(0) = p
        i += 1
      }
      val p1 = entropyBlock(r, dcTab(compDc(1)), acTab(compAc(1)),
        quant(compQ(1)), preds(1), deq, cbPix)
      if (p1 == Int.MinValue) return None
      preds(1) = p1
      val p2 = entropyBlock(r, dcTab(compDc(2)), acTab(compAc(2)),
        quant(compQ(2)), preds(2), deq, crPix)
      if (p2 == Int.MinValue) return None
      preds(2) = p2
      // emit the MCU's pixels (clipped to the image)
      val x0 = (mcu % mcusX) * mcuW
      val y0 = (mcu / mcusX) * mcuH
      var yy = 0
      while (yy < mcuH) {
        var xx = 0
        while (xx < mcuW) {
          if (x0 + xx < w && y0 + yy < h) {
            val yv = yBlocks((yy / 8) * hs + (xx / 8))((yy % 8) * 8 + (xx % 8))
            val cidx = (yy / hs) * 8 + (xx / hs) // box upsample
            val cb = cbPix(cidx) - 128
            val cr = crPix(cidx) - 128
            val rr = clamp8(yv + ((91881 * cr + 32768) >> 16))
            val gg = clamp8(yv + ((-22554 * cb - 46802 * cr + 32768) >> 16))
            val bb = clamp8(yv + ((116130 * cb + 32768) >> 16))
            sink(x0 + xx, y0 + yy, rr, gg, bb)
          }
          xx += 1
        }
        yy += 1
      }
      mcu += 1
    }
    Some((w, h))
  }

  // ------------------------------------------------------------ encoder

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def put(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >>> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    def flushOnes(): Unit = if (nbits > 0) put((1 << (8 - nbits)) - 1, 8 - nbits)
  }

  // encoder Huffman tables (canonical; the decoder reads them from DHT
  // like any real decoder): DC = categories 0..11, all 4-bit codes;
  // AC = EOB, ZRL and (run 0..15, size 1..4), all 7-bit codes
  private val DcBits = { val b = new Array[Int](16); b(3) = 12; b }
  private val DcVals = (0 to 11).toArray
  private val AcVals: Array[Int] =
    Array(0x00, 0xf0) ++ (for (run <- 0 to 15; size <- 1 to 4) yield (run << 4) | size)
  private val AcBits = { val b = new Array[Int](16); b(6) = AcVals.length; b }

  private def canonicalCodes(bits: Array[Int]): Array[(Int, Int)] = {
    // (code, length) per value index, Annex C
    val out = Array.newBuilder[(Int, Int)]
    var code = 0
    for (l <- 0 until 16) {
      for (_ <- 0 until bits(l)) { out += ((code, l + 1)); code += 1 }
      code <<= 1
    }
    out.result()
  }

  private def category(v: Int): Int = {
    var t = 0
    var a = math.abs(v)
    while (a != 0) { t += 1; a >>= 1 }
    t
  }

  /** Synthesize a baseline grayscale JPEG of `wb`×`hb` blocks whose
    * quantized coefficients follow [[synthCoeff]] and quant table
    * [[synthQuant]] — the writer inverse the mm12 oracle replays.
    * `restartInterval > 0` adds a DRI segment and RSTn markers every
    * that many blocks (with DC-prediction resets), exercising the
    * decoder's restart path; decoded PIXELS are identical either way,
    * so the oracle is restart-agnostic by construction.
    */
  def synthJpeg(id: Long, wb: Int, hb: Int, restartInterval: Int = 0): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def m(marker: Int): Unit = { out.write(0xff); out.write(marker) }
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    m(0xd8) // SOI
    m(0xdb); u16(2 + 1 + 64); out.write(0x00) // DQT, 8-bit, id 0
    for (k <- 0 until 64) out.write(synthQuant(k))
    m(0xc0); u16(11); out.write(8); u16(hb * 8); u16(wb * 8) // SOF0
    out.write(1); out.write(1); out.write(0x11); out.write(0)
    m(0xc4); u16(2 + 1 + 16 + DcVals.length); out.write(0x00) // DHT DC
    DcBits.foreach(out.write); DcVals.foreach(out.write)
    m(0xc4); u16(2 + 1 + 16 + AcVals.length); out.write(0x10) // DHT AC, id 0
    AcBits.foreach(out.write); AcVals.foreach(out.write)
    if (restartInterval > 0) { m(0xdd); u16(4); u16(restartInterval) } // DRI
    m(0xda); u16(8); out.write(1); out.write(1); out.write(0x00) // SOS
    out.write(0); out.write(63); out.write(0)
    val dcCode = canonicalCodes(DcBits)
    val acCode = canonicalCodes(AcBits)
    val acIndex = AcVals.zipWithIndex.toMap
    var bw = new BitWriter(out)
    def putCoded(codes: Array[(Int, Int)], i: Int): Unit = {
      val (c, l) = codes(i); bw.put(c, l)
    }
    var pred = 0
    var rst = 0
    for (b <- 0 until wb * hb) {
      if (restartInterval > 0 && b > 0 && b % restartInterval == 0) {
        bw.flushOnes()
        m(0xd0 + rst); rst = (rst + 1) % 8
        bw = new BitWriter(out)
        pred = 0
      }
      val dc = synthCoeff(id, b, 0)
      val diff = dc - pred
      pred = dc
      val t = category(diff)
      putCoded(dcCode, t)
      if (t > 0) bw.put(if (diff >= 0) diff else diff + (1 << t) - 1, t)
      var run = 0
      var lastNonzero = 0
      for (k <- 1 to 63) if (synthCoeff(id, b, k) != 0) lastNonzero = k
      for (k <- 1 to lastNonzero) {
        val v = synthCoeff(id, b, k)
        if (v == 0) run += 1
        else {
          while (run > 15) { putCoded(acCode, acIndex(0xf0)); run -= 16 }
          val s = category(v)
          putCoded(acCode, acIndex((run << 4) | s))
          bw.put(if (v >= 0) v else v + (1 << s) - 1, s)
          run = 0
        }
      }
      if (lastNonzero < 63) putCoded(acCode, acIndex(0x00)) // EOB
    }
    bw.flushOnes()
    m(0xd9) // EOI
    out.toByteArray
  }

  // -------------------------------------------------- progressive encoder

  // The progressive AC table adds the EOBn symbols (n<<4, n = 1..14)
  // the refinement/first AC scans need for multi-block EOB runs; a
  // SEPARATE table so baseline payloads (and their committed oracle
  // hashes) keep their exact canonical code assignment.
  private val AcValsP: Array[Int] = AcVals ++ (1 to 14).map(_ << 4)
  private val AcBitsP = { val b = new Array[Int](16); b(6) = AcValsP.length; b }

  /** Synthesize a PROGRESSIVE (SOF2) grayscale JPEG whose FINAL
    * coefficients equal [[synthCoeff]] — the same closed form the mm12
    * oracle replays, so one oracle serves both codings. Four scans,
    * the classic successive-approximation script, chosen so every
    * decoder branch runs:
    *
    *   1. DC first   Al=1 (differential, shifted domain);
    *   2. AC first   Ss=1..63, Al=1 — |v|≥2 coefficients appear at
    *      half magnitude; runs, ZRL and cross-block EOB runs all occur;
    *   3. DC refine  Ah=1→0 — one raw bit per block;
    *   4. AC refine  Ah=1→0 — the ±1 coefficients of [[synthCoeff]]
    *      (slots 1/2/5 take ±1 routinely) become newly significant
    *      HERE, interleaved with correction bits for the scan-2
    *      coefficients and EOB runs carrying buffered corrections —
    *      the branchiest path in the whole codec, exercised by every
    *      payload.
    *
    * The entropy coding follows T.81 §G.1.2 exactly (libjpeg's
    * encoder is the reference behavior): AC-first point transform is
    * sign·(|v|≫Al); refinement emits run/1 symbols whose run counts
    * only zero-HISTORY positions, with correction bits for crossed
    * nonzero-history coefficients appended after the next emitted
    * symbol (or after the EOBn that closes their run).
    */
  def synthJpegProgressive(id: Long, wb: Int, hb: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def m(marker: Int): Unit = { out.write(0xff); out.write(marker) }
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    m(0xd8) // SOI
    m(0xdb); u16(2 + 1 + 64); out.write(0x00) // DQT, 8-bit, id 0
    for (k <- 0 until 64) out.write(synthQuant(k))
    m(0xc2); u16(11); out.write(8); u16(hb * 8); u16(wb * 8) // SOF2
    out.write(1); out.write(1); out.write(0x11); out.write(0)
    m(0xc4); u16(2 + 1 + 16 + DcVals.length); out.write(0x00) // DHT DC
    DcBits.foreach(out.write); DcVals.foreach(out.write)
    m(0xc4); u16(2 + 1 + 16 + AcValsP.length); out.write(0x10) // DHT AC (EOBn-capable)
    AcBitsP.foreach(out.write); AcValsP.foreach(out.write)
    val dcCode = canonicalCodes(DcBits)
    val acCode = canonicalCodes(AcBitsP)
    val acIndex = AcValsP.zipWithIndex.toMap
    val nB = wb * hb
    def coeff(b: Int, k: Int): Int = synthCoeff(id, b, k)

    def sos(ss: Int, se: Int, ah: Int, al: Int): BitWriter = {
      m(0xda); u16(8); out.write(1); out.write(1); out.write(0x00)
      out.write(ss); out.write(se); out.write((ah << 4) | al)
      new BitWriter(out)
    }
    def putAc(bw: BitWriter, sym: Int): Unit = {
      val (c, l) = acCode(acIndex(sym)); bw.put(c, l)
    }

    // ---- scan 1: DC first, Al=1 (differential in the shifted domain)
    locally {
      val bw = sos(0, 0, 0, 1)
      var pred = 0
      for (b <- 0 until nB) {
        val v = coeff(b, 0) >> 1 // arithmetic: sign-preserving point transform
        val diff = v - pred
        pred = v
        val t = category(diff)
        val (c0, l0) = dcCode(t); bw.put(c0, l0)
        if (t > 0) bw.put(if (diff >= 0) diff else diff + (1 << t) - 1, t)
      }
      bw.flushOnes()
    }

    // ---- scan 2: AC first, Ss=1..63, Al=1
    locally {
      val bw = sos(1, 63, 0, 1)
      var eobrun = 0
      def emitEobrun(): Unit = if (eobrun > 0) {
        var nbits = 0
        var t = eobrun
        while ({ t >>= 1; t != 0 }) nbits += 1
        putAc(bw, nbits << 4)
        if (nbits > 0) bw.put(eobrun & ((1 << nbits) - 1), nbits)
        eobrun = 0
      }
      for (b <- 0 until nB) {
        var r = 0
        for (k <- 1 to 63) {
          val v0 = coeff(b, k)
          val av = math.abs(v0) >> 1 // AC point transform: |v| >> Al
          if (av == 0) r += 1
          else {
            emitEobrun()
            while (r > 15) { putAc(bw, 0xf0); r -= 16 }
            val s = category(av)
            putAc(bw, (r << 4) | s)
            val v = if (v0 < 0) -av else av
            bw.put(if (v >= 0) v else v + (1 << s) - 1, s)
            r = 0
          }
        }
        if (r > 0) eobrun += 1 // trailing zeros (an all-zero band is r = 63) fold into an EOB run
        if (eobrun == 0x7fff) emitEobrun() // T.81 EOBn bound (same clamp as scan 4)
      }
      emitEobrun()
      bw.flushOnes()
    }

    // ---- scan 3: DC refine, Ah=1, Al=0 — one raw bit per block
    locally {
      val bw = sos(0, 0, 1, 0)
      for (b <- 0 until nB) bw.put(coeff(b, 0) & 1, 1)
      bw.flushOnes()
    }

    // ---- scan 4: AC refine, Ss=1..63, Ah=1, Al=0
    locally {
      val bw = sos(1, 63, 1, 0)
      var eobrun = 0
      // Buffered correction bits, split libjpeg-style: the first `be`
      // belong to the blocks the PENDING EOB RUN covers (the decoder
      // consumes them right after the EOBn symbol, while crossing those
      // blocks); the rest were buffered in the CURRENT block and are
      // consumed during the advance that follows the current block's
      // next emitted symbol — flushing them with the EOBn instead
      // misaligns every later Huffman code by that many bits.
      val corr = scala.collection.mutable.ArrayBuffer.empty[Int]
      var be = 0
      def flushCurrent(): Unit = { corr.foreach(bit => bw.put(bit, 1)); corr.clear(); be = 0 }
      def emitEobrun(): Unit = if (eobrun > 0) {
        var nbits = 0
        var t = eobrun
        while ({ t >>= 1; t != 0 }) nbits += 1
        putAc(bw, nbits << 4)
        if (nbits > 0) bw.put(eobrun & ((1 << nbits) - 1), nbits)
        eobrun = 0
        var i = 0
        while (i < be) { bw.put(corr(i), 1); i += 1 } // EOB-run bits only
        corr.remove(0, be)
        be = 0
      }
      for (b <- 0 until nB) {
        val abs = Array.tabulate(64)(k => if (k == 0) 0 else math.abs(coeff(b, k)))
        var eobPos = 0 // position of the last NEWLY-significant coefficient
        for (k <- 1 to 63) if (abs(k) == 1) eobPos = k
        var r = 0
        for (k <- 1 to 63) {
          val av = abs(k)
          if (av == 0) r += 1
          else {
            // ZRLs are emitted on reaching ANY nonzero absvalue (the
            // decoder's crossing consumes the flushed corrections in
            // the same spans), but never when they can fold into the
            // block's EOB (no new coefficient remains)
            while (r > 15 && k <= eobPos) {
              emitEobrun()
              putAc(bw, 0xf0)
              r -= 16
              flushCurrent()
            }
            if (av > 1) corr += (av & 1) // history: buffer its bit; run unaffected
            else { // newly significant (|v| == 1)
              emitEobrun()
              putAc(bw, (r << 4) | 1)
              r = 0
              bw.put(if (coeff(b, k) < 0) 0 else 1, 1)
              flushCurrent()
            }
          }
        }
        if (r > 0 || corr.size > be) { // trailing zeros/corrections fold into an EOB
          eobrun += 1
          be = corr.size // this block's bits now belong to the run
        }
        if (eobrun == 0x7fff || be > 900) emitEobrun() // T.81 bounds
      }
      emitEobrun()
      bw.flushOnes()
    }

    m(0xd9) // EOI
    out.toByteArray
  }

  // ------------------------------------------------------ color encoder

  /** The synth CHROMA quant table, ZIGZAG order: qc(k) = 10 + (5k mod 13). */
  private[graft] def synthQuantC(k: Int): Int = 10 + (5 * k) % 13

  /** Closed-form QUANTIZED chroma coefficient for comp (1=Cb, 2=Cr),
    * chroma block `b`, zigzag slot `k`: DC spans ±20 (×10 quant — real
    * chroma swing) and one live AC slot exercises the run path.
    */
  private[graft] def synthChroma(id: Long, comp: Int, b: Int, k: Int): Int = k match {
    case 0 => (((id * 11 + comp * 5 + b * 7) % 41) - 20).toInt
    case 1 => (((id * 3 + comp + b) % 5) - 2).toInt
    case _ => 0
  }

  /** Per-FILE constant chroma (flat planes): any correct upsampler
    * reproduces a constant exactly, so flat-chroma payloads make the
    * ImageIO conformance pin upsampling-AGNOSTIC (libjpeg's fancy
    * triangle filter vs this decoder's box replication differ wherever
    * chroma has gradients — a rounding-convention difference, not a
    * defect; ISO 10918 does not specify the upsampling filter).
    */
  private[graft] def synthChromaFlat(id: Long, comp: Int, k: Int): Int =
    if (k == 0) {
      if (comp == 1) (((id * 13) % 31) - 15).toInt else (((id * 17) % 29) - 14).toInt
    } else 0

  /** Synthesize a baseline YCbCr COLOR JPEG: 4:2:0 (Y 2×2, chroma 1×1)
    * when `subsample`, else 4:4:4; `wm`×`hm` MCUs (image = 16wm×16hm px
    * at 4:2:0, 8wm×8hm at 4:4:4). Quant table 0 = [[synthQuant]] (luma),
    * table 1 = [[synthQuantC]] (chroma); the same canonical Huffman
    * pair serves all three components (legal — selectors are
    * per-component). Y coefficients follow [[synthCoeff]] over the
    * GLOBAL Y-block raster index (the mm12 closed form, reused), chroma
    * follow [[synthChroma]] — or [[synthChromaFlat]] when `flatChroma`.
    * `restartInterval` adds DRI + RSTn every that many MCUs with all
    * three DC predictions reset.
    */
  def synthJpegColor(id: Long, wm: Int, hm: Int, subsample: Boolean,
      restartInterval: Int = 0, flatChroma: Boolean = false): Array[Byte] = {
    val hs = if (subsample) 2 else 1
    val w = wm * 8 * hs
    val h = hm * 8 * hs
    val out = new java.io.ByteArrayOutputStream()
    def m(marker: Int): Unit = { out.write(0xff); out.write(marker) }
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    m(0xd8) // SOI
    m(0xdb); u16(2 + 1 + 64); out.write(0x00) // DQT luma, 8-bit, id 0
    for (k <- 0 until 64) out.write(synthQuant(k))
    m(0xdb); u16(2 + 1 + 64); out.write(0x01) // DQT chroma, 8-bit, id 1
    for (k <- 0 until 64) out.write(synthQuantC(k))
    m(0xc0); u16(8 + 3 * 3); out.write(8); u16(h); u16(w) // SOF0, 3 comps
    out.write(3)
    out.write(1); out.write((hs << 4) | hs); out.write(0) // Y
    out.write(2); out.write(0x11); out.write(1) //          Cb
    out.write(3); out.write(0x11); out.write(1) //          Cr
    m(0xc4); u16(2 + 1 + 16 + DcVals.length); out.write(0x00) // DHT DC
    DcBits.foreach(out.write); DcVals.foreach(out.write)
    m(0xc4); u16(2 + 1 + 16 + AcVals.length); out.write(0x10) // DHT AC
    AcBits.foreach(out.write); AcVals.foreach(out.write)
    if (restartInterval > 0) { m(0xdd); u16(4); u16(restartInterval) } // DRI
    m(0xda); u16(6 + 2 * 3); out.write(3) // SOS, interleaved
    out.write(1); out.write(0x00)
    out.write(2); out.write(0x00)
    out.write(3); out.write(0x00)
    out.write(0); out.write(63); out.write(0)
    val dcCode = canonicalCodes(DcBits)
    val acCode = canonicalCodes(AcBits)
    val acIndex = AcVals.zipWithIndex.toMap
    var bw = new BitWriter(out)
    val preds = new Array[Int](3)
    var rst = 0
    def encodeBlock(comp: Int, coeff: Int => Int): Unit = {
      val dc = coeff(0)
      val diff = dc - preds(comp)
      preds(comp) = dc
      val t = category(diff)
      val (c0, l0) = dcCode(t); bw.put(c0, l0)
      if (t > 0) bw.put(if (diff >= 0) diff else diff + (1 << t) - 1, t)
      var run = 0
      var lastNonzero = 0
      for (k <- 1 to 63) if (coeff(k) != 0) lastNonzero = k
      for (k <- 1 to lastNonzero) {
        val v = coeff(k)
        if (v == 0) run += 1
        else {
          while (run > 15) {
            val (c, l) = acCode(acIndex(0xf0)); bw.put(c, l); run -= 16
          }
          val s = category(v)
          val (c, l) = acCode(acIndex((run << 4) | s)); bw.put(c, l)
          bw.put(if (v >= 0) v else v + (1 << s) - 1, s)
          run = 0
        }
      }
      if (lastNonzero < 63) { val (c, l) = acCode(acIndex(0x00)); bw.put(c, l) } // EOB
    }
    var mcu = 0
    for (my <- 0 until hm; mx <- 0 until wm) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        bw.flushOnes()
        m(0xd0 + rst); rst = (rst + 1) % 8
        bw = new BitWriter(out)
        preds(0) = 0; preds(1) = 0; preds(2) = 0
      }
      for (v <- 0 until hs; u <- 0 until hs) { // Y raster within the MCU
        val b = (my * hs + v) * (wm * hs) + (mx * hs + u) // global Y-block index
        encodeBlock(0, k => synthCoeff(id, b, k))
      }
      val cb = my * wm + mx // chroma block index
      if (flatChroma) {
        encodeBlock(1, k => synthChromaFlat(id, 1, k))
        encodeBlock(2, k => synthChromaFlat(id, 2, k))
      } else {
        encodeBlock(1, k => synthChroma(id, 1, cb, k))
        encodeBlock(2, k => synthChroma(id, 2, cb, k))
      }
      mcu += 1
    }
    bw.flushOnes()
    m(0xd9) // EOI
    out.toByteArray
  }
}
