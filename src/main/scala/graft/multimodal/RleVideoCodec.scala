package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Microsoft RLE8 VIDEO (biCompression = BI_RLE8 inside an AVI `vids`
  * stream) — the INTER-FRAME member of the codec family: unlike MJPEG
  * (mm15, every frame self-contained), an MS-RLE stream has a keyframe
  * followed by DELTA frames that paint only the pixels that changed,
  * and a decoder MUST carry the canvas from frame to frame — drop one
  * frame and every later frame is wrong. This is the smallest real
  * temporal-prediction codec (reference spec: the Windows BMP/AVI RLE8
  * escapes; cf. reference repo's opaque-binary posture,
  * `dags/yougile_etl_dag.py:48` treats attachments as bytes), so it
  * closes the "inter-frame video" seam with a genuine implementation:
  * the full RLE8 instruction set is honored — encoded runs, ABSOLUTE
  * literal mode (word-aligned), EOL (0,0), EOS (0,1) and DELTA-move
  * (0,2,dx,dy), with every write bounds-checked so corrupt input
  * returns None instead of throwing (CodecFuzzSpec discipline).
  *
  * The synthetic stream (writer inverse, same container walk AviCodec
  * uses) exercises every instruction: the keyframe paints the 16×8
  * canvas with encoded runs row by row — except row 3, written in
  * ABSOLUTE mode — and each delta frame DELTA-moves the cursor to a
  * fixed non-overlapping offset and paints one 4-px run. Closed-form
  * pixel sums per frame let the DuckDB oracle state the decode result
  * without simulating the state machine.
  */
object RleVideoCodec {

  val W = 16
  val H = 8

  final case class RleVideoInfo(
      nFrames: Int,
      finalPxSum: Long,
      sumAfterF1: Long,
      nPxDelta: Long)

  private def fourCC(s: String): Int = {
    require(s.length == 4)
    (s(0) & 0xff) | ((s(1) & 0xff) << 8) | ((s(2) & 0xff) << 16) | ((s(3) & 0xff) << 24)
  }

  // ------------------------------------------------------------ decode

  /** Demux the AVI, then run the persistent-canvas RLE8 machine over
    * every `00dc` chunk in order. None on any structural violation.
    */
  def parseRleAvi(bytes: Array[Byte]): Option[RleVideoInfo] = {
    val frames = demux(bytes).getOrElse(return None)
    if (frames.isEmpty) return None
    val canvas = new Array[Int](W * H) // persists ACROSS frames
    var sumAfterF1 = -1L
    var painted = 0L
    var f = 0
    while (f < frames.length) {
      val changed = applyFrame(canvas, frames(f)).getOrElse(return None)
      if (f > 0) painted += changed
      if (f == 1) sumAfterF1 = canvas.map(_.toLong).sum
      f += 1
    }
    Some(RleVideoInfo(frames.length, canvas.map(_.toLong).sum, sumAfterF1, painted))
  }

  /** One frame through the RLE8 instruction set; returns pixels written
    * or None on a malformed stream / out-of-canvas write.
    */
  private def applyFrame(canvas: Array[Int], data: Array[Byte]): Option[Long] = {
    var p = 0
    var x = 0
    var y = 0
    var written = 0L
    def put(v: Int): Boolean = {
      if (x >= W || y >= H) return false
      canvas(y * W + x) = v
      x += 1
      written += 1
      true
    }
    while (p + 1 < data.length) {
      val n = data(p) & 0xff
      val v = data(p + 1) & 0xff
      p += 2
      if (n > 0) { // encoded run
        var i = 0
        while (i < n) { if (!put(v)) return None; i += 1 }
      } else v match {
        case 0 => x = 0; y += 1 // EOL
        case 1 => return Some(written) // EOS
        case 2 => // DELTA move
          if (p + 1 >= data.length) return None
          x += data(p) & 0xff
          y += data(p + 1) & 0xff
          p += 2
        case abs => // ABSOLUTE: `abs` literal pixels, word-aligned
          if (p + abs > data.length) return None
          var i = 0
          while (i < abs) { if (!put(data(p + i) & 0xff)) return None; i += 1 }
          p += abs + (abs & 1)
      }
    }
    None // ran off the end without EOS
  }

  /** Minimal RIFF/AVI walk collecting `00dc` frame chunks in stream
    * order (word-aligned, AviCodec's convention).
    */
  private def demux(bytes: Array[Byte]): Option[Seq[Array[Byte]]] = {
    if (bytes.length < 12) return None
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    if (b.getInt(0) != fourCC("RIFF") || b.getInt(8) != fourCC("AVI ")) return None
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    def walk(from: Int, to: Int): Boolean = {
      var p = from
      while (p + 8 <= to) {
        val id = b.getInt(p)
        val size = b.getInt(p + 4)
        // Long math: a crafted size near Int.MaxValue overflows the Int
        // sum, slips past the bound and walks p negative (r13 review) —
        // corrupt input must be None, never a throw
        if (size < 0 || p.toLong + 8 + size > to) return false
        if (id == fourCC("LIST")) {
          if (size >= 4 && !walk(p + 12, p + 8 + size)) return false
        } else if (id == fourCC("00dc")) {
          out += java.util.Arrays.copyOfRange(bytes, p + 8, p + 8 + size)
        }
        p += 8 + size + (size & 1)
      }
      true
    }
    if (!walk(12, bytes.length)) None else Some(out.toSeq)
  }

  // ------------------------------------------------------------- synth

  /** Per-id parameters shared with the oracle's closed form. */
  def v0(id: Long): Int = ((id * 31) % 200).toInt
  def vf(id: Long, f: Int): Int = (((id * 31) + f * 7) % 200).toInt
  def nFrames(id: Long): Int = (3 + id % 4).toInt

  /** The synthetic stream: keyframe + (nFrames−1) delta frames. Delta
    * frame f paints 4 px at offset (f−1)·8 — non-overlapping for every
    * f ≤ 5, so the final canvas sum is closed-form.
    */
  def synthRleAvi(id: Long): Array[Byte] = {
    val frames = (0 until nFrames(id)).map { f =>
      if (f == 0) keyframe(v0(id)) else deltaFrame((f - 1) * 8, vf(id, f))
    }
    container(frames)
  }

  private def keyframe(v: Int): Array[Byte] = {
    val o = scala.collection.mutable.ArrayBuffer.empty[Byte]
    for (r <- 0 until H) {
      if (r == 3) { // ABSOLUTE mode for one row: same value, mode proven
        o += 0; o += W.toByte
        for (_ <- 0 until W) o += v.toByte // W is even: no pad byte
      } else {
        o += W.toByte; o += v.toByte // encoded run
      }
      o += 0; o += 0 // EOL
    }
    o += 0; o += 1 // EOS
    o.toArray
  }

  private def deltaFrame(offset: Int, v: Int): Array[Byte] = {
    val o = scala.collection.mutable.ArrayBuffer.empty[Byte]
    o += 0; o += 2 // DELTA move from (0,0)
    o += (offset % W).toByte
    o += (offset / W).toByte
    o += 4; o += v.toByte // one 4-px run
    o += 0; o += 1 // EOS
    o.toArray
  }

  /** RIFF/AVI wrapper: hdrl(avih) + movi with one `00dc` per frame. */
  private def container(frames: Seq[Array[Byte]]): Array[Byte] = {
    val hdrlSize = 4 + 8 + 56 // 'hdrl' + avih chunk
    val moviSize = 4 + frames.map(f => 8L + f.length + (f.length & 1)).sum
    val riffSize = 4 + 8 + hdrlSize + 8 + moviSize
    val buf = ByteBuffer.allocate((8 + riffSize).toInt).order(ByteOrder.LITTLE_ENDIAN)
    def tag(s: String): Unit = { buf.putInt(fourCC(s)); () }
    tag("RIFF"); buf.putInt(riffSize.toInt); tag("AVI ")
    tag("LIST"); buf.putInt(hdrlSize); tag("hdrl")
    tag("avih"); buf.putInt(56)
    buf.putInt(40000) // usec per frame
    buf.putInt(0); buf.putInt(0); buf.putInt(0)
    buf.putInt(frames.length) // dwTotalFrames
    buf.putInt(0); buf.putInt(1)
    buf.putInt(0)
    buf.putInt(W); buf.putInt(H)
    buf.putInt(0); buf.putInt(0); buf.putInt(0); buf.putInt(0)
    tag("LIST"); buf.putInt(moviSize.toInt); tag("movi")
    frames.foreach { f =>
      tag("00dc"); buf.putInt(f.length)
      buf.put(f)
      if ((f.length & 1) == 1) buf.put(0.toByte)
    }
    buf.array()
  }
}
