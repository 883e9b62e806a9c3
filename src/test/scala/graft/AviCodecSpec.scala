package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{AviCodec, JpegCodec}

/** Pins for the AVI/MJPEG demuxer. Frame DECODE correctness belongs to
  * JpegCodecSpec (ImageIO-conformance-pinned); what this spec owns is
  * the container walk and frame SELECTION: which chunks are frames,
  * which frames get decoded, and that unsampled frames cost nothing.
  */
class AviCodecSpec extends AnyFunSuite {

  private def frameSum(seed: Long, wb: Int): Long =
    JpegCodec.parseJpeg(JpegCodec.synthJpeg(seed, wb, 1)).get.sumPx

  test("demux + sampling: every-Nth frames decoded, sums match per-frame decode") {
    for (id <- Seq(0L, 17L, 42L, 167L); frames <- Seq(3, 4, 6); wb <- Seq(1, 2)) {
      val bytes = AviCodec.synthAvi(id, wb, 1, frames)
      for (n <- Seq(1, 2, 3)) {
        val info = AviCodec.parseAvi(bytes, n)
          .getOrElse(fail(s"synthAvi($id,$wb,1,$frames) everyNth=$n did not parse"))
        assert(info.width == wb * 8 && info.height == 8 && info.nFrames == frames)
        val sampled = (0 until frames).filter(_ % n == 0)
        assert(info.nSampled == sampled.size)
        assert(info.sumPx == sampled.map(f => frameSum(id * 7 + f, wb)).sum,
          s"id=$id frames=$frames n=$n — wrong frames selected")
      }
    }
  }

  test("sampling every 2nd is cheaper than decoding all (distinct sums prove selection)") {
    val bytes = AviCodec.synthAvi(9L, 2, 1, 5)
    val all = AviCodec.parseAvi(bytes, 1).get
    val half = AviCodec.parseAvi(bytes, 2).get
    assert(all.nSampled == 5 && half.nSampled == 3)
    assert(all.sumPx != half.sumPx, "distinct frames must yield distinct sums")
  }

  test("structural corruption is None: truncation, frame-count lie, broken frame") {
    val good = AviCodec.synthAvi(7L, 1, 1, 4)
    assert(AviCodec.parseAvi(good.take(good.length / 2), 2).isEmpty)
    assert(AviCodec.parseAvi("RIFFxxxxAVI ".getBytes("US-ASCII"), 2).isEmpty)
    assert(AviCodec.parseAvi(Array.empty[Byte], 2).isEmpty)
    // avih totalFrames lives at byte 48: declare one frame too many
    val lie = good.clone()
    lie(48) = (lie(48) + 1).toByte
    assert(AviCodec.parseAvi(lie, 2).isEmpty, "header/stream frame-count mismatch must refuse")
    // corrupt a byte inside the first frame's entropy stream
    val moviAt = {
      var i = 0
      while (!(good(i) == 'm' && good(i + 1) == 'o' && good(i + 2) == 'v' &&
        good(i + 3) == 'i')) i += 1
      i
    }
    val broken = good.clone()
    broken(moviAt + 12) = 0x00 // clobber the first frame's SOI marker
    assert(AviCodec.parseAvi(broken, 2).isEmpty, "undecodable sampled frame must refuse")
  }

  test("RLE8 delta video: canvas state persists across frames, sums match closed form") {
    import graft.multimodal.RleVideoCodec
    val id = 34L // nFrames = 3 + 34%4 = 5 → 4 delta frames
    val i = RleVideoCodec.parseRleAvi(RleVideoCodec.synthRleAvi(id)).get
    val nF = RleVideoCodec.nFrames(id)
    assert(i.nFrames == nF)
    val v0 = RleVideoCodec.v0(id).toLong
    val deltas = (1 until nF).map(f => 4L * RleVideoCodec.vf(id, f))
    assert(i.finalPxSum == v0 * (128 - 4 * (nF - 1)) + deltas.sum,
      "final canvas must carry keyframe + every delta")
    assert(i.sumAfterF1 == v0 * 124 + deltas.head,
      "mid-stream sum proves per-frame state, not per-frame reset")
    assert(i.nPxDelta == 4L * (nF - 1))
    // a canvas that reset per frame would make the two sums equal only
    // if every delta painted the same total — pin they differ here
    assert(i.finalPxSum != i.sumAfterF1)
    // truncating away the EOS of the last frame must refuse, not hang
    val good = RleVideoCodec.synthRleAvi(id)
    assert(RleVideoCodec.parseRleAvi(good.dropRight(3)).isEmpty)
    // a chunk size near Int.MaxValue must not overflow the bounds check
    // into a negative walk (r13 review): None, never a throw
    val evil = java.nio.ByteBuffer.allocate(32)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    evil.put("RIFF".getBytes); evil.putInt(24); evil.put("AVI ".getBytes)
    evil.put("00dc".getBytes); evil.putInt(0x7FFFFFF8)
    assert(RleVideoCodec.parseRleAvi(evil.array()).isEmpty)
  }
}
