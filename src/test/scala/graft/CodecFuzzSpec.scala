package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{AviCodec, GifCodec, JpegCodec, PngCodec, RawCodec}

/** Deterministic corruption fuzz across every pure-JVM codec: parse on
  * hostile bytes must return None (or a value), NEVER throw — on the
  * cluster a thrown decode kills the task and, after retries, the
  * whole job; the multimodal contract is "undecodable media is data".
  * Three mutation classes per codec, all from a seeded xorshift so
  * failures reproduce: single-byte flips (header/structure damage),
  * truncations (partial fetches), and random suffixes on valid
  * prefixes (container length lies).
  */
class CodecFuzzSpec extends AnyFunSuite {

  private final class XorShift(var s: Long) {
    def next(): Long = { s ^= s << 13; s ^= s >>> 7; s ^= s << 17; s }
    def nextInt(n: Int): Int = (((next() >>> 1) % n).toInt)
  }

  private def fuzz(name: String, valid: Array[Byte], parse: Array[Byte] => Any): Unit = {
    val rnd = new XorShift(0x9e3779b97f4a7c15L ^ name.hashCode.toLong)
    for (i <- 0 until 300) {
      val mutated = valid.clone()
      val kind = i % 3
      try {
        kind match {
          case 0 => // byte flips (1..4 of them)
            for (_ <- 0 to rnd.nextInt(4))
              mutated(rnd.nextInt(mutated.length)) =
                (mutated(rnd.nextInt(mutated.length)) ^ (1 + rnd.nextInt(255))).toByte
            parse(mutated)
          case 1 => // truncation
            parse(mutated.take(rnd.nextInt(mutated.length)))
          case 2 => // valid prefix + junk suffix
            val cut = rnd.nextInt(mutated.length)
            val junk = Array.fill(1 + rnd.nextInt(64))(rnd.next().toByte)
            parse(mutated.take(cut) ++ junk)
        }
      } catch {
        case e: Throwable =>
          fail(s"$name threw ${e.getClass.getSimpleName} on mutation $i (kind $kind): " +
            s"${e.getMessage}")
      }
    }
  }

  test("JPEG decoder never throws on corrupt bytes") {
    fuzz("jpeg", JpegCodec.synthJpeg(17L, 3, 2, restartInterval = 2), JpegCodec.parseJpeg)
  }

  test("progressive JPEG decoder never throws on corrupt bytes") {
    fuzz("jpeg-progressive", JpegCodec.synthJpegProgressive(17L, 3, 2), JpegCodec.parseJpeg)
  }

  test("color JPEG decoder never throws on corrupt bytes") {
    fuzz("jpeg_color",
      JpegCodec.synthJpegColor(17L, 2, 2, subsample = true, restartInterval = 2),
      JpegCodec.parseJpegColor)
    fuzz("jpeg_444",
      JpegCodec.synthJpegColor(17L, 2, 2, subsample = false),
      JpegCodec.parseJpegColor)
  }

  test("PNG decoder never throws on corrupt bytes") {
    fuzz("png", PngCodec.synthPng(17L, 12, 9, splitIdat = true), PngCodec.parsePng)
  }

  test("GIF decoder never throws on corrupt bytes") {
    fuzz("gif", GifCodec.synthGif(17L, 23, 17), GifCodec.parseGif)
  }

  test("AVI demuxer never throws on corrupt bytes") {
    fuzz("avi", AviCodec.synthAvi(17L, 2, 1, 4), AviCodec.parseAvi(_, 2))
  }

  test("WAV/BMP/RLE8/ADPCM parsers never throw on corrupt bytes") {
    fuzz("wav", RawCodec.synthWav(17L, 2, 8000, 64), RawCodec.parseWav)
    fuzz("bmp", RawCodec.synthBmp(17L, 9, 7), RawCodec.parseBmp)
    fuzz("rle8", RawCodec.synthRle8Bmp(17L, 9, 7), RawCodec.parseRle8Bmp)
    fuzz("adpcm", RawCodec.synthAdpcmWav(17L, 2, 3, 2, 8000), RawCodec.parseAdpcmWav)
  }

  test("RLE8 delta-video decoder never throws on corrupt bytes") {
    fuzz("rle_video", graft.multimodal.RleVideoCodec.synthRleAvi(34L),
      graft.multimodal.RleVideoCodec.parseRleAvi)
  }
}
