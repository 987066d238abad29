package graft.multimodal

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** Decoder robustness as a property: the corrupt-media contract
  * ([[Multimodal.decodePixels]] — a bad blob must never fail OR HANG the
  * job) fuzz-tested over three adversarial input families per codec:
  * pure random bytes, valid media truncated at every granularity, and
  * valid media with random bit flips (which keeps magics/structure intact
  * so the deep parser paths actually run — pure noise dies at the
  * signature check). Deterministic seeds; every decode call must return
  * (Some or None, never throw) within the suite's normal runtime — an
  * infinite loop here fails the build by timeout, which is exactly the
  * regression class the round-11 AVI size-guard fixed.
  */
class CodecFuzzSpec extends AnyFunSuite {

  private def gray(w: Int, h: Int, seed: Int): PngCodec.Gray = {
    val r = new Random(seed)
    val px = Array.fill(w * h)((r.nextInt(256) - 128).toByte)
    PngCodec.Gray(w, h, px)
  }

  private val png = PngCodec.encodeGray(gray(24, 16, 1))
  private val jpg = JpegCodec.encodeGray(gray(24, 16, 2), quality = 90)
  private val gif = GifCodec.encodeGray(gray(24, 16, 3))
  private val avi = AviCodec.encodeMjpeg((0 until 3).map(f => gray(16, 16, 4 + f)))

  private def decoders: Seq[(String, Array[Byte] => Any)] = Seq(
    "png" -> (b => PngCodec.decode(b)),
    "jpeg" -> (b => JpegCodec.decode(b)),
    "gif" -> (b => GifCodec.decode(b)),
    "gif-frames" -> (b => GifCodec.decodeFrames(b, maxFrames = 8)),
    "avi-info" -> (b => AviCodec.parseInfo(b)),
    "avi-frames" -> (b => AviCodec.decodeFrames(b, maxFrames = 8)))

  test("random bytes never throw or hang any decoder") {
    val r = new Random(7)
    for (n <- Seq(0, 1, 7, 64, 1024); i <- 1 to 20) {
      val junk = Array.fill(n)((r.nextInt(256) - 128).toByte)
      decoders.foreach { case (name, d) =>
        d(junk) // must return; Option result shape is the codec's own spec
      }
      val _ = i
    }
  }

  test("every truncation prefix of valid media decodes or rejects cleanly") {
    for ((bytes, d) <- Seq((png, decoders(0)._2), (jpg, decoders(1)._2),
        (gif, decoders(2)._2), (avi, decoders(5)._2));
        cut <- 0 to bytes.length by math.max(1, bytes.length / 64))
      d(bytes.take(cut))
  }

  test("bit-flipped valid media (structure intact) never throws or hangs") {
    val r = new Random(11)
    for ((bytes, d) <- Seq((png, decoders(0)._2), (jpg, decoders(1)._2),
        (gif, decoders(2)._2), (avi, decoders(5)._2)); i <- 1 to 60) {
      val c = bytes.clone()
      // flip 1-4 random bits past the magic so parsers run deep
      for (_ <- 0 until 1 + r.nextInt(4)) {
        val at = 12 + r.nextInt(c.length - 12)
        c(at) = (c(at) ^ (1 << r.nextInt(8))).toByte
      }
      d(c)
      val _ = i
    }
  }
}
