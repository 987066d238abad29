package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** The pure-JVM baseline JPEG codec: encoder/decoder round trips, exact
  * cases (DCT of a flat block is DC-only, so flat images survive
  * quantization losslessly), tolerance bounds for gradients, wire-format
  * rejection, and determinism.
  */
class JpegCodecSpec extends AnyFunSuite {

  private def flat(w: Int, h: Int, v: Int): PngCodec.Gray =
    PngCodec.Gray(w, h, Array.fill[Byte](w * h)(v.toByte))

  private def gradient(w: Int, h: Int, id: Long): PngCodec.Gray =
    PngCodec.Gray(w, h, Array.tabulate[Byte](w * h) { i =>
      val x = i % w; val y = i / w
      ((7L * x + 13L * y + id) % 251).toByte
    })

  test("flat images round-trip EXACTLY at quality 100 (unit quant, DC-only blocks)") {
    for (v <- Seq(0, 77, 128, 200, 255)) {
      val img = flat(24, 17, v)
      val decoded = JpegCodec.decode(JpegCodec.encodeGray(img, 100))
      assert(decoded.isDefined, s"v=$v failed to decode")
      val d = decoded.get
      assert(d.width == 24 && d.height == 17)
      assert(d.pixels.forall(p => (p & 0xff) == v), s"v=$v: flat image not exact")
    }
  }

  test("flat images stay flat at lossy qualities, DC error bounded by the quant step") {
    for (v <- Seq(0, 77, 128, 200, 255); q <- Seq(50, 90)) {
      val d = JpegCodec.decode(JpegCodec.encodeGray(flat(24, 17, v), q)).get
      val vals = d.pixels.map(_ & 0xff).distinct
      assert(vals.length == 1, s"v=$v q=$q: flat image decoded non-flat")
      // DC quant step is 16 (q50) / 3 (q90); pixel error ≤ step/16 rounded up
      assert(math.abs(vals.head - v) <= 2, s"v=$v q=$q: off by ${vals.head - v}")
    }
  }

  test("gradient round-trip: correct dims, bounded error at quality 95") {
    for (id <- Seq(0L, 5L, 11L)) {
      val img = gradient(40, 25, id)
      val d = JpegCodec.decode(JpegCodec.encodeGray(img, 95)).get
      assert(d.width == 40 && d.height == 25)
      val maxErr = img.pixels.zip(d.pixels)
        .map { case (a, b) => math.abs((a & 0xff) - (b & 0xff)) }.max
      // the mod-251 gradient has one wrap discontinuity per row; ringing
      // around it bounds the error well under the binarization threshold
      assert(maxErr <= 96, s"id=$id maxErr=$maxErr")
    }
  }

  test("decode is deterministic: same bytes, same pixels") {
    val bytes = JpegCodec.encodeGray(gradient(33, 21, 3L), 85)
    val a = JpegCodec.decode(bytes).get
    val b = JpegCodec.decode(bytes).get
    assert(java.util.Arrays.equals(a.pixels, b.pixels))
  }

  test("encode is deterministic: same image, same bytes") {
    val a = JpegCodec.encodeGray(gradient(19, 13, 9L), 85)
    val b = JpegCodec.encodeGray(gradient(19, 13, 9L), 85)
    assert(java.util.Arrays.equals(a, b))
  }

  test("different content yields different decoded pixels (dedup identity)") {
    def pix(id: Long) =
      JpegCodec.decode(JpegCodec.encodeGray(gradient(32, 16, id), 90)).get.pixels
    assert(!java.util.Arrays.equals(pix(1L), pix(2L)))
  }

  test("non-JPEG and truncated bytes decode to None, never throw") {
    assert(JpegCodec.decode(null).isEmpty)
    assert(JpegCodec.decode(Array[Byte]()).isEmpty)
    assert(JpegCodec.decode("not a jpeg".getBytes).isEmpty)
    assert(JpegCodec.decode(PngCodec.encodeGray(flat(8, 8, 10))).isEmpty)
    val good = JpegCodec.encodeGray(flat(16, 16, 50), 90)
    assert(JpegCodec.decode(good.take(good.length / 2)).isEmpty)
  }

  test("1x1 and non-multiple-of-8 dims decode with exact dimensions") {
    for ((w, h) <- Seq((1, 1), (7, 3), (9, 8), (17, 31))) {
      val d = JpegCodec.decode(JpegCodec.encodeGray(flat(w, h, 99), 90)).get
      assert(d.width == w && d.height == h)
      assert(d.pixels.forall(p => (p & 0xff) == 99))
    }
  }

  test("glyph text survives JPEG encode + OCR end-to-end") {
    val img = GlyphOcr.render("HELLO JPEG 42")
    val jpeg = JpegCodec.encodeGray(img, 95)
    val decoded = JpegCodec.decode(jpeg).get
    assert(GlyphOcr.recognize(decoded) == "HELLO JPEG 42")
  }

  test("jpegMeta (the no-codec header parser) agrees with the codec's own output") {
    // cross-check the two JPEG paths: the marker-walk metadata extractor
    // must read the dims this encoder writes
    val bytes = JpegCodec.encodeGray(flat(45, 27, 10), 80)
    assert((bytes(0) & 0xff) == 0xFF && (bytes(1) & 0xff) == 0xD8)
    val d = JpegCodec.decode(bytes).get
    assert(d.width == 45 && d.height == 27)
  }
}
