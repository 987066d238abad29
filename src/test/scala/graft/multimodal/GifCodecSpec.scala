package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** The pure-JVM GIF codec: exact LZW round trips (grayscale table makes
  * the format lossless here), dictionary growth through every code width
  * up to the 4096-slot reset, interlacing, the BT.601 luma rule on a
  * non-gray palette, wire-format rejection, and the decodeImage dispatch.
  */
class GifCodecSpec extends AnyFunSuite {

  private def gradient(w: Int, h: Int, id: Long): PngCodec.Gray =
    PngCodec.Gray(w, h, Array.tabulate[Byte](w * h) { i =>
      val x = i % w; val y = i / w
      ((7L * x + 13L * y + id) % 251).toByte
    })

  /** Deterministic LCG noise — incompressible, so the LZW dictionary fills
    * and (on big planes) resets; exercises widths 9..12 + clear handling.
    */
  private def noise(w: Int, h: Int, seed: Long): PngCodec.Gray = {
    var s = seed
    PngCodec.Gray(w, h, Array.tabulate[Byte](w * h) { _ =>
      s = s * 6364136223846793005L + 1442695040888963407L
      (s >>> 56).toByte
    })
  }

  test("gradient images round-trip EXACTLY (lossless grayscale table)") {
    for ((w, h, id) <- Seq((1, 1, 0L), (7, 3, 5L), (16, 9, 11L), (64, 41, 3L))) {
      val img = gradient(w, h, id)
      val d = GifCodec.decode(GifCodec.encodeGray(img))
      assert(d.isDefined, s"$w x $h failed to decode")
      assert(d.get.width == w && d.get.height == h)
      assert(java.util.Arrays.equals(d.get.pixels, img.pixels),
        s"$w x $h: pixels differ")
    }
  }

  test("incompressible plane forces dictionary saturation + reset; still exact") {
    val img = noise(120, 90, seed = 42L) // 10 800 px >> 4 096 LZW slots
    val bytes = GifCodec.encodeGray(img)
    val d = GifCodec.decode(bytes)
    assert(d.isDefined)
    assert(java.util.Arrays.equals(d.get.pixels, img.pixels))
  }

  test("highly compressible plane (flat) round-trips exactly") {
    val img = PngCodec.Gray(300, 200, Array.fill[Byte](60000)(37.toByte))
    val d = GifCodec.decode(GifCodec.encodeGray(img)).get
    assert(d.pixels.forall(_ == 37.toByte))
  }

  test("interlaced encode decodes to the same sequential pixels") {
    for ((w, h) <- Seq((9, 1), (5, 2), (8, 7), (33, 29))) { // hits passes 1..4
      val img = gradient(w, h, 7L)
      val d = GifCodec.decode(GifCodec.encodeGray(img, interlaced = true))
      assert(d.isDefined, s"$w x $h interlaced failed")
      assert(java.util.Arrays.equals(d.get.pixels, img.pixels),
        s"$w x $h: deinterlace wrong")
    }
  }

  test("non-gray palette collapses by the integer BT.601 rule") {
    // palette: index 0 = pure red, 1 = pure green, 2 = pure blue, 3 = white
    val palette = new Array[Byte](768)
    palette(0) = 255.toByte                      // (255, 0, 0)
    palette(3 + 1) = 255.toByte                  // (0, 255, 0)
    palette(6 + 2) = 255.toByte                  // (0, 0, 255)
    palette(9) = 255.toByte; palette(10) = 255.toByte; palette(11) = 255.toByte
    val idx = Array[Byte](0, 1, 2, 3)
    val bytes = GifCodec.encodeIndexed(4, 1, palette, idx, interlaced = false)
    val d = GifCodec.decode(bytes).get
    // (299*255 + 500)/1000 = 76; 587 → 150; 114 → 29; white → 255
    assert(d.pixels.map(_ & 0xff).toSeq == Seq(76, 150, 29, 255))
  }

  test("encode is deterministic (byte-identical across calls)") {
    val img = noise(40, 30, seed = 9L)
    assert(java.util.Arrays.equals(GifCodec.encodeGray(img), GifCodec.encodeGray(img)))
  }

  test("rejects non-GIF and truncated bytes instead of throwing") {
    val png = PngCodec.encodeGray(gradient(8, 8, 1L))
    val jpg = JpegCodec.encodeGray(gradient(8, 8, 1L), 90)
    val gif = GifCodec.encodeGray(gradient(8, 8, 1L))
    assert(GifCodec.decode(null).isEmpty)
    assert(GifCodec.decode(Array.emptyByteArray).isEmpty)
    assert(GifCodec.decode(png).isEmpty)
    assert(GifCodec.decode(jpg).isEmpty)
    assert(GifCodec.decode("GIF89a junk".getBytes).isEmpty)
    for (n <- Seq(5, 13, 20, gif.length / 2))
      assert(GifCodec.decode(gif.take(n)).isEmpty, s"truncation at $n not rejected")
    // and the other codecs reject GIF bytes (orElse chain has no false hits)
    assert(PngCodec.decode(gif).isEmpty && JpegCodec.decode(gif).isEmpty)
  }

  test("decodeImage dispatches GIF bytes through GifCodec") {
    val img = gradient(12, 5, 4L)
    val viaSeam = Multimodal.decodeImage(GifCodec.encodeGray(img))
    assert(viaSeam.isDefined)
    assert(java.util.Arrays.equals(viaSeam.get.pixels, img.pixels))
  }

  test("glyph OCR reads text through a GIF end-to-end") {
    val rendered = GlyphOcr.render("HELLO GIF 42")
    val decoded = GifCodec.decode(GifCodec.encodeGray(rendered)).get
    assert(GlyphOcr.recognize(decoded) == "HELLO GIF 42")
  }

  test("GIF copy of an asset decodes pixel-identical to its PNG copy") {
    val img = gradient(31, 17, 6L)
    val viaPng = PngCodec.decode(PngCodec.encodeGray(img)).get
    val viaGif = GifCodec.decode(GifCodec.encodeGray(img)).get
    assert(java.util.Arrays.equals(viaPng.pixels, viaGif.pixels))
  }
}
