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

  test("animation round-trips every frame exactly, with delays") {
    val frames = (0 until 5).map(f => gradient(14, 9, 17L * f))
    val bytes = GifCodec.encodeGrayAnimation(frames, delayCs = 10)
    val d = GifCodec.decodeFrames(bytes)
    assert(d.isDefined && d.get.length == 5)
    for ((f, i) <- d.get.zipWithIndex) {
      assert(f.delayCs == 10)
      assert(f.image.width == 14 && f.image.height == 9)
      assert(java.util.Arrays.equals(f.image.pixels, frames(i).pixels),
        s"frame $i differs")
    }
  }

  test("decodeFrames on a still GIF yields one frame; decode stays frame 1") {
    val img = gradient(10, 6, 3L)
    val bytes = GifCodec.encodeGray(img)
    val d = GifCodec.decodeFrames(bytes).get
    assert(d.length == 1)
    assert(java.util.Arrays.equals(d.head.image.pixels, img.pixels))
  }

  test("maxFrames caps a long animation") {
    val frames = (0 until 9).map(f => gradient(6, 4, f.toLong))
    val bytes = GifCodec.encodeGrayAnimation(frames, delayCs = 5)
    assert(GifCodec.decodeFrames(bytes, maxFrames = 3).get.length == 3)
  }

  private val grayPalette = Array.tabulate[Byte](768)(i => (i / 3).toByte)

  test("partial-rect frame composites onto the previous canvas") {
    val bg = Array.fill[Byte](8 * 6)(10.toByte)
    val patch = Array.fill[Byte](3 * 2)(200.toByte)
    val bytes = GifCodec.encodeAnimation(8, 6, grayPalette, Seq(
      GifCodec.RawFrame(0, 0, 8, 6, bg, 4, disposal = 0, transparentIdx = -1),
      GifCodec.RawFrame(2, 1, 3, 2, patch, 4, disposal = 0, transparentIdx = -1)))
    val d = GifCodec.decodeFrames(bytes).get
    assert(d.length == 2)
    val f2 = d(1).image
    assert(f2.width == 8 && f2.height == 6)
    for (y <- 0 until 6; x <- 0 until 8) {
      val expected = if (y >= 1 && y < 3 && x >= 2 && x < 5) 200 else 10
      assert((f2.pixels(y * 8 + x) & 0xff) == expected, s"($x, $y)")
    }
  }

  test("transparent index leaves underlying canvas pixels visible") {
    val bg = Array.fill[Byte](4 * 3)(50.toByte)
    // second frame: checker of transparent (index 0) and value 99
    val overlay = Array.tabulate[Byte](4 * 3)(i => if (i % 2 == 0) 0 else 99.toByte)
    val bytes = GifCodec.encodeAnimation(4, 3, grayPalette, Seq(
      GifCodec.RawFrame(0, 0, 4, 3, bg, 1, disposal = 0, transparentIdx = -1),
      GifCodec.RawFrame(0, 0, 4, 3, overlay, 1, disposal = 0, transparentIdx = 0)))
    val f2 = GifCodec.decodeFrames(bytes).get.apply(1).image
    for (i <- 0 until 12)
      assert((f2.pixels(i) & 0xff) == (if (i % 2 == 0) 50 else 99), s"px $i")
  }

  test("disposal 2 restores the frame rect to background before the next frame") {
    // background index 0 = gray 0; frame 2 paints a patch with disposal 2,
    // so frame 3's canvas shows background (not the patch) outside its rect
    val base = Array.fill[Byte](6 * 4)(80.toByte)
    val patch = Array.fill[Byte](2 * 2)(200.toByte)
    val dot = Array.fill[Byte](1)(250.toByte)
    val bytes = GifCodec.encodeAnimation(6, 4, grayPalette, Seq(
      GifCodec.RawFrame(0, 0, 6, 4, base, 1, disposal = 0, transparentIdx = -1),
      GifCodec.RawFrame(1, 1, 2, 2, patch, 1, disposal = 2, transparentIdx = -1),
      GifCodec.RawFrame(5, 3, 1, 1, dot, 1, disposal = 0, transparentIdx = -1)))
    val d = GifCodec.decodeFrames(bytes).get
    assert((d(1).image.pixels(1 * 6 + 1) & 0xff) == 200) // patch visible in frame 2
    val f3 = d(2).image
    assert((f3.pixels(1 * 6 + 1) & 0xff) == 0, "disposal-2 rect not cleared")
    assert((f3.pixels(0) & 0xff) == 80, "pixels outside the rect must survive")
    assert((f3.pixels(3 * 6 + 5) & 0xff) == 250)
  }

  test("disposal 3 restores the pre-frame canvas") {
    val base = Array.fill[Byte](5 * 5)(60.toByte)
    val splash = Array.fill[Byte](5 * 5)(220.toByte)
    val dot = Array.fill[Byte](1)(7.toByte)
    val bytes = GifCodec.encodeAnimation(5, 5, grayPalette, Seq(
      GifCodec.RawFrame(0, 0, 5, 5, base, 1, disposal = 0, transparentIdx = -1),
      GifCodec.RawFrame(0, 0, 5, 5, splash, 1, disposal = 3, transparentIdx = -1),
      GifCodec.RawFrame(2, 2, 1, 1, dot, 1, disposal = 0, transparentIdx = -1)))
    val d = GifCodec.decodeFrames(bytes).get
    assert((d(1).image.pixels(0) & 0xff) == 220)
    val f3 = d(2).image
    assert((f3.pixels(0) & 0xff) == 60, "disposal-3 must restore the prior canvas")
    assert((f3.pixels(2 * 5 + 2) & 0xff) == 7)
  }

  test("decodeFrames rejects malformed and frameless streams") {
    assert(GifCodec.decodeFrames(null).isEmpty)
    assert(GifCodec.decodeFrames("GIF89a".getBytes).isEmpty)
    val good = GifCodec.encodeGrayAnimation(Seq(gradient(6, 4, 1L)), 1)
    assert(GifCodec.decodeFrames(good.take(good.length / 2)).isEmpty)
  }

  test("GIF copy of an asset decodes pixel-identical to its PNG copy") {
    val img = gradient(31, 17, 6L)
    val viaPng = PngCodec.decode(PngCodec.encodeGray(img)).get
    val viaGif = GifCodec.decode(GifCodec.encodeGray(img)).get
    assert(java.util.Arrays.equals(viaPng.pixels, viaGif.pixels))
  }
}
