package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

class AviCodecSpec extends AnyFunSuite {

  private def flat(w: Int, h: Int, v: Int): PngCodec.Gray =
    PngCodec.Gray(w, h, Array.fill[Byte](w * h)(v.toByte))

  private def gradient(w: Int, h: Int, id: Long): PngCodec.Gray =
    PngCodec.Gray(w, h, Array.tabulate[Byte](w * h) { i =>
      val x = i % w; val y = i / w
      ((7L * x + 13L * y + id) % 251).toByte
    })

  test("round trip: flat frames at quality 100 decode pixel-exactly, in order") {
    val frames = (0 until 5).map(f => flat(24, 17, 40 + 31 * f))
    val avi = AviCodec.encodeMjpeg(frames, fps = 10, quality = 100)
    val out = AviCodec.decodeFrames(avi).get
    assert(out.length == 5)
    out.zip(frames).zipWithIndex.foreach { case ((d, o), i) =>
      assert(d.width == 24 && d.height == 17, s"frame $i dims")
      assert(java.util.Arrays.equals(d.pixels, o.pixels), s"frame $i not exact")
    }
  }

  test("parseInfo reads the header without decoding frames") {
    val avi = AviCodec.encodeMjpeg((0 until 7).map(f => flat(30, 20, f)), fps = 25)
    val info = AviCodec.parseInfo(avi).get
    assert(info.width == 30 && info.height == 20)
    assert(info.totalFrames == 7 && info.streams == 1)
    assert(info.microSecPerFrame == 40000L) // 25 fps
    assert(info.handler == "MJPG")
  }

  test("MJPEG convention: frames with stripped DHT still decode (Annex K injection)") {
    val img = gradient(33, 21, 5L)
    val jpeg = JpegCodec.encodeGray(img, 90)
    // strip every DHT segment the encoder wrote
    val stripped = {
      val out = collection.mutable.ArrayBuffer[Byte](jpeg(0), jpeg(1))
      var o = 2
      var done = false
      while (!done && o + 4 <= jpeg.length) {
        val m = jpeg(o + 1) & 0xff
        if (m == 0xDA) { jpeg.drop(o).foreach(out += _); done = true }
        else {
          val len = ((jpeg(o + 2) & 0xff) << 8) | (jpeg(o + 3) & 0xff)
          if (m != 0xC4) jpeg.slice(o, o + 2 + len).foreach(out += _)
          o += 2 + len
        }
      }
      out.toArray
    }
    assert(JpegCodec.decode(stripped).isEmpty || stripped.length < jpeg.length,
      "strip did not remove tables")
    val direct = JpegCodec.decode(jpeg).get
    val viaEnsure = JpegCodec.decode(AviCodec.ensureDht(stripped)).get
    assert(java.util.Arrays.equals(direct.pixels, viaEnsure.pixels),
      "DHT injection changed the decode")
    // and ensureDht is a no-op when tables are present
    assert(AviCodec.ensureDht(jpeg) eq jpeg)
  }

  test("tolerant walk: truncated AVI yields the frames before the cut") {
    val frames = (0 until 6).map(f => flat(16, 16, 10 * f))
    val avi = AviCodec.encodeMjpeg(frames)
    val cut = avi.length * 2 / 3
    val out = AviCodec.decodeFrames(avi.take(cut)).get
    assert(out.nonEmpty && out.length < 6)
    out.zipWithIndex.foreach { case (d, i) =>
      assert(java.util.Arrays.equals(d.pixels, frames(i).pixels))
    }
  }

  test("non-AVI bytes and corrupt frames are rejected without throwing") {
    assert(AviCodec.decodeFrames("not an avi".getBytes).isEmpty)
    assert(AviCodec.decodeFrames(Array.empty[Byte]).isEmpty)
    assert(AviCodec.parseInfo(PngCodec.encodeGray(flat(4, 4, 1))).isEmpty)
    // corrupt ONE frame's entropy bytes mid-file: other frames survive
    val frames = (0 until 4).map(f => flat(16, 16, 20 + f))
    val avi = AviCodec.encodeMjpeg(frames)
    val corrupted = avi.clone()
    // find the second 00dc chunk and trash its JPEG payload header
    var hits = 0
    var i = 12
    var target = -1
    while (i + 4 <= corrupted.length && target < 0) {
      if (corrupted(i) == '0' && corrupted(i + 1) == '0' &&
          corrupted(i + 2) == 'd' && corrupted(i + 3) == 'c') {
        hits += 1
        if (hits == 2) target = i + 8
      }
      i += 1
    }
    assert(target > 0)
    corrupted(target) = 0x00 // destroy the SOI marker
    val out = AviCodec.decodeFrames(corrupted).get
    assert(out.length == 3, s"expected 3 surviving frames, got ${out.length}")
  }

  test("a 2^31..2^32 chunk size terminates instead of looping (ADVICE r10)") {
    // a declared size of 0xFFFFFFF8 made size.toInt = -8, so the walk
    // offset moved BACKWARDS while staying in bounds — infinite loop, no
    // exception for the try/catch to convert to None. The guard must
    // return promptly from both parseInfo and decodeFrames.
    val avi = AviCodec.encodeMjpeg((0 until 3).map(f => flat(8, 8, f)))
    // find the first 00dc chunk and declare a huge size on it
    var i = 12
    var target = -1
    while (i + 4 <= avi.length && target < 0) {
      if (avi(i) == '0' && avi(i + 1) == '0' &&
          avi(i + 2) == 'd' && avi(i + 3) == 'c') target = i + 4
      i += 1
    }
    assert(target > 0)
    def withSize(v: Long): Array[Byte] = {
      val c = avi.clone()
      c(target) = (v & 0xff).toByte
      c(target + 1) = ((v >> 8) & 0xff).toByte
      c(target + 2) = ((v >> 16) & 0xff).toByte
      c(target + 3) = ((v >> 24) & 0xff).toByte
      c
    }
    for (sz <- Seq(0xFFFFFFF8L, 0x80000000L, 0xFFFFFFFFL)) {
      val c = withSize(sz)
      // completes (rather than hanging); the poisoned chunk is skipped
      assert(AviCodec.decodeFrames(c).get.length <= 3)
      AviCodec.parseInfo(c) // must terminate too
    }
    // size 0 on a non-LIST chunk still advances (next = o + 8 > o)
    assert(AviCodec.decodeFrames(withSize(0L)).get.length <= 3)
  }

  test("maxFrames bounds the decode") {
    val avi = AviCodec.encodeMjpeg((0 until 10).map(f => flat(8, 8, f)))
    assert(AviCodec.decodeFrames(avi, maxFrames = 3).get.length == 3)
  }
}
