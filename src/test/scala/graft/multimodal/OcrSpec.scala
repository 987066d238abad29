package graft.multimodal

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater}

import graft.SparkSpec

/** The real-OCR stack: PNG codec round-trips, filtered/RGB decode against
  * hand-built spec-conformant files, glyph recognition for the whole font,
  * noise tolerance, and the `ocrText` operator end-to-end.
  */
class OcrSpec extends SparkSpec {
  import spark.implicits._

  // -- helpers: build a PNG by hand (independent of PngCodec.encodeGray) --

  private def be32(v: Int): Array[Byte] = Array(
    ((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
    ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val tb = tag.getBytes("US-ASCII")
    out.write(be32(data.length)); out.write(tb); out.write(data)
    val crc = new CRC32(); crc.update(tb); crc.update(data)
    out.write(be32(crc.getValue.toInt))
    out.toByteArray
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new Deflater(); d.setInput(raw); d.finish()
    val out = new ByteArrayOutputStream(); val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end(); out.toByteArray
  }

  /** Build a PNG from per-row (filterType, unfiltered pixel bytes),
    * applying the filter math forward so decode must invert it.
    */
  private def buildPng(w: Int, h: Int, colorType: Int,
                       rows: Seq[(Int, Array[Byte])]): Array[Byte] = {
    val bpp = if (colorType == 2) 3 else 1
    val stride = w * bpp
    def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    val raw = new ByteArrayOutputStream()
    var prior: Array[Byte] = new Array[Byte](stride)
    rows.foreach { case (ft, px) =>
      assert(px.length == stride)
      raw.write(ft)
      var x = 0
      while (x < stride) {
        val cur = px(x) & 0xff
        val a = if (x >= bpp) px(x - bpp) & 0xff else 0
        val b = prior(x) & 0xff
        val c = if (x >= bpp) prior(x - bpp) & 0xff else 0
        val f = ft match {
          case 0 => cur
          case 1 => cur - a
          case 2 => cur - b
          case 3 => cur - (a + b) / 2
          case 4 => cur - paeth(a, b, c)
        }
        raw.write(f & 0xff)
        x += 1
      }
      prior = px
    }
    val sig = Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte,
      0x0D.toByte, 0x0A.toByte, 0x1A.toByte, 0x0A.toByte)
    val ihdr = be32(w) ++ be32(h) ++
      Array[Byte](8, colorType.toByte, 0, 0, 0)
    val out = new ByteArrayOutputStream()
    out.write(sig)
    out.write(chunk("IHDR", ihdr))
    out.write(chunk("IDAT", deflate(raw.toByteArray)))
    out.write(chunk("IEND", Array.emptyByteArray))
    out.toByteArray
  }

  private def detPixels(n: Int, seed: Int): Array[Byte] =
    Array.tabulate(n)(i => ((i * 31 + seed * 17) % 251).toByte)

  // ---------------------------- codec ----------------------------

  test("encodeGray -> decode round-trips pixels exactly") {
    val img = PngCodec.Gray(23, 11, detPixels(23 * 11, 1))
    val back = PngCodec.decode(PngCodec.encodeGray(img)).get
    assert(back.width == 23 && back.height == 11)
    assert(back.pixels.sameElements(img.pixels))
  }

  test("decode inverts all five scanline filters (grayscale)") {
    val w = 8; val h = 5
    val px = (0 until h).map(y => detPixels(w, y))
    val bytes = buildPng(w, h, colorType = 0,
      rows = Seq(0, 1, 2, 3, 4).zip(px))
    val img = PngCodec.decode(bytes).get
    assert(img.pixels.sameElements(Array.concat(px: _*)))
  }

  test("decode converts RGB (color type 2) to BT.601 luma, filters inverted") {
    val w = 6; val h = 4
    val px = (0 until h).map(y => detPixels(w * 3, y + 7))
    val bytes = buildPng(w, h, colorType = 2,
      rows = Seq(4, 3, 2, 1).zip(px))
    val img = PngCodec.decode(bytes).get
    val expected = Array.concat(px: _*).grouped(3).map { t =>
      (((t(0) & 0xff) * 299 + (t(1) & 0xff) * 587 + (t(2) & 0xff) * 114) / 1000).toByte
    }.toArray
    assert(img.pixels.sameElements(expected))
  }

  test("decode returns None on corrupt, truncated, and unsupported input") {
    assert(PngCodec.decode(null).isEmpty)
    assert(PngCodec.decode(Array[Byte](1, 2, 3)).isEmpty)
    val good = PngCodec.encodeGray(PngCodec.Gray(4, 4, detPixels(16, 3)))
    // cut into the IDAT chunk so the pixel stream itself is incomplete
    assert(PngCodec.decode(good.take(good.length / 2)).isEmpty)
    // 16-bit depth is outside the supported profile
    val deep = good.clone(); deep(24) = 16 // IHDR bit-depth byte
    assert(PngCodec.decode(deep).isEmpty)
  }

  // ----------------------------- OCR -----------------------------

  test("render -> PNG -> recognize round-trips the whole font") {
    val all = "ABCDEFGHIJKLMNOPQRSTUVWXYZ 0123456789"
    assert(GlyphOcr.recognizePng(GlyphOcr.renderPng(all)) == all)
  }

  test("recognize reads words and digits with spacing intact") {
    assert(GlyphOcr.recognizePng(GlyphOcr.renderPng("HELLO WORLD 123")) ==
      "HELLO WORLD 123")
    // lowercase input renders upcased
    assert(GlyphOcr.recognizePng(GlyphOcr.renderPng("spark graft")) ==
      "SPARK GRAFT")
  }

  test("recognition tolerates flipped pixels (noise)") {
    val img = GlyphOcr.render("NOISY TEXT 42")
    val px = img.pixels.clone()
    // flip a deterministic scatter of pixels (2 per 100)
    (0 until px.length by 53).foreach { i =>
      px(i) = (~px(i)).toByte
    }
    val noisy = PngCodec.Gray(img.width, img.height, px)
    assert(GlyphOcr.recognize(PngCodec.encodeGray(noisy) match {
      case b => PngCodec.decode(b).get
    }) == "NOISY TEXT 42")
  }

  test("an unknown shape classifies as '?' instead of a false match") {
    // a solid 5x7 ink block is far (Hamming > maxErr) from every glyph
    val w = 9; val h = 11
    val px = Array.fill[Byte](w * h)(0xFF.toByte)
    for (y <- 2 until 9; x <- 2 until 7) px(y * w + x) = 0
    assert(GlyphOcr.recognize(PngCodec.Gray(w, h, px)) == "?")
  }

  test("ocrText runs REAL OCR on PNG media, stub on GFT headers, empty on junk") {
    val png = GlyphOcr.renderPng("HIRING NOW")
    val gft = Multimodal.syntheticMedia(spark, 1)
      .select("media").head().getAs[Array[Byte]](0)
    val junk = Array[Byte](9, 9, 9)
    val df = Seq((1L, png), (2L, gft), (3L, junk)).toDF("media_id", "media")
    val out = Multimodal.ocrText(df, "media")
      .select("media_id", "media_text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "HIRING NOW")
    assert(out(2L).startsWith("stub ocr "))
    assert(out(3L) == "")
  }
}
