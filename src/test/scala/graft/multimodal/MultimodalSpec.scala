package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.syntheticMedia(spark, 20)

  test("decodeMeta parses format/dimensions from the binary column") {
    val decoded = Multimodal.decodeMeta(media, "media")
    val metas = decoded.select("media_id", "meta.format", "meta.width", "meta.valid")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getBoolean(3)))
    assert(metas.length == 20)
    assert(metas.forall(_._4), "all synthetic blobs must decode as valid")
    assert(metas.find(_._1 == 0L).get._2 == "jpeg")
    assert(metas.find(_._1 == 1L).get._2 == "png")
    assert(metas.find(_._1 == 0L).get._3 == 16)
  }

  test("corrupt blobs decode as invalid instead of failing the job") {
    val corrupt = Seq((99L, Array[Byte](1, 2, 3))).toDF("media_id", "media")
    val m = Multimodal.decodeMeta(corrupt, "media").select("meta.valid", "meta.format").head()
    assert(!m.getBoolean(0) && m.getString(1) == "unknown")
  }

  test("feature extraction emits fixed-dim deterministic vectors") {
    val feats = Multimodal.extractFeatures(media, "media", dim = 8)
      .select("media_id", "features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(feats.values.forall(_.length == 8))
    val again = Multimodal.extractFeatures(media, "media", dim = 8)
      .select("media_id", "features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(feats == again)
  }

  test("ocrText emits deterministic text for valid media, empty for corrupt") {
    val withText = Multimodal.ocrText(media, "media")
      .select("media_id", "media_text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(withText(0L) == "stub ocr jpeg 16 9")
    assert(withText.values.forall(_.startsWith("stub ocr ")))
    val corrupt = Seq((99L, Array[Byte](1, 2, 3))).toDF("media_id", "media")
    assert(Multimodal.ocrText(corrupt, "media")
      .select("media_text").head().getString(0) == "")
  }

  test("frame offsets are k evenly spaced positions past the header") {
    val withLen = Multimodal.decodeMeta(media, "media")
      .select(col("media_id"), col("meta.n_bytes").as("n_bytes"))
    val offs = Multimodal.frameOffsets("n_bytes", k = 4)(withLen)
      .select("frame_offsets").head().getSeq[Long](0)
    assert(offs.length == 4)
    assert(offs.head == 9L)
    assert(offs == offs.sorted)
  }

  test("pngMeta parses REAL PNG header bytes as a pure projection") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // a genuine PNG prefix: signature + IHDR for a 2x3, 8-bit RGBA image
    // (CRC bytes arbitrary — header parsing does not checksum)
    val png: Array[Byte] = Array(
      0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A, // signature
      0, 0, 0, 13, 'I', 'H', 'D', 'R',             // IHDR length + type
      0, 0, 0, 2,                                  // width = 2
      0, 0, 0, 3,                                  // height = 3
      8, 6, 0, 0, 0,                               // depth, color, comp, filt, inter
      0, 0, 0, 0                                   // (fake) CRC
    ).map(_.toByte)
    val junk: Array[Byte] = Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9)
    val out = Seq((1L, png), (2L, junk)).toDF("id", "bin")
      .select(col("id"), Multimodal.pngMeta(col("bin")).as("m"))
      .select("id", "m.width", "m.height", "m.bit_depth", "m.color_type", "m.valid")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getInt(3), r.getInt(4), r.getBoolean(5)))).toMap
    assert(out(1L) == ((2L, 3L, 8, 6, true)))
    assert(out(2L) == ((-1L, -1L, -1, -1, false)))
    // a truncated blob with ONLY the signature must be invalid, not
    // valid-with-null-dims
    val sigOnly = png.take(8)
    val t = Seq((3L, sigOnly)).toDF("id", "bin")
      .select(Multimodal.pngMeta(col("bin")).as("m"))
      .select("m.width", "m.valid").head()
    assert(t.getLong(0) == -1L && !t.getBoolean(1))
    // a signature-prefixed blob whose first chunk is NOT IHDR must be
    // invalid — PNG mandates IHDR first; without the tag check the dims
    // would be garbage under valid=true
    val wrongChunk = png.clone()
    wrongChunk(12) = 'i'.toByte // "iHDR" — not the mandated tag
    val w = Seq((4L, wrongChunk)).toDF("id", "bin")
      .select(Multimodal.pngMeta(col("bin")).as("m"))
      .select("m.width", "m.valid").head()
    assert(w.getLong(0) == -1L && !w.getBoolean(1))
  }

  test("wavMeta parses REAL RIFF/WAVE header bytes, little-endian fields") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // genuine 44-byte WAV header prefix: PCM, stereo, 44100 Hz, 16-bit
    def le(v: Long, n: Int): Seq[Byte] =
      (0 until n).map(i => ((v >> (8 * i)) & 0xff).toByte)
    val wav: Array[Byte] = ("RIFF".getBytes("ASCII").toSeq ++ le(36, 4) ++
      "WAVE".getBytes("ASCII").toSeq ++ "fmt ".getBytes("ASCII").toSeq ++
      le(16, 4) ++       // fmt chunk size
      le(1, 2) ++        // audio format 1 = PCM
      le(2, 2) ++        // channels
      le(44100, 4) ++    // sample rate
      le(176400, 4) ++   // byte rate
      le(4, 2) ++        // block align
      le(16, 2)          // bits per sample
      ).toArray
    val junk = Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9)
    val out = Seq((1L, wav), (2L, junk), (3L, wav.take(12)))
      .toDF("id", "bin")
      .select(col("id"), Multimodal.wavMeta(col("bin")).as("m"))
      .select("id", "m.n_channels", "m.sample_rate", "m.bits_per_sample",
        "m.pcm", "m.valid")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2),
        r.getInt(3), r.getBoolean(4), r.getBoolean(5)))).toMap
    assert(out(1L) == ((2, 44100L, 16, true, true)))
    assert(out(2L) == ((-1, -1L, -1, false, false)))
    assert(out(3L) == ((-1, -1L, -1, false, false)))
  }

  test("jpegMeta walks REAL JPEG segments to SOFn and reads dimensions") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def be2(v: Int): Seq[Byte] = Seq(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def seg(marker: Int, payload: Seq[Byte]): Seq[Byte] =
      Seq(0xFF.toByte, marker.toByte) ++ be2(payload.length + 2) ++ payload
    val soi = Seq(0xFF.toByte, 0xD8.toByte)
    val app0 = seg(0xE0, "JFIF".getBytes("ASCII").toSeq ++
      Seq[Byte](0, 1, 2, 0, 0, 1, 0, 1, 0, 0))
    val dqt = seg(0xDB, Seq.fill[Byte](65)(3))
    def sof(marker: Int, h: Int, w: Int): Seq[Byte] =
      seg(marker, Seq[Byte](8) ++ be2(h) ++ be2(w) ++ Seq[Byte](3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1))
    val baseline = (soi ++ app0 ++ dqt ++ sof(0xC0, 480, 640)).toArray
    val progressive = (soi ++ app0 ++ sof(0xC2, 1080, 1920)).toArray
    val withRst = (soi ++ Seq(0xFF.toByte, 0x01.toByte) ++ sof(0xC1, 7, 9)).toArray
    // ITU T.81 B.1.1.2: fill bytes — extra 0xFF padding before a marker
    val withFill = (soi ++ Seq(0xFF.toByte, 0xFF.toByte) ++ sof(0xC0, 33, 44)).toArray
    val eoiFirst = (soi ++ app0 ++ Seq(0xFF.toByte, 0xD9.toByte)).toArray
    val truncated = baseline.take(soi.length + app0.length + 3)
    val junk = Array[Byte](1, 2, 3, 4, 5, 6)
    val zeroLen = (soi ++ Seq(0xFF.toByte, 0xE1.toByte, 0.toByte, 0.toByte)).toArray
    val out = Seq(1L -> baseline, 2L -> progressive, 3L -> withRst,
      4L -> eoiFirst, 5L -> truncated, 6L -> junk, 7L -> zeroLen,
      8L -> withFill)
      .toDF("id", "bin")
      .select(col("id"), Multimodal.jpegMeta(col("bin")).as("m"))
      .select("id", "m.width", "m.height", "m.valid")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(out(1L) == ((640L, 480L, true)))
    assert(out(2L) == ((1920L, 1080L, true)))
    assert(out(3L) == ((9L, 7L, true)))
    assert(out(4L) == ((-1L, -1L, false)))
    assert(out(5L) == ((-1L, -1L, false)))
    assert(out(6L) == ((-1L, -1L, false)))
    assert(out(7L) == ((-1L, -1L, false)))
    assert(out(8L) == ((44L, 33L, true)))
  }

  test("gifMeta parses REAL GIF logical screen descriptor, little-endian") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def le2(v: Int): Seq[Byte] = Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    val gif89 = ("GIF89a".getBytes("ASCII").toSeq ++ le2(320) ++ le2(200) ++
      Seq[Byte](0xF7.toByte, 0, 0)).toArray
    val gif87 = ("GIF87a".getBytes("ASCII").toSeq ++ le2(64) ++ le2(48) ++
      Seq[Byte](0, 0, 0)).toArray
    val notGif = "GIF90a0123456".getBytes("ASCII")
    val out = Seq(1L -> gif89, 2L -> gif87, 3L -> notGif, 4L -> gif89.take(8))
      .toDF("id", "bin")
      .select(col("id"), Multimodal.gifMeta(col("bin")).as("m"))
      .select("id", "m.width", "m.height", "m.version", "m.valid")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getBoolean(4)))).toMap
    assert(out(1L) == ((320L, 200L, "89a", true)))
    assert(out(2L) == ((64L, 48L, "87a", true)))
    assert(out(3L) == ((-1L, -1L, "", false)))
    assert(out(4L) == ((-1L, -1L, "", false)))
  }

  test("mp4Boxes walks REAL ISO-BMFF top-level boxes incl. 64-bit size") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def be(v: Long, n: Int): Seq[Byte] =
      (n - 1 to 0 by -1).map(i => ((v >> (8 * i)) & 0xff).toByte)
    def box(typ: String, payload: Int): Seq[Byte] =
      be(8L + payload, 4) ++ typ.getBytes("ASCII").toSeq ++ Seq.fill[Byte](payload)(7)
    // 64-bit-size box: size=1, then largesize at +8 (16-byte header)
    def bigBox(typ: String, payload: Int): Seq[Byte] =
      be(1L, 4) ++ typ.getBytes("ASCII").toSeq ++ be(16L + payload, 8) ++
        Seq.fill[Byte](payload)(9)
    val good = (box("ftyp", 8) ++ box("moov", 32) ++ box("mdat", 100)).toArray
    val withBig = (box("ftyp", 4) ++ bigBox("mdat", 24) ++ box("free", 0)).toArray
    val noFtyp = (box("moov", 8) ++ box("mdat", 8)).toArray
    val truncated = good.dropRight(5)
    val junk = Array[Byte](1, 2, 3)
    val out = Seq(1L -> good, 2L -> withBig, 3L -> noFtyp, 4L -> truncated, 5L -> junk)
      .toDF("id", "bin")
      .select(col("id"), Multimodal.mp4Boxes(col("bin")).as("m"))
      .select("id", "m.n_boxes", "m.box_types", "m.valid")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getSeq[String](2).toList, r.getBoolean(3)))).toMap
    assert(out(1L) == ((3L, List("ftyp", "moov", "mdat"), true)))
    assert(out(2L) == ((3L, List("ftyp", "mdat", "free"), true)))
    assert(out(3L) == ((0L, Nil, false)))
    assert(out(4L) == ((0L, Nil, false)))
    assert(out(5L) == ((0L, Nil, false)))
  }

  test("wavPcm8Samples decodes real PCM bytes; rejects stereo/16-bit/corrupt") {
    def wav(ch: Int, bits: Int, samples: Array[Int]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      def le(v: Long, n: Int): Unit =
        (0 until n).foreach(i => bos.write(((v >> (8 * i)) & 0xff).toInt))
      bos.write("RIFF".getBytes); le(samples.length + 36, 4)
      bos.write("WAVE".getBytes); bos.write("fmt ".getBytes); le(16, 4)
      le(1, 2); le(ch, 2); le(8000, 4); le(8000L * ch * bits / 8, 4)
      le(ch * bits / 8, 2); le(bits, 2)
      bos.write("data".getBytes); le(samples.length, 4)
      samples.foreach(s => bos.write(s))
      bos.toByteArray
    }
    graft.expressions.GraftFunctions.register(spark)
    val good = wav(1, 8, Array(0, 128, 255, 7, 200))
    val rows = Seq(
      (1L, good), (2L, wav(2, 8, Array(1, 2))), (3L, wav(1, 16, Array(1, 2))),
      (4L, Array[Byte](9, 9, 9))
    ).toDF("id", "wav")
      .select(col("id"), Multimodal.wavPcm8Samples(col("wav")).as("s"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Int](1).toList)).toMap
    assert(rows(1L) == List(0, 128, 255, 7, 200))
    assert(rows(2L) == null && rows(3L) == null && rows(4L) == null)

    val energy = Multimodal.wavFrameEnergy(
      Seq((1L, wav(1, 8, Array.tabulate(20)(j => (j * 13) % 256)))).toDF("id", "wav"),
      "id", "wav", frameSize = 16)
      .collect().map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3)))).toMap
    def e(js: Range) = js.map(j => { val d = (j * 13) % 256 - 128; d.toLong * d }).sum
    assert(energy == Map(0L -> ((16L, e(0 until 16))), 1L -> ((4L, e(16 until 20)))))
  }

  test("resizeArea: integer-exact box averages, weight conservation") {
    // 4x4 → 2x2: each output pixel is the exact mean of a 2x2 block
    val px = Array.tabulate[Byte](16)(i => (i * 10).toByte)
    val out = PngCodec.resizeArea(PngCodec.Gray(4, 4, px), 2, 2)
    def mean4(a: Int, b: Int, c: Int, d: Int) =
      ((a + b + c + d + 2) / 4).toByte
    assert(out.pixels.toSeq == Seq(
      mean4(0, 10, 40, 50), mean4(20, 30, 60, 70),
      mean4(80, 90, 120, 130), mean4(100, 110, 140, 150)))
    // non-divisible 3x3 → 2x2: fractional overlap, exact rational weights
    // out(0,0) covers [0,1.5)²: pixels p0 (area 1), p1 (0.5), p3 (0.5),
    // p4 (0.25) over total area 2.25 → scaled by 4: (4·p0+2·p1+2·p3+p4)/9
    val p3 = Array.tabulate[Byte](9)(i => (i * 20).toByte)
    val o3 = PngCodec.resizeArea(PngCodec.Gray(3, 3, p3), 2, 2)
    assert((o3.pixels(0) & 0xff) ==
      (4 * 0 + 2 * 20 + 2 * 60 + 80 + 4) / 9)
    // constant image stays constant at any output size (weight conservation)
    val const = PngCodec.resizeArea(
      PngCodec.Gray(7, 5, Array.fill[Byte](35)(123)), 3, 4)
    assert(const.pixels.forall(p => (p & 0xff) == 123))
    // identity when dims match
    val same = PngCodec.resizeArea(PngCodec.Gray(4, 4, px), 4, 4)
    assert(same.pixels.toSeq == px.toSeq)
  }

  test("thumbnailPng: real decode→resize→encode round trip; corrupt is null") {
    val base = (0L to 40L).map(i => (i, i % 64 + 16, i % 32 + 9))
      .toDF("doc_id", "w", "h")
    val png = Multimodal.syntheticPng(base, "doc_id", "w", "h")
    val out = Multimodal.thumbnailPng(png, "png", maxDim = 32)
    val rows = out.collect()
    assert(rows.forall(_.getBoolean(rows.head.fieldIndex("thumb_ok"))))
    rows.foreach { r =>
      val w = r.getLong(1); val h = r.getLong(2)
      val m = math.max(w, h)
      val (ew, eh) = if (m <= 32) (w, h)
        else (math.max(1L, w * 32 / m), math.max(1L, h * 32 / m))
      assert(r.getLong(r.fieldIndex("thumb_w")) == ew)
      assert(r.getLong(r.fieldIndex("thumb_h")) == eh)
      // the thumb itself decodes to the exact area-average of the source
      val src = PngCodec.decode(r.getAs[Array[Byte]]("png")).get
      val expect = PngCodec.resizeArea(src, ew.toInt, eh.toInt)
      val got = PngCodec.decode(r.getAs[Array[Byte]]("thumb")).get
      assert(java.util.Arrays.equals(got.pixels, expect.pixels))
    }
    // corrupt blob: ok=false, null thumb, -1 dims
    val junk = Seq((99L, Array[Byte](1, 2, 3))).toDF("doc_id", "png")
    val bad = Multimodal.thumbnailPng(junk, "png", 32).collect().head
    assert(!bad.getBoolean(bad.fieldIndex("thumb_ok")) &&
      bad.isNullAt(bad.fieldIndex("thumb")) &&
      bad.getLong(bad.fieldIndex("thumb_w")) == -1L)
  }

  test("decodePixels: content identity across ids sharing the generator congruence") {
    import spark.implicits._
    // ids 3 and 3+251 produce the SAME pixels at the same dims; id 4 differs
    val base = Seq((3L, 6L, 4L), (254L, 6L, 4L), (4L, 6L, 4L))
      .toDF("img_id", "w", "h")
    val out = Multimodal.decodePixels(
      Multimodal.syntheticPng(base, "img_id", "w", "h"), "png").collect()
    val byId = out.map(r => r.getLong(0) ->
      r.getAs[Array[Byte]](r.fieldIndex("pix"))).toMap
    assert(out.forall(r => r.getBoolean(r.fieldIndex("pix_ok"))))
    assert(out.forall(r => r.getLong(r.fieldIndex("pix_w")) == 6L &&
      r.getLong(r.fieldIndex("pix_h")) == 4L))
    assert(java.util.Arrays.equals(byId(3L), byId(254L)),
      "ids congruent mod 251 must decode to identical pixels")
    assert(!java.util.Arrays.equals(byId(3L), byId(4L)))
    // and the pixels are the raw generator bytes, row-major
    val expect = Array.tabulate[Byte](24) { i =>
      ((7L * (i % 6) + 13L * (i / 6) + 3L) % 251).toByte
    }
    assert(java.util.Arrays.equals(byId(3L), expect))
    // corrupt blob → ok=false, null pixels
    val junk2 = Seq((1L, Array[Byte](9, 9))).toDF("id", "png")
    val b2 = Multimodal.decodePixels(junk2, "png").collect().head
    assert(!b2.getBoolean(b2.fieldIndex("pix_ok")) &&
      b2.isNullAt(b2.fieldIndex("pix")))
  }

  test("decodePixels over MIXED PNG+JPEG blobs: both formats decode, JPEG copies group exactly") {
    import spark.implicits._
    val base = Seq((3L, 16L, 9L), (3L, 16L, 9L), (4L, 16L, 9L))
      .toDF("img_id", "w", "h")
    val png = Multimodal.syntheticPng(base, "img_id", "w", "h", outCol = "blob")
    val jpg = Multimodal.syntheticJpeg(base, "img_id", "w", "h", outCol = "blob")
    val out = Multimodal.decodePixels(png.unionByName(jpg), "blob").collect()
    assert(out.length == 6)
    assert(out.forall(r => r.getBoolean(r.fieldIndex("pix_ok"))))
    // EXACT-pixel grouping: the two JPEG copies of asset 3 decode to
    // byte-identical planes (deterministic codec), as do the two PNGs —
    // but JPEG ≠ PNG (lossy) and asset 3 ≠ asset 4
    def pix(rows: Seq[org.apache.spark.sql.Row]) =
      rows.map(_.getAs[Array[Byte]]("pix").toSeq)
    val groups = pix(out.toSeq).groupBy(identity).view.mapValues(_.size).toMap
    assert(groups.values.toSeq.sorted == Seq(1, 1, 2, 2),
      s"expected {png3:2, jpg3:2, png4:1, jpg4:1}, got ${groups.values}")
  }

  test("JPEG blobs flow through thumbnail and OCR operators end-to-end") {
    import spark.implicits._
    // thumbnail: JPEG in, PNG thumb out, exact area-average of the
    // JPEG-decoded plane
    val base = Seq((7L, 48L, 20L)).toDF("img_id", "w", "h")
    val jpg = Multimodal.syntheticJpeg(base, "img_id", "w", "h", outCol = "blob")
    val t = Multimodal.thumbnailPng(jpg, "blob", maxDim = 24).collect().head
    assert(t.getBoolean(t.fieldIndex("thumb_ok")))
    assert(t.getLong(t.fieldIndex("thumb_w")) == 24L)
    assert(t.getLong(t.fieldIndex("thumb_h")) == 10L)
    val srcPlane = JpegCodec.decode(t.getAs[Array[Byte]]("blob")).get
    val expect = PngCodec.resizeArea(srcPlane, 24, 10)
    val got = PngCodec.decode(t.getAs[Array[Byte]]("thumb")).get
    assert(java.util.Arrays.equals(got.pixels, expect.pixels))
    // OCR: glyph text in a JPEG blob is read through the same operator
    // that handles PNG (the SolrIndexer.java:115-129 shape, now covering
    // the reference's dominant media format)
    val media = Seq(
      (1L, JpegCodec.encodeGray(GlyphOcr.render("JPEG OCR 7"), 95)),
      (2L, GlyphOcr.renderPng("PNG TOO"))
    ).toDF("id", "blob")
    val texts = Multimodal.ocrText(media, "blob").collect()
      .map(r => r.getLong(0) -> r.getString(r.fieldIndex("media_text"))).toMap
    assert(texts(1L) == "JPEG OCR 7")
    assert(texts(2L) == "PNG TOO")
  }

  test("gifFrames samples every k-th composited frame; corrupt blob → sentinel row") {
    import spark.implicits._
    val base = Seq((3L, 9L, 7L, 6L)).toDF("doc_id", "w", "h", "nf")
    val gif = Multimodal.syntheticGifAnimation(base, "doc_id", "w", "h", "nf")
    val rows = Multimodal.gifFrames(gif, "gif", every = 2)
      .select("frame_idx", "frame_delay_cs", "frame_w", "frame_h", "frame")
      .collect().sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 2L, 4L))
    assert(rows.forall(r => r.getLong(1) == 10L &&
      r.getLong(2) == 9L && r.getLong(3) == 7L))
    // frame 2's plane matches the generator formula exactly
    val f2 = rows(1).getAs[Array[Byte]]("frame")
    val expect = Array.tabulate[Byte](63) { i =>
      ((7L * (i % 9) + 13L * (i / 9) + 3L + 17L * 2) % 251).toByte
    }
    assert(java.util.Arrays.equals(f2, expect))
    // corrupt blob: one visible sentinel row, job never fails
    val corrupt = Seq((9L, Array[Byte](1, 2, 3))).toDF("doc_id", "blob")
    val s = Multimodal.gifFrames(corrupt, "blob").collect()
    assert(s.length == 1 && s.head.getAs[Long]("frame_idx") == -1L &&
      s.head.getAs[Array[Byte]]("frame") == null)
  }

  test("videoFrames sniffs the container: AVI rows and GIF rows through ONE seam") {
    import spark.implicits._
    val base = Seq((4L, 12L, 9L, 5L)).toDF("doc_id", "w", "h", "nf")
    val avi = Multimodal.syntheticAviAnimation(base, "doc_id", "w", "h", "nf")
      .withColumnRenamed("avi", "blob")
    val gif = Multimodal.syntheticGifAnimation(
      Seq((7L, 8L, 6L, 3L)).toDF("doc_id", "w", "h", "nf"),
      "doc_id", "w", "h", "nf").withColumnRenamed("gif", "blob")
    val mixed = avi.select("doc_id", "blob").unionByName(gif.select("doc_id", "blob"))
    val rows = Multimodal.videoFrames(mixed, "blob")
      .select("doc_id", "frame_idx", "frame_delay_cs", "frame_w", "frame_h", "frame")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getAs[Array[Byte]]("frame")))
    val aviRows = rows.filter(_._1 == 4L).sortBy(_._2)
    val gifRows = rows.filter(_._1 == 7L).sortBy(_._2)
    assert(aviRows.map(_._2).toSeq == (0L until 5L) &&
      gifRows.map(_._2).toSeq == (0L until 3L))
    assert(aviRows.forall(r => r._3 == 10L && r._4 == 12L && r._5 == 9L))
    // AVI frame f is FLAT (31·id + 17·f) mod 256 — pixel-exact at q100
    aviRows.foreach { case (_, f, _, _, _, px) =>
      val v = ((31L * 4L + 17L * f) % 256).toByte
      assert(px.length == 108 && px.forall(_ == v), s"avi frame $f not exact")
    }
    // the GIF branch is byte-identical to the dedicated gifFrames operator
    val direct = Multimodal.gifFrames(gif, "blob")
      .select("frame_idx", "frame").collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]]("frame").toSeq)).toSet
    assert(gifRows.map(r => (r._2, r._6.toSeq)).toSet == direct)
  }

  test("sceneCuts over the AVI container: exact within-scene and cut diffs") {
    import spark.implicits._
    val base = Seq((11L, 10L, 8L, 6L)).toDF("doc_id", "w", "h", "nf")
    val avi = Multimodal.syntheticAviScenes(base, "doc_id", "w", "h", "nf")
    val rows = Multimodal.sceneCuts(avi, "doc_id", "avi", threshold = 30L)
      .select("frame_idx", "diff_sum", "n_pix", "is_cut")
      .collect().sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    rows.foreach { r =>
      val cutPair = r.getLong(0) == 3L // nf/2 = 3: frame 2→3 jumps +120
      assert(r.getLong(2) == 80L)
      assert(r.getLong(1) == (if (cutPair) 122L else 2L) * 80L,
        s"frame ${r.getLong(0)} diff ${r.getLong(1)}")
      assert(r.getBoolean(3) == cutPair)
    }
  }

  test("videoNearDupPairs: trimmed copy matches, df-capped frame drops out") {
    import spark.implicits._
    // family 5: videos 20..22 share frames; nf 6/4/2 → pairs (20,21)=4/6,
    // (20,22)=2/6, (21,22)=2/4
    val base = Seq((20L, 5L, 9L, 7L, 6L), (21L, 5L, 9L, 7L, 4L),
        (22L, 5L, 9L, 7L, 2L), (23L, 6L, 9L, 7L, 6L)) // other family: no pairs
      .toDF("doc_id", "fam", "w", "h", "nf")
    val gif = Multimodal.syntheticGifFamilies(base, "fam", "w", "h", "nf")
    val out = Multimodal.videoNearDupPairs(gif, "doc_id", "gif", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(out == Set((20L, 21L, 4L, 0.666667), (21L, 22L, 2L, 0.5)))
    // identical AVI videos through the same operator: jaccard 1.0
    val avBase = Seq((1L, 7L, 10L, 8L, 3L), (2L, 7L, 10L, 8L, 3L))
      .toDF("doc_id", "fam", "w", "h", "nf")
    val avi = Multimodal.syntheticAviAnimation(
      avBase.withColumnRenamed("fam", "content"), "content", "w", "h", "nf")
    val av = Multimodal.videoNearDupPairs(avi, "doc_id", "avi", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSet
    assert(av == Set((1L, 2L, 1.0)))
    // a frame present in MORE than maxFrameDf videos is dropped from all
    // sets: with the boilerplate frame capped away, the remaining sets are
    // disjoint and no pair survives
    val boiler = Seq((1L, 9L, 8L, 6L, 1L), (2L, 9L, 8L, 6L, 1L),
        (3L, 9L, 8L, 6L, 1L)).toDF("doc_id", "fam", "w", "h", "nf")
    val bg = Multimodal.syntheticGifFamilies(boiler, "fam", "w", "h", "nf")
    assert(Multimodal.videoNearDupPairs(bg, "doc_id", "gif",
      threshold = 0.1, maxFrameDf = 2).collect().isEmpty)
  }

  test("GIF blobs flow through dedup/thumbnail/OCR operators end-to-end") {
    import spark.implicits._
    val base = Seq((7L, 40L, 18L)).toDF("img_id", "w", "h")
    val gif = Multimodal.syntheticGif(base, "img_id", "w", "h", outCol = "blob")
    val t = Multimodal.thumbnailPng(gif, "blob", maxDim = 20).collect().head
    assert(t.getBoolean(t.fieldIndex("thumb_ok")))
    assert(t.getLong(t.fieldIndex("thumb_w")) == 20L)
    assert(t.getLong(t.fieldIndex("thumb_h")) == 9L)
    val media = Seq((1L, GifCodec.encodeGray(GlyphOcr.render("GIF OCR 3"))))
      .toDF("id", "blob")
    val texts = Multimodal.ocrText(media, "blob").collect()
      .map(r => r.getLong(0) -> r.getString(r.fieldIndex("media_text"))).toMap
    assert(texts(1L) == "GIF OCR 3")
  }
}
