package graft.multimodal

import scala.collection.mutable.ArrayBuffer

/** Pure-JVM baseline JPEG codec (ITU T.81, public wire format) — the JPEG
  * sibling of [[PngCodec]], closing the round-9 fidelity gap: the
  * reference OCRs arbitrary tweet media (`Ranking Model/src/main/java/
  * Main/SolrIndexer.java:115-129`, Tesseract over fetched URLs) whose
  * dominant format is JPEG, and until now only PNG decoded for real.
  *
  * Decoder: baseline sequential DCT (SOF0), 8-bit precision, 1–4
  * components with arbitrary (≤4×4) sampling factors, restart markers,
  * 8/16-bit quant tables. Returns the LUMA plane (component 1) as a
  * [[PngCodec.Gray]] — content identity for dedup and the input OCR
  * wants; chroma is decoded-and-dropped (its blocks still consume
  * entropy bits, so it must be parsed either way). Progressive (SOF2),
  * arithmetic coding, and hierarchical modes return None — corrupt or
  * unsupported media never fails a job ([[Multimodal.decodePixels]]
  * contract).
  *
  * Encoder: baseline grayscale JFIF at a pinned quality (Annex K quant
  * table scaled by the public libjpeg quality curve, Annex K.3 Huffman
  * tables) — the deterministic fixture generator: no image libraries
  * exist in this container, so test JPEGs must be synthesized, and a
  * decoder spec needs bytes whose provenance it controls.
  *
  * Determinism: all transcendentals come from `StrictMath` via
  * precomputed tables, so encode and decode are bit-reproducible across
  * JVMs/platforms — required for hash-checked queries over decoded
  * pixels.
  */
object JpegCodec {

  // ---- shared constants (ITU T.81 / JFIF, public) ----------------------

  /** Zig-zag scan order: zigzag index → raster index. */
  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Annex K.1 luminance quantization table (raster order). */
  private val StdLumaQuant: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  /** Annex K.3.1 DC luminance Huffman spec: counts per code length 1–16,
    * then symbols in order.
    */
  private val StdDcCounts: Array[Int] =
    Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val StdDcSymbols: Array[Int] = (0 to 11).toArray

  /** Annex K.3.2 AC luminance Huffman spec. */
  private val StdAcCounts: Array[Int] =
    Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val StdAcSymbols: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
    0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  /** Annex K.3.1/K.3.2 CHROMINANCE Huffman specs — not used by the
    * grayscale encoder, but needed to reconstruct the DHT segment the
    * MJPEG convention omits (Open DML: AVI MJPG frames may drop their
    * Huffman tables because every decoder is required to assume the
    * Annex K set; [[AviCodec.ensureDht]] splices these back in).
    */
  private val StdDcChromaCounts: Array[Int] =
    Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val StdDcChromaSymbols: Array[Int] = (0 to 11).toArray
  private val StdAcChromaCounts: Array[Int] =
    Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val StdAcChromaSymbols: Array[Int] = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15,
    0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17,
    0x18, 0x19, 0x1a, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5,
    0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9,
    0xda, 0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  /** The four standard Annex K DHT segments (luma DC/AC table 0, chroma
    * DC/AC table 1) as raw marker segments — the bytes a spec-following
    * MJPEG decoder must assume when an AVI frame omits its DHT.
    */
  lazy val StandardDhtSegments: Array[Byte] = {
    val out = ArrayBuffer.empty[Byte]
    def seg(tcTh: Int, counts: Array[Int], syms: Array[Int]): Unit = {
      out += 0xFF.toByte; out += 0xC4.toByte
      val len = 2 + 1 + 16 + syms.length
      out += ((len >> 8) & 0xff).toByte; out += (len & 0xff).toByte
      out += tcTh.toByte
      counts.foreach(c => out += c.toByte)
      syms.foreach(s => out += s.toByte)
    }
    seg(0x00, StdDcCounts, StdDcSymbols)
    seg(0x10, StdAcCounts, StdAcSymbols)
    seg(0x01, StdDcChromaCounts, StdDcChromaSymbols)
    seg(0x11, StdAcChromaCounts, StdAcChromaSymbols)
    out.toArray
  }

  /** cos((2x+1)·u·π/16) via StrictMath — deterministic across platforms. */
  private val Cos: Array[Array[Double]] = Array.tabulate(8, 8)((x, u) =>
    StrictMath.cos((2 * x + 1) * u * StrictMath.PI / 16.0))
  private val InvSqrt2 = 1.0 / StrictMath.sqrt(2.0)

  // ---- encoder ---------------------------------------------------------

  /** Quality-scaled quant table (libjpeg's public curve): scale =
    * 5000/q below 50 else 200−2q; entries clamped to [1, 255].
    */
  private def scaledQuant(quality: Int): Array[Int] = {
    val q = math.max(1, math.min(100, quality))
    val scale = if (q < 50) 5000 / q else 200 - 2 * q
    StdLumaQuant.map(v => math.max(1, math.min(255, (v * scale + 50) / 100)))
  }

  private final class BitWriter(out: ArrayBuffer[Byte]) {
    private var acc = 0
    private var nBits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        nBits += 1
        if (nBits == 8) {
          out += acc.toByte
          if (acc == 0xFF) out += 0x00.toByte // byte stuffing
          acc = 0; nBits = 0
        }
        i -= 1
      }
    }
    /** Flush with 1-padding (T.81 F.1.2.3). */
    def finish(): Unit = if (nBits > 0) put((1 << (8 - nBits)) - 1, 8 - nBits)
  }

  /** Canonical Huffman codes from a (counts, symbols) spec:
    * symbol → (code, length).
    */
  private def buildCodes(counts: Array[Int], symbols: Array[Int]): Array[(Int, Int)] = {
    val codes = new Array[(Int, Int)](256)
    var code = 0
    var k = 0
    var len = 1
    while (len <= 16) {
      var i = 0
      while (i < counts(len - 1)) {
        codes(symbols(k)) = (code, len)
        code += 1; k += 1; i += 1
      }
      code <<= 1
      len += 1
    }
    codes
  }

  /** Magnitude category (T.81 F.1.2.1.1): number of bits to code `v`. */
  private def category(v: Int): Int = 32 - Integer.numberOfLeadingZeros(math.abs(v))

  /** Encode a grayscale image as baseline JFIF at `quality` (1–100). */
  def encodeGray(img: PngCodec.Gray, quality: Int = 90): Array[Byte] = {
    val w = img.width; val h = img.height
    require(w > 0 && h > 0 && w <= 0xFFFF && h <= 0xFFFF, "jpeg: bad dims")
    val quant = scaledQuant(quality)
    val out = ArrayBuffer.empty[Byte]
    def u8(v: Int): Unit = out += (v & 0xff).toByte
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xFF); u8(m) }

    marker(0xD8) // SOI
    marker(0xE0); u16(16) // APP0 JFIF
    "JFIF".foreach(c => u8(c)); u8(0)
    u8(1); u8(1); u8(0); u16(1); u16(1); u8(0); u8(0)
    marker(0xDB); u16(67); u8(0x00) // DQT, 8-bit table 0, zigzag order
    (0 until 64).foreach(i => u8(quant(ZigZag(i))))
    marker(0xC0); u16(11) // SOF0: 1 component, 1x1
    u8(8); u16(h); u16(w); u8(1); u8(1); u8(0x11); u8(0)
    def dht(tcTh: Int, counts: Array[Int], syms: Array[Int]): Unit = {
      marker(0xC4); u16(2 + 1 + 16 + syms.length); u8(tcTh)
      counts.foreach(u8); syms.foreach(u8)
    }
    dht(0x00, StdDcCounts, StdDcSymbols)
    dht(0x10, StdAcCounts, StdAcSymbols)
    marker(0xDA); u16(8); u8(1); u8(1); u8(0x00); u8(0); u8(63); u8(0) // SOS

    val dcCodes = buildCodes(StdDcCounts, StdDcSymbols)
    val acCodes = buildCodes(StdAcCounts, StdAcSymbols)
    val bw = new BitWriter(out)
    val block = new Array[Double](64)
    val coef = new Array[Int](64)
    var prevDc = 0
    val blocksY = (h + 7) / 8
    val blocksX = (w + 7) / 8
    var by = 0
    while (by < blocksY) {
      var bx = 0
      while (bx < blocksX) {
        // level-shifted samples, edge-replicated padding
        var y = 0
        while (y < 8) {
          val sy = math.min(h - 1, by * 8 + y)
          var x = 0
          while (x < 8) {
            val sx = math.min(w - 1, bx * 8 + x)
            block(y * 8 + x) = (img.pixels(sy * w + sx) & 0xff) - 128.0
            x += 1
          }
          y += 1
        }
        // FDCT (direct double-precision 2D transform) + quantize
        var u = 0
        while (u < 8) {
          var v = 0
          while (v < 8) {
            var s = 0.0
            var yy = 0
            while (yy < 8) {
              var xx = 0
              while (xx < 8) {
                s += block(yy * 8 + xx) * Cos(xx)(v) * Cos(yy)(u)
                xx += 1
              }
              yy += 1
            }
            val cu = if (u == 0) InvSqrt2 else 1.0
            val cv = if (v == 0) InvSqrt2 else 1.0
            val f = 0.25 * cu * cv * s
            val q = quant(u * 8 + v)
            coef(u * 8 + v) = StrictMath.round(f / q).toInt
            v += 1
          }
          u += 1
        }
        // DC
        val dc = coef(0)
        val diff = dc - prevDc
        prevDc = dc
        val dcCat = category(diff)
        val (dcCode, dcLen) = dcCodes(dcCat)
        bw.put(dcCode, dcLen)
        if (dcCat > 0) {
          val bits = if (diff < 0) diff + (1 << dcCat) - 1 else diff
          bw.put(bits, dcCat)
        }
        // AC: zigzag, run-length
        var run = 0
        var zi = 1
        while (zi < 64) {
          val ac = coef(ZigZag(zi))
          if (ac == 0) run += 1
          else {
            while (run > 15) { val (c, l) = acCodes(0xF0); bw.put(c, l); run -= 16 }
            val cat = category(ac)
            val (c, l) = acCodes((run << 4) | cat)
            bw.put(c, l)
            val bits = if (ac < 0) ac + (1 << cat) - 1 else ac
            bw.put(bits, cat)
            run = 0
          }
          zi += 1
        }
        if (run > 0) { val (c, l) = acCodes(0x00); bw.put(c, l) } // EOB
        bx += 1
      }
      by += 1
    }
    bw.finish()
    marker(0xD9) // EOI
    out.toArray
  }

  // ---- decoder ---------------------------------------------------------

  /** Canonical-Huffman decode tables per T.81 F.2.2.3: for each code
    * length, the smallest/largest code and the symbol index of the first.
    */
  private final class HuffTable(counts: Array[Int], symbols: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    val syms: Array[Int] = symbols
    locally {
      var code = 0
      var k = 0
      var len = 1
      while (len <= 16) {
        if (counts(len - 1) == 0) { minCode(len) = 0; maxCode(len) = -1 }
        else {
          valPtr(len) = k
          minCode(len) = code
          code += counts(len - 1); k += counts(len - 1)
          maxCode(len) = code - 1
        }
        code <<= 1
        len += 1
      }
    }
  }

  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nBits = 0
    var sawMarker = false

    /** Next bit, honouring FF00 stuffing; an un-stuffed marker ends the
      * entropy stream (sets sawMarker; returns 0s after).
      */
    def bit(): Int = {
      if (nBits == 0) {
        if (sawMarker || pos >= data.length) { sawMarker = true; return 0 }
        var b = data(pos) & 0xff
        pos += 1
        if (b == 0xFF) {
          val next = if (pos < data.length) data(pos) & 0xff else -1
          if (next == 0x00) pos += 1 // stuffed FF
          else { sawMarker = true; pos -= 1; return 0 }
          b = 0xFF
        }
        acc = b; nBits = 8
      }
      nBits -= 1
      (acc >> nBits) & 1
    }

    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }

    /** Byte-align and consume an RSTn marker if present (restart). */
    def restart(): Boolean = {
      nBits = 0
      sawMarker = false
      if (pos + 1 < data.length && (data(pos) & 0xff) == 0xFF) {
        val m = data(pos + 1) & 0xff
        if (m >= 0xD0 && m <= 0xD7) { pos += 2; return true }
      }
      false
    }

    def decodeHuff(t: HuffTable): Int = {
      var code = bit()
      var len = 1
      while (len <= 16) {
        if (t.maxCode(len) >= t.minCode(len) && code <= t.maxCode(len))
          return t.syms(t.valPtr(len) + code - t.minCode(len))
        code = (code << 1) | bit()
        len += 1
      }
      -1 // invalid stream
    }
  }

  /** Extend a `cat`-bit magnitude to its signed value (T.81 F.2.2.1). */
  private def extend(bits: Int, cat: Int): Int =
    if (cat == 0) 0
    else if (bits < (1 << (cat - 1))) bits - (1 << cat) + 1
    else bits

  private final case class Component(id: Int, hSamp: Int, vSamp: Int, tq: Int)

  /** Decode baseline JPEG to the luma plane. None for anything that is
    * not a well-formed baseline-sequential 8-bit file.
    */
  def decode(bytes: Array[Byte]): Option[PngCodec.Gray] =
    try decodeUnsafe(bytes)
    catch { case _: Exception => None }

  private def decodeUnsafe(bytes: Array[Byte]): Option[PngCodec.Gray] = {
    if (bytes == null || bytes.length < 4 ||
      (bytes(0) & 0xff) != 0xFF || (bytes(1) & 0xff) != 0xD8) return None
    var pos = 2
    val quant = Array.fill(4)(null: Array[Int]) // raster order
    val dcTables = Array.fill(4)(null: HuffTable)
    val acTables = Array.fill(4)(null: HuffTable)
    var comps: Array[Component] = null
    var imgW = 0; var imgH = 0
    var restartInterval = 0

    def u16(p: Int): Int = ((bytes(p) & 0xff) << 8) | (bytes(p + 1) & 0xff)

    while (pos + 3 < bytes.length) {
      if ((bytes(pos) & 0xff) != 0xFF) return None
      val m = bytes(pos + 1) & 0xff
      if (m == 0xFF) { pos += 1 } // fill byte
      else if (m == 0xD8 || (m >= 0xD0 && m <= 0xD7) || m == 0x01) pos += 2
      else {
        val len = u16(pos + 2)
        if (len < 2 || pos + 2 + len > bytes.length) return None
        val seg = pos + 4
        m match {
          case 0xDB => // DQT: one or more tables
            var p = seg
            while (p < pos + 2 + len) {
              val pq = (bytes(p) & 0xff) >> 4
              val tq = bytes(p) & 0x0f
              if (tq > 3 || pq > 1) return None
              val t = new Array[Int](64)
              var i = 0
              var q = p + 1
              while (i < 64) {
                val v = if (pq == 1) { val x = u16(q); q += 2; x }
                        else { val x = bytes(q) & 0xff; q += 1; x }
                t(ZigZag(i)) = v
                i += 1
              }
              quant(tq) = t
              p = q
            }
          case 0xC4 => // DHT: one or more tables
            var p = seg
            while (p < pos + 2 + len) {
              val tc = (bytes(p) & 0xff) >> 4
              val th = bytes(p) & 0x0f
              if (tc > 1 || th > 3) return None
              val counts = Array.tabulate(16)(i => bytes(p + 1 + i) & 0xff)
              val n = counts.sum
              val syms = Array.tabulate(n)(i => bytes(p + 17 + i) & 0xff)
              val t = new HuffTable(counts, syms)
              if (tc == 0) dcTables(th) = t else acTables(th) = t
              p += 17 + n
            }
          case 0xC0 | 0xC1 => // baseline / extended sequential SOF
            if ((bytes(seg) & 0xff) != 8) return None // 8-bit only
            imgH = u16(seg + 1); imgW = u16(seg + 3)
            val n = bytes(seg + 5) & 0xff
            if (imgW == 0 || imgH == 0 || n < 1 || n > 4) return None
            comps = Array.tabulate(n) { i =>
              val o = seg + 6 + 3 * i
              Component(bytes(o) & 0xff, (bytes(o + 1) & 0xff) >> 4,
                bytes(o + 1) & 0x0f, bytes(o + 2) & 0xff)
            }
            if (comps.exists(c => c.hSamp < 1 || c.hSamp > 4 ||
              c.vSamp < 1 || c.vSamp > 4 || c.tq > 3)) return None
          case 0xC2 | 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA | 0xCB |
               0xCD | 0xCE | 0xCF =>
            return None // progressive / lossless / arithmetic: unsupported
          case 0xDD =>
            restartInterval = u16(seg)
          case 0xDA => // SOS — entropy data follows
            if (comps == null) return None
            val ns = bytes(seg) & 0xff
            if (ns != comps.length) return None // single interleaved scan only
            val scan = Array.tabulate(ns) { i =>
              val cid = bytes(seg + 1 + 2 * i) & 0xff
              val tabs = bytes(seg + 2 + 2 * i) & 0xff
              val comp = comps.find(_.id == cid).getOrElse(return None)
              (comp, tabs >> 4, tabs & 0x0f)
            }
            return decodeScan(bytes, pos + 2 + len, scan, quant,
              dcTables, acTables, imgW, imgH, restartInterval)
          case 0xD9 => return None // EOI before any scan
          case _ => () // APPn / COM / others: skip
        }
        pos += 2 + len
      }
    }
    None
  }

  private def decodeScan(bytes: Array[Byte], dataStart: Int,
                         scan: Array[(Component, Int, Int)],
                         quant: Array[Array[Int]],
                         dcTables: Array[HuffTable], acTables: Array[HuffTable],
                         imgW: Int, imgH: Int,
                         restartInterval: Int): Option[PngCodec.Gray] = {
    val maxH = scan.map(_._1.hSamp).max
    val maxV = scan.map(_._1.vSamp).max
    val mcuW = 8 * maxH
    val mcuH = 8 * maxV
    val mcusX = (imgW + mcuW - 1) / mcuW
    val mcusY = (imgH + mcuH - 1) / mcuH
    // per-component plane (padded to whole MCUs)
    val planes = scan.map { case (c, _, _) =>
      new Array[Byte](mcusX * c.hSamp * 8 * mcusY * c.vSamp * 8)
    }
    val planeW = scan.map { case (c, _, _) => mcusX * c.hSamp * 8 }
    val prevDc = new Array[Int](scan.length)
    val br = new BitReader(bytes, dataStart)
    val coef = new Array[Int](64)
    val px = new Array[Double](64)

    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        if (!br.restart()) return None
        java.util.Arrays.fill(prevDc, 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var ci = 0
      while (ci < scan.length) {
        val (c, dcId, acId) = scan(ci)
        val dcT = dcTables(dcId); val acT = acTables(acId)
        val qt = quant(c.tq)
        if (dcT == null || acT == null || qt == null) return None
        var v = 0
        while (v < c.vSamp) {
          var hh = 0
          while (hh < c.hSamp) {
            // --- decode one block ---
            java.util.Arrays.fill(coef, 0)
            val dcCat = br.decodeHuff(dcT)
            if (dcCat < 0 || dcCat > 15) return None
            val diff = extend(br.bits(dcCat), dcCat)
            prevDc(ci) += diff
            coef(0) = prevDc(ci) * qt(0)
            var zi = 1
            var eob = false
            while (zi < 64 && !eob) {
              val rs = br.decodeHuff(acT)
              if (rs < 0) return None
              val run = rs >> 4
              val cat = rs & 0x0f
              if (cat == 0) {
                if (run == 15) zi += 16 // ZRL
                else eob = true         // EOB
              } else {
                zi += run
                if (zi > 63) return None
                coef(ZigZag(zi)) = extend(br.bits(cat), cat) * qt(ZigZag(zi))
                zi += 1
              }
            }
            // --- IDCT (direct double-precision) + level shift ---
            var y = 0
            while (y < 8) {
              var x = 0
              while (x < 8) {
                var s = 0.0
                var u = 0
                while (u < 8) {
                  var w = 0
                  while (w < 8) {
                    val cu = if (u == 0) InvSqrt2 else 1.0
                    val cw = if (w == 0) InvSqrt2 else 1.0
                    s += cu * cw * coef(u * 8 + w) * Cos(x)(w) * Cos(y)(u)
                    w += 1
                  }
                  u += 1
                }
                px(y * 8 + x) = 0.25 * s + 128.0
                x += 1
              }
              y += 1
            }
            // --- place into the component plane ---
            val bx0 = (mx * c.hSamp + hh) * 8
            val by0 = (my * c.vSamp + v) * 8
            val pw = planeW(ci)
            var yy = 0
            while (yy < 8) {
              var xx = 0
              while (xx < 8) {
                val s = StrictMath.round(px(yy * 8 + xx)).toInt
                planes(ci)((by0 + yy) * pw + bx0 + xx) =
                  math.max(0, math.min(255, s)).toByte
                xx += 1
              }
              yy += 1
            }
            hh += 1
          }
          v += 1
        }
        ci += 1
      }
      mcu += 1
    }

    // luma plane: component 0 of the scan; upsample to image dims if its
    // sampling is below max (nearest neighbour — grayscale identity path
    // always has full-res luma, this covers odd 3-component layouts)
    val (c0, _, _) = scan(0)
    val pw = planeW(0)
    val sx = maxH / c0.hSamp // ≥1, exact for the standard factor sets
    val sy = maxV / c0.vSamp
    val outPx = new Array[Byte](imgW * imgH)
    var y = 0
    while (y < imgH) {
      var x = 0
      while (x < imgW) {
        outPx(y * imgW + x) = planes(0)((y / sy) * pw + (x / sx))
        x += 1
      }
      y += 1
    }
    Some(PngCodec.Gray(imgW, imgH, outPx))
  }
}
