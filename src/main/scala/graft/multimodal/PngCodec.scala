package graft.multimodal

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater, Inflater}

/** A REAL, pure-JVM PNG codec — no external library, only `java.util.zip`
  * (zlib is part of the JDK) and the public W3C PNG specification
  * (ISO/IEC 15948: 8-byte signature, length-tag-data-CRC chunks, IHDR
  * fixed layout, zlib-compressed filtered scanlines in IDAT).
  *
  * This replaces the "no image libraries in this container" excuse for the
  * OCR seam: the reference really decodes media before OCR
  * (`Ranking Model/src/main/java/Main/SolrIndexer.java:115-129`), and with
  * this codec [[Multimodal.ocrText]] really decodes PNGs too.
  *
  * Scope (documented, asserted): 8-bit depth, color types 0 (grayscale)
  * and 2 (RGB, converted to luma), non-interlaced, all five scanline
  * filters (None/Sub/Up/Average/Paeth) on decode; encode emits grayscale
  * with filter 0. That covers every image this engine synthesizes and the
  * common screenshot/figure shape; anything else decodes to None rather
  * than throwing — corrupt media must never fail the job.
  */
object PngCodec {

  /** A decoded image: 8-bit grayscale pixels, row-major, 0=black. */
  final case class Gray(width: Int, height: Int, pixels: Array[Byte])

  private val Signature: Array[Byte] =
    Array(0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)

  private def be32(v: Int): Array[Byte] = Array(
    ((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
    ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def readBe32(b: Array[Byte], pos: Int): Int =
    ((b(pos) & 0xff) << 24) | ((b(pos + 1) & 0xff) << 16) |
      ((b(pos + 2) & 0xff) << 8) | (b(pos + 3) & 0xff)

  private def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val tb = tag.getBytes("US-ASCII")
    out.write(be32(data.length)); out.write(tb); out.write(data)
    val crc = new CRC32(); crc.update(tb); crc.update(data)
    out.write(be32(crc.getValue.toInt))
    out.toByteArray
  }

  /** Encode an 8-bit grayscale image as a standards-conformant PNG
    * (color type 0, filter 0 per scanline, one zlib IDAT).
    */
  def encodeGray(img: Gray): Array[Byte] = {
    require(img.pixels.length == img.width * img.height,
      s"pixel buffer ${img.pixels.length} != ${img.width}x${img.height}")
    val ihdr = be32(img.width) ++ be32(img.height) ++
      Array[Byte](8, 0, 0, 0, 0) // depth, color, compression, filter, interlace
    val raw = new Array[Byte]((img.width + 1) * img.height)
    var y = 0
    while (y < img.height) {
      // raw(y * (w+1)) stays 0 = filter None
      System.arraycopy(img.pixels, y * img.width, raw,
        y * (img.width + 1) + 1, img.width)
      y += 1
    }
    val deflater = new Deflater(Deflater.DEFAULT_COMPRESSION)
    deflater.setInput(raw); deflater.finish()
    val zipped = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) zipped.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val out = new ByteArrayOutputStream()
    out.write(Signature)
    out.write(chunk("IHDR", ihdr))
    out.write(chunk("IDAT", zipped.toByteArray))
    out.write(chunk("IEND", Array.emptyByteArray))
    out.toByteArray
  }

  /** EXACT area-average (box-filter) resize — the standard high-quality
    * downsample, in pure integer arithmetic so the result is bit-identical
    * on every JVM/partitioning: output pixel (ox, oy) covers the source
    * rectangle [ox·inW/outW, (ox+1)·inW/outW) × [oy·inH/outH, …); each
    * source pixel contributes its overlap area. Working in units scaled by
    * outW (x) and outH (y) keeps every boundary an integer: the overlap of
    * source pixel sx with output cell ox is
    * min((sx+1)·outW, (ox+1)·inW) − max(sx·outW, ox·inW), and the total
    * weight per output cell is exactly inW·inH, so the final value is one
    * rounded integer division. O(inW·inH) accumulation.
    */
  def resizeArea(img: Gray, outW: Int, outH: Int): Gray = {
    require(outW > 0 && outH > 0, "resizeArea: output dims must be positive")
    val inW = img.width; val inH = img.height
    if (outW == inW && outH == inH) return img
    val acc = new Array[Long](outW * outH)
    var sy = 0
    while (sy < inH) {
      val y0 = sy.toLong * outH; val y1 = y0 + outH // source row in scaled units
      var oy = (y0 / inH).toInt
      while (oy < outH && oy.toLong * inH < y1) {
        val oyLo = oy.toLong * inH; val oyHi = oyLo + inH
        val ovy = math.min(y1, oyHi) - math.max(y0, oyLo)
        if (ovy > 0) {
          var sx = 0
          while (sx < inW) {
            val x0 = sx.toLong * outW; val x1 = x0 + outW
            val p = img.pixels(sy * inW + sx) & 0xff
            var ox = (x0 / inW).toInt
            while (ox < outW && ox.toLong * inW < x1) {
              val oxLo = ox.toLong * inW; val oxHi = oxLo + inW
              val ovx = math.min(x1, oxHi) - math.max(x0, oxLo)
              if (ovx > 0) acc(oy * outW + ox) += p * ovx * ovy
              ox += 1
            }
            sx += 1
          }
        }
        oy += 1
      }
      sy += 1
    }
    val den = inW.toLong * inH
    val out = new Array[Byte](outW * outH)
    var i = 0
    while (i < out.length) {
      out(i) = ((acc(i) + den / 2) / den).toByte
      i += 1
    }
    Gray(outW, outH, out)
  }

  /** Decode a PNG to grayscale. Returns None (never throws) for anything
    * outside the supported profile or any malformed byte — the corrupt-
    * media contract of the multimodal operators.
    */
  def decode(bytes: Array[Byte]): Option[Gray] = {
    try decodeUnsafe(bytes)
    catch { case scala.util.control.NonFatal(_) => None }
  }

  private def decodeUnsafe(bytes: Array[Byte]): Option[Gray] = {
    if (bytes == null || bytes.length < 8 ||
      !bytes.take(8).sameElements(Signature)) return None
    var pos = 8
    var w = 0; var h = 0; var colorType = -1
    var sawIhdr = false; var sawIend = false
    val idat = new ByteArrayOutputStream()
    while (pos + 8 <= bytes.length && !sawIend) {
      val len = readBe32(bytes, pos)
      if (len < 0 || pos + 12 + len > bytes.length) return None
      val tag = new String(bytes, pos + 4, 4, "US-ASCII")
      val dataPos = pos + 8
      tag match {
        case "IHDR" =>
          if (len != 13) return None
          w = readBe32(bytes, dataPos); h = readBe32(bytes, dataPos + 4)
          val depth = bytes(dataPos + 8); colorType = bytes(dataPos + 9)
          val compression = bytes(dataPos + 10)
          val filterMethod = bytes(dataPos + 11)
          val interlace = bytes(dataPos + 12)
          if (w <= 0 || h <= 0 || depth != 8 ||
            (colorType != 0 && colorType != 2) ||
            compression != 0 || filterMethod != 0 || interlace != 0) return None
          sawIhdr = true
        case "IDAT" => idat.write(bytes, dataPos, len)
        case "IEND" => sawIend = true
        case _ => // ancillary chunk — skip
      }
      pos = dataPos + len + 4 // skip CRC
    }
    if (!sawIhdr || idat.size() == 0) return None
    val bpp = if (colorType == 2) 3 else 1
    val stride = w * bpp
    val raw = inflate(idat.toByteArray, (stride + 1) * h)
    if (raw.length != (stride + 1) * h) return None

    // Undo scanline filters (PNG spec 9.2): recon byte from left (a),
    // up (b), upper-left (c) neighbours.
    val recon = new Array[Byte](stride * h)
    var y = 0
    while (y < h) {
      val filter = raw(y * (stride + 1)) & 0xff
      if (filter > 4) return None
      val rowIn = y * (stride + 1) + 1
      val rowOut = y * stride
      var x = 0
      while (x < stride) {
        val a = if (x >= bpp) recon(rowOut + x - bpp) & 0xff else 0
        val b = if (y > 0) recon(rowOut - stride + x) & 0xff else 0
        val c = if (y > 0 && x >= bpp) recon(rowOut - stride + x - bpp) & 0xff else 0
        val cur = raw(rowIn + x) & 0xff
        val v = filter match {
          case 0 => cur
          case 1 => cur + a
          case 2 => cur + b
          case 3 => cur + (a + b) / 2
          case 4 => cur + paeth(a, b, c)
        }
        recon(rowOut + x) = (v & 0xff).toByte
        x += 1
      }
      y += 1
    }

    val gray =
      if (colorType == 0) recon
      else {
        // ITU-R BT.601 integer luma — same coefficients every public
        // RGB→gray conversion uses.
        val g = new Array[Byte](w * h)
        var i = 0
        while (i < w * h) {
          val r = recon(3 * i) & 0xff
          val gg = recon(3 * i + 1) & 0xff
          val b = recon(3 * i + 2) & 0xff
          g(i) = ((r * 299 + gg * 587 + b * 114) / 1000).toByte
          i += 1
        }
        g
      }
    Some(Gray(w, h, gray))
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def inflate(data: Array[Byte], expected: Int): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new ByteArrayOutputStream(expected)
    val buf = new Array[Byte](8192)
    while (!inf.finished() && !inf.needsInput()) {
      val n = inf.inflate(buf)
      if (n == 0 && !inf.finished()) return Array.emptyByteArray
      out.write(buf, 0, n)
    }
    inf.end()
    out.toByteArray
  }
}
