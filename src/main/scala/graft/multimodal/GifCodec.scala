package graft.multimodal

import scala.collection.mutable.ArrayBuffer

/** Pure-JVM GIF codec (GIF87a/GIF89a, public wire format) — the third
  * real image decoder behind the [[Multimodal.decodeImage]] seam, after
  * [[PngCodec]] and [[JpegCodec]]: the reference OCRs arbitrary fetched
  * tweet media (`Ranking Model/src/main/java/Main/SolrIndexer.java:115-129`),
  * and GIF is the remaining common still-image wire format that until now
  * was header-parsed only ([[Multimodal.gifMeta]]).
  *
  * Decoder: first image frame of an 87a/89a stream — logical screen
  * descriptor, global/local color tables, extension-block skipping,
  * interlaced or sequential LZW data (variable 3–12-bit codes, LSB-first,
  * dictionary resets via clear codes, deferred-clear streams where the
  * table saturates at 4096 tolerated). Palette entries collapse to luma
  * by the integer ITU-R BT.601 rule `(299r + 587g + 114b + 500) / 1000`
  * — pure integer arithmetic, bit-reproducible everywhere — returned as
  * a [[PngCodec.Gray]]. Malformed or truncated bytes return None
  * (corrupt media never fails a job — the [[Multimodal.decodePixels]]
  * contract).
  *
  * Encoder: GIF89a with a 256-entry grayscale table (index i = gray i,
  * so encode→decode round-trips EXACTLY: the BT.601 rule maps (i,i,i)
  * back to i), real LZW compression, optional interlacing — the
  * deterministic fixture generator (no image libraries ship in this
  * container) and the third wire format in `q_image_dedup`'s mixed
  * library, where its lossless plane must hash-merge with the PNG copy
  * of the same asset.
  */
object GifCodec {
  import PngCodec.Gray

  // ---- decode -----------------------------------------------------------

  /** First frame of a GIF87a/89a stream as grayscale, else None. */
  def decode(bytes: Array[Byte]): Option[Gray] =
    try decodeUnsafe(bytes)
    catch { case _: RuntimeException | _: ArrayIndexOutOfBoundsException => None }

  /** One composited animation frame: the full logical-screen canvas as it
    * would be displayed, plus the frame's delay in centiseconds.
    */
  final case class Frame(image: Gray, delayCs: Int)

  /** All frames of an animated GIF (bounded by `maxFrames`), composited
    * per the GIF89a animation model: frame rects painted onto the
    * logical-screen canvas honoring transparency and disposal methods
    * 0/1 (leave), 2 (restore rect to background) and 3 (restore to the
    * pre-frame canvas). Every snapshot is the full canvas — what a
    * player shows — so frame content is a pure function of the stream.
    * Returns None on malformed bytes; a still GIF yields one frame.
    */
  def decodeFrames(bytes: Array[Byte], maxFrames: Int = 256): Option[Vector[Frame]] =
    try decodeFramesUnsafe(bytes, maxFrames)
    catch { case _: RuntimeException | _: ArrayIndexOutOfBoundsException => None }

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)

  /** Color table → luma table by integer BT.601. */
  private def lumas(b: Array[Byte], pos: Int, n: Int): Array[Byte] =
    Array.tabulate[Byte](n) { i =>
      val p = pos + 3 * i
      ((299 * u8(b, p) + 587 * u8(b, p + 1) + 114 * u8(b, p + 2) + 500) / 1000).toByte
    }

  private def decodeUnsafe(b: Array[Byte]): Option[Gray] = {
    if (b == null || b.length < 14) return None
    val sig = new String(b, 0, 6, java.nio.charset.StandardCharsets.US_ASCII)
    if (sig != "GIF87a" && sig != "GIF89a") return None
    val packed = u8(b, 10)
    var pos = 13
    var palette: Array[Byte] = null
    if ((packed & 0x80) != 0) {
      val n = 1 << ((packed & 7) + 1)
      palette = lumas(b, pos, n)
      pos += 3 * n
    }
    while (pos < b.length) {
      u8(b, pos) match {
        case 0x3b => return None // trailer before any image frame
        case 0x21 => // extension: label byte, then sub-blocks to terminator
          pos += 2
          while (u8(b, pos) != 0) pos += 1 + u8(b, pos)
          pos += 1
        case 0x2c =>
          val iw = le16(b, pos + 5); val ih = le16(b, pos + 7)
          val ip = u8(b, pos + 9)
          pos += 10
          var pal = palette
          if ((ip & 0x80) != 0) { // local color table overrides
            val n = 1 << ((ip & 7) + 1)
            pal = lumas(b, pos, n)
            pos += 3 * n
          }
          if (pal == null || iw <= 0 || ih <= 0) return None
          val minCode = u8(b, pos); pos += 1
          if (minCode < 2 || minCode > 8) return None
          // concatenate the data sub-blocks
          val data = new ArrayBuffer[Byte](b.length - pos)
          while (u8(b, pos) != 0) {
            val n = u8(b, pos)
            data ++= b.slice(pos + 1, pos + 1 + n)
            pos += 1 + n
          }
          val idx = lzwDecode(data.toArray, minCode, iw * ih).getOrElse(return None)
          val px = new Array[Byte](iw * ih)
          var i = 0
          while (i < px.length) {
            val v = idx(i) & 0xff
            px(i) = if (v < pal.length) pal(v) else return None
            i += 1
          }
          return Some(Gray(iw, ih,
            if ((ip & 0x40) != 0) deinterlace(px, iw, ih) else px))
        case _ => return None
      }
    }
    None
  }

  private def decodeFramesUnsafe(b: Array[Byte],
                                 maxFrames: Int): Option[Vector[Frame]] = {
    if (b == null || b.length < 14) return None
    val sig = new String(b, 0, 6, java.nio.charset.StandardCharsets.US_ASCII)
    if (sig != "GIF87a" && sig != "GIF89a") return None
    val sw = le16(b, 6); val sh = le16(b, 8)
    if (sw <= 0 || sh <= 0) return None
    val packed = u8(b, 10)
    val bgIdx = u8(b, 11)
    var pos = 13
    var global: Array[Byte] = null
    if ((packed & 0x80) != 0) {
      val n = 1 << ((packed & 7) + 1)
      global = lumas(b, pos, n)
      pos += 3 * n
    }
    val bg: Byte = if (global != null && bgIdx < global.length) global(bgIdx) else 0
    val canvas = Array.fill[Byte](sw * sh)(bg)
    val frames = Vector.newBuilder[Frame]
    var nFrames = 0
    // pending graphic-control state (applies to the NEXT image block)
    var delayCs = 0; var disposal = 0; var transIdx = -1
    while (pos < b.length && nFrames < maxFrames) {
      u8(b, pos) match {
        case 0x3b =>
          val out = frames.result()
          return if (out.nonEmpty) Some(out) else None
        case 0x21 =>
          if (u8(b, pos + 1) == 0xf9 && u8(b, pos + 2) >= 4) { // GCE
            val gp = u8(b, pos + 3)
            disposal = (gp >> 2) & 7
            delayCs = le16(b, pos + 4)
            transIdx = if ((gp & 1) != 0) u8(b, pos + 6) else -1
          }
          pos += 2
          while (u8(b, pos) != 0) pos += 1 + u8(b, pos)
          pos += 1
        case 0x2c =>
          val left = le16(b, pos + 1); val top = le16(b, pos + 3)
          val iw = le16(b, pos + 5); val ih = le16(b, pos + 7)
          val ip = u8(b, pos + 9)
          pos += 10
          var pal = global
          if ((ip & 0x80) != 0) {
            val n = 1 << ((ip & 7) + 1)
            pal = lumas(b, pos, n)
            pos += 3 * n
          }
          if (pal == null || iw <= 0 || ih <= 0 ||
            left + iw > sw || top + ih > sh) return None
          val minCode = u8(b, pos); pos += 1
          if (minCode < 2 || minCode > 8) return None
          val data = new ArrayBuffer[Byte](b.length - pos)
          while (u8(b, pos) != 0) {
            val n = u8(b, pos)
            data ++= b.slice(pos + 1, pos + 1 + n)
            pos += 1 + n
          }
          pos += 1
          var idx = lzwDecode(data.toArray, minCode, iw * ih).getOrElse(return None)
          if ((ip & 0x40) != 0) idx = deinterlace(idx, iw, ih)
          val before = if (disposal == 3) canvas.clone() else null
          var y = 0
          while (y < ih) {
            var x = 0
            while (x < iw) {
              val v = idx(y * iw + x) & 0xff
              if (v != transIdx) {
                if (v >= pal.length) return None
                canvas((top + y) * sw + left + x) = pal(v)
              }
              x += 1
            }
            y += 1
          }
          frames += Frame(Gray(sw, sh, canvas.clone()), delayCs)
          nFrames += 1
          disposal match {
            case 2 => // restore the frame rect to the background color
              var yy = 0
              while (yy < ih) {
                java.util.Arrays.fill(canvas, (top + yy) * sw + left,
                  (top + yy) * sw + left + iw, bg)
                yy += 1
              }
            case 3 => System.arraycopy(before, 0, canvas, 0, canvas.length)
            case _ => ()
          }
          delayCs = 0; disposal = 0; transIdx = -1
        case _ => return None
      }
    }
    val out = frames.result()
    if (out.nonEmpty) Some(out) else None
  }

  /** GIF's 4-pass row interleave → sequential rows. */
  private def deinterlace(px: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](px.length)
    val passes = Array((0, 8), (4, 8), (2, 4), (1, 2))
    var src = 0
    for ((start, step) <- passes; y <- start until h by step) {
      System.arraycopy(px, src * w, out, y * w, w)
      src += 1
    }
    out
  }

  /** Variable-width LSB-first LZW per the GIF89a spec appendix. Returns
    * exactly `expected` index bytes, or None on a malformed stream.
    */
  private def lzwDecode(data: Array[Byte], minCode: Int,
                        expected: Int): Option[Array[Byte]] = {
    val clear = 1 << minCode
    val end = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4097)
    var next = clear + 2
    var width = minCode + 1
    var i = 0
    while (i < clear) { prefix(i) = -1; suffix(i) = i.toByte; i += 1 }

    val out = new Array[Byte](expected)
    var outPos = 0
    var bitPos = 0
    val nBits = data.length * 8
    var prev = -1
    var firstOfPrev = 0

    def read(): Int = {
      if (bitPos + width > nBits) return -1
      var v = 0; var k = 0
      while (k < width) {
        val bp = bitPos + k
        if ((data(bp >> 3) >> (bp & 7) & 1) != 0) v |= 1 << k
        k += 1
      }
      bitPos += width
      v
    }

    while (outPos < expected) {
      val code = read()
      if (code < 0 || code == end) {
        // truncated or early end: a well-formed stream fills `expected`
        return if (outPos == expected) Some(out) else None
      } else if (code == clear) {
        next = clear + 2; width = minCode + 1; prev = -1
      } else if (prev == -1) {
        if (code >= clear) return None // first code after clear must be a root
        out(outPos) = suffix(code); outPos += 1
        prev = code; firstOfPrev = code
      } else {
        if (code > next || (code == next && next >= 4096)) return None
        // expand into the stack (root-last), handling the code==next case
        var sp = 0
        var cur = code
        if (code == next) { stack(sp) = firstOfPrev.toByte; sp += 1; cur = prev }
        while (cur >= clear + 2) { stack(sp) = suffix(cur); sp += 1; cur = prefix(cur) }
        val first = cur
        stack(sp) = suffix(cur); sp += 1
        if (outPos + sp > expected) return None
        while (sp > 0) { sp -= 1; out(outPos) = stack(sp); outPos += 1 }
        if (next < 4096) {
          prefix(next) = prev; suffix(next) = first.toByte; next += 1
          if (next == (1 << width) && width < 12) width += 1
        }
        prev = code; firstOfPrev = first
      }
    }
    Some(out)
  }

  // ---- encode -----------------------------------------------------------

  /** Grayscale GIF89a: 256-entry gray table, index i = gray i — lossless. */
  def encodeGray(img: Gray, interlaced: Boolean = false): Array[Byte] = {
    require(img.width > 0 && img.width < 65536 &&
      img.height > 0 && img.height < 65536, "gif: dims out of range")
    val palette = Array.tabulate[Byte](768)(i => (i / 3).toByte)
    val rows =
      if (!interlaced) img.pixels
      else {
        val out = new Array[Byte](img.pixels.length)
        val passes = Array((0, 8), (4, 8), (2, 4), (1, 2))
        var dst = 0
        for ((start, step) <- passes; y <- start until img.height by step) {
          System.arraycopy(img.pixels, y * img.width, out, dst * img.width, img.width)
          dst += 1
        }
        out
      }
    encodeIndexed(img.width, img.height, palette, rows, interlaced)
  }

  /** Full-frame single-image GIF89a from an explicit 256-entry RGB table
    * and index bytes (rows already in wire order). Exposed to the spec so
    * non-gray palettes can exercise the decoder's luma rule with bytes of
    * controlled provenance.
    */
  private[multimodal] def encodeIndexed(w: Int, h: Int, palette: Array[Byte],
                                        indices: Array[Byte],
                                        interlaced: Boolean): Array[Byte] = {
    require(palette.length == 768, "gif: palette must be 256 RGB entries")
    require(indices.length == w * h, "gif: index plane size mismatch")
    val out = new ArrayBuffer[Byte](indices.length / 2 + 800)
    out ++= "GIF89a".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    out += (w & 0xff).toByte += ((w >> 8) & 0xff).toByte
    out += (h & 0xff).toByte += ((h >> 8) & 0xff).toByte
    out += 0xf7.toByte += 0.toByte += 0.toByte // GCT, 256 entries; bg 0; aspect 0
    out ++= palette
    out += 0x2c.toByte
    out += 0.toByte += 0.toByte += 0.toByte += 0.toByte // left, top
    out += (w & 0xff).toByte += ((w >> 8) & 0xff).toByte
    out += (h & 0xff).toByte += ((h >> 8) & 0xff).toByte
    out += (if (interlaced) 0x40 else 0x00).toByte
    out += 8.toByte // LZW minimum code size
    lzwEncode(indices, 8, out)
    out += 0.toByte // block terminator
    out += 0x3b.toByte
    out.toArray
  }

  /** One frame for the low-level animation writer. `transparentIdx` < 0
    * means opaque; `disposal` per GIF89a (0/1 leave, 2 background, 3 prev).
    */
  private[multimodal] final case class RawFrame(left: Int, top: Int, w: Int,
                                                h: Int, indices: Array[Byte],
                                                delayCs: Int, disposal: Int,
                                                transparentIdx: Int)

  /** Grayscale animated GIF89a: every frame a full-screen plane with the
    * same dims, disposal "leave" — lossless per frame, so
    * [[decodeFrames]] round-trips the exact pixel planes. The fixture
    * generator for the frame-sampling operator.
    */
  def encodeGrayAnimation(frames: Seq[Gray], delayCs: Int): Array[Byte] = {
    require(frames.nonEmpty, "gif: animation needs at least one frame")
    val w = frames.head.width; val h = frames.head.height
    require(frames.forall(f => f.width == w && f.height == h),
      "gif: animation frames must share dimensions")
    val palette = Array.tabulate[Byte](768)(i => (i / 3).toByte)
    encodeAnimation(w, h, palette, frames.map(f =>
      RawFrame(0, 0, w, h, f.pixels, delayCs, disposal = 0, transparentIdx = -1)))
  }

  /** Low-level animation writer: explicit screen dims, 256-entry RGB
    * table, per-frame rects/disposal/transparency — lets specs build
    * compositing cases (partial updates, disposal 2/3, transparent holes)
    * with bytes of controlled provenance.
    */
  private[multimodal] def encodeAnimation(sw: Int, sh: Int,
                                          palette: Array[Byte],
                                          frames: Seq[RawFrame]): Array[Byte] = {
    require(palette.length == 768, "gif: palette must be 256 RGB entries")
    require(sw > 0 && sw < 65536 && sh > 0 && sh < 65536, "gif: dims out of range")
    val out = new ArrayBuffer[Byte](frames.map(_.indices.length).sum / 2 + 800)
    out ++= "GIF89a".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    out += (sw & 0xff).toByte += ((sw >> 8) & 0xff).toByte
    out += (sh & 0xff).toByte += ((sh >> 8) & 0xff).toByte
    out += 0xf7.toByte += 0.toByte += 0.toByte
    out ++= palette
    for (f <- frames) {
      require(f.indices.length == f.w * f.h, "gif: frame plane size mismatch")
      require(f.left + f.w <= sw && f.top + f.h <= sh, "gif: frame rect out of screen")
      // graphic control extension
      out += 0x21.toByte += 0xf9.toByte += 4.toByte
      val gp = ((f.disposal & 7) << 2) | (if (f.transparentIdx >= 0) 1 else 0)
      out += gp.toByte
      out += (f.delayCs & 0xff).toByte += ((f.delayCs >> 8) & 0xff).toByte
      out += (if (f.transparentIdx >= 0) f.transparentIdx else 0).toByte
      out += 0.toByte
      // image descriptor + data
      out += 0x2c.toByte
      out += (f.left & 0xff).toByte += ((f.left >> 8) & 0xff).toByte
      out += (f.top & 0xff).toByte += ((f.top >> 8) & 0xff).toByte
      out += (f.w & 0xff).toByte += ((f.w >> 8) & 0xff).toByte
      out += (f.h & 0xff).toByte += ((f.h >> 8) & 0xff).toByte
      out += 0x00.toByte
      out += 8.toByte
      lzwEncode(f.indices, 8, out)
      out += 0.toByte
    }
    out += 0x3b.toByte
    out.toArray
  }

  /** LZW-compress `data` and append as ≤255-byte sub-blocks. Code-width
    * bumps run one dictionary slot later than the decoder's (the encoder
    * is one entry ahead at equal stream positions — the classic GIF/TIFF
    * "early change" distinction, GIF side).
    */
  private def lzwEncode(data: Array[Byte], minCode: Int,
                        out: ArrayBuffer[Byte]): Unit = {
    val clear = 1 << minCode
    val end = clear + 1
    var width = minCode + 1
    var next = clear + 2
    val dict = new java.util.HashMap[Integer, Integer](8192)

    val block = new Array[Byte](255)
    var blockLen = 0
    var bitBuf = 0
    var bitCnt = 0
    def putByte(v: Byte): Unit = {
      block(blockLen) = v; blockLen += 1
      if (blockLen == 255) {
        out += 255.toByte
        out ++= block
        blockLen = 0
      }
    }
    def emit(code: Int): Unit = {
      bitBuf |= code << bitCnt
      bitCnt += width
      while (bitCnt >= 8) {
        putByte((bitBuf & 0xff).toByte)
        bitBuf >>>= 8; bitCnt -= 8
      }
    }

    emit(clear)
    if (data.nonEmpty) {
      var prev: Int = data(0) & 0xff
      var i = 1
      while (i < data.length) {
        val c = data(i) & 0xff
        val key = Integer.valueOf((prev << 8) | c)
        val hit = dict.get(key)
        if (hit != null) prev = hit.intValue()
        else {
          emit(prev)
          if (next < 4096) {
            dict.put(key, Integer.valueOf(next)); next += 1
            if (next == (1 << width) + 1 && width < 12) width += 1
          } else { // table full: reset so both sides stay in lockstep
            emit(clear)
            dict.clear(); next = clear + 2; width = minCode + 1
          }
          prev = c
        }
        i += 1
      }
      emit(prev)
    }
    emit(end)
    if (bitCnt > 0) putByte((bitBuf & 0xff).toByte)
    if (blockLen > 0) {
      out += blockLen.toByte
      out ++= block.take(blockLen)
    }
  }
}
