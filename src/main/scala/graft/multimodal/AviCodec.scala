package graft.multimodal

import scala.collection.mutable.ArrayBuffer

/** Pure-JVM AVI (RIFF) container codec for Motion-JPEG video streams —
  * the VIDEO sibling of [[GifCodec]]: where the GIF path proves the
  * frame-sampling pipeline over an animation format, this one proves it
  * over a real video CONTAINER + per-frame codec split, the structure
  * every production video format shares. MJPEG is the one video codec a
  * container can carry whose frames are fully decodable with the
  * engine's existing [[JpegCodec]] (each frame is an independent
  * baseline JPEG — no inter-frame prediction), so the decode path here
  * is REAL end-to-end: RIFF walk → frame chunks → T.81 entropy decode →
  * gray pixels. MP4/H.264 remains header-parsed ([[Multimodal.mp4Boxes]])
  * because an H.264 decoder is out of scope for this container; the
  * operator seam ([[Multimodal.videoFrames]]) takes one as a drop-in.
  *
  * Wire format (public: Microsoft AVI RIFF spec + Open DML AVI 1.02):
  * `RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf)) LIST('movi'
  * 00dc…) idx1)`. The decoder is a tolerant chunk walk: unknown chunks
  * skip by size, odd sizes pad to even (RIFF rule), truncated tails
  * yield the frames parsed so far. Frames arrive as `00dc`/`00db`
  * chunks of stream 0.
  *
  * MJPEG convention handled for real: Open DML permits AVI JPEG frames
  * to OMIT their Huffman tables (every compliant decoder must assume the
  * Annex K set), and many hardware muxers do. [[ensureDht]] splices
  * [[JpegCodec.StandardDhtSegments]] before the scan when a frame
  * carries no DHT marker — spec-covered by stripping the tables from an
  * encoded frame and decoding it back bit-identically.
  *
  * The encoder is the deterministic fixture generator (same rationale as
  * [[JpegCodec]]'s): grayscale frames via `JpegCodec.encodeGray` wrapped
  * in a minimal spec-correct AVI (avih + strh/strf + movi + idx1), so
  * specs and oracles control the provenance of every byte.
  */
object AviCodec {

  /** Header-level stream info (cheap: no frame decode). */
  final case class AviInfo(width: Int, height: Int, microSecPerFrame: Long,
                           totalFrames: Int, handler: String, streams: Int)

  // ---- little-endian helpers ------------------------------------------

  private def u32(b: Array[Byte], o: Int): Long =
    if (o + 4 > b.length) -1L
    else ((b(o) & 0xffL)) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  private def fourCc(b: Array[Byte], o: Int): String =
    if (o + 4 > b.length) ""
    else new String(Array(b(o), b(o + 1), b(o + 2), b(o + 3)), "ISO-8859-1")

  private def putU32(out: ArrayBuffer[Byte], v: Long): Unit = {
    out += (v & 0xff).toByte; out += ((v >> 8) & 0xff).toByte
    out += ((v >> 16) & 0xff).toByte; out += ((v >> 24) & 0xff).toByte
  }

  private def putU16(out: ArrayBuffer[Byte], v: Int): Unit = {
    out += (v & 0xff).toByte; out += ((v >> 8) & 0xff).toByte
  }

  private def putFcc(out: ArrayBuffer[Byte], s: String): Unit =
    s.getBytes("ISO-8859-1").foreach(out += _)

  // ---- encoder ---------------------------------------------------------

  /** Wrap grayscale frames as an MJPEG AVI. `quality` 100 with flat
    * frames gives pixel-exact round trips (the JpegCodec unit-quant
    * property), which is what the analytic oracles lean on.
    */
  def encodeMjpeg(frames: Seq[PngCodec.Gray], fps: Int = 10,
                  quality: Int = 100): Array[Byte] = {
    require(frames.nonEmpty, "avi: need at least one frame")
    require(fps > 0, "avi: fps must be positive")
    val w = frames.head.width; val h = frames.head.height
    require(frames.forall(f => f.width == w && f.height == h),
      "avi: all frames must share dimensions")
    val jpegs = frames.map(f => JpegCodec.encodeGray(f, quality))
    val maxJpeg = jpegs.map(_.length).max

    def list(subtype: String)(body: ArrayBuffer[Byte] => Unit): Array[Byte] = {
      val b = ArrayBuffer.empty[Byte]
      body(b)
      val out = ArrayBuffer.empty[Byte]
      putFcc(out, "LIST"); putU32(out, b.length + 4L); putFcc(out, subtype)
      out ++= b
      out.toArray
    }
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val out = ArrayBuffer.empty[Byte]
      putFcc(out, id); putU32(out, body.length.toLong)
      out ++= body
      if (body.length % 2 == 1) out += 0 // RIFF even-size padding
      out.toArray
    }

    val avih = {
      val b = ArrayBuffer.empty[Byte]
      putU32(b, 1000000L / fps)      // dwMicroSecPerFrame
      putU32(b, maxJpeg.toLong * fps) // dwMaxBytesPerSec
      putU32(b, 0)                   // dwPaddingGranularity
      putU32(b, 0x10)                // dwFlags: AVIF_HASINDEX
      putU32(b, frames.length.toLong) // dwTotalFrames
      putU32(b, 0)                   // dwInitialFrames
      putU32(b, 1)                   // dwStreams
      putU32(b, maxJpeg.toLong)      // dwSuggestedBufferSize
      putU32(b, w.toLong); putU32(b, h.toLong)
      (0 until 4).foreach(_ => putU32(b, 0)) // dwReserved
      b.toArray
    }
    val strh = {
      val b = ArrayBuffer.empty[Byte]
      putFcc(b, "vids"); putFcc(b, "MJPG")
      putU32(b, 0)                   // dwFlags
      putU16(b, 0); putU16(b, 0)     // wPriority, wLanguage
      putU32(b, 0)                   // dwInitialFrames
      putU32(b, 1)                   // dwScale
      putU32(b, fps.toLong)          // dwRate (fps = rate/scale)
      putU32(b, 0)                   // dwStart
      putU32(b, frames.length.toLong) // dwLength (in frames)
      putU32(b, maxJpeg.toLong)      // dwSuggestedBufferSize
      putU32(b, 0xFFFFFFFFL)         // dwQuality (default)
      putU32(b, 0)                   // dwSampleSize (0: one sample = one frame)
      putU16(b, 0); putU16(b, 0); putU16(b, w); putU16(b, h) // rcFrame
      b.toArray
    }
    val strf = {
      val b = ArrayBuffer.empty[Byte]
      putU32(b, 40)                  // biSize
      putU32(b, w.toLong); putU32(b, h.toLong)
      putU16(b, 1); putU16(b, 24)    // biPlanes, biBitCount
      putFcc(b, "MJPG")              // biCompression
      putU32(b, w.toLong * h * 3)    // biSizeImage
      putU32(b, 0); putU32(b, 0); putU32(b, 0); putU32(b, 0)
      b.toArray
    }
    val hdrl = list("hdrl") { b =>
      b ++= chunk("avih", avih)
      b ++= list("strl") { s => s ++= chunk("strh", strh); s ++= chunk("strf", strf) }
    }
    // movi chunks + idx1 offsets (relative to the 'movi' fourcc, the
    // convention every mainstream demuxer accepts)
    val moviBody = ArrayBuffer.empty[Byte]
    val offsets = jpegs.map { j =>
      val off = moviBody.length + 4L // +4: past the 'movi' fourcc
      moviBody ++= chunk("00dc", j)
      (off, j.length.toLong)
    }
    val movi = {
      val out = ArrayBuffer.empty[Byte]
      putFcc(out, "LIST"); putU32(out, moviBody.length + 4L); putFcc(out, "movi")
      out ++= moviBody
      out.toArray
    }
    val idx1 = {
      val b = ArrayBuffer.empty[Byte]
      offsets.foreach { case (off, len) =>
        putFcc(b, "00dc"); putU32(b, 0x10) // AVIIF_KEYFRAME
        putU32(b, off); putU32(b, len)
      }
      b.toArray
    }

    val root = ArrayBuffer.empty[Byte]
    root ++= hdrl
    root ++= movi
    root ++= chunk("idx1", idx1)
    val out = ArrayBuffer.empty[Byte]
    putFcc(out, "RIFF"); putU32(out, root.length + 4L); putFcc(out, "AVI ")
    out ++= root
    out.toArray
  }

  // ---- decoder ---------------------------------------------------------

  def isAvi(b: Array[Byte]): Boolean =
    b != null && b.length >= 12 && fourCc(b, 0) == "RIFF" && fourCc(b, 8) == "AVI "

  /** Header info from the hdrl list; None when not an AVI / no avih. */
  def parseInfo(bytes: Array[Byte]): Option[AviInfo] =
    try parseInfoUnsafe(bytes) catch { case _: Exception => None }

  private def parseInfoUnsafe(b: Array[Byte]): Option[AviInfo] = {
    if (!isAvi(b)) return None
    var info: Option[AviInfo] = None
    var handler = ""
    def walk(from: Int, to: Int): Unit = {
      var o = from
      while (o + 8 <= to && o + 8 <= b.length) {
        val id = fourCc(b, o)
        val size = u32(b, o + 4)
        if (size < 0) return
        val body = o + 8
        val end = math.min(to, math.min(b.length.toLong, body + size).toInt)
        if (id == "LIST" && body + 4 <= end) walk(body + 4, end)
        else if (id == "strh" && body + 8 <= end && fourCc(b, body) == "vids")
          handler = fourCc(b, body + 4)
        else if (id == "avih" && body + 40 <= end) {
          info = Some(AviInfo(
            width = u32(b, body + 32).toInt, height = u32(b, body + 36).toInt,
            microSecPerFrame = u32(b, body), totalFrames = u32(b, body + 16).toInt,
            handler = handler, streams = u32(b, body + 24).toInt))
        }
        // a declared size in [2^31, 2^32) turns size.toInt negative and
        // would walk o backwards forever — advance strictly or bail
        // (corrupt media must never HANG the job either)
        val next = body.toLong + size + (size & 1L)
        if (next <= o || next > Int.MaxValue) return
        o = next.toInt
      }
    }
    walk(12, b.length)
    // handler is parsed after avih in stream order; patch it in
    info.map(_.copy(handler = handler))
  }

  /** Splice the standard Annex K Huffman tables before the scan when the
    * frame has none (the Open DML MJPEG convention). No-op when a DHT
    * marker is present.
    */
  def ensureDht(jpeg: Array[Byte]): Array[Byte] = {
    var o = 2 // past SOI
    var sosAt = -1
    var hasDht = false
    while (o + 4 <= jpeg.length && sosAt < 0) {
      if ((jpeg(o) & 0xff) != 0xFF) return jpeg // not a marker stream we understand
      val m = jpeg(o + 1) & 0xff
      if (m == 0xC4) hasDht = true
      if (m == 0xDA) sosAt = o
      else {
        val len = ((jpeg(o + 2) & 0xff) << 8) | (jpeg(o + 3) & 0xff)
        o += 2 + len
      }
    }
    if (hasDht || sosAt < 0) jpeg
    else {
      val out = new Array[Byte](jpeg.length + JpegCodec.StandardDhtSegments.length)
      System.arraycopy(jpeg, 0, out, 0, sosAt)
      System.arraycopy(JpegCodec.StandardDhtSegments, 0, out, sosAt,
        JpegCodec.StandardDhtSegments.length)
      System.arraycopy(jpeg, sosAt, out,
        sosAt + JpegCodec.StandardDhtSegments.length, jpeg.length - sosAt)
      out
    }
  }

  /** All stream-0 video frames, decoded to gray. None when the container
    * is not an AVI; individual undecodable frames are skipped (corrupt
    * media must never fail the job — [[Multimodal.decodePixels]]
    * contract). Truncated files yield the frames before the cut.
    */
  def decodeFrames(bytes: Array[Byte],
                   maxFrames: Int = 256): Option[Vector[PngCodec.Gray]] =
    try decodeFramesUnsafe(bytes, maxFrames) catch { case _: Exception => None }

  private def decodeFramesUnsafe(b: Array[Byte],
                                 maxFrames: Int): Option[Vector[PngCodec.Gray]] = {
    if (!isAvi(b)) return None
    val frames = Vector.newBuilder[PngCodec.Gray]
    var n = 0
    def walk(from: Int, to: Int, inMovi: Boolean): Unit = {
      var o = from
      while (o + 8 <= to && o + 8 <= b.length && n < maxFrames) {
        val id = fourCc(b, o)
        val size = u32(b, o + 4)
        if (size < 0) return
        val body = o + 8
        val end = math.min(to, math.min(b.length.toLong, body + size).toInt)
        if (id == "LIST" && body + 4 <= end)
          walk(body + 4, end, inMovi || fourCc(b, body) == "movi")
        else if (inMovi && (id == "00dc" || id == "00db") && end > body
            // a truncated payload (declared size past the buffer) is an
            // incomplete frame — skip it rather than decode a partial scan
            && body + size <= math.min(to, b.length)) {
          JpegCodec.decode(ensureDht(b.slice(body, end))).foreach { g =>
            frames += g; n += 1
          }
        }
        // same guard as parseInfoUnsafe: strict forward progress only
        val next = body.toLong + size + (size & 1L)
        if (next <= o || next > Int.MaxValue) return
        o = next.toInt
      }
    }
    walk(12, b.length, inMovi = false)
    Some(frames.result())
  }
}
