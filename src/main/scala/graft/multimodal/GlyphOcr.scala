package graft.multimodal

import scala.collection.mutable.ArrayBuffer

/** A REAL (if deliberately small) OCR engine: classic 5×7 bitmap-font
  * template matching over a decoded grayscale image. Pure JVM, public
  * technique (template matching is the original OCR algorithm; the 5×7
  * dot-matrix glyph shapes are the public-domain character set every
  * HD44780-style display ships).
  *
  * Pipeline, the same stages any OCR runs: binarize (fixed threshold) →
  * vertical-projection segmentation (glyph = run of inked columns, word
  * gap = wide blank run) → per-glyph normalization into the 5×7 cell
  * (best horizontal alignment) → minimum-Hamming-distance classification
  * with a reject threshold ('?' beyond it). Noise-tolerant by
  * construction: a flipped pixel costs 1 of 35 bits.
  *
  * This is the engine behind [[Multimodal.ocrText]] for PNG media (decoded
  * by [[PngCodec]]) — the reference's Tesseract-at-index-time shape
  * (`Ranking Model/src/main/java/Main/SolrIndexer.java:115-129`) with the
  * model swapped for a deterministic public font, so results are exactly
  * reproducible in tests.
  */
object GlyphOcr {

  val GlyphW = 5
  val GlyphH = 7

  /** 5×7 glyph bitmaps, 7 rows of 5 bits, bit 4 = leftmost column. */
  val Font: Map[Char, Array[Int]] = Map(
    'A' -> Array(0x0E, 0x11, 0x11, 0x1F, 0x11, 0x11, 0x11),
    'B' -> Array(0x1E, 0x11, 0x11, 0x1E, 0x11, 0x11, 0x1E),
    'C' -> Array(0x0E, 0x11, 0x10, 0x10, 0x10, 0x11, 0x0E),
    'D' -> Array(0x1C, 0x12, 0x11, 0x11, 0x11, 0x12, 0x1C),
    'E' -> Array(0x1F, 0x10, 0x10, 0x1E, 0x10, 0x10, 0x1F),
    'F' -> Array(0x1F, 0x10, 0x10, 0x1E, 0x10, 0x10, 0x10),
    'G' -> Array(0x0E, 0x11, 0x10, 0x17, 0x11, 0x11, 0x0F),
    'H' -> Array(0x11, 0x11, 0x11, 0x1F, 0x11, 0x11, 0x11),
    'I' -> Array(0x0E, 0x04, 0x04, 0x04, 0x04, 0x04, 0x0E),
    'J' -> Array(0x07, 0x02, 0x02, 0x02, 0x02, 0x12, 0x0C),
    'K' -> Array(0x11, 0x12, 0x14, 0x18, 0x14, 0x12, 0x11),
    'L' -> Array(0x10, 0x10, 0x10, 0x10, 0x10, 0x10, 0x1F),
    'M' -> Array(0x11, 0x1B, 0x15, 0x15, 0x11, 0x11, 0x11),
    'N' -> Array(0x11, 0x11, 0x19, 0x15, 0x13, 0x11, 0x11),
    'O' -> Array(0x0E, 0x11, 0x11, 0x11, 0x11, 0x11, 0x0E),
    'P' -> Array(0x1E, 0x11, 0x11, 0x1E, 0x10, 0x10, 0x10),
    'Q' -> Array(0x0E, 0x11, 0x11, 0x11, 0x15, 0x12, 0x0D),
    'R' -> Array(0x1E, 0x11, 0x11, 0x1E, 0x14, 0x12, 0x11),
    'S' -> Array(0x0F, 0x10, 0x10, 0x0E, 0x01, 0x01, 0x1E),
    'T' -> Array(0x1F, 0x04, 0x04, 0x04, 0x04, 0x04, 0x04),
    'U' -> Array(0x11, 0x11, 0x11, 0x11, 0x11, 0x11, 0x0E),
    'V' -> Array(0x11, 0x11, 0x11, 0x11, 0x11, 0x0A, 0x04),
    'W' -> Array(0x11, 0x11, 0x11, 0x15, 0x15, 0x15, 0x0A),
    'X' -> Array(0x11, 0x11, 0x0A, 0x04, 0x0A, 0x11, 0x11),
    'Y' -> Array(0x11, 0x11, 0x11, 0x0A, 0x04, 0x04, 0x04),
    'Z' -> Array(0x1F, 0x01, 0x02, 0x04, 0x08, 0x10, 0x1F),
    '0' -> Array(0x0E, 0x11, 0x13, 0x15, 0x19, 0x11, 0x0E),
    '1' -> Array(0x04, 0x0C, 0x04, 0x04, 0x04, 0x04, 0x0E),
    '2' -> Array(0x0E, 0x11, 0x01, 0x02, 0x04, 0x08, 0x1F),
    '3' -> Array(0x1F, 0x02, 0x04, 0x02, 0x01, 0x11, 0x0E),
    '4' -> Array(0x02, 0x06, 0x0A, 0x12, 0x1F, 0x02, 0x02),
    '5' -> Array(0x1F, 0x10, 0x1E, 0x01, 0x01, 0x11, 0x0E),
    '6' -> Array(0x06, 0x08, 0x10, 0x1E, 0x11, 0x11, 0x0E),
    '7' -> Array(0x1F, 0x01, 0x02, 0x04, 0x08, 0x08, 0x08),
    '8' -> Array(0x0E, 0x11, 0x11, 0x0E, 0x11, 0x11, 0x0E),
    '9' -> Array(0x0E, 0x11, 0x11, 0x0F, 0x01, 0x02, 0x0C))

  private val Pitch = GlyphW + 1 // one blank column between glyphs

  /** Render `text` (A–Z, 0–9, space; lowercased input is upcased) as a
    * black-on-white grayscale bitmap at the font's native resolution,
    * with a `margin`-pixel white border.
    */
  def render(text: String, margin: Int = 2): PngCodec.Gray = {
    val s = text.toUpperCase
    val w = margin * 2 + math.max(1, s.length * Pitch - 1)
    val h = margin * 2 + GlyphH
    val px = Array.fill[Byte](w * h)(0xFF.toByte) // white
    s.zipWithIndex.foreach { case (ch, i) =>
      Font.get(ch).foreach { rows =>
        var r = 0
        while (r < GlyphH) {
          var c = 0
          while (c < GlyphW) {
            if ((rows(r) & (1 << (GlyphW - 1 - c))) != 0) {
              val x = margin + i * Pitch + c
              val y = margin + r
              px(y * w + x) = 0 // black ink
            }
            c += 1
          }
          r += 1
        }
      }
    }
    PngCodec.Gray(w, h, px)
  }

  /** Render straight to PNG bytes — the synthetic-media generator for
    * OCR tests and demos.
    */
  def renderPng(text: String, margin: Int = 2): Array[Byte] =
    PngCodec.encodeGray(render(text, margin))

  /** Recognize text in a grayscale image. `maxErr` is the Hamming reject
    * threshold per glyph (of 35 template bits); beyond it the glyph reads
    * as '?'. Binarization is followed by a despeckle pass — isolated ink
    * pixels (no ink in the 8-neighbourhood) are dropped, the standard
    * salt-noise cleanup every OCR front-end runs — so scattered bit flips
    * in the background can't merge or split glyph runs.
    */
  def recognize(img: PngCodec.Gray, threshold: Int = 128, maxErr: Int = 8): String = {
    val w = img.width; val h = img.height
    val raw = Array.tabulate(h, w)((y, x) => (img.pixels(y * w + x) & 0xff) < threshold)
    val grid = Array.tabulate(h, w) { (y, x) =>
      raw(y)(x) && (for {
        dy <- -1 to 1; dx <- -1 to 1
        if (dy, dx) != ((0, 0))
        yy = y + dy; xx = x + dx
        if yy >= 0 && yy < h && xx >= 0 && xx < w
      } yield raw(yy)(xx)).exists(identity)
    }

    // Vertical projection: which columns carry any ink.
    val colInk = Array.tabulate(w)(x => (0 until h).exists(y => grid(y)(x)))
    // Glyph rows: all glyphs share a baseline, so the text band is the
    // 7-row window holding the most ink — robust to a stray noise pixel
    // above/below the band, unlike "first row with any ink".
    val rowInk = Array.tabulate(h)(y => grid(y).count(identity))
    if (rowInk.sum == 0) return ""
    val top =
      if (h <= GlyphH) 0
      else (0 to h - GlyphH).maxBy(t => (t until t + GlyphH).map(rowInk).sum)

    // Column runs = candidate glyphs; blank gaps >= spaceGap = word breaks.
    // Pitch leaves 1 blank column between glyphs (up to 3 when both edge
    // columns of the neighbouring glyphs are blank, e.g. "II"); a space
    // adds a full blank cell, so >= 5 blank columns means a word break.
    val spaceGap = GlyphW
    val out = new StringBuilder
    val runs = ArrayBuffer.empty[(Int, Int)] // [start, end) of inked columns
    var x = 0
    while (x < w) {
      if (colInk(x)) {
        val start = x
        while (x < w && colInk(x)) x += 1
        runs += ((start, x))
      } else x += 1
    }
    var prevEnd = -1
    runs.foreach { case (start, end) =>
      if (prevEnd >= 0 && start - prevEnd >= spaceGap) out += ' '
      val runW = end - start
      if (runW <= GlyphW + 2)
        out += classify(grid, w, h, start, end, top, maxErr)
      else {
        // A surviving noise pixel can bridge the blank column between two
        // glyphs and merge their runs. The font is fixed-pitch (k glyphs
        // with single gaps span 6k-1 columns), so split the merged run
        // into its k pitch cells and classify each. Cells are cut one
        // column wider than the glyph so classify's sliding window can
        // absorb the ±1-column misalignment a leading noise column causes;
        // a bridge pixel inside a cell costs its rows as Hamming error.
        val k = math.max(1, math.round((runW + 1) / Pitch.toDouble).toInt)
        (0 until k).foreach { i =>
          val cs = start + i * Pitch
          val ce = math.min(end, cs + Pitch + 1)
          if (cs < end) out += classify(grid, w, h, cs, ce, top, maxErr)
        }
      }
      prevEnd = end
    }
    out.toString
  }

  /** Convenience: decode a PNG and recognize, or "" if undecodable. */
  def recognizePng(bytes: Array[Byte]): String =
    PngCodec.decode(bytes).map(recognize(_)).getOrElse("")

  private def classify(grid: Array[Array[Boolean]], w: Int, h: Int,
                       start: Int, end: Int, top: Int, maxErr: Int): Char = {
    // ink is only read inside THIS run's columns — a sliding window that
    // pokes into the blank gap (or toward a neighbouring run) sees blank.
    def ink(x: Int, y: Int): Boolean =
      x >= start && x < end && top + y < h && grid(top + y)(x)
    val runW = end - start
    // a run much wider than a cell is merged glyphs — unreadable
    if (runW > GlyphW + 2) return '?'
    var best = '?'; var bestDist = Int.MaxValue
    // The template window spans image columns [a, a + 5). A glyph
    // narrower than its cell (I, 1, J…) may sit anywhere inside the
    // window; a noise pixel can widen a run past 5 columns, in which case
    // the window slides along the run and any run ink left outside it
    // counts as error. Both cases are the same sweep of `a`.
    val aLo = math.min(start, end - GlyphW)
    val aHi = math.max(start, end - GlyphW)
    Font.foreach { case (ch, rows) =>
      var a = aLo
      while (a <= aHi) {
        var dist = 0
        var x = start
        while (x < end) { // run ink outside the window = error
          if (x < a || x >= a + GlyphW) {
            var r = 0
            while (r < GlyphH) { if (ink(x, r)) dist += 1; r += 1 }
          }
          x += 1
        }
        var r = 0
        while (r < GlyphH && dist < bestDist) {
          var c = 0
          while (c < GlyphW) {
            val templ = (rows(r) & (1 << (GlyphW - 1 - c))) != 0
            if (templ != ink(a + c, r)) dist += 1
            c += 1
          }
          r += 1
        }
        if (dist < bestDist) { bestDist = dist; best = ch }
        a += 1
      }
    }
    if (bestDist <= maxErr) best else '?'
  }
}
