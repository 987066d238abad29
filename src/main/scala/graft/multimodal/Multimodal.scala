package graft.multimodal

import graft.util.Checkpoints.CheckpointOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / frame-sample
  * operators.
  *
  * The reference's only multimodal op is per-image OCR at index time
  * (`Ranking Model/src/main/java/Main/SolrIndexer.java:115-129`, Tesseract
  * over fetched media URLs) — a driver-side loop. Here the same shape is a
  * distributed column operator.
  *
  * Pixel decode is REAL for PNG ([[PngCodec]]) and baseline JPEG
  * ([[JpegCodec]], pure-JVM T.81 decoder) — the reference's dominant
  * media types; WAV PCM decodes via codegen byte arithmetic. Other
  * formats are header-parsed ([[jpegMeta]]/[[gifMeta]]/[[mp4Boxes]]) and
  * fall back to [[StubCodec]], a deterministic fake behind the same seam,
  * so swapping in a further codec is a one-function change.
  *
  * Scale notes: decode runs via `mapPartitions` (one codec context per
  * partition, not per row); blobs stay off the driver; with media in object
  * storage the binary column holds (uri, byte-range) instead and the decode
  * stage does ranged reads — same operator shape.
  */
object Multimodal {

  /** Typed metadata produced by decode. */
  val MetaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_bytes", LongType),
    StructField("valid", BooleanType)))

  case class MediaMeta(format: String, width: Int, height: Int,
                       n_bytes: Long, valid: Boolean)

  /** The codec seam. A real build binds libjpeg/ffmpeg here; the stub
    * decodes the deterministic fake header written by [[syntheticMedia]]:
    * bytes = "GFT!" ++ [fmt:1] ++ [w:2 BE] ++ [h:2 BE] ++ payload.
    */
  object StubCodec {
    val Formats: Map[Byte, String] = Map[Byte, String](
      1.toByte -> "jpeg", 2.toByte -> "png", 3.toByte -> "wav", 4.toByte -> "mp4")

    def decode(bytes: Array[Byte]): MediaMeta = {
      if (bytes == null || bytes.length < 9 ||
        !(bytes(0) == 'G' && bytes(1) == 'F' && bytes(2) == 'T' && bytes(3) == '!'))
        MediaMeta("unknown", -1, -1, if (bytes == null) 0L else bytes.length.toLong, valid = false)
      else {
        val fmt = Formats.getOrElse(bytes(4), "unknown")
        val w = ((bytes(5) & 0xff) << 8) | (bytes(6) & 0xff)
        val h = ((bytes(7) & 0xff) << 8) | (bytes(8) & 0xff)
        MediaMeta(fmt, w, h, bytes.length.toLong, valid = true)
      }
    }

    /** Fake feature extraction: fixed-dim float vector from byte statistics —
      * deterministic, same signature as a real embedding model.
      */
    def features(bytes: Array[Byte], dim: Int = 8): Array[Float] = {
      val out = new Array[Float](dim)
      if (bytes != null) {
        var i = 0
        while (i < bytes.length) {
          out(i % dim) += (bytes(i) & 0xff) / 255.0f
          i += 1
        }
      }
      out
    }
  }

  /** Decode a binary column into a metadata struct. `mapPartitions`-based:
    * one codec context per partition, rows streamed through it.
    */
  def decodeMeta(df: DataFrame, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(df.schema.fields :+ StructField("meta", MetaSchema))
    val binIdx = df.schema.fieldIndex(binCol)
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      // codec context would be opened here, once per partition
      rows.map { r =>
        val m = StubCodec.decode(r.getAs[Array[Byte]](binIdx))
        Row.fromSeq(r.toSeq :+ Row(m.format, m.width, m.height, m.n_bytes, m.valid))
      }
    }(encoder)
  }

  /** Feature-extract a binary column to a float-array embedding column.
    * `mapPartitions`, not a per-row UDF: a real embedding model's context
    * (weights, session) is loaded once per partition and amortized across
    * the batch — per-call loading is the scale killer.
    */
  def extractFeatures(df: DataFrame, binCol: String, dim: Int = 8): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("features", ArrayType(FloatType)))
    val binIdx = df.schema.fieldIndex(binCol)
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      // embedding-model context would be loaded here, once per partition
      rows.map { r =>
        Row.fromSeq(r.toSeq :+ StubCodec.features(r.getAs[Array[Byte]](binIdx), dim).toSeq)
      }
    }(encoder)
  }

  /** OCR — the reference's only multimodal op (`SolrIndexer.java:115-129`:
    * Tesseract `doOCR` over each tweet's fetched media, output indexed as
    * `tweetMediaText`). For PNG media this is now REAL end-to-end: the
    * blob is decoded by the pure-JVM [[PngCodec]] and read by the
    * [[GlyphOcr]] template matcher — no stub in the path. Blobs in the
    * synthetic `GFT!` header format keep the deterministic stub text, and
    * anything unreadable yields "" (corrupt media never fails the job).
    * Same one-context-per-partition `mapPartitions` shape as
    * [[decodeMeta]] — a heavier model (Tesseract) would be opened once per
    * partition in the same seam. Feeds
    * [[graft.search.Collections.tweetsWithMediaText]].
    */
  /** Decode an image blob by wire format: PNG ([[PngCodec]]), baseline
    * JPEG ([[JpegCodec]], luma plane), or GIF ([[GifCodec]], first frame,
    * palette collapsed to integer-BT.601 luma) — the real-decode surface
    * covers the reference's fetched-tweet-media formats (JPEG/PNG/GIF per
    * `SolrIndexer.java`). Each decoder rejects cleanly on its signature,
    * so the orElse chain costs one header check per miss.
    */
  def decodeImage(bytes: Array[Byte]): Option[PngCodec.Gray] =
    PngCodec.decode(bytes).orElse(JpegCodec.decode(bytes))
      .orElse(GifCodec.decode(bytes))

  def ocrText(df: DataFrame, binCol: String, outCol: String = "media_text"): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField(outCol, StringType))
    val binIdx = df.schema.fieldIndex(binCol)
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      // OCR context (font templates / a Tesseract instance) opened once
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val txt = decodeImage(bytes) match {
          case Some(img) => GlyphOcr.recognize(img)
          case None =>
            val m = StubCodec.decode(bytes)
            if (m.valid) s"stub ocr ${m.format} ${m.width} ${m.height}" else ""
        }
        Row.fromSeq(r.toSeq :+ txt)
      }
    }(encoder)
  }

  /** Deterministic REAL-PNG blob per row: an 8-bit grayscale gradient
    * p(x, y) = (7x + 13y + id) mod 251 encoded by [[PngCodec]] — the
    * fixture generator for image-pipeline tests and the q_thumbnail
    * oracle (dims are pure functions of the id, so SQL can pin them).
    * One encoder per partition, blobs never touch the driver.
    */
  def syntheticPng(df: DataFrame, idCol: String, wCol: String,
                   hCol: String, outCol: String = "png"): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField(outCol, BinaryType))
    val idIdx = df.schema.fieldIndex(idCol)
    val wIdx = df.schema.fieldIndex(wCol)
    val hIdx = df.schema.fieldIndex(hCol)
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val w = r.getLong(wIdx).toInt; val h = r.getLong(hIdx).toInt
        val px = Array.tabulate[Byte](w * h) { i =>
          val x = i % w; val y = i / w
          ((7L * x + 13L * y + id) % 251).toByte
        }
        Row.fromSeq(r.toSeq :+ PngCodec.encodeGray(PngCodec.Gray(w, h, px)))
      }
    }(encoder)
  }

  /** Deterministic REAL-JPEG blob per row: the SAME gradient content as
    * [[syntheticPng]] — p(x, y) = (7x + 13y + id) mod 251 — encoded as
    * baseline JFIF by [[JpegCodec]] at a pinned quality, so mixed-format
    * fixtures carry both wire formats over identical source content.
    * Decoded pixels stay a pure function of (id, w, h, quality): the
    * codec is StrictMath-deterministic, which is what lets hash-checked
    * queries group on md5 of the decoded plane.
    */
  def syntheticJpeg(df: DataFrame, idCol: String, wCol: String,
                    hCol: String, outCol: String = "jpeg",
                    quality: Int = 90): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField(outCol, BinaryType))
    val idIdx = df.schema.fieldIndex(idCol)
    val wIdx = df.schema.fieldIndex(wCol)
    val hIdx = df.schema.fieldIndex(hCol)
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val w = r.getLong(wIdx).toInt; val h = r.getLong(hIdx).toInt
        val px = Array.tabulate[Byte](w * h) { i =>
          val x = i % w; val y = i / w
          ((7L * x + 13L * y + id) % 251).toByte
        }
        Row.fromSeq(r.toSeq :+
          JpegCodec.encodeGray(PngCodec.Gray(w, h, px), quality))
      }
    }(encoder)
  }

  /** Deterministic REAL-GIF blob per row: the SAME gradient content as
    * [[syntheticPng]]/[[syntheticJpeg]] encoded as GIF89a by [[GifCodec]].
    * GIF is LOSSLESS here (grayscale table, index i = gray i), so a GIF
    * copy of an asset must hash-merge with its PNG copy after decode —
    * the cross-format content-identity case in q_image_dedup.
    */
  def syntheticGif(df: DataFrame, idCol: String, wCol: String,
                   hCol: String, outCol: String = "gif"): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField(outCol, BinaryType))
    val idIdx = df.schema.fieldIndex(idCol)
    val wIdx = df.schema.fieldIndex(wCol)
    val hIdx = df.schema.fieldIndex(hCol)
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val w = r.getLong(wIdx).toInt; val h = r.getLong(hIdx).toInt
        val px = Array.tabulate[Byte](w * h) { i =>
          val x = i % w; val y = i / w
          ((7L * x + 13L * y + id) % 251).toByte
        }
        Row.fromSeq(r.toSeq :+ GifCodec.encodeGray(PngCodec.Gray(w, h, px)))
      }
    }(encoder)
  }

  /** REAL thumbnailing over a PNG or baseline-JPEG binary column: decode
    * ([[decodeImage]] — PNG via [[PngCodec]], JPEG luma via [[JpegCodec]]),
    * fit-to-box via the integer rule tw = max(1, ⌊w·maxDim/max(w,h)⌋)
    * (unchanged when already inside the box), EXACT area-average resize
    * ([[PngCodec.resizeArea]]), re-encode, and re-decode as a round-trip
    * self-check. Appends (thumb BINARY, thumb_w, thumb_h, thumb_ok);
    * undecodable blobs yield (null, -1, -1, false) — corrupt media never
    * fails the job. Same one-context-per-partition seam as [[ocrText]]:
    * at 100 TB this is the resize leg of an image-curation pipeline, a
    * pure narrow map with no shuffle.
    */
  def thumbnailPng(df: DataFrame, binCol: String, maxDim: Int): DataFrame = {
    require(maxDim > 0, "thumbnailPng: maxDim must be positive")
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("thumb", BinaryType), StructField("thumb_w", LongType),
      StructField("thumb_h", LongType), StructField("thumb_ok", BooleanType)))
    val binIdx = df.schema.fieldIndex(binCol)
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val out: Seq[Any] = decodeImage(r.getAs[Array[Byte]](binIdx)) match {
          case Some(img) =>
            val gmax = math.max(img.width, img.height)
            val (tw, th) =
              if (gmax <= maxDim) (img.width, img.height)
              else (math.max(1, img.width * maxDim / gmax),
                math.max(1, img.height * maxDim / gmax))
            val thumb = PngCodec.resizeArea(img, tw, th)
            val bytes = PngCodec.encodeGray(thumb)
            val ok = PngCodec.decode(bytes)
              .exists(d => d.width == tw && d.height == th &&
                java.util.Arrays.equals(d.pixels, thumb.pixels))
            Seq(bytes, tw.toLong, th.toLong, ok)
          case None => Seq(null, -1L, -1L, false)
        }
        Row.fromSeq(r.toSeq ++ out)
      }
    }(encoder)
  }

  /** Decoded-pixel view of a PNG / baseline-JPEG binary column: appends (pix BINARY —
    * the raw grayscale pixel bytes, pix_w, pix_h, pix_ok). The point is
    * CONTENT-level identity: two blobs whose bytes differ (different
    * encoder, filter choice, chunk layout) but whose pixels match hash
    * identically downstream, which file-level md5 cannot see. Same
    * one-codec-per-partition seam as [[thumbnailPng]]; undecodable blobs
    * yield (null, -1, -1, false) and never fail the job. Feed `pix` to
    * `md5()`/`sha2()` — a codegen projection — for image dedup grouping.
    */
  def decodePixels(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("pix", BinaryType), StructField("pix_w", LongType),
      StructField("pix_h", LongType), StructField("pix_ok", BooleanType)))
    val binIdx = df.schema.fieldIndex(binCol)
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val out: Seq[Any] = decodeImage(r.getAs[Array[Byte]](binIdx)) match {
          case Some(img) =>
            Seq(img.pixels, img.width.toLong, img.height.toLong, true)
          case None => Seq(null, -1L, -1L, false)
        }
        Row.fromSeq(r.toSeq ++ out)
      }
    }(encoder)
  }

  /** REAL video-style frame sampling over an animated-GIF binary column:
    * decode ([[GifCodec.decodeFrames]] — composited per the GIF89a
    * animation model), keep every `every`-th frame, and emit ONE ROW PER
    * SAMPLED FRAME with (frame_idx, frame_delay_cs, frame_w, frame_h,
    * frame BINARY = the full composited grayscale canvas). This is the
    * frame-sample leg of a video-curation pipeline with a fully real
    * decoder (MP4 stays header-parsed — [[mp4Boxes]] — since no codec
    * libraries ship in this container; the operator shape is identical).
    * Undecodable blobs yield a single (-1, -1, -1, -1, null) row so
    * corrupt media is visible downstream but never fails the job. Same
    * one-codec-per-partition seam as [[decodePixels]]; a narrow map —
    * the explode multiplies rows, never shuffles. Feed `frame` to
    * `graft_bytes_u8` / `md5` for codegen per-frame statistics.
    */
  def gifFrames(df: DataFrame, binCol: String, every: Int = 1,
                maxFrames: Int = 256): DataFrame =
    videoFrames(df, binCol, every, maxFrames)

  /** Container-sniffing frame sampler — the ONE SEAM for every animated/
    * video format the engine decodes for real (the [[decodePixels]]
    * pattern lifted to frame streams): GIF87a/89a through
    * [[GifCodec.decodeFrames]] (full animation compositing, per-frame
    * GCE delays) and MJPEG-in-AVI through [[AviCodec.decodeFrames]]
    * (RIFF walk + per-frame T.81 decode, delay from the container's
    * µs-per-frame). Same output contract as the GIF-only operator it
    * generalizes: one row per sampled frame with (frame_idx,
    * frame_delay_cs, frame_w, frame_h, frame BINARY); undecodable or
    * unknown-container blobs yield a single (-1, -1, -1, -1, null) row.
    * An H.264/MP4 decoder drops in as a third branch when one exists —
    * the sniff is the only dispatch point.
    */
  def videoFrames(df: DataFrame, binCol: String, every: Int = 1,
                  maxFrames: Int = 256): DataFrame = {
    require(every > 0, "videoFrames: every must be positive")
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("frame_idx", LongType), StructField("frame_delay_cs", LongType),
      StructField("frame_w", LongType), StructField("frame_h", LongType),
      StructField("frame", BinaryType)))
    val binIdx = df.schema.fieldIndex(binCol)
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val base = r.toSeq
        val bytes = r.getAs[Array[Byte]](binIdx)
        val miss = Iterator(Row.fromSeq(base ++ Seq(-1L, -1L, -1L, -1L, null)))
        if (AviCodec.isAvi(bytes)) {
          AviCodec.decodeFrames(bytes, maxFrames) match {
            case Some(frames) if frames.nonEmpty =>
              val delayCs = AviCodec.parseInfo(bytes)
                .map(_.microSecPerFrame / 10000L).getOrElse(0L)
              frames.iterator.zipWithIndex.collect {
                case (g, i) if i % every == 0 =>
                  Row.fromSeq(base ++ Seq(i.toLong, delayCs,
                    g.width.toLong, g.height.toLong, g.pixels))
              }
            case _ => miss
          }
        } else GifCodec.decodeFrames(bytes, maxFrames) match {
          case Some(frames) =>
            frames.iterator.zipWithIndex.collect {
              case (f, i) if i % every == 0 =>
                Row.fromSeq(base ++ Seq(i.toLong, f.delayCs.toLong,
                  f.image.width.toLong, f.image.height.toLong, f.image.pixels))
            }
          case None => miss
        }
      }
    }(encoder)
  }

  /** Deterministic REAL animated-GIF blob per row: `nCol` frames of the
    * per-frame gradient p(x, y, f) = (7x + 13y + id + 17f) mod 251
    * encoded by [[GifCodec.encodeGrayAnimation]] — the fixture generator
    * for [[gifFrames]]; frame pixels stay a pure function of
    * (id, w, h, f), so SQL can replay per-frame statistics exactly.
    */
  def syntheticGifAnimation(df: DataFrame, idCol: String, wCol: String,
                            hCol: String, nCol: String,
                            outCol: String = "gif"): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField(outCol, BinaryType))
    val idIdx = df.schema.fieldIndex(idCol)
    val wIdx = df.schema.fieldIndex(wCol)
    val hIdx = df.schema.fieldIndex(hCol)
    val nIdx = df.schema.fieldIndex(nCol)
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val w = r.getLong(wIdx).toInt; val h = r.getLong(hIdx).toInt
        val n = r.getLong(nIdx).toInt
        val frames = (0 until n).map { f =>
          PngCodec.Gray(w, h, Array.tabulate[Byte](w * h) { i =>
            val x = i % w; val y = i / w
            ((7L * x + 13L * y + id + 17L * f) % 251).toByte
          })
        }
        Row.fromSeq(r.toSeq :+ GifCodec.encodeGrayAnimation(frames, delayCs = 10))
      }
    }(encoder)
  }

  /** Scene-cut detection over any decodable video/animation column
    * (GIF or MJPEG-AVI via the [[videoFrames]] container sniff): decode
    * all frames, then score each consecutive pair by the SUM
    * of absolute pixel differences — `lag` over a (doc)-partitioned
    * window, the per-pixel fold as codegen `zip_with`+`aggregate` over
    * two `graft_bytes_u8` views (no UDF). A pair is a cut when
    * `diff_sum > threshold × n_pix`, kept as an integer comparison so
    * the flag is engine-exact (no float mean). Output: one row per
    * consecutive frame pair (frame_idx = the later frame), with
    * (diff_sum, n_pix, is_cut). This is the shot-boundary leg of a
    * video-curation pipeline (sample → diff → cut → dedup shots); the
    * single shuffle is the per-doc window, bounded by frames-per-doc.
    */
  def sceneCuts(df: DataFrame, idCol: String, binCol: String,
                threshold: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.expressions.GraftFunctions.register(df.sparkSession)
    def u8(c: Column) = call_function("graft_bytes_u8", c)
    val frames = gifFrames(df, binCol, every = 1)
      .where(col("frame_idx") >= 0)
    val w = Window.partitionBy(col(idCol)).orderBy(col("frame_idx"))
    frames
      .withColumn("prev", lag(col("frame"), 1).over(w))
      .where(col("prev").isNotNull)
      .select(col(idCol), col("frame_idx"),
        aggregate(zip_with(u8(col("frame")), u8(col("prev")),
          (a, b) => abs(a - b).cast("long")), lit(0L), (acc, x) => acc + x)
          .as("diff_sum"),
        (col("frame_w") * col("frame_h")).as("n_pix"))
      .withColumn("is_cut", col("diff_sum") > lit(threshold) * col("n_pix"))
  }

  /** Two-scene fixture for [[sceneCuts]]: slow in-scene motion (+2 gray
    * per frame) with a +120 intensity jump at frame `nf / 2` — so
    * within-scene pair diffs average ≈ 4 per pixel and the cut pair
    * ≈ 122–129, a decisive margin for any mid-range threshold. All
    * pixels stay pure functions of (id, w, h, f), so SQL replays every
    * diff exactly.
    */
  def syntheticGifScenes(df: DataFrame, idCol: String, wCol: String,
                         hCol: String, nCol: String,
                         outCol: String = "gif"): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField(outCol, BinaryType))
    val idIdx = df.schema.fieldIndex(idCol)
    val wIdx = df.schema.fieldIndex(wCol)
    val hIdx = df.schema.fieldIndex(hCol)
    val nIdx = df.schema.fieldIndex(nCol)
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val w = r.getLong(wIdx).toInt; val h = r.getLong(hIdx).toInt
        val n = r.getLong(nIdx).toInt
        val cut = n / 2
        val frames = (0 until n).map { f =>
          PngCodec.Gray(w, h, Array.tabulate[Byte](w * h) { i =>
            val x = i % w; val y = i / w
            val v = 7L * x + 13L * y + id + 2L * f + (if (f >= cut) 120L else 0L)
            (v % 251).toByte
          })
        }
        Row.fromSeq(r.toSeq :+ GifCodec.encodeGrayAnimation(frames, delayCs = 10))
      }
    }(encoder)
  }

  /** Video near-duplicate pairs by FRAME-SET Jaccard — n-gram/shingle
    * dedup transplanted to video: a frame plays the role of a shingle,
    * its identity is (frame_w, frame_h, md5(decoded pixels)) — CONTENT
    * identity through the real decoders, so re-muxed/re-contained copies
    * match where file hashing cannot — and two videos are near-dups when
    * |shared frames| / |union| reaches `threshold`. Candidates come from
    * the shared-frame equi-join (a pair is only generated by an actual
    * common frame — never an all-pairs scan), with a frame-df cap as the
    * skew guard: a frame appearing in more than `maxFrameDf` videos
    * (black frames, boilerplate intros at corpus scale) is dropped from
    * the sets on BOTH sides of the Jaccard before the join, exactly the
    * [[graft.dedup.Dedup]] `maxShingleDf` discipline. Linear in total
    * frames: decode is the [[videoFrames]] narrow map, the join is
    * bounded by df² per distinct frame ≤ maxFrameDf², and set sizes are
    * one combinable groupBy. Returns (vid_a, vid_b, n_shared, jaccard).
    */
  def videoNearDupPairs(df: DataFrame, idCol: String, binCol: String,
                        threshold: Double, maxFrameDf: Int = 64): DataFrame = {
    require(threshold > 0 && threshold <= 1, "videoNearDupPairs: bad threshold")
    val frames = videoFrames(df, binCol).where(col("frame_idx") >= 0)
    val fh = frames.select(col(idCol), col("frame_w"), col("frame_h"),
      md5(col("frame")).as("__fh")).distinct()
    val hot = fh.groupBy(col("frame_w"), col("frame_h"), col("__fh"))
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxFrameDf)
      .select(col("frame_w"), col("frame_h"), col("__fh"))
    val kept = fh.join(hot, Seq("frame_w", "frame_h", "__fh"))
    val sizes = kept.groupBy(col(idCol)).agg(count(lit(1)).as("__n"))
    val a = kept.select(col("frame_w"), col("frame_h"), col("__fh"),
      col(idCol).as("vid_a"))
    val b = kept.select(col("frame_w"), col("frame_h"), col("__fh"),
      col(idCol).as("vid_b"))
    a.join(b, Seq("frame_w", "frame_h", "__fh"))
      .filter(col("vid_a") < col("vid_b"))
      .groupBy(col("vid_a"), col("vid_b")).agg(count(lit(1)).as("n_shared"))
      .join(sizes.select(col(idCol).as("vid_a"), col("__n").as("__na")), "vid_a")
      .join(sizes.select(col(idCol).as("vid_b"), col("__n").as("__nb")), "vid_b")
      .withColumn("jaccard", round(col("n_shared") /
        (col("__na") + col("__nb") - col("n_shared")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("vid_a"), col("vid_b"), col("n_shared"), col("jaccard"))
  }

  /** Family-structured animated-GIF fixture for [[videoNearDupPairs]]:
    * frame f of family `famCol` is the gradient
    * p(x, y) = ((fam%13 + 1)·x + (fam%11 + 1)·y + fam + 17·f) mod 251 —
    * videos of the same family share byte-identical frames (GIF is
    * lossless), and the (slope_x, slope_y, intercept) triple UNIQUELY
    * determines the pixel buffer for any w, h ≥ 2 (p(0,0) = intercept,
    * p(1,0) − p(0,0) = slope_x, p(0,1) − p(0,0) = slope_y), so the SQL
    * oracle can model frame identity as (w, h, fam%13, fam%11,
    * (fam + 17·f) mod 251) with no collision ambiguity. Nonzero slopes
    * by construction — a flat frame's bytes would be layout-independent
    * and alias across dimensions.
    */
  def syntheticGifFamilies(df: DataFrame, famCol: String, wCol: String,
                           hCol: String, nCol: String,
                           outCol: String = "gif"): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField(outCol, BinaryType))
    val famIdx = df.schema.fieldIndex(famCol)
    val wIdx = df.schema.fieldIndex(wCol)
    val hIdx = df.schema.fieldIndex(hCol)
    val nIdx = df.schema.fieldIndex(nCol)
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val fam = r.getLong(famIdx)
        val w = r.getLong(wIdx).toInt; val h = r.getLong(hIdx).toInt
        val n = r.getLong(nIdx).toInt
        val sx = fam % 13 + 1; val sy = fam % 11 + 1
        val frames = (0 until n).map { f =>
          PngCodec.Gray(w, h, Array.tabulate[Byte](w * h) { i =>
            ((sx * (i % w) + sy * (i / w) + fam + 17L * f) % 251).toByte
          })
        }
        Row.fromSeq(r.toSeq :+ GifCodec.encodeGrayAnimation(frames, delayCs = 10))
      }
    }(encoder)
  }

  /** Deterministic REAL MJPEG-AVI blob per row: `nCol` FLAT frames of
    * value (31·id + 17·f) mod 256 at quality 100 — flat frames at unit
    * quant round-trip pixel-EXACTLY through the JPEG codec (JpegCodecSpec
    * pins it), so SQL replays per-frame pixel sums analytically:
    * sum = ((31·id + 17·f) mod 256) · w · h. The [[videoFrames]] fixture
    * generator for the video-container leg.
    */
  def syntheticAviAnimation(df: DataFrame, idCol: String, wCol: String,
                            hCol: String, nCol: String,
                            outCol: String = "avi"): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField(outCol, BinaryType))
    val idIdx = df.schema.fieldIndex(idCol)
    val wIdx = df.schema.fieldIndex(wCol)
    val hIdx = df.schema.fieldIndex(hCol)
    val nIdx = df.schema.fieldIndex(nCol)
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val w = r.getLong(wIdx).toInt; val h = r.getLong(hIdx).toInt
        val n = r.getLong(nIdx).toInt
        val frames = (0 until n).map { f =>
          PngCodec.Gray(w, h,
            Array.fill[Byte](w * h)(((31L * id + 17L * f) % 256).toByte))
        }
        Row.fromSeq(r.toSeq :+ AviCodec.encodeMjpeg(frames, fps = 10, quality = 100))
      }
    }(encoder)
  }

  /** Two-scene flat-frame AVI fixture for [[sceneCuts]] over the video
    * container: value (id mod 60) + 2·f, +120 at frame nf/2 — all values
    * stay < 256 (no wrap), so within-scene pair diffs are EXACTLY
    * 2·w·h and the cut pair exactly 122·w·h, SQL-replayable with plain
    * integer arithmetic (flat frames decode exactly at quality 100).
    */
  def syntheticAviScenes(df: DataFrame, idCol: String, wCol: String,
                         hCol: String, nCol: String,
                         outCol: String = "avi"): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField(outCol, BinaryType))
    val idIdx = df.schema.fieldIndex(idCol)
    val wIdx = df.schema.fieldIndex(wCol)
    val hIdx = df.schema.fieldIndex(hCol)
    val nIdx = df.schema.fieldIndex(nCol)
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        val w = r.getLong(wIdx).toInt; val h = r.getLong(hIdx).toInt
        val n = r.getLong(nIdx).toInt
        val cut = n / 2
        val frames = (0 until n).map { f =>
          val v = (id % 60) + 2L * f + (if (f >= cut) 120L else 0L)
          PngCodec.Gray(w, h, Array.fill[Byte](w * h)(v.toByte))
        }
        Row.fromSeq(r.toSeq :+ AviCodec.encodeMjpeg(frames, fps = 10, quality = 100))
      }
    }(encoder)
  }

  /** REAL (not stubbed) PNG header metadata, as pure codegen'd column
    * arithmetic — no codec, no mapPartitions, no UDF: the PNG wire format
    * is public byte offsets (8-byte signature `89 50 4E 47 0D 0A 1A 0A`,
    * then the IHDR chunk: width/height as 4-byte big-endian at offsets
    * 16/20, bit depth and color type at 24/25). `substring` on a binary
    * column slices bytes; `conv(hex(...), 16, 10)` turns a slice into its
    * big-endian integer. Demonstrates that METADATA extraction over 100 TB
    * of media needs no per-row codec at all — it is a WholeStageCodegen
    * projection; only pixel decode needs the [[decodeMeta]] seam.
    * Returns a struct (width, height, bit_depth, color_type, valid);
    * non-PNG bytes yield valid=false with -1 dims.
    */
  def pngMeta(binCol: Column): Column = {
    def beInt(pos: Int, len: Int) =
      conv(hex(substring(binCol, pos, len)), 16, 10).cast("long")
    // the length guard keeps a truncated signature-only blob on the
    // invalid branch — without it the dims would come back NULL (substring
    // past the end) under valid=true, breaking the -1 sentinel contract.
    // The chunk-tag check (bytes 13-16 must spell "IHDR" — PNG mandates
    // IHDR first) keeps a signature-prefixed blob with some other first
    // chunk from yielding garbage dims under valid=true.
    val isPng = hex(substring(binCol, 1, 8)) === lit("89504E470D0A1A0A") &&
      length(binCol) >= 26 &&
      hex(substring(binCol, 13, 4)) === lit("49484452")
    when(isPng, struct(
      beInt(17, 4).as("width"),
      beInt(21, 4).as("height"),
      beInt(25, 1).cast("int").as("bit_depth"),
      beInt(26, 1).cast("int").as("color_type"),
      lit(true).as("valid")))
      .otherwise(struct(lit(-1L).as("width"), lit(-1L).as("height"),
        lit(-1).as("bit_depth"), lit(-1).as("color_type"),
        lit(false).as("valid")))
  }

  /** REAL WAV (RIFF) header metadata — the audio sibling of [[pngMeta]],
    * again pure codegen'd column arithmetic over the public wire format:
    * "RIFF" at 1–4, "WAVE" at 9–12, the fmt chunk tag at 13–16, then
    * LITTLE-endian fields — audio format (17+4+1=21, 2 bytes), channels
    * (23, 2), sample rate (25, 4), bits/sample (35, 2). `conv(hex(...))`
    * reads big-endian, so LE integers are assembled per byte:
    * b0 + b1·2⁸ + b2·2¹⁶ + b3·2²⁴. Metadata extraction over 100 TB of
    * audio without any codec — a WholeStageCodegen projection.
    * Returns struct (n_channels, sample_rate, bits_per_sample, pcm,
    * valid); non-WAV bytes yield valid=false with -1s.
    */
  def wavMeta(binCol: Column): Column = {
    def byte(pos: Int) = conv(hex(substring(binCol, pos, 1)), 16, 10).cast("long")
    def le(pos: Int, len: Int) =
      (0 until len).map(i => byte(pos + i) * (1L << (8 * i)) : Column)
        .reduce(_ + _)
    val isWav = hex(substring(binCol, 1, 4)) === lit("52494646") &&   // "RIFF"
      hex(substring(binCol, 9, 4)) === lit("57415645") &&             // "WAVE"
      hex(substring(binCol, 13, 4)) === lit("666D7420") &&            // "fmt "
      length(binCol) >= 36
    when(isWav, struct(
      le(23, 2).cast("int").as("n_channels"),
      le(25, 4).as("sample_rate"),
      le(35, 2).cast("int").as("bits_per_sample"),
      (le(21, 2) === 1L).as("pcm"),
      lit(true).as("valid")))
      .otherwise(struct(lit(-1).as("n_channels"), lit(-1L).as("sample_rate"),
        lit(-1).as("bits_per_sample"), lit(false).as("pcm"),
        lit(false).as("valid")))
  }

  /** REAL 8-bit PCM sample decode — the audio sibling of [[pngMeta]]'s
    * no-codec thesis, taken one level deeper: not just the header but the
    * SAMPLES decode inside WholeStageCodegen, zero shuffle and zero UDF.
    * Header validation is portable byte arithmetic; the payload decode is
    * the [[graft.expressions.BytesToU8]] codegen Expression (one primitive
    * loop per blob — the `transform(substr+hex+conv)` formulation it
    * replaced cost ~2 ms per 100-byte blob, 30× this). Requires
    * [[graft.expressions.GraftFunctions.register]] on the session (done by
    * [[wavFrameEnergy]]). Supports the canonical 44-byte-header mono 8-bit
    * PCM layout (the format [[wavMeta]] validates); anything else yields
    * null — corrupt or unsupported audio never fails the job. Returns
    * array<int> of unsigned samples (0–255, midpoint 128).
    */
  def wavPcm8Samples(binCol: Column): Column = {
    def le(pos: Int, len: Int) =
      (0 until len).map(i =>
        conv(hex(substring(binCol, pos + i, 1)), 16, 10).cast("long") *
          (1L << (8 * i)) : Column).reduce(_ + _)
    val meta = wavMeta(binCol)
    val n = le(41, 4)
    val isData = hex(substring(binCol, 37, 4)) === lit("64617461") // "data"
    when(meta.getField("valid") && meta.getField("pcm") &&
      meta.getField("bits_per_sample") === 8 &&
      meta.getField("n_channels") === 1 && isData &&
      length(binCol) >= lit(44L) + n && n > 0,
      slice(call_function("graft_bytes_u8", binCol), lit(45), n.cast("int")))
      .otherwise(lit(null).cast("array<int>"))
  }

  /** Per-frame audio energy over decoded PCM: frames of `frameSize`
    * samples, energy = Σ(s−128)² — the VAD/silence-detection primitive an
    * audio-curation pipeline runs before transcription (drop silent or
    * clipped segments). Frame energies are computed as a `transform` +
    * `aggregate` fold over the sample array (no per-sample row explosion,
    * no shuffle); only the per-FRAME rows are emitted. Undecodable rows
    * are dropped. Returns (idCol, frame, n_samples, energy).
    */
  def wavFrameEnergy(df: DataFrame, idCol: String, binCol: String,
                     frameSize: Int): DataFrame = {
    require(frameSize > 0, "wavFrameEnergy: frameSize must be positive")
    graft.expressions.GraftFunctions.register(df.sparkSession)
    df.withColumn("__s", wavPcm8Samples(col(binCol)))
      .filter(col("__s").isNotNull)
      .select(col(idCol),
        posexplode(transform(
          expr(s"sequence(0, CAST((size(__s) + $frameSize - 1) DIV $frameSize AS INT) - 1)"),
          f => struct(
            size(slice(col("__s"), f * frameSize + 1, lit(frameSize))).cast("long")
              .as("n_samples"),
            aggregate(slice(col("__s"), f * frameSize + 1, lit(frameSize)), lit(0L),
              (a, s) => a + ((s - 128) * (s - 128)).cast("long"))
              .as("energy")))))
      .select(col(idCol), col("pos").cast("long").as("frame"),
        col("col.n_samples"), col("col.energy"))
  }

  /** REAL JPEG (JFIF/EXIF) header metadata — the third no-codec parser.
    * Unlike PNG/WAV, JPEG has no fixed offsets: dimensions live in a SOFn
    * segment at a position that depends on every preceding segment's
    * declared length, so extraction is a bounded MARKER WALK, not a fixed
    * slice. The walk is a `functions.aggregate` fold over a constant
    * sequence (max `maxSegments` hops) carrying (pos, w, h, done, bad)
    * through per-segment transitions — still pure Catalyst expressions:
    * no UDF, no mapPartitions, evaluated row-local with zero shuffle, so
    * it runs at scan speed over 100 TB of media like its siblings.
    *
    * Wire format (public, ITU T.81): SOI `FF D8`, then segments of
    * `FF <marker> <len:2 BE incl. itself> <payload>`; standalone markers
    * (TEM `01`, RST `D0-D7`) have no length; SOFn (`C0-C3, C5-C7, C9-CB,
    * CD-CF` — baseline/progressive/lossless families, excluding DHT `C4`,
    * JPG `C8`, DAC `CC`) carries precision(1), height(2 BE), width(2 BE)
    * after the length. EOI or any malformed byte before a SOF → invalid.
    * Returns struct (width, height, valid); non-JPEG bytes yield
    * valid=false with -1 dims.
    */
  def jpegMeta(binCol: Column, maxSegments: Int = 24): Column = {
    def byteAt(pos: Column): Column =
      coalesce(conv(hex(binCol.substr(pos, lit(1))), 16, 10).cast("long"), lit(-1L))
    def be2(pos: Column): Column = byteAt(pos) * 256L + byteAt(pos + 1)
    def mk(pos: Column, w: Column, h: Column, done: Column, bad: Column) =
      struct(pos.as("pos"), w.as("w"), h.as("h"), done.as("done"), bad.as("bad"))
    val init = mk(lit(3L), lit(-1L), lit(-1L), lit(false), lit(false))
    val walked = aggregate(
      sequence(lit(1), lit(maxSegments)),
      init,
      (acc, _) => {
        val pos = acc.getField("pos")
        val keep = acc
        val m0 = byteAt(pos)
        val m1 = byteAt(pos + 1)
        val sof = m1.isin(0xC0L, 0xC1L, 0xC2L, 0xC3L, 0xC5L, 0xC6L, 0xC7L,
          0xC9L, 0xCAL, 0xCBL, 0xCDL, 0xCEL, 0xCFL)
        val standalone = m1 === 0x01L || (m1 >= 0xD0L && m1 <= 0xD7L) || m1 === 0xD8L
        val segLen = be2(pos + 2)
        val h = be2(pos + 5)
        val w = be2(pos + 7)
        val badState = mk(pos, lit(-1L), lit(-1L), lit(false), lit(true))
        when(acc.getField("done") || acc.getField("bad"), keep)
          .when(m0 =!= 0xFFL || m1 < 0L || m1 === 0xD9L || m1 === 0x00L, badState)
          // legal fill byte (ITU T.81 B.1.1.2: any number of 0xFF pad
          // bytes may precede a marker) — consume one and re-read
          .when(m1 === 0xFFL,
            mk(pos + 1L, lit(-1L), lit(-1L), lit(false), lit(false)))
          .when(sof,
            // truncated SOF payload → substr past the end → -1 sentinel dims
            when(h < 0L || w < 0L, badState)
              .otherwise(mk(pos, w, h, lit(true), lit(false))))
          .when(standalone, mk(pos + 2L, lit(-1L), lit(-1L), lit(false), lit(false)))
          .when(segLen < 2L, badState)
          .otherwise(mk(pos + 2L + segLen, lit(-1L), lit(-1L), lit(false), lit(false)))
      })
    val isJpeg = hex(substring(binCol, 1, 2)) === lit("FFD8") &&
      walked.getField("done") && !walked.getField("bad")
    when(isJpeg, struct(
      walked.getField("w").as("width"),
      walked.getField("h").as("height"),
      lit(true).as("valid")))
      .otherwise(struct(lit(-1L).as("width"), lit(-1L).as("height"),
        lit(false).as("valid")))
  }

  /** REAL GIF header metadata — fixed public offsets like [[pngMeta]]:
    * signature "GIF87a"/"GIF89a", then the logical screen descriptor with
    * LITTLE-endian width (offset 7, 2 bytes) and height (offset 9).
    * Pure codegen'd column arithmetic; returns struct (width, height,
    * version, valid) with -1/"" on non-GIF bytes.
    */
  def gifMeta(binCol: Column): Column = {
    def byte(pos: Int) = conv(hex(substring(binCol, pos, 1)), 16, 10).cast("long")
    def le(pos: Int, len: Int) =
      (0 until len).map(i => byte(pos + i) * (1L << (8 * i)): Column).reduce(_ + _)
    val isGif = hex(substring(binCol, 1, 4)) === lit("47494638") &&  // "GIF8"
      (hex(substring(binCol, 5, 2)) === lit("3761") ||               // "7a"
        hex(substring(binCol, 5, 2)) === lit("3961")) &&             // "9a"
      length(binCol) >= 13
    when(isGif, struct(
      le(7, 2).as("width"),
      le(9, 2).as("height"),
      substring(binCol, 4, 3).cast("string").as("version"),
      lit(true).as("valid")))
      .otherwise(struct(lit(-1L).as("width"), lit(-1L).as("height"),
        lit("").as("version"), lit(false).as("valid")))
  }

  /** REAL ISO-BMFF (MP4/MOV) top-level box inventory — the video sibling of
    * [[jpegMeta]]'s marker walk: each box is `size:4 BE` + `type:4 ASCII`,
    * size 1 ⇒ 64-bit largesize at +8, size 0 ⇒ box extends to EOF. The walk
    * is again a bounded `aggregate` fold accumulating the box-type array —
    * pure column expressions, no codec, scan-speed over 100 TB of video.
    * A valid file must start with `ftyp` and its boxes must tile the blob
    * exactly (`maxBoxes` cap; typical top level is 3–6 boxes).
    * Returns struct (n_boxes, box_types, valid).
    */
  def mp4Boxes(binCol: Column, maxBoxes: Int = 16): Column = {
    def byteAt(pos: Column): Column =
      coalesce(conv(hex(binCol.substr(pos, lit(1))), 16, 10).cast("long"), lit(-1L))
    def be(pos: Column, len: Int): Column =
      (0 until len).map(i => byteAt(pos + i) * (1L << (8 * (len - 1 - i))): Column)
        .reduce(_ + _)
    val totalLen = length(binCol).cast("long")
    def mk(pos: Column, types: Column, bad: Column) =
      struct(pos.as("pos"), types.as("types"), bad.as("bad"))
    val init = mk(lit(1L), array().cast("array<string>"), lit(false))
    val walked = aggregate(
      sequence(lit(1), lit(maxBoxes)),
      init,
      (acc, _) => {
        val pos = acc.getField("pos")
        val types = acc.getField("types")
        val sz = be(pos, 4)
        val typ = binCol.substr(pos + 4, lit(4)).cast("string")
        val effSize = when(sz === 1L, be(pos + 8, 8))
          .when(sz === 0L, totalLen - pos + 1L)
          .otherwise(sz)
        val minHeader = when(sz === 1L, lit(16L)).otherwise(lit(8L))
        val badState = mk(pos, types, lit(true))
        when(acc.getField("bad") || pos > totalLen, acc)
          .when(pos + 7L > totalLen, badState)            // header doesn't fit
          .when(effSize < minHeader || pos + effSize - 1L > totalLen, badState)
          .otherwise(mk(pos + effSize, concat(types, array(typ)), lit(false)))
      })
    val valid = !walked.getField("bad") &&
      walked.getField("pos") === totalLen + 1L &&
      size(walked.getField("types")) > 0 &&
      element_at(walked.getField("types"), 1) === lit("ftyp")
    when(valid, struct(
      size(walked.getField("types")).cast("long").as("n_boxes"),
      walked.getField("types").as("box_types"),
      lit(true).as("valid")))
      .otherwise(struct(lit(0L).as("n_boxes"),
        array().cast("array<string>").as("box_types"),
        lit(false).as("valid")))
  }

  /** Deterministic frame-sample offsets for a video-shaped blob: k evenly
    * spaced byte offsets past the header. Pure column arithmetic — the
    * ranged-read pattern for real video.
    */
  def frameOffsets(nBytesCol: String, k: Int, headerBytes: Int = 9): DataFrame => DataFrame =
    df => df.withColumn("frame_offsets",
      expr(s"transform(sequence(0, ${k - 1}), " +
        s"i -> CAST($headerBytes + i * (($nBytesCol - $headerBytes) DIV $k) AS BIGINT))"))

  /** Synthetic media table for tests/demos: deterministic fake blobs derived
    * from (id) — header per [[StubCodec]], payload from the id bytes.
    */
  def syntheticMedia(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      val fmt = (1 + i % 4).toByte
      val w = 16 + (i % 64); val h = 9 + (i % 32)
      val payload = Array.tabulate[Byte](32 + i % 128)(j => ((i * 31 + j) % 251).toByte)
      val bytes = Array[Byte]('G', 'F', 'T', '!', fmt,
        ((w >> 8) & 0xff).toByte, (w & 0xff).toByte,
        ((h >> 8) & 0xff).toByte, (h & 0xff).toByte) ++ payload
      (i.toLong, bytes)
    }.toDF("media_id", "media")
  }
}
