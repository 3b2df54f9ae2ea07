package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media (image/audio/video) ride through the
  * engine as opaque `binary` columns with a typed metadata struct; decode /
  * feature-extraction runs as an imperative per-partition stage.
  *
  * Decoding: [[ImageIODecoder]] is a REAL image decoder built on the
  * JDK's own `javax.imageio` (PNG/JPEG/GIF/BMP — no external libs
  * needed); audio/video and exotic codecs stay behind [[StubDecoder]],
  * the clearly-marked deterministic fake for environments without codec
  * libraries. The Spark-side contract (schema, batching, partitioning)
  * is real and tested either way:
  *  - payloads stay `BinaryType` end-to-end (never stringified);
  *  - decode happens in `mapPartitions`, one decoder instance per
  *    partition (the expensive init amortizes across the partition — the
  *    same shape a JNI/FFmpeg decoder needs);
  *  - upstream `repartition` spreads decode cost; downstream columns are
  *    ordinary typed columns, so Catalyst prunes/pushes around them.
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, mime: String, payload: Array[Byte])
  case class MediaFeatures(
      doc_id: Long,
      byte_len: Long,
      head_hex: String,
      byte_sum: Long,
      width: Int,
      height: Int)

  private val hexChars = "0123456789abcdef".toCharArray

  /** lowercase hex of a byte slice (no per-byte Formatter allocation) */
  private[ops] def toHex(b: Array[Byte], from: Int, until: Int): String = {
    val sb = new java.lang.StringBuilder((until - from) * 2)
    var i = from
    while (i < until) {
      val v = b(i) & 0xff
      sb.append(hexChars(v >>> 4)).append(hexChars(v & 0xf))
      i += 1
    }
    sb.toString
  }

  /** The decode seam. A real deployment implements this with an image/
    * audio library; the engine only relies on the interface. */
  trait MediaDecoder extends Serializable {
    def decode(mime: String, payload: Array[Byte]): (Int, Int) // (width, height)
  }

  /** STUB for modalities without a decoder in this environment (audio/
    * video; also the m-query fixtures, whose payloads are text bytes, not
    * images). Deterministic fake dimensions derived from the payload so
    * tests are stable. Real image payloads go through [[ImageIODecoder]]. */
  object StubDecoder extends MediaDecoder {
    override def decode(mime: String, payload: Array[Byte]): (Int, Int) = {
      val n = payload.length
      (n % 640, n % 480)
    }
  }

  /** REAL image decode via the JDK's built-in `javax.imageio` (part of
    * Java SE — present wherever the engine runs): true (width, height)
    * for PNG/JPEG/GIF/BMP payloads. Only the HEADER is read — dimensions
    * come from `ImageReader.getWidth/getHeight(0)`, the pixel raster is
    * never materialized (at media scale this pass decodes sizes, not
    * pixels). Undecodable / non-image payloads yield (-1, -1) instead of
    * failing the row — the engine's decode-failure-drops-value
    * convention ([[graft.mapping.ValueMapper.safeMap]]). */
  object ImageIODecoder extends MediaDecoder {
    // ImageIO defaults to a DISK-backed stream cache: without this, every
    // decode writes its input stream to a temp file first — at corpus
    // scale that turns a header read into a disk round-trip per payload
    javax.imageio.ImageIO.setUseCache(false)

    override def decode(mime: String, payload: Array[Byte]): (Int, Int) = {
      import javax.imageio.ImageIO
      try {
        val iis = ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val readers = ImageIO.getImageReaders(iis)
          if (!readers.hasNext) (-1, -1)
          else {
            val r = readers.next()
            try { r.setInput(iis); (r.getWidth(0), r.getHeight(0)) }
            finally r.dispose()
          }
        } finally iis.close()
      } catch { case _: Exception => (-1, -1) }
    }
  }

  /** documents text → opaque binary payloads (the test stand-in for real
    * media bytes). */
  def toMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").cast("long").as("doc_id"),
      lit("text/plain").as("mime"),
      col("text").cast("binary").as("payload"))

  /** Exact media dedup: group identical payload BYTES by content hash —
    * the multimodal twin of [[TextAnalysis.fingerprint]] (no
    * canonicalization: media bytes either match or they don't). One
    * uniform-key shuffle on the 16-byte digest; near-dup media would go
    * through the embedding path (d06/d08) instead. Output:
    * (content_md5, n_copies, keeper = min doc_id). */
  def dedupExact(media: DataFrame): DataFrame =
    media.select(col("doc_id"), md5(col("payload")).as("content_md5"))
      .groupBy(col("content_md5"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keeper"))

  case class MediaFrame(
      doc_id: Long,
      frame_idx: Long,
      frame_len: Long,
      frame_sum: Long,
      head_hex: String)

  /** Frame sampling / chunking: split each payload into fixed-size frames
    * (the video-frame / audio-window shape), one output row per frame with
    * its index and cheap per-frame features. Runs as a typed `flatMap` —
    * the engine's UDTF-equivalent escape hatch (SURVEY §2.3 P17): one row
    * in, N typed rows out, with ordinary columns downstream so Catalyst
    * prunes/pushes around them. A real pipeline would decode each frame
    * here; the feature extraction is the deterministic stand-in. */
  def chunkFrames(media: DataFrame, frameBytes: Int = 32): Dataset[MediaFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].flatMap { r =>
      val n = r.payload.length
      val frames = (n + frameBytes - 1) / frameBytes
      (0 until frames).iterator.map { f =>
        val from = f * frameBytes
        val until = math.min(from + frameBytes, n)
        var sum = 0L
        var i = from
        while (i < until) { sum += r.payload(i) & 0xff; i += 1 }
        MediaFrame(
          doc_id = r.doc_id,
          frame_idx = (f + 1).toLong, // 1-based, matches SQL generate_series
          frame_len = (until - from).toLong,
          frame_sum = sum,
          head_hex = toHex(r.payload, from, math.min(from + 8, until)))
      }
    }
  }

  /** SEQUENCE-LEVEL media near-dup: two media are near-duplicates when
    * their DISTINCT frame-signature sets overlap ≥ threshold (Jaccard) —
    * the video-dedup shape that catches clipped intros, appended
    * trailers, and re-containered copies, where no byte of the container
    * matches ([[dedupExact]] splits them) and single-image perceptual
    * hashing does not apply. Signature = (frame_len, frame_sum,
    * head_hex) per frame — swap in a decoded-frame aHash without
    * touching the plan.
    *
    * Plan shape is d02's two-shuffle similarity join: per-media distinct
    * signature sets (sizes ride through the explode — no denominator
    * join-back), signature-keyed self-join, pair aggregation. `maxDf`
    * drops viral signatures (black/silent frames are the media analog of
    * stopword shingles) before the join — the d09 recall-rides-the-cool-
    * keys convention, which is what bounds the join at video scale. */
  def videoNearDupPairs(media: DataFrame, frameBytes: Int = 32,
                        threshold: Double = 0.5,
                        maxDf: Option[Int] = None): DataFrame = {
    val sigs = chunkFrames(media, frameBytes).toDF()
      .select(col("doc_id"),
        concat_ws("_", col("frame_len"), col("frame_sum"), col("head_hex")).as("sig"))
      .distinct()
    val sets = sigs.groupBy(col("doc_id"))
      .agg(collect_list(col("sig")).as("ss"))
      .select(col("doc_id"), size(col("ss")).cast("long").as("n_sig"),
        explode(col("ss")).as("sig"))
    val capped = maxDf match {
      case Some(cap) =>
        val hot = sets.groupBy(col("sig")).agg(count(lit(1)).as("df"))
          .filter(col("df") > cap).select("sig")
        sets.join(hot, Seq("sig"), "left_anti")
      case None => sets
    }
    val a = capped.select(col("doc_id").as("a_id"), col("n_sig").as("a_n"), col("sig"))
    val b = capped.select(col("doc_id").as("b_id"), col("n_sig").as("b_n"), col("sig"))
    a.join(b, Seq("sig"))
      .filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id", "a_n", "b_n").agg(count(lit(1)).as("inter"))
      .withColumn("uni", col("a_n") + col("b_n") - col("inter"))
      .withColumn("jaccard", col("inter").cast("double") / col("uni"))
      .filter(col("jaccard") >= threshold)
      .select("a_id", "b_id", "inter", "uni", "jaccard")
  }

  /** Frame SAMPLING: keep every `stride`-th frame (1, 1+stride, …) — the
    * video keyframe / audio-window subsampling shape. Skipped frames are
    * never generated (the iterator steps by `stride`), so cost scales
    * with frames KEPT, not frames present — at video scale that is the
    * whole point of sampling. */
  def sampleFrames(media: DataFrame, frameBytes: Int = 32, stride: Int = 4): Dataset[MediaFrame] = {
    require(stride > 0, s"stride must be positive: $stride")
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].flatMap { r =>
      val n = r.payload.length
      val frames = (n + frameBytes - 1) / frameBytes
      (0 until frames by stride).iterator.map { f =>
        val from = f * frameBytes
        val until = math.min(from + frameBytes, n)
        var sum = 0L
        var i = from
        while (i < until) { sum += r.payload(i) & 0xff; i += 1 }
        MediaFrame(
          doc_id = r.doc_id,
          frame_idx = (f + 1).toLong,
          frame_len = (until - from).toLong,
          frame_sum = sum,
          head_hex = toHex(r.payload, from, math.min(from + 8, until)))
      }
    }
  }

  case class ResizedImage(
      doc_id: Long, width: Int, height: Int,
      new_w: Int, new_h: Int, pixel_sum: Long)

  /** Integer fit-to-box: never upscale; the binding axis hits its max and
    * the other scales by exact integer division (floor, min 1). All-
    * integer so the target dims are bit-identical on any engine. */
  private[ops] def fitWithin(w: Int, h: Int, maxW: Int, maxH: Int): (Int, Int) =
    if (w <= maxW && h <= maxH) (w, h)
    else if (w.toLong * maxH >= h.toLong * maxW)
      (maxW, math.max(1, (h.toLong * maxW / w).toInt))
    else
      (math.max(1, (w.toLong * maxH / h).toInt), maxH)

  /** REAL image resize (the thumbnail/normalize step of a multimodal
    * ingest): full ImageIO decode, aspect-preserving [[fitWithin]] scale
    * (never upscales), redraw into a fresh RGB raster, and a checksum
    * over the RESIZED pixels — reading the new raster back is what
    * proves the scale actually ran, not just the dim arithmetic. Runs
    * per-partition like every decoder-seam operator (one JVM decode
    * pipeline per partition, no driver involvement). Undecodable
    * payloads yield (-1, …) instead of failing the row — the engine's
    * decode-failure convention. Output: (doc_id, width, height, new_w,
    * new_h, pixel_sum) with width/height the SOURCE dims. */
  def resizeImages(media: DataFrame, maxW: Int, maxH: Int): Dataset[ResizedImage] = {
    require(maxW > 0 && maxH > 0, s"bounds must be positive: ${maxW}x$maxH")
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // in-memory streams, no temp files
      it.map { r =>
        val img = try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
        catch { case _: Exception => null }
        if (img == null) ResizedImage(r.doc_id, -1, -1, -1, -1, -1L)
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          val (nw, nh) = fitWithin(w, h, maxW, maxH)
          val dst = new java.awt.image.BufferedImage(nw, nh,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = dst.createGraphics()
          try g.drawImage(img, 0, 0, nw, nh, null) finally g.dispose()
          var sum = 0L
          var y = 0
          while (y < nh) {
            var x = 0
            while (x < nw) {
              val p = dst.getRGB(x, y)
              sum += ((p >>> 16) & 0xff) + ((p >>> 8) & 0xff) + (p & 0xff)
              x += 1
            }
            y += 1
          }
          ResizedImage(r.doc_id, w, h, nw, nh, sum)
        }
      }
    }
  }

  case class PerceptualHash(doc_id: Long, phash: Long)

  /** Perceptual average-hash (aHash) over REAL image decode: full
    * ImageIO read → integer grayscale → grid×grid block-average
    * downsample → threshold each cell against the global cell mean → one
    * 64-bit fingerprint. All reductions are integer (per-pixel gray =
    * (r+g+b)/3 int-div, per-cell and global means int-div), so the hash
    * is a pure function of the pixels — engine-portable, no float
    * resampler semantics in the contract (the reason this downsamples by
    * block averaging instead of `drawImage` scaling, whose boundary
    * sampling is implementation-defined). Undecodable payloads hash to
    * −1 (the decode-failure convention). Bit layout: cell (cy, cx) →
    * bit cy·grid + cx. */
  def aHash64(media: DataFrame, grid: Int = 8): Dataset[PerceptualHash] = {
    require(grid > 0 && grid * grid <= 64, s"grid² must fit 64 bits: $grid")
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val img = try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
        catch { case _: Exception => null }
        if (img == null) PerceptualHash(r.doc_id, -1L)
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          val cells = new Array[Long](grid * grid)
          var cy = 0
          while (cy < grid) {
            var cx = 0
            while (cx < grid) {
              val x0 = cx * w / grid; val x1 = (cx + 1) * w / grid
              val y0 = cy * h / grid; val y1 = (cy + 1) * h / grid
              var sum = 0L; var n = 0L
              var y = y0
              while (y < y1) {
                var x = x0
                while (x < x1) {
                  val p = img.getRGB(x, y)
                  sum += (((p >>> 16) & 0xff) + ((p >>> 8) & 0xff) + (p & 0xff)) / 3
                  n += 1; x += 1
                }
                y += 1
              }
              cells(cy * grid + cx) = if (n == 0) 0L else sum / n
              cx += 1
            }
            cy += 1
          }
          val mean = cells.sum / cells.length
          var hash = 0L
          var i = 0
          while (i < cells.length) {
            if (cells(i) > mean) hash |= 1L << i
            i += 1
          }
          PerceptualHash(r.doc_id, hash)
        }
      }
    }
  }

  case class ToneProfile(doc_id: Long, share_ppm: Long, blank: Boolean)

  /** BLANK / NEAR-BLANK image filter: the media-curation gate that drops
    * failed renders, empty-page screenshots, and solid placeholders —
    * images whose DOMINANT tone band covers ≥ `threshold` ppm of the
    * raster carry no trainable signal. Pixels bucket into `bands`
    * grayscale bands (band = gray·bands div 256, integer), the dominant
    * share lands on the 1e-6 grid — all exact, so a synthetic fixture's
    * share is pure id arithmetic while the real decode + raster walk run.
    * One pass per image inside the decode partition (no shuffle);
    * undecodable payloads are dropped (no raster to judge). */
  def blankFilter(media: DataFrame, bands: Int = 4,
                  threshold: Long = 900000L): Dataset[ToneProfile] = {
    require(bands > 0 && bands <= 256, s"bands must be in 1..256: $bands")
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { r =>
        val img = try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
        catch { case _: Exception => null }
        if (img == null) Iterator.empty
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          val counts = new Array[Long](bands)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = img.getRGB(x, y)
              val g = (((p >>> 16) & 0xff) + ((p >>> 8) & 0xff) + (p & 0xff)) / 3
              counts(g * bands / 256) += 1
              x += 1
            }
            y += 1
          }
          val share = counts.max * 1000000L / (w.toLong * h)
          Iterator.single(ToneProfile(r.doc_id, share, share >= threshold))
        }
      }
    }
  }

  /** ROTATION-CANONICAL perceptual hash: the minimum aHash over the four
    * 90° orientations of the decoded raster — re-oriented copies (phone
    * photos, rotated scans, EXIF-stripped re-uploads) share one hash
    * where plain [[aHash64]] splits them fourfold. Each orientation's
    * hash is computed by walking the SAME in-memory raster with
    * transformed coordinates (no pixel copy, no re-decode): per image
    * this is 4 grid passes inside the one decode pass, rows never
    * shuffle. min() canonicalizes because any of the four orientations
    * of the same content produces the same 4-hash SET — the orbit is the
    * identity, its least member the representative. Undecodable → −1. */
  def canonicalAHash64(media: DataFrame, grid: Int = 8): Dataset[PerceptualHash] = {
    require(grid > 0 && grid * grid <= 64, s"grid² must fit 64 bits: $grid")
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val img = try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
        catch { case _: Exception => null }
        if (img == null) PerceptualHash(r.doc_id, -1L)
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          def gray(x: Int, y: Int): Long = {
            val p = img.getRGB(x, y)
            ((((p >>> 16) & 0xff) + ((p >>> 8) & 0xff) + (p & 0xff)) / 3).toLong
          }
          // one orientation's aHash over accessor-space dims (ww, hh)
          def hashOf(ww: Int, hh: Int, pix: (Int, Int) => Long): Long = {
            val cells = new Array[Long](grid * grid)
            var cy = 0
            while (cy < grid) {
              var cx = 0
              while (cx < grid) {
                val x0 = cx * ww / grid; val x1 = (cx + 1) * ww / grid
                val y0 = cy * hh / grid; val y1 = (cy + 1) * hh / grid
                var sum = 0L; var n = 0L
                var y = y0
                while (y < y1) {
                  var x = x0
                  while (x < x1) { sum += pix(x, y); n += 1; x += 1 }
                  y += 1
                }
                cells(cy * grid + cx) = if (n == 0) 0L else sum / n
                cx += 1
              }
              cy += 1
            }
            val mean = cells.sum / cells.length
            var hash = 0L
            var i = 0
            while (i < cells.length) {
              if (cells(i) > mean) hash |= 1L << i
              i += 1
            }
            hash
          }
          val h0 = hashOf(w, h, (x, y) => gray(x, y))
          val h90 = hashOf(h, w, (x, y) => gray(y, h - 1 - x))
          val h180 = hashOf(w, h, (x, y) => gray(w - 1 - x, h - 1 - y))
          val h270 = hashOf(h, w, (x, y) => gray(w - 1 - y, x))
          PerceptualHash(r.doc_id, Seq(h0, h90, h180, h270).min)
        }
      }
    }
  }

  /** Rotation-invariant perceptual dedup: [[phashDedup]] over the
    * canonical orientation hash — the grouping that catches re-oriented
    * copies. Output: (phash, n_copies, keeper). */
  def rotationDedup(media: DataFrame, grid: Int = 8): DataFrame =
    canonicalAHash64(media, grid).toDF()
      .groupBy(col("phash"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keeper"))

  /** Perceptual media dedup: group by aHash — near-identical renders
    * (recompressions, format shifts, minor tone drift within the cell
    * threshold) land in one group even when their BYTES differ, which is
    * exactly what [[dedupExact]]'s content-hash cannot see. Same one
    * uniform-key shuffle shape. Output: (phash, n_copies, keeper). */
  def phashDedup(media: DataFrame, grid: Int = 8): DataFrame =
    aHash64(media, grid).toDF()
      .groupBy(col("phash"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keeper"))

  case class ImagePatch(doc_id: Long, px: Int, py: Int,
                        patch_w: Int, patch_h: Int, gray_sum: Long)

  /** PATCH extraction (the ViT data-prep step): real decode → the image
    * cut into a `grid`×`grid` array of patches (block boundaries by the
    * same integer `c·dim/grid` arithmetic as [[aHash64]] — no resampler
    * semantics in the contract), one typed row per patch with its exact
    * integer grayscale sum. A real vision pipeline replaces the feature
    * with the raw patch tensor; the SHAPE — one row per (image, py, px)
    * with typed coordinates, flatMap'd inside the decode pass so pixels
    * never shuffle — is the contract this operator pins. Undecodable
    * payloads yield no patches (decode-failure-drops convention). */
  def patchify(media: DataFrame, grid: Int = 4): Dataset[ImagePatch] = {
    require(grid > 0, s"grid must be positive: $grid")
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { r =>
        val img = try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
        catch { case _: Exception => null }
        if (img == null) Iterator.empty
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          for {
            cy <- (0 until grid).iterator
            cx <- (0 until grid).iterator
            x0 = cx * w / grid; x1 = (cx + 1) * w / grid
            y0 = cy * h / grid; y1 = (cy + 1) * h / grid
            if x1 > x0 && y1 > y0 // degenerate cells of tiny images drop
          } yield {
            var sum = 0L
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) {
                val p = img.getRGB(x, y)
                sum += (((p >>> 16) & 0xff) + ((p >>> 8) & 0xff) + (p & 0xff)) / 3
                x += 1
              }
              y += 1
            }
            ImagePatch(r.doc_id, cx, cy, x1 - x0, y1 - y0, sum)
          }
        }
      }
    }
  }

  case class CropBox(doc_id: Long, x0: Int, y0: Int, crop_w: Int, crop_h: Int)

  /** LETTERBOX/PILLARBOX detection: find the maximal all-dark border
    * rows (top/bottom) and columns (left/right) of each decoded image
    * and emit the content crop box — the pre-crop every vision-training
    * pipeline runs so padding bars don't dilute patch statistics (and
    * so aHash/patchify fingerprints aren't dominated by black borders).
    * A pixel is "bar" when its RGB mean ≤ `threshold`. An image with no
    * content pixel reports (0, 0, 0, 0) — fully synthetic padding,
    * droppable upstream.
    *
    * Row/column scans are independent (a bar row is all-dark, so it
    * never blocks column detection), run per partition behind the same
    * typed decode seam as [[patchify]]/[[aHash64]]: one row in, one
    * typed row out, columns ordinary downstream so Catalyst prunes
    * around them. Undecodable payloads are dropped (they have no
    * raster to crop). */
  def detectLetterbox(media: DataFrame, threshold: Int = 0): Dataset[CropBox] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { r =>
        val img = try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
        catch { case _: Exception => null }
        if (img == null) Iterator.empty
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          def dark(x: Int, y: Int): Boolean = {
            val p = img.getRGB(x, y)
            (((p >>> 16) & 0xff) + ((p >>> 8) & 0xff) + (p & 0xff)) / 3 <= threshold
          }
          def rowDark(y: Int): Boolean = { var x = 0; while (x < w && dark(x, y)) x += 1; x == w }
          def colDark(x: Int): Boolean = { var y = 0; while (y < h && dark(x, y)) y += 1; y == h }
          var top = 0; while (top < h && rowDark(top)) top += 1
          if (top == h) Iterator.single(CropBox(r.doc_id, 0, 0, 0, 0))
          else {
            var bot = h - 1; while (bot > top && rowDark(bot)) bot -= 1
            var left = 0; while (left < w && colDark(left)) left += 1
            var right = w - 1; while (right > left && colDark(right)) right -= 1
            Iterator.single(CropBox(r.doc_id, left, top, right - left + 1, bot - top + 1))
          }
        }
      }
    }
  }

  /** DECODE-HEALTH census: per claimed mime type, how many payloads the
    * real decoder actually accepts — the media-feed integrity number
    * (a mime class going dark means an upstream re-encoder broke, and
    * mislabeled-but-decodable classes surface as healthy under a
    * "wrong" name). Header-only decode, one pass, mime-classes-sized
    * output: (mime, n, n_decodable, ok_ppm). */
  def decodeHealth(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.map { r =>
        val (w, _) = ImageIODecoder.decode(r.mime, r.payload)
        (r.mime, if (w > 0) 1L else 0L)
      }
    }.toDF("mime", "ok")
      .groupBy(col("mime"))
      .agg(count(lit(1)).as("n"), sum(col("ok")).as("n_decodable"))
      .withColumn("ok_ppm", expr("(n_decodable * 1000000L) div n"))
  }

  case class AspectAssign(doc_id: Long, width: Int, height: Int,
                          bucket_w: Int, bucket_h: Int)

  /** ASPECT-RATIO BUCKETING: assign each image to the nearest of a fixed
    * aspect-ratio bucket set — the batching precondition of every
    * variable-aspect vision-training pipeline (images batch only with
    * same-shaped peers; a census over the buckets IS the batch plan).
    *
    * Nearest is decided in EXACT integer arithmetic: with D = lcm of
    * bucket denominators, |w/h − bw/bh| ranks identically to
    * |D·w − (bw·D/bh)·h| (multiply through by D·h > 0, one common
    * denominator for every bucket) — no float ratio ever forms, so the
    * assignment is bit-stable and oracle-replayable. Ties go to the
    * earlier bucket in the list.
    *
    * Dimensions come from the HEADER-ONLY [[ImageIODecoder]] (rasters
    * never materialize) and the bucket loop runs inside the same decode
    * pass — per image this is O(|buckets|) integer ops and NO shuffle;
    * the downstream census is a buckets-sized aggregate. Undecodable
    * payloads are dropped. */
  def aspectBuckets(media: DataFrame,
      buckets: Seq[(Int, Int)] = Seq((1, 1), (4, 3), (3, 4), (16, 9),
        (9, 16), (3, 2), (2, 3))): Dataset[AspectAssign] = {
    val spark = media.sparkSession
    import spark.implicits._
    @annotation.tailrec def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
    val d = buckets.map(_._2.toLong).foldLeft(1L)((acc, b) => acc / gcd(acc, b) * b)
    val scaled = buckets.map { case (bw, bh) => (bw * (d / bh), bw, bh) }
    media.as[MediaRecord].mapPartitions { it =>
      it.flatMap { r =>
        val (w, h) = ImageIODecoder.decode(r.mime, r.payload)
        if (w <= 0 || h <= 0) Iterator.empty
        else {
          var bestW = 0; var bestH = 0; var bestD = Long.MaxValue
          scaled.foreach { case (rs, bw, bh) =>
            val dist = math.abs(d * w - rs * h)
            if (dist < bestD) { bestD = dist; bestW = bw; bestH = bh }
          }
          Iterator.single(AspectAssign(r.doc_id, w, h, bestW, bestH))
        }
      }
    }
  }

  /** PERCEPTUAL near-dup PAIR search: aHash fingerprints + the
    * pigeonhole Hamming band join ([[graft.ops.Dedup.hammingPairs]],
    * recall 1.0 by construction) — the media variant of text SimHash
    * pairs. [[phashDedup]] groups only EXACT hash matches
    * (re-encodings); this finds the slightly-retouched variants — a few
    * flipped grid cells from noise, small overlays, brightness-local
    * edits — that land within `maxHamming` bits, without any pairwise
    * scan (band buckets bound the join). Undecodable payloads (aHash
    * −1) are excluded up front: they are not near-dups of each other.
    * `maxHamming + 1` must divide 64 (the band layout). Output:
    * (a_id, b_id, hamming). */
  def perceptualNearDupPairs(media: DataFrame, maxHamming: Int = 3,
                             grid: Int = 8,
                             maxBucket: Option[Int] = None): DataFrame = {
    require(maxHamming >= 0 && 64 % (maxHamming + 1) == 0,
      s"maxHamming + 1 must divide 64 for the band layout, got $maxHamming")
    val fps = aHash64(media, grid).toDF().filter(col("phash") =!= -1L)
    graft.ops.Dedup.hammingPairs(fps, "doc_id", "phash",
      bits = 64, bands = maxHamming + 1, maxHamming = maxHamming,
      maxBucket = maxBucket)
  }

  /** [[perceptualNearDupPairs]] at ROTATION-CANONICAL granularity: the
    * pigeonhole Hamming band join over [[canonicalAHash64]] fingerprints
    * — finds the rotated-AND-retouched variants neither plain-hash pairs
    * (rotation moves ~half the bits) nor exact canonical grouping (a
    * retouch flips bits) can see. Same recall-1.0 band layout, same
    * bucket bounds. Output: (a_id, b_id, hamming over canonicals). */
  def rotationNearDupPairs(media: DataFrame, maxHamming: Int = 3,
                           grid: Int = 8,
                           maxBucket: Option[Int] = None): DataFrame = {
    require(maxHamming >= 0 && 64 % (maxHamming + 1) == 0,
      s"maxHamming + 1 must divide 64 for the band layout, got $maxHamming")
    val fps = canonicalAHash64(media, grid).toDF().filter(col("phash") =!= -1L)
    graft.ops.Dedup.hammingPairs(fps, "doc_id", "phash",
      bits = 64, bands = maxHamming + 1, maxHamming = maxHamming,
      maxBucket = maxBucket)
  }

  // Audio ----------------------------------------------------------------

  /** The audio decode seam (the [[MediaDecoder]] pattern for sample
    * streams): payload bytes → PCM samples. A real deployment implements
    * this with a codec library (FFmpeg/JavaSound); the engine relies only
    * on the interface — windowing, energy, and trimming below never look
    * at bytes. */
  trait AudioDecoder extends Serializable {
    def decode(mime: String, payload: Array[Byte]): Array[Short]
  }

  /** REAL decoder for raw PCM signed-16-bit little-endian (the WAV data
    * chunk / `audio/L16`-style payload) — byte-pair reassembly is the
    * actual wire format, no external codec needed. A trailing odd byte is
    * a malformed frame and drops (the decode-failure-drops-value
    * convention), never throws. */
  object PcmS16leDecoder extends AudioDecoder {
    override def decode(mime: String, payload: Array[Byte]): Array[Short] = {
      val n = payload.length / 2
      val out = new Array[Short](n)
      var i = 0
      while (i < n) {
        out(i) = ((payload(2 * i) & 0xff) | (payload(2 * i + 1) << 8)).toShort
        i += 1
      }
      out
    }
  }

  case class AudioWindow(
      doc_id: Long, win_idx: Long, n_samples: Long, energy_q: Long, peak: Long)

  /** Deterministic PCM fixture synthesis (the audio twin of m05's
    * in-query PNG generation): each doc renders `4 + id%4` windows of 16
    * samples, the first `id%3` and last `id%2` windows silent, interior
    * samples `(id·31 + i·7) mod 201 − 100` — chosen so no interior window
    * can be all-zero (the per-sample step 7 can't hold a residue for 16
    * consecutive samples), making the loud region well-defined. Emitted
    * as REAL s16le bytes so the operator under test genuinely decodes. */
  def synthPcm(ids: DataFrame, windowSamples: Int = 16): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col("doc_id").cast("long")).as[Long].map { id =>
      val wTotal = (4 + id % 4).toInt
      val lead = (id % 3).toInt
      val tail = (id % 2).toInt
      val n = wTotal * windowSamples
      val bytes = new Array[Byte](n * 2) // silent regions stay zero
      var w = lead
      while (w < wTotal - tail) {
        var j = 0
        while (j < windowSamples) {
          val i = w * windowSamples + j
          val s = ((id * 31 + i * 7) % 201 - 100).toShort
          bytes(2 * i) = (s & 0xff).toByte
          bytes(2 * i + 1) = ((s >> 8) & 0xff).toByte
          j += 1
        }
        w += 1
      }
      (id, "audio/pcm-s16le", bytes)
    }.toDF("doc_id", "mime", "payload")
  }

  /** Fixed-size audio windowing with exact integer energy: one row per
    * window with Σ s² (energy) and max |s| (peak) — the per-window
    * features VAD / silence detection runs on. Same per-partition decoder
    * amortization as every seam operator; all-integer arithmetic so the
    * features are engine-portable. */
  /** One record's windows with exact integer features: Σ s² (energy) and
    * max |s| (peak) — the per-window features VAD / silence detection
    * runs on. All-integer, so engine-portable. */
  private def windowsOf(r: MediaRecord, windowSamples: Int,
                        decoder: AudioDecoder): Array[AudioWindow] = {
    val s = decoder.decode(r.mime, r.payload)
    val wins = (s.length + windowSamples - 1) / windowSamples
    Array.tabulate(wins) { w =>
      val from = w * windowSamples
      val until = math.min(from + windowSamples, s.length)
      var energy = 0L; var peak = 0L
      var i = from
      while (i < until) {
        val v = s(i).toLong
        energy += v * v
        val a = math.abs(v)
        if (a > peak) peak = a
        i += 1
      }
      AudioWindow(r.doc_id, (w + 1).toLong, (until - from).toLong, energy, peak)
    }
  }

  /** Fixed-size audio windowing: one row per window. Per-partition
    * decoder amortization like every seam operator. */
  def audioWindows(media: DataFrame, windowSamples: Int = 16,
                   decoder: AudioDecoder = PcmS16leDecoder): Dataset[AudioWindow] = {
    require(windowSamples > 0, s"windowSamples must be positive: $windowSamples")
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.flatMap(windowsOf(_, windowSamples, decoder))
    }
  }

  /** Sample-rate conversion by a rational factor l/m (out/in) with
    * EXACT-INTEGER linear interpolation — the audio-curation normalize
    * step that makes a mixed-rate corpus uniform before windowing/
    * training. Output sample n sits at input position n·m/l: with
    * p = ⌊n·m/l⌋ and phase f = n·m − p·l ∈ [0, l),
    * `y[n] = x[p] + ⌊(x[p+1] − x[p])·f / l⌋` (floor division — exact and
    * engine-portable, the trainCentroids update convention), so the
    * resampled stream is a pure integer function of the input and the
    * DuckDB oracle replays it bit-for-bit. Output length
    * ⌊(nIn−1)·l/m⌋ + 1 — the last output never reads past x[nIn−1].
    *
    * Emitted re-windowed ([[AudioWindow]] over the RESAMPLED stream):
    * the resample + window + feature scan runs on one doc's in-memory
    * sample array INSIDE the decode pass — samples never shuffle, and
    * at 100 TB the operator is the same map-only decode-seam pass as
    * every other audio op. */
  def resampleWindows(media: DataFrame, l: Int, m: Int,
                      windowSamples: Int = 16,
                      decoder: AudioDecoder = PcmS16leDecoder): Dataset[AudioWindow] = {
    require(l > 0 && m > 0, s"resample ratio must be positive: $l/$m")
    require(windowSamples > 0, s"windowSamples must be positive: $windowSamples")
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.flatMap { r =>
        val x = decoder.decode(r.mime, r.payload)
        if (x.length == 0) Iterator.empty
        else {
          val nOut = Math.floorDiv((x.length - 1).toLong * l, m).toInt + 1
          val y = new Array[Long](nOut)
          var n = 0
          while (n < nOut) {
            val t = n.toLong * m
            val p = (t / l).toInt // t ≥ 0: truncation == floor
            val f = t - p.toLong * l
            y(n) =
              if (f == 0L) x(p).toLong
              else x(p) + Math.floorDiv((x(p + 1) - x(p)).toLong * f, l.toLong)
            n += 1
          }
          val wins = (nOut + windowSamples - 1) / windowSamples
          Iterator.tabulate(wins) { w =>
            val from = w * windowSamples
            val until = math.min(from + windowSamples, nOut)
            var energy = 0L; var peak = 0L
            var i = from
            while (i < until) {
              val v = y(i)
              energy += v * v
              val a = math.abs(v)
              if (a > peak) peak = a
              i += 1
            }
            AudioWindow(r.doc_id, (w + 1).toLong, (until - from).toLong, energy, peak)
          }
        }
      }
    }
  }

  case class AudioPrint(doc_id: Long, pos: Long, h: Long)

  /** Scale-invariant energy-contour FINGERPRINTS — the audio-matching
    * primitive: each doc's window-energy sequence collapses to a 5-way
    * RATIO contour — per step, e[w+1] vs e[w] classified as sharp-drop
    * (2·e' < e), drop (e' < e), equal, rise (e' ≤ 2·e), sharp-rise —
    * and k consecutive symbols pack into one base-5 integer. No hashing
    * needed: 5^k fits a long for k ≤ 27 and every comparison is exact
    * integer arithmetic, engine-portable. One print per contour position.
    *
    * Ratio classes (not deltas) are what make the print INVARIANT to
    * amplitude: gain g scales every energy by g² > 0 and all four
    * comparisons are homogeneous, so the contour doesn't move — clip
    * lookup survives volume normalization. The 5-symbol alphabet (vs a
    * 3-way delta sign) is the discrimination lever: ~2.3 bits/step keeps
    * chance k-gram collisions from out-voting a true containment.
    * Swapping this contour for spectral peak pairs (when an FFT lib is
    * present) replaces THIS kernel only; [[matchAudioClips]]' plan is
    * the constellation join either way. Decode + window + contour + pack
    * all run on one doc's in-memory data inside the decode pass —
    * nothing per-sample ever shuffles. */
  def audioContourPrints(media: DataFrame, windowSamples: Int = 16, k: Int = 4,
                         decoder: AudioDecoder = PcmS16leDecoder): Dataset[AudioPrint] = {
    require(k >= 1 && k <= 27, s"contour gram k in [1,27]: $k")
    require(windowSamples > 0, s"windowSamples must be positive: $windowSamples")
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.flatMap { r =>
        val ws = windowsOf(r, windowSamples, decoder)
        val c = Array.tabulate(math.max(0, ws.length - 1)) { i =>
          val a = ws(i).energy_q; val b = ws(i + 1).energy_q
          if (b * 2 < a) 0L
          else if (b < a) 1L
          else if (b == a) 2L
          else if (b <= a * 2) 3L
          else 4L
        }
        Iterator.tabulate(math.max(0, c.length - k + 1)) { p =>
          var h = 0L; var j = 0
          while (j < k) { h = h * 5 + c(p + j); j += 1 }
          AudioPrint(r.doc_id, (p + 1).toLong, h)
        }
      }
    }
  }

  /** Clip→track matching by offset-consistency VOTING — the
    * constellation-join shape of every audio-lookup system: clip prints
    * ([[audioContourPrints]]) broadcast against ONE map-only scan of the
    * track corpus's prints, each gram match votes for
    * (track, t_pos − c_pos), and a clip's verdict is its highest-voted
    * (track, offset) pair (ties → smaller track, then smaller offset —
    * deterministic). A true containment lines all the clip's grams up at
    * one offset; chance collisions scatter across offsets and lose the
    * vote.
    *
    * Scale: the corpus side NEVER shuffles on its own volume — the
    * broadcast clip set prunes it map-side, and the vote aggregate
    * carries only gram matches. Flat contours (digital silence, constant
    * tones) are hub grams — the stopword analog — so `maxDf` drops track
    * grams above a per-track document-frequency cap before the join,
    * the same candidate-volume contract as shingle dedup's df cap.
    * Output: (clip_id, track_id, offset_w, votes), one row per matched
    * clip; clips with no offset reaching `minVotes` produce no row. */
  def matchAudioClips(tracks: DataFrame, clips: DataFrame,
                      windowSamples: Int = 16, k: Int = 4, minVotes: Long = 2,
                      maxDf: Option[Int] = None,
                      decoder: AudioDecoder = PcmS16leDecoder): DataFrame =
    clipMatches(tracks, clips, windowSamples, k, minVotes, maxDf, decoder)
      .groupBy(col("clip_id"))
      .agg(max(struct(col("votes"), (-col("track_id")).as("nt"),
        (-col("offset_w")).as("no"))).as("b"))
      .select(col("clip_id"), (-col("b.nt")).as("track_id"),
        (-col("b.no")).as("offset_w"), col("b.votes").as("votes"))

  /** PAIR-level clip matching — every (clip, track) pair that reaches
    * `minVotes` at some offset, with its best offset (ties → smaller).
    * The percolation-friendly granularity: each pair's verdict depends
    * only on that one track and the frozen clip set, so a track corpus
    * can be processed in chunks (or as a stream — s23) and the union of
    * chunk outputs IS the batch output. [[matchAudioClips]] adds the
    * per-clip argmax over tracks on top. */
  def clipMatches(tracks: DataFrame, clips: DataFrame,
                  windowSamples: Int = 16, k: Int = 4, minVotes: Long = 2,
                  maxDf: Option[Int] = None,
                  decoder: AudioDecoder = PcmS16leDecoder): DataFrame =
    clipMatchesPrepared(tracks,
      clipPrints(clips, windowSamples, k, decoder),
      windowSamples, k, minVotes, maxDf, decoder)

  /** The FROZEN-side half of [[clipMatches]]: the standing clip set's
    * contour fingerprints, decoded and hashed once. A streaming
    * percolator (s23) probes the SAME clips every trigger — decoding +
    * fingerprinting them per trigger re-pays the whole kernel pass;
    * persist this frame (the freeze discipline) and hand it to
    * [[clipMatchesPrepared]]. */
  def clipPrints(clips: DataFrame, windowSamples: Int = 16, k: Int = 4,
                 decoder: AudioDecoder = PcmS16leDecoder): DataFrame =
    audioContourPrints(clips, windowSamples, k, decoder).toDF()
      .select(col("doc_id").as("clip_id"), col("pos").as("c_pos"), col("h"))

  /** [[clipMatches]] against a prepared ([[clipPrints]]) — and typically
    * persisted — clip fingerprint side. */
  def clipMatchesPrepared(tracks: DataFrame, clipPrintsDf: DataFrame,
                          windowSamples: Int = 16, k: Int = 4, minVotes: Long = 2,
                          maxDf: Option[Int] = None,
                          decoder: AudioDecoder = PcmS16leDecoder): DataFrame = {
    val tp0 = audioContourPrints(tracks, windowSamples, k, decoder).toDF()
      .select(col("doc_id").as("track_id"), col("pos").as("t_pos"), col("h"))
    val tp = maxDf.fold(tp0) { cap =>
      val keep = tp0.select("track_id", "h").distinct()
        .groupBy("h").agg(count(lit(1)).as("df"))
        .filter(col("df") <= cap)
      tp0.join(keep.select("h"), Seq("h"))
    }
    val cp = clipPrintsDf
    tp.join(broadcast(cp), Seq("h"))
      .groupBy(col("clip_id"), col("track_id"),
        (col("t_pos") - col("c_pos")).as("offset_w"))
      .agg(count(lit(1)).as("votes"))
      .filter(col("votes") >= minVotes)
      .groupBy(col("clip_id"), col("track_id"))
      .agg(max(struct(col("votes"), (-col("offset_w")).as("no"))).as("b"))
      .select(col("clip_id"), col("track_id"),
        (-col("b.no")).as("offset_w"), col("b.votes").as("votes"))
  }

  /** Leading/trailing-silence trim (the audio-curation normalize step):
    * keep each doc's windows from its first to its last window with
    * energy > `threshold`. The first/last-loud scan runs over one doc's
    * in-memory window array INSIDE the decode pass — windows never
    * shuffle (a groupBy(doc) formulation would exchange every window),
    * and fully-silent docs vanish at the scan. */
  def trimSilence(media: DataFrame, windowSamples: Int = 16, threshold: Long = 0L,
                  decoder: AudioDecoder = PcmS16leDecoder): Dataset[AudioWindow] = {
    require(windowSamples > 0, s"windowSamples must be positive: $windowSamples")
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.flatMap { r =>
        val ws = windowsOf(r, windowSamples, decoder)
        var lo = -1; var hi = -1
        var i = 0
        while (i < ws.length) {
          if (ws(i).energy_q > threshold) { if (lo < 0) lo = i; hi = i }
          i += 1
        }
        if (lo < 0) Iterator.empty
        else ws.iterator.slice(lo, hi + 1)
      }
    }
  }

  /** Per-partition imperative decode + feature extraction. */
  def extractFeatures(media: DataFrame, decoder: MediaDecoder = StubDecoder): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      // one decoder per partition — init cost amortized
      it.map { r =>
        val (w, h) = decoder.decode(r.mime, r.payload)
        var sum = 0L
        var i = 0
        val upTo = math.min(64, r.payload.length)
        while (i < upTo) { sum += r.payload(i) & 0xff; i += 1 }
        MediaFeatures(
          doc_id = r.doc_id,
          byte_len = r.payload.length.toLong,
          head_hex = toHex(r.payload, 0, math.min(16, r.payload.length)),
          byte_sum = sum,
          width = w,
          height = h)
      }
    }.toDF()
  }
}
