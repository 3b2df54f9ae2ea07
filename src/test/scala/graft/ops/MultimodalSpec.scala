package graft.ops

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The image decode seam with a REAL codec: ImageIODecoder must recover
  * true dimensions from genuine PNG/JPEG/GIF bytes (encoded in-test with
  * the same JDK ImageIO), degrade to (-1,-1) on junk instead of failing
  * the row, and run distributed through extractFeatures' per-partition
  * decoder plumbing. */
class MultimodalSpec extends SparkSpec {

  private def encode(w: Int, h: Int, format: String): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    (0 until w).foreach(x => (0 until h).foreach(y =>
      img.setRGB(x, y, (x * 31 + y * 7) & 0xffffff)))
    val out = new ByteArrayOutputStream()
    require(ImageIO.write(img, format, out), s"JDK can't encode $format")
    out.toByteArray
  }

  test("ImageIODecoder reads true dimensions from real PNG/JPEG/GIF headers") {
    assert(Multimodal.ImageIODecoder.decode("image/png", encode(3, 2, "png")) == (3, 2))
    assert(Multimodal.ImageIODecoder.decode("image/jpeg", encode(7, 5, "jpg")) == (7, 5))
    assert(Multimodal.ImageIODecoder.decode("image/gif", encode(11, 4, "gif")) == (11, 4))
    // PNG magic: 8 header bytes — the decoder must read dimensions from
    // the header without needing a full raster decode of a large image
    val big = encode(640, 480, "png")
    assert(Multimodal.ImageIODecoder.decode("image/png", big) == (640, 480))
  }

  test("undecodable payloads degrade to (-1,-1), never throw (drop-value convention)") {
    assert(Multimodal.ImageIODecoder.decode("image/png", Array[Byte](1, 2, 3)) == (-1, -1))
    assert(Multimodal.ImageIODecoder.decode("text/plain",
      "not an image".getBytes("UTF-8")) == (-1, -1))
    assert(Multimodal.ImageIODecoder.decode("image/png", Array.empty[Byte]) == (-1, -1))
    // a PNG magic prefix with a truncated/corrupt body must not throw
    val corrupt = encode(3, 2, "png").take(12)
    val (w, _) = Multimodal.ImageIODecoder.decode("image/png", corrupt)
    assert(w == -1 || w == 3) // header may or may not survive truncation
  }

  test("extractFeatures runs the real decoder per-partition over binary payloads") {
    import spark.implicits._
    val rows = Seq(
      (1L, "image/png", encode(3, 2, "png")),
      (2L, "image/jpeg", encode(7, 5, "jpg")),
      (3L, "text/plain", "junk".getBytes("UTF-8")))
    val media = rows.toDF("doc_id", "mime", "payload").repartition(2)
    val got = Multimodal.extractFeatures(media, Multimodal.ImageIODecoder)
      .select("doc_id", "width", "height")
      .as[(Long, Int, Int)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 3, 2), (2L, 7, 5), (3L, -1, -1)))
  }

  test("fitWithin: aspect-preserving integer fit, never upscales, floors at 1") {
    assert(Multimodal.fitWithin(10, 10, 32, 32) == ((10, 10)), "inside the box: unchanged")
    assert(Multimodal.fitWithin(64, 48, 32, 32) == ((32, 24)), "width binds")
    assert(Multimodal.fitWithin(48, 64, 32, 32) == ((24, 32)), "height binds")
    assert(Multimodal.fitWithin(64, 1, 32, 32) == ((32, 1)), "thin strip floors at 1")
    assert(Multimodal.fitWithin(100, 50, 10, 40) == ((10, 5)), "asymmetric box")
  }

  test("resizeImages: real decode + scale; solid fill checks out; junk degrades") {
    import spark.implicits._
    def solid(w: Int, h: Int, c: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      try { g.setColor(new java.awt.Color(c, c, c)); g.fillRect(0, 0, w, h) }
      finally g.dispose()
      val out = new ByteArrayOutputStream()
      ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val media = Seq(
      (1L, "image/png", solid(64, 48, 100)),  // scales to 32x24
      (2L, "image/png", solid(8, 8, 7)),      // inside the box: untouched
      (3L, "application/octet-stream", Array[Byte](1, 2, 3)))
      .toDF("doc_id", "mime", "payload")
    val got = Multimodal.resizeImages(media, 32, 32)
      .collect().map(r => r.doc_id -> r).toMap
    assert((got(1L).width, got(1L).height, got(1L).new_w, got(1L).new_h) == ((64, 48, 32, 24)))
    assert(got(1L).pixel_sum == 32L * 24 * 3 * 100,
      s"resized raster of a solid image must stay solid: ${got(1L)}")
    assert((got(2L).new_w, got(2L).new_h, got(2L).pixel_sum) == ((8, 8, 8L * 8 * 3 * 7)))
    assert(got(3L).width == -1 && got(3L).pixel_sum == -1L, "junk degrades, never throws")
  }

  test("chunk/sample frame shapes agree with a brute-force reference") {
    import spark.implicits._
    val payload = (0 until 100).map(_.toByte).toArray
    val media = Seq((9L, "application/octet-stream", payload))
      .toDF("doc_id", "mime", "payload")
    val all = Multimodal.chunkFrames(media, frameBytes = 32).collect()
    assert(all.map(_.frame_idx).sorted.toSeq == Seq(1L, 2L, 3L, 4L))
    assert(all.map(_.frame_len).sum == 100)
    val sampled = Multimodal.sampleFrames(media, frameBytes = 32, stride = 2).collect()
    assert(sampled.map(_.frame_idx).sorted.toSeq == Seq(1L, 3L),
      "stride-2 keeps frames 1 and 3 only")
  }

  test("aHash groups re-encodings that content-md5 splits; junk hashes to -1") {
    import spark.implicits._
    def render(fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(32, 32,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      try {
        g.setColor(new java.awt.Color(140, 140, 140)); g.fillRect(0, 0, 16, 32)
        g.setColor(new java.awt.Color(40, 40, 40)); g.fillRect(16, 0, 16, 32)
      } finally g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    val png = render("png"); val bmp = render("bmp")
    assert(!java.util.Arrays.equals(png, bmp), "distinct bytes by construction")
    val media = Seq((1L, "image/png", png), (2L, "image/bmp", bmp),
      (3L, "application/octet-stream", Array[Byte](1, 2, 3))).toDF("doc_id", "mime", "payload")
    // content dedup sees three distinct payloads...
    assert(Multimodal.dedupExact(media).count() == 3)
    // ...perceptual dedup sees one image twice (+ the junk sentinel)
    val groups = Multimodal.phashDedup(media).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val junk = groups.find(_._1 == -1L).get
    assert(junk._2 == 1L && junk._3 == 3L)
    val img = groups.filter(_._1 != -1L)
    assert(img.length == 1 && img.head._2 == 2L && img.head._3 == 1L,
      s"png+bmp must share one perceptual group: ${groups.toSeq}")
    // left half is the bright half: bits 0-3 of each row set
    val expected = (0 until 8).map(cy => (0 until 4).map(cx => 1L << (cy * 8 + cx)).sum).sum
    assert(img.head._1 == expected)
  }

  test("PcmS16leDecoder: little-endian reassembly incl. negatives; odd tail drops") {
    val bytes = Array[Byte](0x34, 0x12, 0xff.toByte, 0xff.toByte, 0x00, 0x80.toByte, 0x7f)
    val s = Multimodal.PcmS16leDecoder.decode("audio/pcm-s16le", bytes)
    assert(s.toSeq == Seq(0x1234.toShort, (-1).toShort, Short.MinValue))
  }

  test("audioWindows: exact integer energy/peak; short final window") {
    import spark.implicits._
    // samples: 3, -4, 0, 5 → windows of 2: [3,-4] e=25 p=4; [0,5] e=25 p=5
    val bytes = Array[Short](3, -4, 0, 5).flatMap(v =>
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte))
    val media = Seq((1L, "audio/pcm-s16le", bytes)).toDF("doc_id", "mime", "payload")
    val w = Multimodal.audioWindows(media, windowSamples = 2).collect()
      .sortBy(_.win_idx).map(x => (x.win_idx, x.n_samples, x.energy_q, x.peak))
    assert(w.toSeq == Seq((1L, 2L, 25L, 4L), (2L, 2L, 25L, 5L)))
    // 3 samples at window 2 → final window is short
    val odd = Seq((2L, "audio/pcm-s16le", bytes.take(6))).toDF("doc_id", "mime", "payload")
    val ws = Multimodal.audioWindows(odd, windowSamples = 2).collect().sortBy(_.win_idx)
    assert(ws.map(_.n_samples).toSeq == Seq(2L, 1L))
  }

  test("trimSilence keeps first-loud..last-loud; interior silence survives; all-silent docs vanish") {
    import spark.implicits._
    def pcm(vs: Short*): Array[Byte] =
      vs.toArray.flatMap(v => Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte))
    val media = Seq(
      // windows of 2: [0,0] [1,0] [0,0] [0,2] [0,0] → keep 2..4 (incl. silent 3)
      (1L, "audio/pcm-s16le", pcm(0, 0, 1, 0, 0, 0, 0, 2, 0, 0)),
      (2L, "audio/pcm-s16le", pcm(0, 0, 0, 0)) // fully silent → no rows
    ).toDF("doc_id", "mime", "payload")
    val kept = Multimodal.trimSilence(media, windowSamples = 2).collect()
    assert(kept.forall(_.doc_id == 1L))
    assert(kept.map(_.win_idx).sorted.toSeq == Seq(2L, 3L, 4L))
    assert(kept.find(_.win_idx == 3L).get.energy_q == 0L, "interior silence is content")
  }

  test("resampleWindows: 1:1 is identity; hand-traced upsample; downsample shortens the stream") {
    import spark.implicits._
    val ids = Seq(3L, 7L, 10L).toDF("doc_id")
    val media = Multimodal.synthPcm(ids)
    // l = m ⇒ y == x, so windows must equal audioWindows exactly
    val id11 = Multimodal.resampleWindows(media, l = 1, m = 1).collect().toSeq
      .sortBy(w => (w.doc_id, w.win_idx))
    val base = Multimodal.audioWindows(media).collect().toSeq
      .sortBy(w => (w.doc_id, w.win_idx))
    assert(id11 == base)

    // hand trace: samples [0, 10, -7] upsampled 2:1 →
    // [0, 5, 10, ⌊(−17)/2⌋+10 = 1, −7]; one window of 5
    def s16le(xs: Seq[Int]): Array[Byte] =
      xs.flatMap(v => Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)).toArray
    val tiny = Seq((1L, "audio/pcm-s16le", s16le(Seq(0, 10, -7))))
      .toDF("doc_id", "mime", "payload")
    val up = Multimodal.resampleWindows(tiny, l = 2, m = 1).collect()
    assert(up.toSeq == Seq(Multimodal.AudioWindow(1L, 1L, 5L, 0 + 25 + 100 + 1 + 49, 10L)),
      up.toSeq.toString)

    // 3:2 downsample: output length ⌊(n−1)·2/3⌋+1 per doc
    val down = Multimodal.resampleWindows(media, l = 2, m = 3, windowSamples = 1000)
      .collect().toSeq
    ids.collect().map(_.getLong(0)).foreach { id =>
      val nIn = (4 + id % 4) * 16
      val expect = (nIn - 1) * 2 / 3 + 1
      assert(down.filter(_.doc_id == id).map(_.n_samples).sum == expect)
    }
  }

  test("videoNearDupPairs: clipped copy pairs with its original; viral frames df-capped") {
    import spark.implicits._
    def doc(id: Long, frames: Seq[String]) = (id, frames.mkString)
    val f = (c: Char) => c.toString * 32 // one 32-byte frame of a single char
    val base = Seq(
      doc(1L, Seq(f('a'), f('b'), f('c'), f('d'), f('e'))),
      doc(2L, Seq(f('b'), f('c'), f('d'), f('e'))), // doc 1 minus its first frame
      doc(3L, Seq(f('x'), f('y'), f('z'), f('w'), f('v'))), // unrelated
      // docs 4..9 share ONLY the viral frame 'q' with each other
      doc(4L, Seq(f('q'), f('1'))), doc(5L, Seq(f('q'), f('2'))),
      doc(6L, Seq(f('q'), f('3'))), doc(7L, Seq(f('q'), f('4'))),
      doc(8L, Seq(f('q'), f('5'))), doc(9L, Seq(f('q'), f('6'))))
      .toDF("doc_id", "text")
    val media = Multimodal.toMedia(base)
    val pairs = Multimodal.videoNearDupPairs(media, frameBytes = 32,
        threshold = 0.5, maxDf = Some(5))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(4))).toSeq
    // only (1,2): inter 4, union 5 → 0.8; the q-sharers' only common
    // signature is viral (df 6 > 5) and must not generate candidates
    assert(pairs.map(p => (p._1, p._2)) == Seq((1L, 2L)), pairs.toString)
    assert(math.abs(pairs.head._3 - 0.8) < 1e-12)

    // without the cap the q-sharers WOULD pair at 1/3 — below the 0.5
    // threshold here, so raise none; but at threshold 0.3 they all appear
    val uncapped = Multimodal.videoNearDupPairs(media, frameBytes = 32,
        threshold = 0.3, maxDf = None)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.contains((4L, 5L)) && uncapped.size >= 16,
      s"uncapped viral frame must candidate all q-sharers: $uncapped")
  }

  test("perceptualNearDupPairs == brute-force Hamming ball over the aHashes") {
    import spark.implicits._
    def png(id: Long): Array[Byte] = {
      val img = new BufferedImage(32, 32, BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      try {
        var idx = 0
        while (idx < 64) {
          val base = ((id % 10) * 31 + idx * 17) % 97 < 48
          val flip = id % 4 == 0 && idx == id % 64
          val tone = if (base != flip) 140 else 40
          g.setColor(new java.awt.Color(tone, tone, tone))
          g.fillRect((idx % 8) * 4, (idx / 8) * 4, 4, 4)
          idx += 1
        }
      } finally g.dispose()
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val media = (0L until 40L).map(id => (id, "image/png", png(id)))
      .toDF("doc_id", "mime", "payload")
    val got = Multimodal.perceptualNearDupPairs(media, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val hashes = Multimodal.aHash64(media).collect().map(h => h.doc_id -> h.phash)
    val brute = (for {
      (a, ha) <- hashes; (b, hb) <- hashes if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (a, b, d.toLong)).toSet
    assert(got == brute, s"missing=${brute -- got} extra=${got -- brute}")
    assert(got.exists(_._3 == 1L), "the flipped-cell variants must pair at hamming 1")
    assert(got.exists(_._3 == 0L), "identical renders must pair at hamming 0")
  }

  test("audio clip matching: gain-invariant prints, offset voting, df cap, broadcast plan") {
    import spark.implicits._
    def s16le(samples: Array[Int]): Array[Byte] = {
      val b = new Array[Byte](samples.length * 2)
      samples.indices.foreach { i =>
        b(2 * i) = (samples(i) & 0xff).toByte
        b(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      }
      b
    }
    def x(t: Long, i: Int): Int =
      (graft.expr.TextHash.hash60(s"${t}_$i") % 201 - 100).toInt
    val tracks = Seq(1L, 2L, 3L).map { t =>
      (t, "audio/pcm-s16le", s16le(Array.tabulate(64)(i => x(t, i))))
    }.toDF("doc_id", "mime", "payload")
    // clip of track 2: 8 windows from window 3, gain 5
    val clip = Seq((20L, "audio/pcm-s16le",
      s16le(Array.tabulate(32)(j => 5 * x(2L, 12 + j))))).toDF("doc_id", "mime", "payload")

    // gain invariance: the scaled clip's prints equal the unscaled slice's
    val unscaled = Seq((20L, "audio/pcm-s16le",
      s16le(Array.tabulate(32)(j => x(2L, 12 + j))))).toDF("doc_id", "mime", "payload")
    def prints(df: org.apache.spark.sql.DataFrame) =
      Multimodal.audioContourPrints(df, windowSamples = 4, k = 4)
        .collect().sortBy(_.pos).toSeq
    assert(prints(clip) == prints(unscaled), "gain must never move the contour")

    val m = Multimodal.matchAudioClips(tracks, clip, windowSamples = 4, k = 4)
    val got = m.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq((20L, 2L, 3L, 4L)),
      s"clip must land on track 2 at window offset 3 with all 4 grams voting: $got")
    val plan = m.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "clip prints must broadcast against the track scan:\n" + plan.take(800))

    // pair granularity: per-chunk union == whole-corpus batch (the s23
    // percolation contract — a pair's verdict sees only its own track)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      Multimodal.clipMatches(df, clip, windowSamples = 4, k = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(Seq(tracks.filter(col("doc_id") <= 1), tracks.filter(col("doc_id") > 1))
      .map(pairs).reduce(_ ++ _) == pairs(tracks),
      "chunked pair matching must union to the batch result")

    // df cap: an all-silent track pair shares flat hub grams everywhere —
    // capped at 1 they vanish, so a silent clip finds nothing
    val silent = Seq(7L, 8L).map(t =>
      (t, "audio/pcm-s16le", s16le(Array.fill(64)(0)))).toDF("doc_id", "mime", "payload")
    val silentClip = Seq((70L, "audio/pcm-s16le", s16le(Array.fill(32)(0))))
      .toDF("doc_id", "mime", "payload")
    assert(Multimodal.matchAudioClips(silent, silentClip,
      windowSamples = 4, k = 4, maxDf = Some(1)).count() == 0,
      "hub grams above the df cap must drop before the join")
    assert(Multimodal.matchAudioClips(silent, silentClip,
      windowSamples = 4, k = 4).count() > 0,
      "uncapped, the flat grams do collide (the hazard the cap controls)")
  }

  test("synthPcm round-trips through the decoder: loud region = [lead, total-tail)") {
    import spark.implicits._
    val ids = Seq(7L).toDF("doc_id") // wt = 4+3 = 7, lead = 1, tail = 1
    val media = Multimodal.synthPcm(ids)
    val ws = Multimodal.audioWindows(media, windowSamples = 16).collect().sortBy(_.win_idx)
    assert(ws.length == 7)
    assert(ws.head.energy_q == 0L && ws.last.energy_q == 0L)
    assert(ws.slice(1, 6).forall(_.energy_q > 0L), "interior windows are never silent")
    val s = Multimodal.PcmS16leDecoder.decode("", media.select("payload").as[Array[Byte]].head())
    assert(s(16) == ((7L * 31 + 16 * 7) % 201 - 100).toShort, "formula survives the byte round-trip")
  }

  test("detectLetterbox: bars crop, bar-free images keep the frame, all-black reports empty") {
    import spark.implicits._
    def png(id: Long, w: Int, h: Int)(paint: java.awt.image.BufferedImage => Unit) = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      paint(img)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      (id, "image/png", bos.toByteArray)
    }
    val white = 0xffffff
    val media = Seq(
      // asymmetric-looking bars via independent scans: 2 rows top/bottom, 3 cols left/right
      png(1L, 20, 10) { im =>
        for (y <- 2 until 8; x <- 3 until 17) im.setRGB(x, y, white) },
      png(2L, 8, 8) { im => for (y <- 0 until 8; x <- 0 until 8) im.setRGB(x, y, white) },
      png(3L, 6, 6) { _ => () }, // stays zero = all black
      (4L, "image/png", Array[Byte](1, 2, 3)) // undecodable → dropped
    ).toDF("doc_id", "mime", "payload")
    val got = Multimodal.detectLetterbox(media).collect()
      .map(c => c.doc_id -> ((c.x0, c.y0, c.crop_w, c.crop_h))).toMap
    assert(got(1L) == ((3, 2, 14, 6)), got.toString)
    assert(got(2L) == ((0, 0, 8, 8)), got.toString)
    assert(got(3L) == ((0, 0, 0, 0)), got.toString)
    assert(!got.contains(4L), "undecodable payloads have no raster to crop")
  }

  test("aspectBuckets: exact-integer nearest assignment, tie to the earlier bucket, undecodable dropped") {
    import spark.implicits._
    def png(id: Long, w: Int, h: Int) = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      (id, "image/png", bos.toByteArray)
    }
    val media = Seq(
      png(1L, 32, 32),   // exact 1:1
      png(2L, 64, 36),   // exact 16:9
      png(3L, 40, 30),   // exact 4:3
      png(4L, 30, 40),   // exact 3:4
      png(5L, 33, 32),   // slightly wide of square → still (1,1)
      (6L, "image/png", Array[Byte](9, 9))) // undecodable → dropped
      .toDF("doc_id", "mime", "payload")
    val got = Multimodal.aspectBuckets(media).collect()
      .map(a => a.doc_id -> ((a.bucket_w, a.bucket_h))).toMap
    assert(got(1L) == ((1, 1)) && got(2L) == ((16, 9)) && got(3L) == ((4, 3))
      && got(4L) == ((3, 4)) && got(5L) == ((1, 1)), got.toString)
    assert(!got.contains(6L), "undecodable payloads are dropped")
    // the real dims feed the assignment: a 2:1 image is NOT in the list —
    // nearest by |D·w − rs·h| is 16:9 (|288·... closest cross-multiplied)
    val wide = Multimodal.aspectBuckets(Seq(png(7L, 64, 32)).toDF("doc_id", "mime", "payload"))
      .collect().head
    assert((wide.bucket_w, wide.bucket_h) == ((16, 9)), s"${wide.bucket_w}:${wide.bucket_h}")
  }

  test("blankFilter: solid flags, half-split does not, undecodable dropped") {
    import spark.implicits._
    def png(id: Long)(paint: java.awt.image.BufferedImage => Unit) = {
      val img = new java.awt.image.BufferedImage(16, 16,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      paint(img)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      (id, "image/png", bos.toByteArray)
    }
    val white = 0xffffff
    val media = Seq(
      png(1L) { im => for (y <- 0 until 16; x <- 0 until 16) im.setRGB(x, y, white) },
      png(2L) { im => for (y <- 0 until 8; x <- 0 until 16) im.setRGB(x, y, white) },
      (3L, "image/png", Array[Byte](7))
    ).toDF("doc_id", "mime", "payload")
    val got = Multimodal.blankFilter(media).collect()
      .map(t => t.doc_id -> ((t.share_ppm, t.blank))).toMap
    assert(got(1L) == ((1000000L, true)), got.toString)
    assert(got(2L) == ((500000L, false)), "half white, half black → 50% dominant")
    assert(!got.contains(3L), "undecodable payloads are dropped")
  }

  test("canonicalAHash64: all four orientations of one image share the canonical hash") {
    import spark.implicits._
    // an asymmetric 16×16 pattern and its three rotations as separate docs
    def render(id: Long, rot: Int) = {
      val img = new java.awt.image.BufferedImage(16, 16,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 16) {
        val (sx, sy) = rot match {
          case 0 => (x, y)
          case 1 => (y, 15 - x)          // 90° cw: R(x,y) = I(y, h-1-x)
          case 2 => (15 - x, 15 - y)
          case _ => (15 - y, x)
        }
        val tone = if ((sx * 7 + sy * 13) % 23 < 11) 200 else 30
        img.setRGB(x, y, (tone << 16) | (tone << 8) | tone)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      (id, "image/png", bos.toByteArray)
    }
    val media = (0 to 3).map(r => render(r.toLong, r))
      .toDF("doc_id", "mime", "payload")
    val plain = Multimodal.aHash64(media).collect().map(_.phash).distinct
    assert(plain.length > 1, "the pattern must not be rotation-symmetric under aHash")
    val canon = Multimodal.canonicalAHash64(media).collect().map(_.phash).distinct
    assert(canon.length == 1, s"all orientations must share one canonical hash: ${canon.toSeq}")
    // undecodable payloads → −1, never dropped silently
    val bad = Multimodal.canonicalAHash64(
      Seq((9L, "image/png", Array[Byte](1, 2))).toDF("doc_id", "mime", "payload"))
      .collect().head
    assert(bad.phash == -1L)
  }
}
