package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal
import graft.sources.Tables

/** Multimodal plumbing: batch shape, schema, determinism of the stubbed
  * decode, and frame sampling geometry.
  */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("multimodal-test")
  val dir = "/root/testdata/sf0.001"

  def media = Multimodal.syntheticMedia(
    spark, Tables.table(spark, dir, "documents"))

  test("feature extraction: one row per media, 8-dim feature, fractions sum to ~1") {
    val feats = Multimodal.extractFeatures(media, partitions = 8).collect()
    assert(feats.length == media.count())
    assert(feats.forall(_.feature.length == 8))
    assert(feats.forall(f => math.abs(f.feature.map(_.toDouble).sum - 1.0) < 1e-3))
    // deterministic across runs
    val again = Multimodal.extractFeatures(media, partitions = 4).collect()
    assert(feats.map(f => f.media_id -> f.checksum).toMap ==
      again.map(f => f.media_id -> f.checksum).toMap)
  }

  test("frame sampling: frame count and size follow payload length") {
    val frames = Multimodal.sampleFrames(media.toDF(), frameBytes = 16, stride = 2)
    val byMedia = frames.groupBy("media_id")
      .agg(count(lit(1)).as("n"), max(length(col("frame"))).as("max_len"))
      .collect()
    assert(byMedia.forall(_.getInt(2) <= 16))
    val lens = media.select(col("media_id"), length(col("data")).as("len"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    byMedia.foreach { r =>
      val expect = math.max(1, lens(r.getLong(0)) / 32)
      assert(r.getLong(1) == expect, s"media ${r.getLong(0)}")
    }
  }

  test("image_meta parses real PNG and JPEG byte streams") {
    import graft.functions.ImageBytesUtil
    // the canonical 1x1 8-bit RGBA PNG (signature + IHDR + IDAT + IEND),
    // bytes as produced by real encoders
    val onePixelPng: Array[Byte] = Array(
      0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a, // signature
      0x00, 0x00, 0x00, 0x0d, 0x49, 0x48, 0x44, 0x52, // len 13, IHDR
      0x00, 0x00, 0x00, 0x01, 0x00, 0x00, 0x00, 0x01, // w=1 h=1
      0x08, 0x06, 0x00, 0x00, 0x00, 0x1f, 0x15, 0xc4, // depth 8, color 6
      0x89, 0x00, 0x00, 0x00, 0x0a, 0x49, 0x44, 0x41,
      0x54, 0x78, 0x9c, 0x63, 0x00, 0x01, 0x00, 0x00,
      0x05, 0x00, 0x01, 0x0d, 0x0a, 0x2d, 0xb4, 0x00,
      0x00, 0x00, 0x00, 0x49, 0x45, 0x4e, 0x44, 0xae,
      0x42, 0x60, 0x82).map(_.toByte)
    val png = ImageBytesUtil.imageMeta(onePixelPng)
    assert(png != null)
    assert(png.getString(0) == "png" && png.getInt(1) == 1 &&
      png.getInt(2) == 1 && png.getInt(3) == 4)

    // a JPEG prefix in encoder layout: SOI, APP0/JFIF, DQT, then SOF0
    // 640x480 3-component — the scan must skip the variable segments
    val jpegPrefix: Array[Byte] = (
      Array(0xff, 0xd8) ++ // SOI
        Array(0xff, 0xe0, 0x00, 0x10, 0x4a, 0x46, 0x49, 0x46, 0x00, 0x01,
          0x01, 0x00, 0x00, 0x01, 0x00, 0x01, 0x00, 0x00) ++ // APP0
        (Array(0xff, 0xdb, 0x00, 0x43, 0x00) ++ Array.fill(64)(0x10)) ++ // DQT
        Array(0xff, 0xc0, 0x00, 0x11, 0x08, 0x01, 0xe0, 0x02, 0x80, 0x03,
          0x01, 0x22, 0x00, 0x02, 0x11, 0x01, 0x03, 0x11, 0x01) // SOF0
      ).map(_.toByte)
    val jpg = ImageBytesUtil.imageMeta(jpegPrefix)
    assert(jpg != null)
    assert(jpg.getString(0) == "jpeg" && jpg.getInt(1) == 640 &&
      jpg.getInt(2) == 480 && jpg.getInt(3) == 3)

    // garbage and truncation return null, and the SQL surface agrees
    assert(ImageBytesUtil.imageMeta("not an image".getBytes) == null)
    assert(ImageBytesUtil.imageMeta(onePixelPng.take(20)) == null)
    val viaSql = spark.sql(
      "SELECT m.* FROM (SELECT image_meta(unhex('89504E470D0A1A0A0000000D" +
        "494844520000014000000100080200000000000000')) AS m)").collect().head
    assert(viaSql.getString(0) == "png" && viaSql.getInt(1) == 320 &&
      viaSql.getInt(2) == 256 && viaSql.getInt(3) == 3)
  }

  test("image_meta agrees with ImageIO-written PNG/JPEG/GIF/BMP files") {
    import graft.functions.ImageBytesUtil
    val (w, h) = (37, 21)
    def write(fmt: String, imgType: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, imgType)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, (x * 31 + y * 7) * 1103515245)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), fmt)
      bos.toByteArray
    }
    import java.awt.image.BufferedImage._
    val cases = Seq(
      // (bytes, format, channels) — channels per the parser's color-model
      // mapping for what each JDK writer actually emits
      (write("png", TYPE_INT_RGB), "png", 3),
      (write("png", TYPE_INT_ARGB), "png", 4),
      (write("jpg", TYPE_3BYTE_BGR), "jpeg", 3),
      (write("gif", TYPE_BYTE_INDEXED), "gif", 3),
      (write("bmp", TYPE_3BYTE_BGR), "bmp", 3),
      (write("bmp", TYPE_BYTE_GRAY), "bmp", 1))
    for ((bytes, fmt, ch) <- cases) {
      val m = ImageBytesUtil.imageMeta(bytes)
      assert(m != null, s"$fmt: parse returned null")
      assert(m.getString(0) == fmt && m.getInt(1) == w && m.getInt(2) == h,
        s"$fmt: got (${m.getString(0)}, ${m.getInt(1)}, ${m.getInt(2)})")
      assert(m.getInt(3) == ch, s"$fmt channels: got ${m.getInt(3)}")
    }
  }

  test("audio_meta parses a real WAV header byte stream") {
    import graft.functions.ImageBytesUtil
    // canonical 44-byte PCM WAV header: 8 kHz mono 8-bit, 4 samples
    def s(str: String): Seq[Int] = str.getBytes.toSeq.map(_.toInt)
    val wav: Array[Byte] = (
      s("RIFF") ++ Seq(0x28, 0, 0, 0) ++ s("WAVE") ++
        s("fmt ") ++ Seq(16, 0, 0, 0) ++ // chunk size 16
        Seq(1, 0) ++ Seq(1, 0) ++ // PCM, mono
        Seq(0x40, 0x1f, 0, 0) ++ // 8000 Hz
        Seq(0x40, 0x1f, 0, 0) ++ // byte rate
        Seq(1, 0) ++ Seq(8, 0) ++ // block align 1, 8 bits
        s("data") ++ Seq(4, 0, 0, 0) ++ Seq(1, 2, 3, 4)
      ).map(_.toByte).toArray
    val m = ImageBytesUtil.audioMeta(wav)
    assert(m != null)
    assert(m.getString(0) == "wav" && m.getInt(1) == 8000 &&
      m.getInt(2) == 1 && m.getInt(3) == 8 && m.getLong(4) == 4L)
    assert(ImageBytesUtil.audioMeta("RIFFxxxxAVI ".getBytes) == null)
    assert(ImageBytesUtil.audioMeta(wav.take(20)) == null)
    // SQL surface parses the same byte stream
    val viaSql = spark.sql(
      "SELECT m.* FROM (SELECT audio_meta(unhex('5249464628000000" +
        "57415645666d74201000000001000100401f0000401f000001000800" +
        "646174610400000001020304')) AS m)").collect().head
    assert(viaSql.getString(0) == "wav" && viaSql.getInt(1) == 8000 &&
      viaSql.getLong(4) == 4L)

    // adversarial chunk sizes must terminate, not spin: 0xFFFFFFF8 as an
    // Int is -8 (a zero/backward cursor step before the Long-advance fix)
    val evil = (s("RIFF") ++ Seq(0x28, 0, 0, 0) ++ s("WAVE") ++
      s("junk") ++ Seq(0xf8, 0xff, 0xff, 0xff) ++ Seq.fill(16)(0))
      .map(_.toByte).toArray
    assert(ImageBytesUtil.audioMeta(evil) == null)
  }

  test("parser hardening: JPEG fill bytes, oversized synth dims") {
    import graft.functions.ImageBytesUtil
    // ITU T.81 B.1.1.2 permits 0xFF fill bytes before a marker
    val filled = Array(0xff, 0xd8, 0xff, 0xff, 0xff, 0xc0, 0x00, 0x0b,
      0x08, 0x00, 0x10, 0x00, 0x20, 0x01, 0x11, 0x00).map(_.toByte)
    val m = ImageBytesUtil.imageMeta(filled)
    assert(m != null && m.getString(0) == "jpeg" &&
      m.getInt(1) == 0x20 && m.getInt(2) == 0x10 && m.getInt(3) == 1)
    // w*h beyond the cap returns null instead of a wrong-size allocation
    assert(ImageBytesUtil.synthImage(1L, 65536, 65536, 0) == null)
    assert(spark.sql("SELECT synth_image(1L, 65536, 65536, 0) IS NULL")
      .collect().head.getBoolean(0))
  }

  test("audio fingerprint: synth round trip, JDK cross-check, invariances") {
    import graft.functions.AudioBytesUtil
    // fingerprint(synth(seed)) == seed across lengths and perturbations
    for (seed <- Seq(0L, 42L, -1L, 0x123456789abcdefL); nps <- Seq(2, 5, 9);
         p <- Seq(0, 2)) {
      val wav = AudioBytesUtil.synthAudio(seed, nps, p)
      assert(wav != null)
      assert(AudioBytesUtil.audioFingerprint(wav) == seed,
        s"seed=$seed nps=$nps p=$p")
      // it is a REAL wav: the container parser agrees on every field
      val m = graft.functions.ImageBytesUtil.audioMeta(wav)
      assert(m.getString(0) == "wav" && m.getInt(1) == 8000 &&
        m.getInt(2) == 1 && m.getInt(3) == 16 && m.getLong(4) == 65L * nps)
    }
    // the JDK's own RIFF reader decodes the same format and samples
    val wav = AudioBytesUtil.synthAudio(7L, 4, 0)
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    val fmt = in.getFormat
    assert(fmt.getSampleRate == 8000f && fmt.getChannels == 1 &&
      fmt.getSampleSizeInBits == 16)
    val payload = in.readAllBytes()
    assert(java.util.Arrays.equals(payload,
      java.util.Arrays.copyOfRange(wav, 44, wav.length)))
    // amplitude scaling preserves the envelope ordering -> same hash
    val scaled = wav.clone()
    var j = 44
    while (j + 1 < scaled.length) {
      val v = ((scaled(j) & 0xff) | (scaled(j + 1) << 8)) / 2
      scaled(j) = v.toByte; scaled(j + 1) = (v >> 8).toByte
      j += 2
    }
    assert(AudioBytesUtil.audioFingerprint(scaled) == 7L)
    // hostile inputs: never throw; unsupported shapes are null
    for (cut <- Seq(0, 11, 43, 44, 60, wav.length - 1))
      AudioBytesUtil.audioFingerprint(java.util.Arrays.copyOf(wav, cut))
    assert(AudioBytesUtil.audioFingerprint(
      java.util.Arrays.copyOf(wav, 100)) == null) // < 2 samples/segment
    val nonPcm = wav.clone()
    nonPcm(20) = 3 // fmt code: IEEE float
    assert(AudioBytesUtil.audioFingerprint(nonPcm) == null)
    assert(AudioBytesUtil.audioFingerprint("RIFFjunk".getBytes) == null)
  }

  test("audioNearDups: planted envelope groups pair from WAV bytes only") {
    import spark.implicits._
    val media = (0 until 12).map { i =>
      val seed = (i % 4) * 424243L + 17
      (i.toLong, graft.functions.AudioBytesUtil.synthAudio(seed, 2 + i % 3, i % 3))
    }.toDF("id", "data")
    val pairs = graft.operators.Multimodal
      .audioNearDups(media, "id", "data", maxHamming = 0)
      .select("id_a", "id_b", "hamming").collect()
    assert(pairs.length == 4 * 3)
    assert(pairs.forall(r => r.getLong(0) % 4 == r.getLong(1) % 4))
    assert(pairs.forall(_.getInt(2) == 0))
  }

  test("mediaFeatures: format routing over a mixed corpus, nulls for junk") {
    import spark.implicits._
    import graft.functions.{AudioBytesUtil, ImageBytesUtil, JpegCodecUtil, PngCodecUtil}
    val px = ImageBytesUtil.synthImageStep(77L, 16, 12, 0, 12)
    val mp4 = {
      import spark.implicits._
      Seq(1).toDF("x").select(graft.operators.Multimodal.mp4Bytes(
        lit("isom"), lit(1000), lit(9000), lit(640), lit(480),
        lit("avc1"), lit(true), lit("mp4a")).as("d"))
        .collect().head.getAs[Array[Byte]](0)
    }
    val rows = Seq(
      (1L, PngCodecUtil.pngEncodeGray(px, 16, 12, 5)),
      (2L, JpegCodecUtil.jpegEncodeGray(px, 16, 12, 2)),
      (3L, AudioBytesUtil.synthAudio(77L, 3, 1)),
      (4L, "not media at all".getBytes),
      (5L, mp4),
    ).toDF("id", "data")
    val got = graft.operators.Multimodal.mediaFeatures(rows, "id", "data")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getString(1) == "png" && got(1L).getInt(2) == 16 &&
      got(1L).getLong(7) == 77L)
    assert(got(2L).getString(1) == "jpeg" && got(2L).getInt(3) == 12 &&
      got(2L).getLong(7) == 77L)
    assert(got(3L).getString(1) == "wav" && got(3L).getInt(5) == 8000 &&
      got(3L).getLong(6) == 65L * 3 && got(3L).getLong(7) == 77L)
    assert(got(4L).isNullAt(1) && got(4L).isNullAt(2) && got(4L).isNullAt(7))
    assert(got(4L).getLong(8) == 16L) // n_bytes still reported
    // containers route too: format + video-track dims, no pixel sig
    assert(got(5L).getString(1) == "mp4" && got(5L).getInt(2) == 640 &&
      got(5L).getInt(3) == 480 && got(5L).isNullAt(7))
  }

  test("dhash: perturbation/resize invariant, distant for different seeds") {
    import graft.functions.ImageBytesUtil
    val seeds = Seq(0L, -1L, 0x5a5a5a5aL, 1234567L, Long.MinValue)
    for (seed <- seeds; (w, h) <- Seq((9, 8), (16, 12), (64, 48))) {
      val clean = ImageBytesUtil.synthImage(seed, w, h, 0)
      val dirty = ImageBytesUtil.synthImage(seed, w, h, 3)
      assert(ImageBytesUtil.dhash64(clean, w, h) == seed,
        s"seed $seed at ${w}x$h")
      assert(ImageBytesUtil.dhash64(dirty, w, h) == seed,
        s"perturbed seed $seed at ${w}x$h")
    }
    assert(ImageBytesUtil.dhash64(Array.fill(32)(0.toByte), 8, 4) == null)
  }

  test("videoNearDups: partial-overlap pairing and the boilerplate-frame cap") {
    import spark.implicits._
    import graft.functions.ImageBytesUtil
    val (w, h) = (16, 8)
    def frame(seed: Long, perturb: Int = 1) =
      ImageBytesUtil.synthImage(seed, w, h, perturb)
    // all three share the BOILERPLATE intro frame 99; A and B also share
    // real content frames 1,2,3 (B swaps A's tail for its own)
    val rows = Seq(
      (1L, Array(99L, 1L, 2L, 3L, 4L)), // A
      (2L, Array(99L, 1L, 2L, 3L, 5L)), // B: same shots, new tail
      (3L, Array(99L, 7L, 8L, 9L, 10L)) // C: only the intro in common
    ).flatMap { case (id, seeds) =>
      seeds.map(sd => (id, frame(sd, perturb = (id % 3).toInt)))
    }.toDF("media_id", "frame")
    val pairs = graft.operators.Multimodal.videoNearDups(
      rows, "media_id", "frame", w, h, minShared = 3).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 2L, 4L)))
    // cap the intro out (df=3 > 2): the A-B pair survives on its unique
    // shots, and C still cannot pair with anyone through boilerplate
    val capped = graft.operators.Multimodal.videoNearDups(
      rows, "media_id", "frame", w, h, minShared = 3, maxPerHash = 2L)
      .collect()
    assert(capped.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 2L, 3L)))
  }

  test("gifVideoNearDups / gifKeyframes: real animated-GIF payloads end to end") {
    import spark.implicits._
    import graft.functions.{GifCodecUtil, ImageBytesUtil}
    val (w, h) = (16, 8)
    def gif(seeds: Seq[Long], perturb: Int): Array[Byte] = {
      val all = seeds.flatMap(sd =>
        ImageBytesUtil.synthImage(sd, w, h, perturb).toSeq).toArray
      GifCodecUtil.gifEncodeGrayFrames(all, w, h, seeds.length)
    }
    // same planted overlap structure as the raw-frame test, but the
    // frames travel through real animated-GIF payloads
    val rows = Seq(
      (1L, gif(Seq(99L, 1L, 2L, 3L, 4L), 1)),
      (2L, gif(Seq(99L, 1L, 2L, 3L, 5L), 2)),
      (3L, gif(Seq(99L, 7L, 8L, 9L, 10L), 0))
    ).toDF("media_id", "data")
    val pairs = Multimodal.gifVideoNearDups(
      rows, "media_id", "data", minShared = 3).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      == Seq((1L, 2L, 4L)))
    // keyframes: video 1's shot changes land where the seeds change
    // (synth_image's dHash IS the seed, and the GIF round trip is
    // lossless), so frames 0..4 are all boundaries except none —
    // seeds 99,1,2,3,4 all differ; with a high minDelta only big jumps
    // stay. Plant an explicit two-shot animation instead:
    val two = Seq((7L, gif(Seq(5L, 5L, 5L, ~5L, ~5L), 1)))
      .toDF("media_id", "data")
    val kf = Multimodal.gifKeyframes(two, "media_id", "data", minDelta = 3)
      .orderBy("frame_idx").collect()
    assert(kf.map(_.getLong(1)).toSeq == Seq(0L, 3L))
    assert(kf.head.isNullAt(3) && kf.last.getInt(3) == 64)
  }

  test("image_resize: identity, grid-exact odd factors, reference bilinear, hostile") {
    import graft.functions.ImageBytesUtil.{resizeGray, synthGradient}
    // identity resize returns the same bytes
    val g = synthGradient(11L, 9, 6)
    assert(java.util.Arrays.equals(resizeGray(g, 9, 6, 9, 6), g))
    // constant image stays constant under any scale, up or down
    val const = Array.fill(12 * 7)(93.toByte)
    for ((nw, nh) <- Seq((4, 3), (25, 2), (1, 1), (24, 14)))
      assert(resizeGray(const, 12, 7, nw, nh).forall(_ == 93.toByte),
        s"$nw x $nh")
    // 3x downscale samples land exactly on the source grid: 3x'+1
    val down = resizeGray(g, 9, 6, 3, 2)
    for (y <- 0 until 2; x <- 0 until 3)
      assert(down(y * 3 + x) == g((3 * y + 1) * 9 + (3 * x + 1)))
    // general (non-grid) case against an independent double-precision
    // bilinear reference with the same half-pixel convention
    def ref(src: Array[Byte], w: Int, h: Int, nw: Int, nh: Int): Array[Int] = {
      val out = new Array[Int](nw * nh)
      for (y <- 0 until nh; x <- 0 until nw) {
        val sx = math.max(0.0, math.min((x + 0.5) * w / nw - 0.5, w - 1.0))
        val sy = math.max(0.0, math.min((y + 0.5) * h / nh - 0.5, h - 1.0))
        val (x0, y0) = (sx.toInt, sy.toInt)
        val (x1, y1) = (math.min(x0 + 1, w - 1), math.min(y0 + 1, h - 1))
        val (fx, fy) = (sx - x0, sy - y0)
        def p(i: Int, j: Int) = (src(j * w + i) & 0xff).toDouble
        val v = (p(x0, y0) * (1 - fx) + p(x1, y0) * fx) * (1 - fy) +
          (p(x0, y1) * (1 - fx) + p(x1, y1) * fx) * fy
        out(y * nw + x) = math.floor(v + 0.5).toInt
      }
      out
    }
    // gradient small enough that no byte wrap occurs (max 2*9+3*6+40 < 256)
    val smooth = new Array[Byte](10 * 7)
    for (y <- 0 until 7; x <- 0 until 10)
      smooth(y * 10 + x) = (2 * x + 3 * y + 40).toByte
    for ((nw, nh) <- Seq((7, 5), (4, 4), (15, 9), (10, 3))) {
      val got = resizeGray(smooth, 10, 7, nw, nh).map(_ & 0xff)
      assert(got.toSeq == ref(smooth, 10, 7, nw, nh).toSeq, s"$nw x $nh")
    }
    // hostile: bad dims / short buffers null, never throw
    assert(resizeGray(g, 9, 6, 0, 2) == null)
    assert(resizeGray(g, 9, 6, 3, -1) == null)
    assert(resizeGray(g, 9, 6, 1 << 13, 1 << 13) == null) // output cap
    assert(resizeGray(Array[Byte](1, 2), 9, 6, 3, 2) == null) // short src
  }

  test("gif_frames_composited: disposal/transparency replay matches a reference compositor") {
    import graft.functions.GifCodecUtil
    // independent reference: replay synthAnim's PLANTED geometry directly
    // from its documented arithmetic (not from the GIF bytes)
    def reference(seed: Long, mode: Int): Seq[(Int, Int, Long)] = {
      val w = 24 + (seed % 5).toInt * 8
      val h = 10 + (seed % 3).toInt * 4
      val bg = (seed % 100 + 5).toInt
      val c0 = (seed % 200 + 10).toInt
      val n = 4 + (seed % 3).toInt
      val canvas = Array.fill(w * h)(c0)
      val out = scala.collection.mutable.ArrayBuffer[(Int, Int, Long)]()
      out += ((w, h, canvas.map(_.toLong).sum))
      var f = 1
      while (f < n) {
        val cf = ((seed * 7 + f * 31) % 200 + 20).toInt
        val x0 = 5 * (f - 1)
        val transparent = mode == 3 && f % 2 == 0
        val before = canvas.clone()
        if (!transparent)
          for (y <- 2 until 5; x <- x0 until x0 + 4) canvas(y * w + x) = cf
        out += ((w, h, canvas.map(_.toLong).sum))
        if (mode == 1)
          for (y <- 2 until 5; x <- x0 until x0 + 4) canvas(y * w + x) = bg
        else if (mode == 2)
          for (y <- 2 until 5; x <- x0 until x0 + 4)
            canvas(y * w + x) = before(y * w + x)
        f += 1
      }
      out.toSeq
    }
    def decoded(seed: Long, mode: Int): Seq[(Int, Int, Long)] = {
      val arr = GifCodecUtil.gifCompositedFrames(
        GifCodecUtil.synthAnim(seed, mode))
      assert(arr != null, s"seed=$seed mode=$mode")
      (0 until arr.numElements()).map { i =>
        val r = arr.getStruct(i, 4)
        (r.getInt(0), r.getInt(1),
          graft.functions.ImageBytesUtil.byteSum(r.getBinary(3)))
      }
    }
    for (seed <- Seq(0L, 1L, 2L, 3L, 4L, 7L, 123L, 4567L); mode <- 0 to 3)
      assert(decoded(seed, mode) == reference(seed, mode),
        s"seed=$seed mode=$mode")
  }

  test("gif_frames_composited: full-screen disposal-1 animations equal standalone frames") {
    import graft.functions.{GifCodecUtil, ImageBytesUtil}
    val (w, h) = (16, 8)
    val all = Seq(3L, 8L, 21L).flatMap(sd =>
      ImageBytesUtil.synthImage(sd, w, h, 0).toSeq).toArray
    val payload = GifCodecUtil.gifEncodeGrayFrames(all, w, h, 3)
    val standalone = GifCodecUtil.gifDecodeFrames(payload)
    val composited = GifCodecUtil.gifCompositedFrames(payload)
    assert(standalone.numElements() == 3 && composited.numElements() == 3)
    for (i <- 0 until 3) {
      val a = standalone.getStruct(i, 4)
      val b = composited.getStruct(i, 4)
      assert(a.getInt(0) == b.getInt(0) && a.getInt(1) == b.getInt(1))
      assert(java.util.Arrays.equals(a.getBinary(3), b.getBinary(3)), i)
    }
  }

  test("gif_frames_composited: per-frame LOCAL color tables override the global") {
    import graft.functions.GifCodecUtil
    // literal-code LZW stream with the decoder's width bookkeeping (the
    // same scheme the production encoder uses, here for arbitrary tables)
    def lzw(pixels: Seq[Int], minCode: Int): Array[Byte] = {
      val clear = 1 << minCode
      val end = clear + 1
      val out = new java.io.ByteArrayOutputStream()
      var acc = 0L
      var nBits = 0
      var codeSize = minCode + 1
      var next = end + 1
      var prev = -1
      def emit(code: Int): Unit = {
        acc |= code.toLong << nBits
        nBits += codeSize
        while (nBits >= 8) { out.write((acc & 0xff).toInt); acc >>= 8; nBits -= 8 }
      }
      emit(clear)
      for (p <- pixels) {
        emit(p)
        if (prev >= 0 && next < 4096) {
          next += 1
          if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prev = p
      }
      emit(end)
      if (nBits > 0) out.write((acc & 0xff).toInt)
      out.toByteArray
    }
    def frame(left: Int, top: Int, w: Int, h: Int, pixels: Seq[Int],
        local: Option[Seq[Int]]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      def b(v: Int): Unit = bos.write(v & 0xff)
      def le2(v: Int): Unit = { b(v); b(v >> 8) }
      b(0x2c); le2(left); le2(top); le2(w); le2(h)
      b(local.map(_ => 0x80).getOrElse(0)) // 2-entry local table when set
      local.foreach(_.foreach(g => { b(g); b(g); b(g) }))
      b(2) // min LZW code size
      val data = lzw(pixels, 2)
      var p = 0
      while (p < data.length) {
        val len = math.min(255, data.length - p)
        b(len); bos.write(data, p, len); p += len
      }
      b(0)
      bos.toByteArray
    }
    val head = "GIF89a".getBytes("US-ASCII") ++
      Array[Byte](2, 0, 2, 0, 0xf0.toByte, 0, 0) ++ // 2x2, GCT(2), bg 0
      Array[Byte](0, 0, 0, 100, 100, 100) // global: luma 0, 100
    val payload = head ++
      frame(0, 0, 2, 2, Seq(1, 1, 1, 1), None) ++ // global: all 100
      frame(0, 0, 2, 2, Seq(0, 1, 0, 1), Some(Seq(200, 30))) ++ // local
      frame(0, 0, 1, 1, Seq(1), None) ++ // global again, 1x1 patch
      Array[Byte](0x3b)
    val arr = GifCodecUtil.gifCompositedFrames(payload)
    assert(arr != null && arr.numElements() == 3)
    def pix(i: Int): Seq[Int] =
      arr.getStruct(i, 4).getBinary(3).map(_ & 0xff).toSeq
    assert(pix(0) == Seq(100, 100, 100, 100))
    assert(pix(1) == Seq(200, 30, 200, 30)) // the local table's lumas
    assert(pix(2) == Seq(100, 30, 200, 30)) // global restored for frame 3
    // the standalone decoder resolves the same local palette per frame
    val solo = GifCodecUtil.gifDecodeFrames(payload)
    assert((0 until 3).map(i =>
      solo.getStruct(i, 4).getBinary(3).map(_ & 0xff).toSeq) ==
      Seq(Seq(100, 100, 100, 100), Seq(200, 30, 200, 30), Seq(100)))
  }

  test("gif_frames_composited: hostile prefixes/flips never throw; junk is null") {
    import graft.functions.GifCodecUtil
    val p = GifCodecUtil.synthAnim(42L, 1)
    for (n <- 0 to p.length)
      GifCodecUtil.gifCompositedFrames(java.util.Arrays.copyOf(p, n))
    for (i <- p.indices) {
      val c = p.clone()
      c(i) = (c(i) ^ 0xff).toByte
      GifCodecUtil.gifCompositedFrames(c)
    }
    assert(GifCodecUtil.gifCompositedFrames(Array.empty[Byte]) == null)
    assert(GifCodecUtil.gifCompositedFrames(
      "GIF89a but not really".getBytes("US-ASCII")) == null)
  }

  test("dhashNearDups: finds hamming<=3 pairs via band join, skips far pairs") {
    import spark.implicits._
    // base signature, a 2-bit-flipped near dup, and a far image
    val base = 0x0f0f0f0f12345678L
    val near = base ^ (1L << 5) ^ (1L << 40) // hamming 2, bands 0|2 differ
    val far = ~base // hamming 64
    val rows = Seq((1L, base), (2L, near), (3L, far)).toDF("id", "seed")
      .select(col("id"), lit(18).as("w"), lit(14).as("h"),
        graft.functions.images.synth_image(
          col("seed"), lit(18), lit(14), lit(1)).as("data"))
    val pairs = Multimodal
      .dhashNearDups(rows, "id", "data", "w", "h", maxHamming = 3)
      .collect()
    assert(pairs.length == 1)
    assert(pairs.head.getLong(0) == 1L && pairs.head.getLong(1) == 2L)
    assert(pairs.head.getInt(4) == 2)
  }

  test("dhashNearDups: degenerate-bucket cluster is capped, pairs survive via later bands") {
    import spark.implicits._
    // a real crawl's failure mode: a large cluster of dHash-IDENTICAL
    // images (solid-color thumbnails / black frames). Uncapped, its band
    // buckets go quadratic in candidate generation.
    val clusterSig = 0xaaaabbbbccccddddL
    val cluster = (100L until 160L).map(_ -> clusterSig)
    // a near-dup pair whose LOWEST shared band collides with the hot
    // cluster's band-0 bucket: the cap drops that bucket, so the pair
    // must surface through its other surviving bands — which the grouped
    // pair dedup allows and the old first-shared-band predicate would
    // have rejected
    val x = 0x333322221111ddddL
    val y = x ^ (1L << 20) // band 1 differs by one bit -> hamming 1
    val rows = (cluster ++ Seq(4L -> x, 5L -> y)).toDF("id", "seed")
      .select(col("id"), lit(18).as("w"), lit(14).as("h"),
        graft.functions.images.synth_image(
          col("seed"), lit(18), lit(14), lit(1)).as("data"))
    val capped = Multimodal
      .dhashNearDups(rows, "id", "data", "w", "h", maxHamming = 1,
        maxPerBucket = 20L)
      .collect()
    // candidate generation stays bounded: the 60-member cluster's four
    // hot buckets are all dropped (its 1770 internal pairs are exactly
    // the stop-content collisions the cap exists to shed), while the
    // (4,5) pair survives through bands 2/3 and is emitted exactly once
    assert(capped.map(r => (r.getLong(0), r.getLong(1), r.getInt(4))).toSeq
      == Seq((4L, 5L, 1)))
    // uncapped, the same frame yields the full quadratic cluster
    val uncapped = Multimodal.dhashNearDups(
      rows, "id", "data", "w", "h", maxHamming = 1)
    assert(uncapped.count() == 60L * 59 / 2 + 1)
  }
}
