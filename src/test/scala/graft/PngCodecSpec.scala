package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{ImageBytesUtil, PngCodecUtil}

/** The PNG codec against an INDEPENDENT implementation: every encode is
  * re-read with the JDK's own ImageIO PNG reader, and ImageIO-written
  * PNGs of every color type are decoded back — two codebases agreeing
  * bit-for-bit on the wire format. Plus hostile-input hardening: decode
  * must return null, never throw, on truncation, CRC damage, dimension
  * bombs, and over-long pixel streams.
  */
class PngCodecSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("png-codec-test")

  private def rng(seed: Long) = new scala.util.Random(seed)

  private def randGray(w: Int, h: Int, seed: Long): Array[Byte] = {
    val a = new Array[Byte](w * h)
    rng(seed).nextBytes(a)
    a
  }

  private def decode(png: Array[Byte]) =
    Option(PngCodecUtil.pngDecodeGray(png)).map { r =>
      (r.getInt(0), r.getInt(1), r.getInt(2), r.getBinary(3))
    }

  test("round trip is bit-exact for every filter mode") {
    for (fm <- 0 to 5; (w, h) <- Seq((1, 1), (9, 8), (40, 23), (257, 3))) {
      val gray = randGray(w, h, fm * 1000 + w)
      val png = PngCodecUtil.pngEncodeGray(gray, w, h, fm)
      assert(png != null, s"encode fm=$fm ${w}x$h")
      val Some((dw, dh, ch, px)) = decode(png)
      assert((dw, dh, ch) == (w, h, 1), s"fm=$fm ${w}x$h")
      assert(java.util.Arrays.equals(px, gray), s"pixels fm=$fm ${w}x$h")
    }
  }

  test("large image splits IDAT across chunks and still decodes exactly") {
    val (w, h) = (200, 120) // raw stream 24 KiB+ -> several 8 KiB IDATs
    val gray = randGray(w, h, 7)
    val png = PngCodecUtil.pngEncodeGray(gray, w, h, 5)
    var pos = 8
    var idats = 0
    while (pos + 12 <= png.length) {
      val len = ((png(pos) & 0xff) << 24) | ((png(pos + 1) & 0xff) << 16) |
        ((png(pos + 2) & 0xff) << 8) | (png(pos + 3) & 0xff)
      if (new String(png, pos + 4, 4, "US-ASCII") == "IDAT") idats += 1
      pos += 12 + len
    }
    assert(idats >= 2, s"expected multi-IDAT, got $idats")
    assert(decode(png).exists(d => java.util.Arrays.equals(d._4, gray)))
  }

  test("ImageIO (the JDK's independent PNG reader) reads our encodes back") {
    for (fm <- Seq(0, 4, 5)) {
      val (w, h) = (31, 17)
      val gray = randGray(w, h, 100 + fm)
      val png = PngCodecUtil.pngEncodeGray(gray, w, h, fm)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      assert(img != null && img.getWidth == w && img.getHeight == h)
      for (y <- 0 until h; x <- 0 until w) {
        val expected = gray(y * w + x) & 0xff
        // TYPE_BYTE_GRAY raster: one band, the sample IS the gray value
        assert(img.getRaster.getSample(x, y, 0) == expected, s"($x,$y) fm=$fm")
      }
    }
  }

  test("decodes ImageIO-written gray, RGB, RGBA, and palette PNGs") {
    val (w, h) = (23, 14)
    val r = rng(42)
    def luma(rr: Int, g: Int, b: Int) = (77 * rr + 150 * g + 29 * b) >> 8

    // color type 0: TYPE_BYTE_GRAY
    val grayImg = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val grayPx = randGray(w, h, 1)
    for (y <- 0 until h; x <- 0 until w)
      grayImg.getRaster.setSample(x, y, 0, grayPx(y * w + x) & 0xff)

    // color type 2: TYPE_3BYTE_BGR; type 6: TYPE_INT_ARGB
    val rgbImg = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val rgbaImg = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_ARGB)
    val rgb = Array.fill(w * h)((r.nextInt(256), r.nextInt(256), r.nextInt(256)))
    for (y <- 0 until h; x <- 0 until w) {
      val (rr, g, b) = rgb(y * w + x)
      rgbImg.setRGB(x, y, (rr << 16) | (g << 8) | b)
      rgbaImg.setRGB(x, y, (0xcc << 24) | (rr << 16) | (g << 8) | b)
    }

    // color type 3: IndexColorModel with 5 entries
    val palR = Array[Byte](0, 50, 100.toByte, 200.toByte, 255.toByte)
    val palG = Array[Byte](10, 60, 110.toByte, 210.toByte, 250.toByte)
    val palB = Array[Byte](20, 70, 120.toByte, 220.toByte, 245.toByte)
    val icm = new java.awt.image.IndexColorModel(8, 5, palR, palG, palB)
    val palImg = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
    val palIdx = Array.fill(w * h)(r.nextInt(5))
    for (y <- 0 until h; x <- 0 until w)
      palImg.getRaster.setSample(x, y, 0, palIdx(y * w + x))

    def viaImageIO(img: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", bos))
      bos.toByteArray
    }

    val Some((gw, gh, gch, gpx)) = decode(viaImageIO(grayImg))
    assert((gw, gh, gch) == (w, h, 1))
    assert(java.util.Arrays.equals(gpx, grayPx))

    val Some((_, _, rch, rpx)) = decode(viaImageIO(rgbImg))
    assert(rch == 3)
    for (i <- 0 until w * h) {
      val (rr, g, b) = rgb(i)
      assert((rpx(i) & 0xff) == luma(rr, g, b), s"rgb@$i")
    }

    val Some((_, _, ach, apx)) = decode(viaImageIO(rgbaImg))
    assert(ach == 4)
    for (i <- 0 until w * h) {
      val (rr, g, b) = rgb(i)
      assert((apx(i) & 0xff) == luma(rr, g, b), s"rgba@$i")
    }

    val Some((_, _, pch, ppx)) = decode(viaImageIO(palImg))
    assert(pch == 1)
    for (i <- 0 until w * h) {
      val k = palIdx(i)
      assert((ppx(i) & 0xff) ==
        luma(palR(k) & 0xff, palG(k) & 0xff, palB(k) & 0xff), s"pal@$i")
    }
  }

  // minimal hand-rolled chunk writer for crafting pathological PNGs
  private def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def w4(v: Int): Unit = {
      bos.write(v >>> 24); bos.write(v >>> 16); bos.write(v >>> 8); bos.write(v)
    }
    w4(data.length)
    val head = tag.getBytes("US-ASCII") ++ data
    bos.write(head, 0, head.length)
    val c = new java.util.zip.CRC32
    c.update(head)
    w4(c.getValue.toInt)
    bos.toByteArray
  }

  private def ihdr(w: Int, h: Int, depth: Int, colorType: Int,
      interlace: Int = 0): Array[Byte] =
    chunk("IHDR", Array[Byte](
      (w >>> 24).toByte, (w >>> 16).toByte, (w >>> 8).toByte, w.toByte,
      (h >>> 24).toByte, (h >>> 16).toByte, (h >>> 8).toByte, h.toByte,
      depth.toByte, colorType.toByte, 0, 0, interlace.toByte))

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val bos = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
    d.end()
    bos.toByteArray
  }

  private val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  test("decodes a hand-built gray+alpha (color type 4) PNG") {
    val (w, h) = (6, 4)
    val raw = new java.io.ByteArrayOutputStream()
    val expected = new Array[Byte](w * h)
    for (y <- 0 until h) {
      raw.write(0) // filter None
      for (x <- 0 until w) {
        val g = (x * 40 + y * 13) & 0xff
        expected(y * w + x) = g.toByte
        raw.write(g); raw.write(128) // alpha ignored by luma projection
      }
    }
    val png = sig ++ ihdr(w, h, 8, 4) ++
      chunk("IDAT", deflate(raw.toByteArray)) ++
      chunk("IEND", Array.emptyByteArray)
    val Some((dw, dh, ch, px)) = decode(png)
    assert((dw, dh, ch) == (w, h, 2))
    assert(java.util.Arrays.equals(px, expected))
  }

  test("hostile inputs return null, never throw") {
    val good = PngCodecUtil.pngEncodeGray(randGray(20, 15, 9), 20, 15, 5)
    // truncation at every boundary class and a sweep of prefixes
    for (cut <- Seq(0, 4, 8, 20, 33, good.length / 2, good.length - 1))
      assert(decode(java.util.Arrays.copyOf(good, cut)).isEmpty, s"cut=$cut")
    // flip one byte inside the first IDAT payload -> CRC mismatch
    val damaged = good.clone()
    damaged(50) = (damaged(50) ^ 0x41).toByte
    assert(decode(damaged).isEmpty, "crc damage")
    // dimension bomb: tiny payload claiming 2^30 pixels is rejected
    // before any allocation
    val bomb = sig ++ ihdr(1 << 15, 1 << 15, 8, 0) ++
      chunk("IDAT", deflate(Array[Byte](0, 0))) ++
      chunk("IEND", Array.emptyByteArray)
    assert(decode(bomb).isEmpty, "dimension bomb")
    // truncated pixel stream: IDAT inflates to less than h*(w+1)
    val short = sig ++ ihdr(8, 8, 8, 0) ++
      chunk("IDAT", deflate(new Array[Byte](3 * 9))) ++
      chunk("IEND", Array.emptyByteArray)
    assert(decode(short).isEmpty, "short stream")
    // over-long pixel stream: more raw bytes than the scanlines need
    val long = sig ++ ihdr(8, 8, 8, 0) ++
      chunk("IDAT", deflate(new Array[Byte](8 * 9 + 5))) ++
      chunk("IEND", Array.emptyByteArray)
    assert(decode(long).isEmpty, "over-long stream")
    // unsupported shapes: 16-bit depth, interlaced, bad filter byte
    assert(decode(sig ++ ihdr(4, 4, 16, 0) ++
      chunk("IDAT", deflate(new Array[Byte](4 * 9))) ++
      chunk("IEND", Array.emptyByteArray)).isEmpty, "16-bit")
    assert(decode(sig ++ ihdr(4, 4, 8, 0, interlace = 1) ++
      chunk("IDAT", deflate(new Array[Byte](4 * 5))) ++
      chunk("IEND", Array.emptyByteArray)).isEmpty, "interlaced")
    val badFilter = new Array[Byte](4 * 5)
    badFilter(0) = 9
    assert(decode(sig ++ ihdr(4, 4, 8, 0) ++
      chunk("IDAT", deflate(badFilter)) ++
      chunk("IEND", Array.emptyByteArray)).isEmpty, "filter 9")
    // palette image without a PLTE chunk
    assert(decode(sig ++ ihdr(4, 4, 8, 3) ++
      chunk("IDAT", deflate(new Array[Byte](4 * 5))) ++
      chunk("IEND", Array.emptyByteArray)).isEmpty, "missing PLTE")
    // palette index past the palette's end
    val oob = new Array[Byte](2 * 3)
    oob(1) = 7 // index 7 into a 2-entry palette
    assert(decode(sig ++ ihdr(2, 2, 8, 3) ++
      chunk("PLTE", new Array[Byte](6)) ++
      chunk("IDAT", deflate(oob)) ++
      chunk("IEND", Array.emptyByteArray)).isEmpty, "palette oob")
    // pure garbage of assorted sizes
    for (n <- Seq(0, 7, 64, 4096))
      assert(decode(randGray(math.max(1, n), 1, n)).isEmpty, s"garbage $n")
  }

  test("BMP codec: round trip both row orders, ImageIO cross-check, hostile") {
    import graft.functions.BmpCodecUtil
    def decodeBmp(b: Array[Byte]) =
      Option(BmpCodecUtil.bmpDecodeGray(b)).map { r =>
        (r.getInt(0), r.getInt(1), r.getInt(2), r.getBinary(3))
      }
    // identity-palette round trip is bit-exact, both row orders, with
    // widths that exercise the 4-byte row padding
    for ((w, h) <- Seq((9, 8), (10, 5), (33, 17)); td <- Seq(false, true)) {
      val gray = randGray(w, h, w * 100 + h)
      val bmp = BmpCodecUtil.bmpEncodeGray(gray, w, h, td)
      val Some((dw, dh, ch, px)) = decodeBmp(bmp)
      assert((dw, dh, ch) == (w, h, 1), s"${w}x$h td=$td")
      assert(java.util.Arrays.equals(px, gray), s"pixels ${w}x$h td=$td")
      // the JDK's independent BMP reader agrees on every pixel (raster
      // samples: it loads the identity-gray palette as TYPE_BYTE_GRAY,
      // where getRGB would add a gray->sRGB colorspace conversion)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bmp))
      assert(img != null && img.getWidth == w && img.getHeight == h)
      for (y <- 0 until h; x <- 0 until w)
        assert(img.getRaster.getSample(x, y, 0) == (gray(y * w + x) & 0xff),
          s"imageio ($x,$y) ${w}x$h td=$td")
    }
    // decode an ImageIO-WRITTEN 24-bit BMP: luma of the planted colors
    val (w, h) = (21, 13)
    val img24 = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val r = rng(5)
    val rgb = Array.fill(w * h)((r.nextInt(256), r.nextInt(256), r.nextInt(256)))
    for (y <- 0 until h; x <- 0 until w) {
      val (rr, g, b) = rgb(y * w + x)
      img24.setRGB(x, y, (rr << 16) | (g << 8) | b)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img24, "bmp", bos))
    val Some((_, _, c24, p24)) = decodeBmp(bos.toByteArray)
    assert(c24 == 3)
    for (i <- 0 until w * h) {
      val (rr, g, b) = rgb(i)
      assert((p24(i) & 0xff) == ((77 * rr + 150 * g + 29 * b) >> 8), s"@$i")
    }
    // hostile: truncation sweep, dimension bomb, compressed rejected
    val good = BmpCodecUtil.bmpEncodeGray(randGray(16, 12, 1), 16, 12, false)
    for (cut <- Seq(0, 2, 13, 53, 100, good.length - 1))
      assert(decodeBmp(java.util.Arrays.copyOf(good, cut)).isEmpty, s"cut=$cut")
    val bomb = good.clone()
    bomb(18) = 0xff.toByte; bomb(19) = 0xff.toByte
    bomb(20) = 0x7f.toByte // w huge
    assert(decodeBmp(bomb).isEmpty, "dimension bomb")
    val rle = good.clone()
    rle(30) = 1 // BI_RLE8
    assert(decodeBmp(rle).isEmpty, "compressed")
    assert(decodeBmp("BMnope".getBytes).isEmpty)
  }

  test("GIF codec: literal round trip, dictionary streams via ImageIO, hostile") {
    import graft.functions.GifCodecUtil
    def decodeGif(b: Array[Byte]) =
      Option(GifCodecUtil.gifDecodeGray(b)).map { r =>
        (r.getInt(0), r.getInt(1), r.getInt(2), r.getBinary(3))
      }
    // literal-code round trip is bit-exact, incl. sizes that push the
    // code width to 10-12 bits (w*h > 254 grows the decoder dictionary)
    for ((w, h) <- Seq((9, 8), (30, 20), (80, 60))) {
      val gray = randGray(w, h, w + h)
      val gif = GifCodecUtil.gifEncodeGray(gray, w, h)
      val Some((dw, dh, ch, px)) = decodeGif(gif)
      assert((dw, dh, ch) == (w, h, 3), s"${w}x$h")
      assert(java.util.Arrays.equals(px, gray), s"pixels ${w}x$h")
      // the JDK's independent GIF reader agrees (identity gray palette:
      // every RGB channel equals the planted index)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(gif))
      assert(img != null && img.getWidth == w && img.getHeight == h)
      for (y <- 0 until h; x <- 0 until w)
        assert((img.getRGB(x, y) & 0xff) == (gray(y * w + x) & 0xff),
          s"imageio ($x,$y) ${w}x$h")
    }
    // an ImageIO-WRITTEN gif uses real dictionary compression: decoding
    // it exercises the string-table path (prefix chains, KwKwK) that
    // literal streams never build. Repetitive pixels compress well.
    val (w, h) = (40, 25)
    val palR = new Array[Byte](8); val palG = new Array[Byte](8)
    val palB = new Array[Byte](8)
    for (i <- 0 until 8) {
      palR(i) = (i * 30).toByte; palG(i) = (i * 30).toByte
      palB(i) = (i * 30).toByte
    }
    val icm = new java.awt.image.IndexColorModel(8, 8, palR, palG, palB)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
    val idx = Array.tabulate(w * h)(i => (i / 7) % 8) // runs -> dict hits
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, idx(y * w + x))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "gif", bos))
    val Some((gw, gh, _, px)) = decodeGif(bos.toByteArray)
    assert((gw, gh) == (w, h))
    for (i <- 0 until w * h) {
      val v = (idx(i) * 30) & 0xff
      // identity grayscale palette: luma == the channel value
      assert((px(i) & 0xff) == v, s"dict-stream @$i")
    }
    // hostile: truncation sweep, dimension bomb, junk
    val good = GifCodecUtil.gifEncodeGray(randGray(16, 12, 3), 16, 12)
    for (cut <- Seq(0, 5, 12, 13 + 500, 13 + 768 + 5, good.length / 2))
      assert(decodeGif(java.util.Arrays.copyOf(good, cut)).isEmpty, s"cut=$cut")
    val bomb = good.clone()
    // image descriptor width at header+table+1(sep)+4: blow it up
    val descAt = 13 + 768
    bomb(descAt + 5) = 0xff.toByte; bomb(descAt + 6) = 0x7f.toByte
    assert(decodeGif(bomb).isEmpty, "dimension bomb")
    assert(decodeGif("GIF89a junk but not an image".getBytes).isEmpty)
  }

  test("animated GIF: frame iteration round trip, ImageIO cross-check, budgets") {
    import graft.functions.GifCodecUtil
    def frames(b: Array[Byte]): Seq[(Int, Int, Array[Byte])] =
      Option(GifCodecUtil.gifDecodeFrames(b)).toSeq.flatMap { arr =>
        (0 until arr.numElements()).map { i =>
          val r = arr.getStruct(i, 4)
          (r.getInt(0), r.getInt(1), r.getBinary(3))
        }
      }
    val (w, h, n) = (18, 11, 5)
    val all = randGray(w, h * n, 77) // n concatenated frames
    val gif = GifCodecUtil.gifEncodeGrayFrames(all, w, h, n)
    assert(gif != null)
    // every frame comes back bit-exact, in order
    val fs = frames(gif)
    assert(fs.length == n)
    for ((f, i) <- fs.zipWithIndex) {
      assert((f._1, f._2) == (w, h), s"frame $i dims")
      assert(java.util.Arrays.equals(f._3,
        java.util.Arrays.copyOfRange(all, i * w * h, (i + 1) * w * h)),
        s"frame $i pixels")
    }
    // first-frame decode of the SAME animated payload stays consistent
    val first = Option(GifCodecUtil.gifDecodeGray(gif)).get
    assert(java.util.Arrays.equals(first.getBinary(3), fs.head._3))
    // the JDK's frame-indexed GIF reader agrees on every frame
    val rdr = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    rdr.setInput(javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(gif)))
    assert(rdr.getNumImages(true) == n)
    for (i <- 0 until n) {
      val img = rdr.read(i)
      for (y <- 0 until h; x <- 0 until w)
        assert((img.getRGB(x, y) & 0xff) == (all(i * w * h + y * w + x) & 0xff),
          s"imageio frame $i ($x,$y)")
    }
    // tolerance: truncation INSIDE frame k keeps frames 0..k-1
    val cut = java.util.Arrays.copyOf(gif, gif.length - w * h / 2)
    val partial = frames(cut)
    assert(partial.length >= 1 && partial.length < n)
    assert(java.util.Arrays.equals(partial.head._3, fs.head._3))
    // budgets: frame-count cap and encoder bounds
    assert(GifCodecUtil.gifEncodeGrayFrames(all, w, h, 0) == null)
    assert(GifCodecUtil.gifEncodeGrayFrames(all, w, h,
      GifCodecUtil.MaxFrames + 1) == null)
    assert(GifCodecUtil.gifEncodeGrayFrames(all, w, h, n + 1) == null,
      "buffer shorter than n frames")
  }

  test("SQL surface: png_encode_gray / png_decode round trip with dhash") {
    val df = spark.sql(
      """SELECT id,
           png_decode(png_encode_gray(
             synth_image(CAST(id * 7919 AS BIGINT), 16, 12, CAST(id % 3 AS INT)),
             16, 12, CAST(id % 6 AS INT))) AS m
         FROM range(0, 50)""")
      .selectExpr("id", "m.width", "m.height",
        "dhash64(m.pixels, m.width, m.height) AS dh")
      .collect()
    assert(df.length == 50)
    df.foreach { r =>
      assert(r.getInt(1) == 16 && r.getInt(2) == 12)
      assert(r.getLong(3) == r.getLong(0) * 7919, s"id ${r.getLong(0)}")
    }
  }

  test("pngNearDups finds planted groups from compressed payloads only") {
    import spark.implicits._
    // 12 images in 4 groups of 3: same seed per group, different sizes
    // and perturbations per member -> every intra-group pair at hamming 0
    val media = (0 until 12).map { i =>
      val seed = (i % 4) * 999983L + 5
      val (w, h) = (16 + i % 3, 12 + i % 2)
      val px = ImageBytesUtil.synthImage(seed, w, h, i % 3)
      (i.toLong, PngCodecUtil.pngEncodeGray(px, w, h, i % 6))
    }.toDF("id", "data")
    val pairs = graft.operators.Multimodal
      .pngNearDups(media, "id", "data", maxHamming = 0)
      .select("id_a", "id_b", "hamming").collect()
    assert(pairs.length == 4 * 3) // 4 groups x C(3,2)
    assert(pairs.forall(r => r.getLong(0) % 4 == r.getLong(1) % 4))
    assert(pairs.forall(_.getInt(2) == 0))
  }
}
