package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{ImageBytesUtil, JpegCodecUtil}

/** The baseline JPEG codec against the JDK's independent ImageIO codec,
  * an EXHAUSTIVE replay of the q_multimodal_jpeg_decode gate's fixture
  * space (every seed/size combination the gate can generate must survive
  * the lossy round trip with its dHash intact), and hostile-input
  * hardening.
  */
class JpegCodecSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("jpeg-codec-test")

  private def decode(jpg: Array[Byte]) =
    Option(JpegCodecUtil.jpegDecodeGray(jpg)).map { r =>
      (r.getInt(0), r.getInt(1), r.getInt(2), r.getBinary(3))
    }

  test("gate fixture space: every seed x size keeps dims and dHash exact") {
    // the q_multimodal_jpeg_decode and _dups gates' exact seed space:
    // 7 group bases x 3 bit-flip classes x every (w, h) the gates plant
    for (k <- 0 until 7; flip <- Seq(0L, 1L << 5, 1L << 37);
         w <- 16 to 20; h <- 12 to 15) {
      val seed = (k.toLong * 1234567 + 42) ^ flip
      val px = ImageBytesUtil.synthImageStep(seed, w, h, 0, 12)
      val jpg = JpegCodecUtil.jpegEncodeGray(px, w, h, 2)
      assert(jpg != null, s"encode $seed ${w}x$h")
      val Some((dw, dh, ch, out)) = decode(jpg)
      assert((dw, dh, ch) == (w, h, 1), s"dims $seed ${w}x$h")
      assert(ImageBytesUtil.dhash64(out, w, h) == seed,
        s"dhash drift seed=$seed ${w}x$h")
    }
  }

  test("lossy error is small: flat-quant-2 round trip stays within a few units") {
    val (w, h) = (40, 24)
    val px = ImageBytesUtil.synthImageStep(99L, w, h, 0, 12)
    val Some((_, _, _, out)) = decode(JpegCodecUtil.jpegEncodeGray(px, w, h, 2))
    val maxErr = (0 until w * h).map(i => math.abs((px(i) & 0xff) - (out(i) & 0xff))).max
    assert(maxErr <= 5, s"max pixel error $maxErr")
  }

  test("ImageIO (the JDK's independent reader) decodes our encodes") {
    val (w, h) = (33, 18)
    val px = ImageBytesUtil.synthImageStep(7L, w, h, 0, 12)
    val jpg = JpegCodecUtil.jpegEncodeGray(px, w, h, 2)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))
    assert(img != null && img.getWidth == w && img.getHeight == h)
    val Some((_, _, _, mine)) = decode(jpg)
    // two decoders of the same stream may differ by IDCT rounding only
    for (y <- 0 until h; x <- 0 until w) {
      val d = math.abs(img.getRaster.getSample(x, y, 0) - (mine(y * w + x) & 0xff))
      assert(d <= 2, s"($x,$y): diff $d")
    }
  }

  test("decodes ImageIO-written grayscale and 4:2:0 color JPEGs") {
    val (w, h) = (37, 22)
    def viaImageIO(img: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "jpg", bos))
      bos.toByteArray
    }
    // grayscale: single component
    val grayImg = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      grayImg.getRaster.setSample(x, y, 0, (x * 5 + y * 3) % 200 + 20)
    val gjpg = viaImageIO(grayImg)
    val Some((gw, gh, gch, gpx)) = decode(gjpg)
    assert((gw, gh, gch) == (w, h, 1))
    val gref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(gjpg))
    for (y <- 0 until h; x <- 0 until w)
      assert(math.abs(gref.getRaster.getSample(x, y, 0) -
        (gpx(y * w + x) & 0xff)) <= 2, s"gray ($x,$y)")

    // color: the JDK writer emits 3-component YCbCr with 4:2:0 chroma
    // subsampling — interleaved MCUs with 2x2 luma sampling factors, the
    // chroma blocks entropy-decoded and dropped
    val rgbImg = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 7 + y * 11) % 220 + 10
      rgbImg.setRGB(x, y, (v << 16) | (v << 8) | v) // gray-valued RGB: Y == v
    }
    val cjpg = viaImageIO(rgbImg)
    val Some((cw, chh, cch, cpx)) = decode(cjpg)
    assert((cw, chh) == (w, h) && cch == 3)
    val cref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(cjpg))
    for (y <- 0 until h; x <- 0 until w) {
      val refLuma = {
        val rgb = cref.getRGB(x, y)
        (77 * ((rgb >> 16) & 0xff) + 150 * ((rgb >> 8) & 0xff) +
          29 * (rgb & 0xff)) >> 8
      }
      assert(math.abs(refLuma - (cpx(y * w + x) & 0xff)) <= 3, s"color ($x,$y)")
    }
  }

  test("hostile inputs return null, never throw") {
    val good = JpegCodecUtil.jpegEncodeGray(
      ImageBytesUtil.synthImageStep(5L, 24, 16, 0, 12), 24, 16, 2)
    // cuts inside the header segments must reject cleanly
    for (cut <- Seq(0, 1, 2, 4, 20, 100, 250))
      assert(decode(java.util.Arrays.copyOf(good, cut)).isEmpty, s"cut=$cut")
    // a cut a few bytes into the ENTROPY stream starves the block decode
    val sosAt = {
      var i = 2
      while (!((good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xda)) i += 1
      i
    }
    assert(decode(java.util.Arrays.copyOf(good, sosAt + 15)).isEmpty,
      "mid-entropy cut")
    // cuts past the entropy stream (dropped EOI / padding) may still
    // decode — the stream is complete — but must never throw
    decode(java.util.Arrays.copyOf(good, good.length - 1))
    decode(java.util.Arrays.copyOf(good, good.length - 2))
    // corrupt the Huffman table segment -> table validation rejects
    val badDht = good.clone()
    val dhtAt = {
      var i = 2
      while (!((badDht(i) & 0xff) == 0xff && (badDht(i + 1) & 0xff) == 0xc4)) i += 1
      i
    }
    badDht(dhtAt + 5) = 0x7f // inflate a code-length count
    assert(decode(badDht).isEmpty, "corrupt DHT")
    // dimension bomb: huge declared frame on a tiny stream
    val bomb = good.clone()
    val sofAt = {
      var i = 2
      while (!((bomb(i) & 0xff) == 0xff && (bomb(i + 1) & 0xff) == 0xc0)) i += 1
      i
    }
    bomb(sofAt + 5) = 0x7f; bomb(sofAt + 6) = 0xff.toByte // h = 32767
    bomb(sofAt + 7) = 0x7f; bomb(sofAt + 8) = 0xff.toByte // w = 32767
    assert(decode(bomb).isEmpty, "dimension bomb")
    // progressive frames are rejected, not mis-decoded
    val prog = good.clone()
    prog(sofAt + 1) = 0xc2.toByte
    assert(decode(prog).isEmpty, "progressive")
    // garbage
    assert(decode("definitely not a jpeg".getBytes).isEmpty)
    assert(decode(Array[Byte](0xff.toByte, 0xd8.toByte)).isEmpty)
  }

  test("SQL surface: jpeg_encode_gray / jpeg_decode round trip with dhash") {
    val rows = spark.sql(
      """SELECT id,
           jpeg_decode(jpeg_encode_gray(
             synth_image_step(CAST(id * 31 + 5 AS BIGINT), 20, 14,
               CAST(0 AS INT), 12),
             20, 14, CAST(2 AS INT))) AS m
         FROM range(0, 30)""")
      .selectExpr("id", "m.width", "m.height",
        "dhash64(m.pixels, m.width, m.height) AS dh")
      .collect()
    assert(rows.length == 30)
    rows.foreach { r =>
      assert(r.getInt(1) == 20 && r.getInt(2) == 14)
      assert(r.getLong(3) == r.getLong(0) * 31 + 5, s"id ${r.getLong(0)}")
    }
  }
}
