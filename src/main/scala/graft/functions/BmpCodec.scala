package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** BMP codec in pure byte math — the uncompressed member of the real
  * decode family ([[PngCodecUtil]], [[JpegCodecUtil]]): BITMAPINFOHEADER
  * frames with 8-bit palette, 24-bit BGR, or 32-bit BGRA pixels,
  * 4-byte-aligned rows, bottom-up or top-down order, projected to the
  * same single-channel luma buffer every perceptual path consumes. The
  * encoder writes 8-bit palette grayscale BMPs (identity gray palette,
  * either row order) for fixtures. Hostile input yields null: every
  * offset is bounds-checked and declared dimensions are capped before
  * allocation.
  */
object BmpCodecUtil {

  /** Decode allocation cap — see [[GifCodecUtil.MaxSamples]]: 16M pixels
    * bounds the pre-validation allocation a hostile header can force
    * while staying far beyond what the dHash grid samples. */
  val MaxSamples: Long = 1L << 24

  private def le2(d: Array[Byte], i: Int): Int =
    (d(i) & 0xff) | ((d(i + 1) & 0xff) << 8)

  private def le4(d: Array[Byte], i: Int): Int =
    (d(i) & 0xff) | ((d(i + 1) & 0xff) << 8) |
      ((d(i + 2) & 0xff) << 16) | ((d(i + 3) & 0xff) << 24)

  /** Encode a `w x h` single-channel buffer as an 8-bit palette BMP with
    * an identity grayscale palette; `topDown` writes a negative-height
    * header and first-row-first data. Null for unusable input. */
  def bmpEncodeGray(
      gray: Array[Byte], w: Int, h: Int, topDown: Boolean): Array[Byte] = {
    if (w < 1 || h < 1 || w.toLong * h > MaxSamples ||
      gray.length < w.toLong * h) return null
    val stride = (w + 3) & ~3
    val dataOff = 14 + 40 + 256 * 4
    val out = new Array[Byte](dataOff + stride * h)
    def w2(i: Int, v: Int): Unit = {
      out(i) = v.toByte; out(i + 1) = (v >> 8).toByte
    }
    def w4(i: Int, v: Int): Unit = {
      out(i) = v.toByte; out(i + 1) = (v >> 8).toByte
      out(i + 2) = (v >> 16).toByte; out(i + 3) = (v >> 24).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    w4(2, out.length); w4(10, dataOff)
    w4(14, 40) // BITMAPINFOHEADER
    w4(18, w); w4(22, if (topDown) -h else h)
    w2(26, 1); w2(28, 8) // planes, bits
    w4(34, stride * h) // image size (informational)
    var i = 0
    while (i < 256) { // BGRA identity gray palette
      val o = 14 + 40 + i * 4
      out(o) = i.toByte; out(o + 1) = i.toByte; out(o + 2) = i.toByte
      i += 1
    }
    var y = 0
    while (y < h) {
      val srcRow = if (topDown) y else h - 1 - y
      System.arraycopy(gray, srcRow * w, out, dataOff + y * stride, w)
      y += 1
    }
    out
  }

  /** Decode an uncompressed 8/24/32-bit BITMAPINFOHEADER BMP to
    * struct(width, height, channels, pixels) with single-channel luma
    * pixels (palette lookup then luma for 8-bit; integer ITU-R 601
    * weights for BGR/BGRA). Null for compressed (BI_RLE/BI_BITFIELDS),
    * other depths, or any malformed layout. */
  def bmpDecodeGray(data: Array[Byte]): InternalRow = {
    if (data.length < 54 || data(0) != 'B' || data(1) != 'M') return null
    val dataOff = le4(data, 10)
    val dibSize = le4(data, 14)
    if (dibSize < 40 || 14 + dibSize > data.length) return null
    val w = le4(data, 18)
    val rawH = le4(data, 22)
    val topDown = rawH < 0
    val h = math.abs(rawH)
    val bits = le2(data, 28)
    val compression = le4(data, 30)
    if (w <= 0 || h <= 0 || compression != 0 ||
      (bits != 8 && bits != 24 && bits != 32) ||
      w.toLong * h > MaxSamples) return null
    val bpp = bits / 8
    val stride = (w * bpp + 3) & ~3
    if (dataOff < 0 || dataOff.toLong + stride.toLong * h > data.length)
      return null
    // 8-bit: palette between the DIB header and the pixel data (BGRA
    // quads); nUsed=0 means the full 256
    var palette: Array[Byte] = null
    if (bits == 8) {
      val nUsed = {
        val n = le4(data, 46)
        if (n == 0) 256 else n
      }
      val palOff = 14 + dibSize
      if (nUsed < 1 || nUsed > 256 ||
        palOff + 4 * nUsed > data.length) return null
      palette = java.util.Arrays.copyOfRange(data, palOff, palOff + 4 * nUsed)
    }
    val gray = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      val srcY = if (topDown) y else h - 1 - y
      val ro = dataOff + srcY * stride
      var x = 0
      while (x < w) {
        val v = bits match {
          case 8 =>
            val idx = (data(ro + x) & 0xff) * 4
            if (idx + 2 >= palette.length) return null
            // palette entries are BGRA
            (29 * (palette(idx) & 0xff) + 150 * (palette(idx + 1) & 0xff) +
              77 * (palette(idx + 2) & 0xff)) >> 8
          case _ =>
            val o = ro + x * bpp // BGR(A)
            (29 * (data(o) & 0xff) + 150 * (data(o + 1) & 0xff) +
              77 * (data(o + 2) & 0xff)) >> 8
        }
        gray(y * w + x) = v.toByte
        x += 1
      }
      y += 1
    }
    InternalRow(w, h, if (bits == 8) 1 else bpp, gray)
  }
}

/** Codegen'd BMP encode: `bmp_encode_gray(pixels, w, h, topDown)` ->
  * BINARY 8-bit palette grayscale BMP (null for unusable input). */
case class BmpEncodeGray(
    data: Expression, w: Expression, h: Expression, topDown: Expression)
    extends QuaternaryExpression {
  override def first: Expression = data
  override def second: Expression = w
  override def third: Expression = h
  override def fourth: Expression = topDown
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (data.dataType == BinaryType && w.dataType == IntegerType &&
      h.dataType == IntegerType && topDown.dataType == BooleanType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bmp_encode_gray expects (BINARY, INT, INT, BOOLEAN), got " +
        s"(${data.dataType}, ${w.dataType}, ${h.dataType}, ${topDown.dataType})")

  override def nullSafeEval(d: Any, wv: Any, hv: Any, tv: Any): Any =
    BmpCodecUtil.bmpEncodeGray(d.asInstanceOf[Array[Byte]],
      wv.asInstanceOf[Int], hv.asInstanceOf[Int], tv.asInstanceOf[Boolean])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (d, wv, hv, tv) => s"""
      ${ev.value} = graft.functions.BmpCodecUtil.bmpEncodeGray($d, $wv, $hv, $tv);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression,
      newFourth: Expression): BmpEncodeGray =
    copy(data = newFirst, w = newSecond, h = newThird, topDown = newFourth)
}

/** Codegen'd BMP decode: `bmp_decode(binary)` -> struct(width, height,
  * channels, pixels) with single-channel luma pixels. */
case class BmpDecodeGray(child: Expression) extends UnaryExpression {
  override def dataType: DataType = PngDecodeGray.schema // same shape
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bmp_decode expects BINARY, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    BmpCodecUtil.bmpDecodeGray(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.BmpCodecUtil.bmpDecodeGray($c);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(newChild: Expression): BmpDecodeGray =
    copy(child = newChild)
}
