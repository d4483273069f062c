package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static byte-level image helpers callable from generated code.
  *
  * These are the REAL decode paths of the multimodal family: container
  * metadata comes from the actual PNG IHDR / JPEG SOF byte layouts (pure
  * byte math over the payload's first bytes — no codec library), and the
  * perceptual dHash runs over raw single-channel pixel buffers. Payload
  * DECOMPRESSION (PNG IDAT inflate, JPEG entropy decode) is the one step
  * that still needs a codec binding; [[graft.operators.Multimodal]]
  * documents that seam.
  */
object ImageBytesUtil {

  /** Bilinear grayscale resize under the half-pixel (align-corners =
    * false) convention ML pipelines use: srcX = (dstX + 0.5) * w/newW -
    * 0.5, edge-clamped. ALL arithmetic is exact integer fixed-point
    * (denominator 2*newW resp. 2*newH, rounding half-up at the end), so
    * results are platform-deterministic; an odd integer downscale factor
    * k lands every sample exactly on the source grid (srcX = k*dstX +
    * (k-1)/2), which is what the oracle gate exploits. Null on
    * non-positive/overflowing dims or a short buffer. */
  def resizeGray(src: Array[Byte], w: Int, h: Int,
      newW: Int, newH: Int): Array[Byte] = {
    if (w <= 0 || h <= 0 || newW <= 0 || newH <= 0) return null
    if (w.toLong * h > src.length || newW.toLong * newH > (1L << 24))
      return null
    val out = new Array[Byte](newW * newH)
    val denX = 2L * newW
    val denY = 2L * newH
    var y = 0
    while (y < newH) {
      // numY/denY is the real-valued source row, clamped at the edges
      var numY = (2L * y + 1) * h - newH
      if (numY < 0) numY = 0
      var y0 = (numY / denY).toInt
      if (y0 > h - 1) y0 = h - 1
      val y1 = math.min(y0 + 1, h - 1)
      val wy = numY - y0 * denY // 0..denY
      var x = 0
      while (x < newW) {
        var numX = (2L * x + 1) * w - newW
        if (numX < 0) numX = 0
        var x0 = (numX / denX).toInt
        if (x0 > w - 1) x0 = w - 1
        val x1 = math.min(x0 + 1, w - 1)
        val wx = numX - x0 * denX // 0..denX
        val p00 = src(y0 * w + x0) & 0xff
        val p01 = src(y0 * w + x1) & 0xff
        val p10 = src(y1 * w + x0) & 0xff
        val p11 = src(y1 * w + x1) & 0xff
        val top = p00 * (denX - wx) + p01 * wx
        val bot = p10 * (denX - wx) + p11 * wx
        val v = (top * (denY - wy) + bot * wy + denX * denY / 2) /
          (denX * denY)
        out(y * newW + x) = v.toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** Fixture builder: a seed-derived LINEAR gradient buffer —
    * pixel(x, y) = (a*x + b*y + c) mod 256 with a = seed%5+1,
    * b = seed%7+1, c = seed%97 — the image whose odd-factor resize is
    * closed-form (grid-exact samples pick planted values directly). */
  def synthGradient(seed: Long, w: Int, h: Int): Array[Byte] = {
    if (w <= 0 || h <= 0 || w.toLong * h > (1L << 24)) return null
    val s = if (seed < 0) -seed else seed
    val a = (s % 5 + 1).toInt
    val b = (s % 7 + 1).toInt
    val c = (s % 97).toInt
    val out = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        out(y * w + x) = ((a * x + b * y + c) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** Sum of the buffer's UNSIGNED bytes. */
  def byteSum(d: Array[Byte]): Long = {
    var s = 0L
    var i = 0
    while (i < d.length) { s += d(i) & 0xff; i += 1 }
    s
  }

  private def be4(d: Array[Byte], i: Int): Int =
    ((d(i) & 0xff) << 24) | ((d(i + 1) & 0xff) << 16) |
      ((d(i + 2) & 0xff) << 8) | (d(i + 3) & 0xff)

  private def be2(d: Array[Byte], i: Int): Int =
    ((d(i) & 0xff) << 8) | (d(i + 1) & 0xff)

  /** Container metadata from the leading bytes: PNG (8-byte signature,
    * IHDR fixed offsets: width/height as 4-byte big-endian at 16/20, bit
    * depth and color type at 24/25) or JPEG (SOI, then marker-segment
    * scan to the first SOF frame header: height/width big-endian at +5/+7
    * inside the segment, component count at +9). Returns
    * (format, width, height, channels) or null when unrecognized /
    * truncated. */
  def imageMeta(data: Array[Byte]): InternalRow = {
    if (data.length >= 26 &&
      (data(0) & 0xff) == 0x89 && data(1) == 'P' && data(2) == 'N' &&
      data(3) == 'G' && (data(4) & 0xff) == 0x0d && (data(5) & 0xff) == 0x0a &&
      (data(6) & 0xff) == 0x1a && (data(7) & 0xff) == 0x0a &&
      data(12) == 'I' && data(13) == 'H' && data(14) == 'D' &&
      data(15) == 'R') {
      val ch = (data(25) & 0xff) match {
        case 0 => 1 // grayscale
        case 2 => 3 // truecolor
        case 3 => 1 // palette
        case 4 => 2 // gray + alpha
        case 6 => 4 // truecolor + alpha
        case _ => return null
      }
      return InternalRow(UTF8String.fromString("png"),
        be4(data, 16), be4(data, 20), ch)
    }
    // GIF87a / GIF89a: 6-byte version signature, then the logical screen
    // descriptor's width/height as little-endian u16 at offsets 6/8.
    // Pixels are palette indices into an RGB color table -> 3 channels.
    if (data.length >= 10 && data(0) == 'G' && data(1) == 'I' &&
      data(2) == 'F' && data(3) == '8' &&
      (data(4) == '7' || data(4) == '9') && data(5) == 'a') {
      val w = (data(6) & 0xff) | ((data(7) & 0xff) << 8)
      val h = (data(8) & 0xff) | ((data(9) & 0xff) << 8)
      if (w <= 0 || h <= 0) return null
      return InternalRow(UTF8String.fromString("gif"), w, h, 3)
    }
    // BMP: "BM" file header, then a BITMAPINFOHEADER-or-later DIB header
    // (size >= 40 at offset 14): width/height little-endian i32 at 18/22
    // (height may be negative for top-down rows), bit count u16 at 28.
    if (data.length >= 30 && data(0) == 'B' && data(1) == 'M') {
      def le4(i: Int): Int =
        (data(i) & 0xff) | ((data(i + 1) & 0xff) << 8) |
          ((data(i + 2) & 0xff) << 16) | ((data(i + 3) & 0xff) << 24)
      val dibSize = le4(14)
      if (dibSize < 40) return null
      val w = le4(18)
      val h = math.abs(le4(22))
      val bits = (data(28) & 0xff) | ((data(29) & 0xff) << 8)
      val ch = bits match {
        case 1 | 4 | 8 => 1 // palette indices
        case 16 | 24 => 3
        case 32 => 4
        case _ => return null
      }
      if (w <= 0 || h <= 0) return null
      return InternalRow(UTF8String.fromString("bmp"), w, h, ch)
    }
    if (data.length >= 4 && (data(0) & 0xff) == 0xff &&
      (data(1) & 0xff) == 0xd8) {
      var i = 2
      while (i + 9 < data.length) {
        if ((data(i) & 0xff) != 0xff) return null
        val m = data(i + 1) & 0xff
        // SOF0..SOF15 minus the non-frame markers DHT/JPG/DAC
        if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
          return InternalRow(UTF8String.fromString("jpeg"),
            be2(data, i + 7), be2(data, i + 5), data(i + 9) & 0xff)
        }
        if (m == 0xff) i += 1 // ITU T.81 B.1.1.2: 0xFF fill bytes
        else if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) i += 2
        else if (m == 0xd9) return null // EOI before any frame header
        else {
          // segment length includes its own 2 bytes; < 2 is corrupt and
          // would advance the scan misaligned onto payload bytes that can
          // masquerade as an SOF marker — reject instead
          val len = be2(data, i + 2)
          if (len < 2) return null
          i += 2 + len
        }
      }
      return null
    }
    null
  }

  /** Audio container metadata from the leading bytes: WAV (RIFF/WAVE,
    * scanning chunks to `fmt `: audio format code, channels, sample rate,
    * bits per sample — all little-endian per RIFF) and, when a `data`
    * chunk follows, the sample count (data bytes / block align). Returns
    * (format, sample_rate, channels, bits, n_samples) with n_samples = -1
    * when no data chunk is present in the prefix; null when unrecognized.
    */
  def audioMeta(data: Array[Byte]): InternalRow = {
    def le4(i: Int): Long =
      (data(i) & 0xffL) | ((data(i + 1) & 0xffL) << 8) |
        ((data(i + 2) & 0xffL) << 16) | ((data(i + 3) & 0xffL) << 24)
    def le2(i: Int): Int = (data(i) & 0xff) | ((data(i + 1) & 0xff) << 8)
    def tag(i: Int, s: String): Boolean =
      data(i) == s.charAt(0) && data(i + 1) == s.charAt(1) &&
        data(i + 2) == s.charAt(2) && data(i + 3) == s.charAt(3)
    if (data.length < 36 || !tag(0, "RIFF") || !tag(8, "WAVE")) return null
    var i = 12
    var sampleRate = -1
    var channels = -1
    var bits = -1
    var blockAlign = -1
    var nSamples = -1L
    while (i + 8 <= data.length) {
      val size = le4(i + 4)
      if (tag(i, "fmt ")) {
        // PCM fmt chunks declare >= 16 payload bytes; a smaller declared
        // size means the format fields below would read into the NEXT
        // chunk's bytes — reject rather than decode garbage
        if (size < 16 || i + 24 > data.length) return null
        channels = le2(i + 10)
        sampleRate = le4(i + 12).toInt
        blockAlign = le2(i + 20)
        bits = le2(i + 22)
      } else if (tag(i, "data") && blockAlign > 0) {
        nSamples = size / blockAlign
      }
      // chunks are word-aligned: odd sizes carry a pad byte. Advance in
      // LONG arithmetic — the size field is an unsigned 32-bit value, so
      // a >= 2 GiB (or corrupt) size truncated to Int would step the
      // cursor backward or not at all and spin this loop forever
      val next = i.toLong + 8L + size + (size & 1L)
      i = if (next > data.length) data.length else next.toInt
    }
    if (sampleRate < 0) return null
    InternalRow(UTF8String.fromString("wav"), sampleRate, channels, bits,
      nSamples)
  }

  /** Perceptual difference hash of a `w x h` single-channel (grayscale)
    * pixel buffer: sample a 9 x 8 grid (column c at x = ceil(c*w/9), row r
    * at y = ceil(r*h/8)), set bit r*8+c when the sample is brighter than
    * its right neighbor. Small pixel perturbations and resizes leave the
    * hash unchanged as long as the horizontal gradients keep their sign —
    * the standard near-duplicate-image fingerprint. Null when the buffer
    * is smaller than the claimed dimensions or the grid cannot be sampled
    * (w < 9 or h < 8). */
  def dhash64(data: Array[Byte], w: Int, h: Int): java.lang.Long = {
    if (w < 9 || h < 8 || data.length < w.toLong * h) return null
    var sig = 0L
    var r = 0
    while (r < 8) {
      // Long index math: for w near 2^31/8 the Int products r*h / c*w+8
      // wrap negative and throw AIOOBE on hostile metadata; every valid
      // sample index is < w*h <= data.length so the toInt is lossless
      val y = (r.toLong * h + 7) / 8
      val px = new Array[Int](9)
      var c = 0
      while (c < 9) {
        px(c) = data((y * w + (c.toLong * w + 8) / 9).toInt) & 0xff
        c += 1
      }
      c = 0
      while (c < 8) {
        if (px(c) > px(c + 1)) sig |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    sig
  }

  /** Deterministic raw-grayscale image whose [[dhash64]] is exactly
    * `seed`, at any size w >= 9, h >= 8: each of the 8 sample rows walks
    * +/-8 brightness steps following seed's bits (so every adjacent
    * sample pair differs by 8, far above the perturbation amplitude),
    * and `perturb` brightens ~perturb/997 of the pixels by one step —
    * the planted near-duplicate. The multimodal fixture generator: real
    * byte-buffer plumbing with a closed-form oracle. Null for
    * unsampleable dimensions. */
  def synthImage(seed: Long, w: Int, h: Int, perturb: Int): Array[Byte] =
    synthImageStep(seed, w, h, perturb, 8)

  /** [[synthImage]] with a chosen walk step (1..15; 8 rows x 8 steps stay
    * within byte range for step <= 15): larger steps buy gradient margin
    * for LOSSY round trips — a baseline-JPEG encode/decode perturbs
    * pixels by a few units, so a step-12 fixture keeps every sampled
    * gradient's sign and dhash64 == seed survives the codec. */
  def synthImageStep(
      seed: Long, w: Int, h: Int, perturb: Int, step: Int): Array[Byte] = {
    // the size guard keeps the SQL surface total: w*h in INT arithmetic
    // would overflow to a wrong allocation and throw mid-query
    if (w < 9 || h < 8 || w.toLong * h > (1L << 26) ||
      step < 1 || step > 15) return null
    val g = Array.ofDim[Int](8, 9)
    var r = 0
    while (r < 8) {
      g(r)(0) = 128
      var c = 0
      while (c < 8) {
        g(r)(c + 1) =
          if (((seed >>> (r * 8 + c)) & 1L) == 1L) g(r)(c) - step
          else g(r)(c) + step
        c += 1
      }
      r += 1
    }
    val out = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      val gr = math.min(7, y * 8 / h)
      var x = 0
      while (x < w) {
        val gc = math.min(8, x * 9 / w)
        var v = g(gr)(gc)
        if (perturb > 0 &&
          java.lang.Math.floorMod(x * 31L + y * 17L + seed, 997L) < perturb)
          v += 1
        out(y * w + x) = v.toByte
        x += 1
      }
      y += 1
    }
    out
  }
}

/** Codegen'd bilinear resize: `image_resize(pixels, w, h, new_w, new_h)`
  * -> BINARY grayscale buffer of new_w x new_h (half-pixel convention,
  * exact integer fixed-point; null for unusable dims). */
case class ImageResize(pixels: Expression, w: Expression, h: Expression,
    newW: Expression, newH: Expression)
    extends org.apache.spark.sql.catalyst.expressions.QuinaryExpression {
  override def children: Seq[Expression] = Seq(pixels, w, h, newW, newH)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (pixels.dataType == BinaryType && w.dataType == IntegerType &&
      h.dataType == IntegerType && newW.dataType == IntegerType &&
      newH.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"image_resize expects (BINARY, INT, INT, INT, INT), got " +
        children.map(_.dataType).mkString("(", ", ", ")"))

  override def nullSafeEval(p: Any, wv: Any, hv: Any, nw: Any, nh: Any): Any =
    ImageBytesUtil.resizeGray(p.asInstanceOf[Array[Byte]],
      wv.asInstanceOf[Int], hv.asInstanceOf[Int],
      nw.asInstanceOf[Int], nh.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (p, wv, hv, nw, nh) => s"""
      ${ev.value} = graft.functions.ImageBytesUtil.resizeGray($p, $wv, $hv, $nw, $nh);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ImageResize =
    copy(pixels = newChildren(0), w = newChildren(1), h = newChildren(2),
      newW = newChildren(3), newH = newChildren(4))
}

/** Fixture builder: `synth_gradient(seed, w, h)` -> the seed-derived
  * linear-gradient buffer of [[ImageBytesUtil.synthGradient]]. */
case class SynthGradient(seed: Expression, w: Expression, h: Expression)
    extends TernaryExpression {
  override def first: Expression = seed
  override def second: Expression = w
  override def third: Expression = h
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (seed.dataType == LongType && w.dataType == IntegerType &&
      h.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"synth_gradient expects (BIGINT, INT, INT), got " +
        s"(${seed.dataType}, ${w.dataType}, ${h.dataType})")

  override def nullSafeEval(sv: Any, wv: Any, hv: Any): Any =
    ImageBytesUtil.synthGradient(sv.asInstanceOf[Long],
      wv.asInstanceOf[Int], hv.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sv, wv, hv) => s"""
      ${ev.value} = graft.functions.ImageBytesUtil.synthGradient($sv, $wv, $hv);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): SynthGradient =
    copy(seed = newFirst, w = newSecond, h = newThird)
}

/** Codegen'd unsigned-byte sum: `byte_sum(binary)` -> BIGINT. The
  * closed-form probe for pixel/sample buffers: a planted image's sum is
  * arithmetic an oracle can predict, and any decode slip moves it. */
case class ByteSum(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"byte_sum expects BINARY, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    ImageBytesUtil.byteSum(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ImageBytesUtil.byteSum($c)")

  override protected def withNewChildInternal(newChild: Expression): ByteSum =
    copy(child = newChild)
}

/** Codegen'd container-metadata parse: `image_meta(binary)` ->
  * struct(format, width, height, channels), null when unrecognized. */
case class ImageMeta(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ImageMeta.schema
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"image_meta expects BINARY, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    ImageBytesUtil.imageMeta(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.ImageBytesUtil.imageMeta($c);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(newChild: Expression): ImageMeta =
    copy(child = newChild)
}

object ImageMeta {
  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false)))
}

/** Codegen'd audio-container parse: `audio_meta(binary)` ->
  * struct(format, sample_rate, channels, bits, n_samples), null when
  * unrecognized. */
case class AudioMeta(child: Expression) extends UnaryExpression {
  override def dataType: DataType = AudioMeta.schema
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"audio_meta expects BINARY, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    ImageBytesUtil.audioMeta(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.ImageBytesUtil.audioMeta($c);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(newChild: Expression): AudioMeta =
    copy(child = newChild)
}

object AudioMeta {
  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("bits", IntegerType, nullable = false),
    StructField("n_samples", LongType, nullable = false)))
}

/** Codegen'd perceptual dHash: `dhash64(data, w, h)` -> BIGINT (null for
  * unsampleable dimensions). */
case class DHash64(data: Expression, w: Expression, h: Expression)
    extends TernaryExpression {
  override def first: Expression = data
  override def second: Expression = w
  override def third: Expression = h
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (data.dataType == BinaryType && w.dataType == IntegerType &&
      h.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dhash64 expects (BINARY, INT, INT), got " +
        s"(${data.dataType}, ${w.dataType}, ${h.dataType})")

  override def nullSafeEval(d: Any, wv: Any, hv: Any): Any =
    ImageBytesUtil.dhash64(d.asInstanceOf[Array[Byte]],
      wv.asInstanceOf[Int], hv.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (d, wv, hv) => {
      val tmp = ctx.freshName("dh")
      s"""
      java.lang.Long $tmp = graft.functions.ImageBytesUtil.dhash64($d, $wv, $hv);
      ${ev.isNull} = $tmp == null;
      ${ev.value} = ${ev.isNull} ? -1L : $tmp.longValue();"""
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): DHash64 =
    copy(data = newFirst, w = newSecond, h = newThird)
}

/** Codegen'd deterministic fixture image: `synth_image(seed, w, h,
  * perturb)` -> BINARY raw grayscale buffer with dhash64 == seed. */
case class SynthImage(
    seed: Expression, w: Expression, h: Expression, perturb: Expression)
    extends QuaternaryExpression {
  override def first: Expression = seed
  override def second: Expression = w
  override def third: Expression = h
  override def fourth: Expression = perturb
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (seed.dataType == LongType && w.dataType == IntegerType &&
      h.dataType == IntegerType && perturb.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"synth_image expects (BIGINT, INT, INT, INT), got " +
        s"(${seed.dataType}, ${w.dataType}, ${h.dataType}, ${perturb.dataType})")

  override def nullSafeEval(sv: Any, wv: Any, hv: Any, pv: Any): Any =
    ImageBytesUtil.synthImage(sv.asInstanceOf[Long], wv.asInstanceOf[Int],
      hv.asInstanceOf[Int], pv.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sv, wv, hv, pv) => s"""
      ${ev.value} = graft.functions.ImageBytesUtil.synthImage($sv, $wv, $hv, $pv);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression,
      newFourth: Expression): SynthImage =
    copy(seed = newFirst, w = newSecond, h = newThird, perturb = newFourth)
}

/** [[SynthImage]] with a literal walk step — the lossy-codec fixture:
  * `synth_image_step(seed, w, h, perturb, step)` -> BINARY raw grayscale
  * buffer with dhash64 == seed and step-sized sampled gradients. */
case class SynthImageStep(
    seed: Expression, w: Expression, h: Expression, perturb: Expression,
    step: Int)
    extends QuaternaryExpression {
  override def first: Expression = seed
  override def second: Expression = w
  override def third: Expression = h
  override def fourth: Expression = perturb
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (seed.dataType == LongType && w.dataType == IntegerType &&
      h.dataType == IntegerType && perturb.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"synth_image_step expects (BIGINT, INT, INT, INT), got " +
        s"(${seed.dataType}, ${w.dataType}, ${h.dataType}, ${perturb.dataType})")

  override def nullSafeEval(sv: Any, wv: Any, hv: Any, pv: Any): Any =
    ImageBytesUtil.synthImageStep(sv.asInstanceOf[Long], wv.asInstanceOf[Int],
      hv.asInstanceOf[Int], pv.asInstanceOf[Int], step)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sv, wv, hv, pv) => s"""
      ${ev.value} = graft.functions.ImageBytesUtil.synthImageStep($sv, $wv, $hv, $pv, $step);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression,
      newFourth: Expression): SynthImageStep =
    copy(seed = newFirst, w = newSecond, h = newThird, perturb = newFourth)
}

/** Column wrappers for the image byte kernels. */
object images {
  import org.apache.spark.sql.GraftBridge

  def image_meta(data: Column): Column =
    GraftBridge.column(ImageMeta(GraftBridge.expression(data)))

  def byte_sum(data: Column): Column =
    GraftBridge.column(ByteSum(GraftBridge.expression(data)))

  def image_resize(pixels: Column, w: Column, h: Column,
      newW: Column, newH: Column): Column =
    GraftBridge.column(ImageResize(GraftBridge.expression(pixels),
      GraftBridge.expression(w), GraftBridge.expression(h),
      GraftBridge.expression(newW), GraftBridge.expression(newH)))

  def synth_gradient(seed: Column, w: Column, h: Column): Column =
    GraftBridge.column(SynthGradient(GraftBridge.expression(seed),
      GraftBridge.expression(w), GraftBridge.expression(h)))

  def audio_meta(data: Column): Column =
    GraftBridge.column(AudioMeta(GraftBridge.expression(data)))

  def container_meta(data: Column): Column =
    GraftBridge.column(ContainerMeta(GraftBridge.expression(data)))

  def container_tracks(data: Column): Column =
    GraftBridge.column(ContainerTracks(GraftBridge.expression(data)))

  def synth_mp4(seed: Column, withAudio: Column): Column =
    GraftBridge.column(SynthMp4(GraftBridge.expression(seed),
      GraftBridge.expression(withAudio)))

  def dhash64(data: Column, w: Column, h: Column): Column =
    GraftBridge.column(DHash64(GraftBridge.expression(data),
      GraftBridge.expression(w), GraftBridge.expression(h)))

  def synth_image(seed: Column, w: Column, h: Column, perturb: Column): Column =
    GraftBridge.column(SynthImage(GraftBridge.expression(seed),
      GraftBridge.expression(w), GraftBridge.expression(h),
      GraftBridge.expression(perturb)))

  def png_encode_gray(
      data: Column, w: Column, h: Column, filterMode: Column): Column =
    GraftBridge.column(PngEncodeGray(GraftBridge.expression(data),
      GraftBridge.expression(w), GraftBridge.expression(h),
      GraftBridge.expression(filterMode)))

  def png_decode(data: Column): Column =
    GraftBridge.column(PngDecodeGray(GraftBridge.expression(data)))

  def synth_image_step(seed: Column, w: Column, h: Column, perturb: Column,
      step: Int): Column =
    GraftBridge.column(SynthImageStep(GraftBridge.expression(seed),
      GraftBridge.expression(w), GraftBridge.expression(h),
      GraftBridge.expression(perturb), step))

  def jpeg_encode_gray(
      data: Column, w: Column, h: Column, quant: Column): Column =
    GraftBridge.column(JpegEncodeGray(GraftBridge.expression(data),
      GraftBridge.expression(w), GraftBridge.expression(h),
      GraftBridge.expression(quant)))

  def jpeg_decode(data: Column): Column =
    GraftBridge.column(JpegDecodeGray(GraftBridge.expression(data)))

  def gif_encode_gray(data: Column, w: Column, h: Column): Column =
    GraftBridge.column(GifEncodeGray(GraftBridge.expression(data),
      GraftBridge.expression(w), GraftBridge.expression(h)))

  def gif_decode(data: Column): Column =
    GraftBridge.column(GifDecodeGray(GraftBridge.expression(data)))

  def gif_encode_frames(data: Column, w: Column, h: Column,
      n: Column): Column =
    GraftBridge.column(GifEncodeFrames(GraftBridge.expression(data),
      GraftBridge.expression(w), GraftBridge.expression(h),
      GraftBridge.expression(n)))

  def gif_frames(data: Column): Column =
    GraftBridge.column(GifFrames(GraftBridge.expression(data)))

  def gif_frames_composited(data: Column): Column =
    GraftBridge.column(GifCompositedFrames(GraftBridge.expression(data)))

  def gif_frame_meta(data: Column): Column =
    GraftBridge.column(GifFrameMeta(GraftBridge.expression(data)))

  def synth_anim(seed: Column, mode: Column): Column =
    GraftBridge.column(SynthAnim(GraftBridge.expression(seed),
      GraftBridge.expression(mode)))

  def bmp_encode_gray(
      data: Column, w: Column, h: Column, topDown: Column): Column =
    GraftBridge.column(BmpEncodeGray(GraftBridge.expression(data),
      GraftBridge.expression(w), GraftBridge.expression(h),
      GraftBridge.expression(topDown)))

  def bmp_decode(data: Column): Column =
    GraftBridge.column(BmpDecodeGray(GraftBridge.expression(data)))

  def audio_fingerprint(data: Column): Column =
    GraftBridge.column(AudioFingerprint(GraftBridge.expression(data)))

  def synth_audio(seed: Column, nPerSeg: Column, perturb: Column): Column =
    GraftBridge.column(SynthAudio(GraftBridge.expression(seed),
      GraftBridge.expression(nPerSeg), GraftBridge.expression(perturb)))
}
