package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** GIF codec in pure byte math — the LZW member of the real decode
  * family: GIF87a/89a frames with global or local color tables,
  * LSB-first variable-width LZW code streams (dictionary rebuild, KwKwK
  * case, code-width growth to 12 bits, deferred-clear full-table
  * behavior), length-prefixed data sub-blocks, extension skipping, and
  * Adam-style 4-pass interlace, projected to the shared single-channel
  * luma buffer. The encoder writes literal-code streams (clear, then
  * one code per pixel — legal LZW an arbitrary decoder accepts) over an
  * identity gray table for bit-exact fixtures; dictionary-heavy streams
  * are exercised by decoding ImageIO-written GIFs in the specs.
  *
  * Hostile input yields null: sub-block and table offsets are
  * bounds-checked, declared dimensions capped before allocation, and
  * out-of-range codes rejected.
  */
object GifCodecUtil {

  /** Decode allocation cap. The palette codecs allocate ~2-3 bytes per
    * declared pixel BEFORE decode can fail, so a small hostile payload
    * declaring huge dimensions is an allocation amplifier; 16M pixels
    * (4096 x 4096) is far beyond anything the dHash grid needs while
    * bounding the worst per-task allocation to ~48 MB. */
  val MaxSamples: Long = 1L << 24

  /** Encode a `w x h` single-channel buffer as a non-interlaced GIF89a
    * with a 256-entry identity gray global table and a literal-code LZW
    * stream (min code size 8). Null for unusable input. */
  def gifEncodeGray(gray: Array[Byte], w: Int, h: Int): Array[Byte] =
    gifEncodeGrayFrames(gray, w, h, 1)

  /** Encode `nFrames` concatenated `w x h` single-channel buffers as an
    * ANIMATED non-interlaced GIF89a: one identity gray global table, a
    * NETSCAPE looping extension, and per frame a Graphic Control
    * Extension (so decoders exercise the between-frame extension walk)
    * followed by an image descriptor + literal-code LZW stream. The
    * identity palette makes the luma projection lossless, so decoded
    * frames are bit-exact. Null for unusable input. */
  def gifEncodeGrayFrames(
      gray: Array[Byte], w: Int, h: Int, nFrames: Int): Array[Byte] = {
    if (w < 1 || h < 1 || w > 0xffff || h > 0xffff || nFrames < 1 ||
      nFrames > MaxFrames || w.toLong * h * nFrames > MaxSamples ||
      gray.length < w.toLong * h * nFrames) return null
    val bos = new java.io.ByteArrayOutputStream(w * h * nFrames * 2 + 1024)
    def b(v: Int): Unit = bos.write(v & 0xff)
    def le2(v: Int): Unit = { b(v); b(v >> 8) }
    bos.write("GIF89a".getBytes("US-ASCII"), 0, 6)
    le2(w); le2(h)
    b(0xf7) // global color table, 8 bits, 256 entries
    b(0); b(0) // background, aspect
    var i = 0
    while (i < 256) { b(i); b(i); b(i); i += 1 }
    if (nFrames > 1) {
      // NETSCAPE2.0 application extension: loop forever
      b(0x21); b(0xff); b(11)
      bos.write("NETSCAPE2.0".getBytes("US-ASCII"), 0, 11)
      b(3); b(1); le2(0); b(0)
    }
    var f = 0
    while (f < nFrames) {
      writeFrame(bos, gray, f * w * h, w, h, gce = nFrames > 1,
        left = 0, top = 0, disposal = 1, transIdx = -1)
      f += 1
    }
    b(0x3b) // trailer
    bos.toByteArray
  }

  /** Write one frame: optional Graphic Control Extension (disposal in
    * bits 2-4; `transIdx` >= 0 sets the transparency flag + index), an
    * image descriptor at (left, top), and a literal-code LZW stream. */
  private def writeFrame(bos: java.io.ByteArrayOutputStream,
      gray: Array[Byte], off: Int, w: Int, h: Int, gce: Boolean,
      left: Int, top: Int, disposal: Int, transIdx: Int,
      delayCs: Int = 1): Unit = {
    def b(v: Int): Unit = bos.write(v & 0xff)
    def le2(v: Int): Unit = { b(v); b(v >> 8) }
    if (gce) {
      val packed = ((disposal & 7) << 2) | (if (transIdx >= 0) 1 else 0)
      b(0x21); b(0xf9); b(4); b(packed); le2(delayCs)
      b(if (transIdx >= 0) transIdx else 0); b(0)
    }
    b(0x2c) // image descriptor
    le2(left); le2(top); le2(w); le2(h)
    b(0) // no local table, not interlaced
    b(8) // LZW min code size
    // literal-code stream mirroring the decoder's width bookkeeping
    val data = new java.io.ByteArrayOutputStream(w * h * 2)
    var acc = 0L
    var nBits = 0
    def emit(code: Int, size: Int): Unit = {
      acc |= code.toLong << nBits
      nBits += size
      while (nBits >= 8) { data.write((acc & 0xff).toInt); acc >>= 8; nBits -= 8 }
    }
    var codeSize = 9
    var next = 258
    var prev = -1
    emit(256, codeSize) // clear
    var j = 0
    val n = w * h
    while (j < n) {
      emit(gray(off + j) & 0xff, codeSize)
      if (prev >= 0 && next < 4096) {
        next += 1
        if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
      }
      prev = gray(off + j) & 0xff
      j += 1
    }
    emit(257, codeSize) // end of information
    if (nBits > 0) data.write((acc & 0xff).toInt)
    val bytes = data.toByteArray
    var p = 0
    while (p < bytes.length) {
      val len = math.min(255, bytes.length - p)
      b(len); bos.write(bytes, p, len)
      p += len
    }
    b(0) // block terminator
  }

  /** Frame-count cap for the animation walk: bounds the per-row output
    * a hostile payload can force alongside the cumulative [[MaxSamples]]
    * pixel budget. */
  val MaxFrames: Int = 1024

  /** Fixture builder: a seed-derived animated GIF that exercises every
    * compositing dimension [[gifCompositedFrames]] must honor, with
    * pixel sums that stay closed-form for an oracle:
    *
    *  - screen W = 24 + seed%5 * 8, H = 10 + seed%3 * 4, background
    *    index bg = seed%100 + 5, identity gray palette (luma == index);
    *  - nFrames = 4 + seed%3; frame 0 fills the screen with
    *    c0 = seed%200 + 10 (disposal "leave");
    *  - frames f >= 1 are 4x3 rects at (5*(f-1), 2) — pairwise disjoint —
    *    with color c_f = (seed*7 + f*31) % 200 + 20;
    *  - `mode` 0: all disposal 1 (accumulate); 1: disposal 2 (restore
    *    rect to BACKGROUND before the next frame); 2: disposal 3
    *    (restore rect to the PREVIOUS canvas); 3: disposal 1 but
    *    even-numbered rect frames are fully TRANSPARENT (index 255,
    *    flag set) — a draw that must be a no-op.
    */
  def synthAnim(seed: Long, mode: Int): Array[Byte] = {
    if (mode < 0 || mode > 3) return null
    val s = if (seed < 0) -seed else seed
    val w = 24 + (s % 5).toInt * 8
    val h = 10 + (s % 3).toInt * 4
    val bg = (s % 100 + 5).toInt
    val c0 = (s % 200 + 10).toInt
    val nFrames = 4 + (s % 3).toInt
    val bos = new java.io.ByteArrayOutputStream(w * h * 2 + 1024)
    def b(v: Int): Unit = bos.write(v & 0xff)
    def le2(v: Int): Unit = { b(v); b(v >> 8) }
    bos.write("GIF89a".getBytes("US-ASCII"), 0, 6)
    le2(w); le2(h)
    b(0xf7); b(bg); b(0) // GCT 256, background index, aspect
    var i = 0
    while (i < 256) { b(i); b(i); b(i); i += 1 }
    b(0x21); b(0xff); b(11) // NETSCAPE loop
    bos.write("NETSCAPE2.0".getBytes("US-ASCII"), 0, 11)
    b(3); b(1); le2(0); b(0)
    val full = new Array[Byte](w * h)
    java.util.Arrays.fill(full, c0.toByte)
    // per-frame delays f+1 centiseconds: cumulative timestamps stay
    // closed-form for the metadata gate
    writeFrame(bos, full, 0, w, h, gce = true, left = 0, top = 0,
      disposal = 1, transIdx = -1, delayCs = 1)
    val rect = new Array[Byte](12)
    var f = 1
    while (f < nFrames) {
      val transparent = mode == 3 && f % 2 == 0
      val cf = ((s * 7 + f * 31) % 200 + 20).toInt
      java.util.Arrays.fill(rect, (if (transparent) 255 else cf).toByte)
      val disposal = mode match {
        case 1 => 2
        case 2 => 3
        case _ => 1
      }
      writeFrame(bos, rect, 0, 4, 3, gce = true, left = 5 * (f - 1),
        top = 2, disposal = disposal,
        transIdx = if (transparent) 255 else -1, delayCs = f + 1)
      f += 1
    }
    b(0x3b)
    bos.toByteArray
  }

  /** Decode the FIRST image of a GIF to struct(width, height, channels,
    * pixels) — width/height are the image descriptor's (the frame), and
    * `pixels` its palette-resolved luma. channels is 3 (palette RGB),
    * matching [[ImageBytesUtil.imageMeta]]. Null for malformed streams,
    * missing color tables, or out-of-range codes. */
  def gifDecodeGray(data: Array[Byte]): InternalRow = {
    try {
      val fs = decodeFramesOrNull(data, 1)
      if (fs == null || fs.isEmpty) null else fs.head
    } catch { case scala.util.control.NonFatal(_) => null }
  }

  /** Decode EVERY frame of a (possibly animated) GIF to an array of
    * struct(width, height, channels, pixels) — each frame standalone at
    * its own descriptor dimensions (no inter-frame disposal compositing:
    * the perceptual pipeline compares frames, it does not replay the
    * animation). Null for streams whose FIRST frame is undecodable; a
    * stream that corrupts after N good frames yields those N (tolerant,
    * matching the curation posture). Bounded by [[MaxFrames]] frames and
    * a cumulative [[MaxSamples]] pixel budget. */
  def gifDecodeFrames(data: Array[Byte]): org.apache.spark.sql.catalyst.util.ArrayData = {
    try {
      val fs = decodeFramesOrNull(data, MaxFrames)
      if (fs == null || fs.isEmpty) null
      else new org.apache.spark.sql.catalyst.util.GenericArrayData(
        fs.toArray[Any])
    } catch { case scala.util.control.NonFatal(_) => null }
  }

  private def decodeFramesOrNull(
      d: Array[Byte], maxFrames: Int): Seq[InternalRow] = {
    if (d.length < 14 || d(0) != 'G' || d(1) != 'I' || d(2) != 'F' ||
      d(3) != '8' || (d(4) != '7' && d(4) != '9') || d(5) != 'a') return null
    def le2(i: Int): Int = (d(i) & 0xff) | ((d(i + 1) & 0xff) << 8)
    var pos = 6
    pos += 4 // logical screen w/h (frames carry their own)
    val flags = d(pos) & 0xff
    pos += 3 // flags, background, aspect
    var globalTable: Array[Byte] = null
    if ((flags & 0x80) != 0) {
      val sz = 3 * (1 << ((flags & 7) + 1))
      if (pos + sz > d.length) return null
      globalTable = java.util.Arrays.copyOfRange(d, pos, pos + sz)
      pos += sz
    }
    val frames = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var budget = MaxSamples
    // a malformed block ends the walk: frames decoded so far survive,
    // an immediately-malformed stream is null
    def result: Seq[InternalRow] = if (frames.isEmpty) null else frames.toSeq
    while (pos < d.length && frames.size < maxFrames) {
      (d(pos) & 0xff) match {
        case 0x3b => return result // trailer
        case 0x21 => // extension (incl. per-frame GCE): label + sub-blocks
          pos += 2
          var len = if (pos < d.length) d(pos) & 0xff else return result
          while (len != 0) {
            pos += 1 + len
            if (pos >= d.length) return result
            len = d(pos) & 0xff
          }
          pos += 1
        case 0x2c =>
          if (pos + 10 > d.length) return result
          val w = le2(pos + 5)
          val h = le2(pos + 7)
          val iFlags = d(pos + 9) & 0xff
          pos += 10
          if (w <= 0 || h <= 0 || w.toLong * h > budget) return result
          var table = globalTable
          if ((iFlags & 0x80) != 0) {
            val sz = 3 * (1 << ((iFlags & 7) + 1))
            if (pos + sz > d.length) return result
            table = java.util.Arrays.copyOfRange(d, pos, pos + sz)
            pos += sz
          }
          if (table == null) return result
          val interlaced = (iFlags & 0x40) != 0
          if (pos >= d.length) return result
          val minCode = d(pos) & 0xff
          pos += 1
          if (minCode < 2 || minCode > 8) return result
          // concatenate the data sub-blocks
          val lzw = new java.io.ByteArrayOutputStream(d.length - pos)
          var len = d(pos) & 0xff
          while (len != 0) {
            if (pos + 1 + len > d.length) return result
            lzw.write(d, pos + 1, len)
            pos += 1 + len
            if (pos >= d.length) return result
            len = d(pos) & 0xff
          }
          pos += 1 // the sub-block terminator
          val frame = decodeLzw(lzw.toByteArray, w, h, minCode, table,
            interlaced)
          if (frame == null) return result
          budget -= w.toLong * h
          frames += frame
        case _ => return result
      }
    }
    result
  }

  /** Decode a (possibly animated) GIF as the viewer SEES it: each element
    * is the full logical-screen canvas after that frame is rendered,
    * honoring frame offsets, Graphic Control Extension transparency, and
    * the three disposal methods (1 leave, 2 restore-to-background,
    * 3 restore-to-previous). Null when the stream yields no composited
    * frame; corruption after N good frames yields those N. Canvas starts
    * as the background color's luma; rects are clipped to the screen. */
  def gifCompositedFrames(data: Array[Byte]): org.apache.spark.sql.catalyst.util.ArrayData = {
    try {
      val fs = compositedOrNull(data, MaxFrames)
      if (fs == null || fs.isEmpty) null
      else new org.apache.spark.sql.catalyst.util.GenericArrayData(
        fs.toArray[Any])
    } catch { case scala.util.control.NonFatal(_) => null }
  }

  private def compositedOrNull(
      d: Array[Byte], maxFrames: Int): Seq[InternalRow] = {
    if (d.length < 14 || d(0) != 'G' || d(1) != 'I' || d(2) != 'F' ||
      d(3) != '8' || (d(4) != '7' && d(4) != '9') || d(5) != 'a') return null
    def le2(i: Int): Int = (d(i) & 0xff) | ((d(i + 1) & 0xff) << 8)
    val sw = le2(6)
    val sh = le2(8)
    if (sw <= 0 || sh <= 0 || sw.toLong * sh > MaxSamples) return null
    val flags = d(10) & 0xff
    val bgIdx = d(11) & 0xff
    var pos = 13
    var globalTable: Array[Byte] = null
    if ((flags & 0x80) != 0) {
      val sz = 3 * (1 << ((flags & 7) + 1))
      if (pos + sz > d.length) return null
      globalTable = java.util.Arrays.copyOfRange(d, pos, pos + sz)
      pos += sz
    }
    val canvas = new Array[Byte](sw * sh)
    val bgLuma: Byte =
      if (globalTable != null && bgIdx < globalTable.length / 3)
        lumaOf(globalTable, bgIdx)
      else 0
    java.util.Arrays.fill(canvas, bgLuma)
    val frames = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var budget = MaxSamples
    // pending Graphic Control state — applies to the next image only
    var disposal = 0
    var transIdx = -1
    def result: Seq[InternalRow] = if (frames.isEmpty) null else frames.toSeq
    while (pos < d.length && frames.size < maxFrames) {
      (d(pos) & 0xff) match {
        case 0x3b => return result
        case 0x21 =>
          val label = if (pos + 1 < d.length) d(pos + 1) & 0xff else -1
          if (label == 0xf9 && pos + 7 < d.length && (d(pos + 2) & 0xff) >= 4) {
            val packed = d(pos + 3) & 0xff
            disposal = (packed >> 2) & 7
            transIdx = if ((packed & 1) != 0) d(pos + 6) & 0xff else -1
          }
          pos += 2
          var len = if (pos < d.length) d(pos) & 0xff else return result
          while (len != 0) {
            pos += 1 + len
            if (pos >= d.length) return result
            len = d(pos) & 0xff
          }
          pos += 1
        case 0x2c =>
          if (pos + 10 > d.length) return result
          val left = le2(pos + 1)
          val top = le2(pos + 3)
          val w = le2(pos + 5)
          val h = le2(pos + 7)
          val iFlags = d(pos + 9) & 0xff
          pos += 10
          if (w <= 0 || h <= 0 || w.toLong * h > MaxSamples) return result
          var table = globalTable
          if ((iFlags & 0x80) != 0) {
            val sz = 3 * (1 << ((iFlags & 7) + 1))
            if (pos + sz > d.length) return result
            table = java.util.Arrays.copyOfRange(d, pos, pos + sz)
            pos += sz
          }
          if (table == null) return result
          val interlaced = (iFlags & 0x40) != 0
          if (pos >= d.length) return result
          val minCode = d(pos) & 0xff
          pos += 1
          if (minCode < 2 || minCode > 8) return result
          val lzw = new java.io.ByteArrayOutputStream(d.length - pos)
          var len = d(pos) & 0xff
          while (len != 0) {
            if (pos + 1 + len > d.length) return result
            lzw.write(d, pos + 1, len)
            pos += 1 + len
            if (pos >= d.length) return result
            len = d(pos) & 0xff
          }
          pos += 1
          val idx = decodeLzwIdx(lzw.toByteArray, w, h, minCode, interlaced)
          if (idx == null) return result
          if (budget < sw.toLong * sh) return result
          val nColors = table.length / 3
          // pre-draw snapshot of the (clipped) rect for disposal 3
          val drawW = math.min(w, math.max(0, sw - left))
          val drawH = math.min(h, math.max(0, sh - top))
          val prev: Array[Byte] =
            if (disposal == 3 && drawW > 0 && drawH > 0) {
              val p = new Array[Byte](drawW * drawH)
              var y = 0
              while (y < drawH) {
                System.arraycopy(canvas, (top + y) * sw + left, p,
                  y * drawW, drawW)
                y += 1
              }
              p
            } else null
          var y = 0
          while (y < drawH) {
            var x = 0
            while (x < drawW) {
              val ci = idx(y * w + x) & 0xff
              if (ci != transIdx) {
                if (ci >= nColors) return result
                canvas((top + y) * sw + left + x) = lumaOf(table, ci)
              }
              x += 1
            }
            y += 1
          }
          budget -= sw.toLong * sh
          frames += InternalRow(sw, sh, 3,
            java.util.Arrays.copyOf(canvas, canvas.length))
          // dispose for the NEXT frame
          if (disposal == 2 && drawW > 0 && drawH > 0) {
            var yy = 0
            while (yy < drawH) {
              java.util.Arrays.fill(canvas, (top + yy) * sw + left,
                (top + yy) * sw + left + drawW, bgLuma)
              yy += 1
            }
          } else if (disposal == 3 && prev != null) {
            var yy = 0
            while (yy < drawH) {
              System.arraycopy(prev, yy * drawW, canvas,
                (top + yy) * sw + left, drawW)
              yy += 1
            }
          }
          disposal = 0
          transIdx = -1
        case _ => return result
      }
    }
    result
  }

  /** Per-frame animation metadata WITHOUT pixel decode: one row per
    * image descriptor with its rect, the pending Graphic Control fields
    * (delay in centiseconds, disposal method, transparency), and the
    * cumulative start time. LZW data sub-blocks are length-skipped, so a
    * 100 TB animation-metadata pass costs header bytes per frame, not
    * pixels. Null when the payload is not a GIF or holds no frame. */
  def gifFrameMeta(data: Array[Byte]): org.apache.spark.sql.catalyst.util.ArrayData = {
    try {
      val d = data
      if (d.length < 14 || d(0) != 'G' || d(1) != 'I' || d(2) != 'F' ||
        d(3) != '8' || (d(4) != '7' && d(4) != '9') || d(5) != 'a') return null
      def le2(i: Int): Int = (d(i) & 0xff) | ((d(i + 1) & 0xff) << 8)
      val flags = d(10) & 0xff
      var pos = 13
      if ((flags & 0x80) != 0) {
        val sz = 3 * (1 << ((flags & 7) + 1))
        if (pos + sz > d.length) return null
        pos += sz
      }
      val rows = scala.collection.mutable.ArrayBuffer.empty[Any]
      var delay = 0
      var disposal = 0
      var trans = false
      var startCs = 0L
      def result: org.apache.spark.sql.catalyst.util.ArrayData =
        if (rows.isEmpty) null
        else new org.apache.spark.sql.catalyst.util.GenericArrayData(
          rows.toArray)
      while (pos < d.length && rows.size < MaxFrames) {
        (d(pos) & 0xff) match {
          case 0x3b => return result
          case 0x21 =>
            val label = if (pos + 1 < d.length) d(pos + 1) & 0xff else -1
            if (label == 0xf9 && pos + 7 < d.length &&
              (d(pos + 2) & 0xff) >= 4) {
              val packed = d(pos + 3) & 0xff
              disposal = (packed >> 2) & 7
              trans = (packed & 1) != 0
              delay = le2(pos + 4)
            }
            pos += 2
            var len = if (pos < d.length) d(pos) & 0xff else return result
            while (len != 0) {
              pos += 1 + len
              if (pos >= d.length) return result
              len = d(pos) & 0xff
            }
            pos += 1
          case 0x2c =>
            if (pos + 10 > d.length) return result
            val left = le2(pos + 1)
            val top = le2(pos + 3)
            val w = le2(pos + 5)
            val h = le2(pos + 7)
            val iFlags = d(pos + 9) & 0xff
            pos += 10
            if ((iFlags & 0x80) != 0) {
              val sz = 3 * (1 << ((iFlags & 7) + 1))
              if (pos + sz > d.length) return result
              pos += sz
            }
            if (pos >= d.length) return result
            pos += 1 // LZW min code size
            if (pos >= d.length) return result
            var len = d(pos) & 0xff
            while (len != 0) { // skip the data sub-blocks by length alone
              pos += 1 + len
              if (pos >= d.length) return result
              len = d(pos) & 0xff
            }
            pos += 1
            rows += InternalRow(left, top, w, h, delay, disposal, trans,
              startCs)
            startCs += delay
            delay = 0; disposal = 0; trans = false
          case _ => return result
        }
      }
      result
    } catch { case scala.util.control.NonFatal(_) => null }
  }

  val frameMetaSchema: StructType = StructType(Seq(
    StructField("left", IntegerType, nullable = false),
    StructField("top", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("delay_cs", IntegerType, nullable = false),
    StructField("disposal", IntegerType, nullable = false),
    StructField("transparent", BooleanType, nullable = false),
    StructField("start_cs", LongType, nullable = false)))

  /** Interlace pass row order: 0,8,16.. then 4,12.. then 2,6.. then 1,3.. */
  private def rowOrder(h: Int, interlaced: Boolean): Array[Int] = {
    val rows = new Array[Int](h)
    if (!interlaced) {
      var i = 0
      while (i < h) { rows(i) = i; i += 1 }
    } else {
      var k = 0
      for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
        var y = start
        while (y < h) { rows(k) = y; k += 1; y += step }
      }
    }
    rows
  }

  private def lumaOf(table: Array[Byte], ci: Int): Byte = {
    val o = ci * 3
    ((77 * (table(o) & 0xff) + 150 * (table(o + 1) & 0xff) +
      29 * (table(o + 2) & 0xff)) >> 8).toByte
  }

  private def decodeLzw(
      lzw: Array[Byte], w: Int, h: Int, minCode: Int,
      table: Array[Byte], interlaced: Boolean): InternalRow = {
    val idx = decodeLzwIdx(lzw, w, h, minCode, interlaced)
    if (idx == null) return null
    val nColors = table.length / 3
    val n = w * h
    val gray = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val ci = idx(i) & 0xff
      if (ci >= nColors) return null
      gray(i) = lumaOf(table, ci)
      i += 1
    }
    InternalRow(w, h, 3, gray)
  }

  /** The frame's palette INDICES in row order (interlace resolved), or
    * null for corrupt/truncated streams. */
  private def decodeLzwIdx(
      lzw: Array[Byte], w: Int, h: Int, minCode: Int,
      interlaced: Boolean): Array[Byte] = {
    val clear = 1 << minCode
    val end = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4097)
    var codeSize = minCode + 1
    var next = end + 1
    var prev = -1
    val rows = rowOrder(h, interlaced)
    val idx = new Array[Byte](w * h)
    var out = 0 // position in scan order; mapped through rows at the end
    var acc = 0L
    var nBits = 0
    var pos = 0
    def read(): Int = {
      while (nBits < codeSize) {
        if (pos >= lzw.length) return -1
        acc |= (lzw(pos) & 0xffL) << nBits
        pos += 1
        nBits += 8
      }
      val c = (acc & ((1 << codeSize) - 1)).toInt
      acc >>= codeSize
      nBits -= codeSize
      c
    }
    val n = w * h
    var done = false
    while (!done && out < n) {
      val code = read()
      if (code < 0) return null // truncated stream
      if (code == clear) {
        codeSize = minCode + 1
        next = end + 1
        prev = -1
      } else if (code == end) {
        done = true
      } else if (prev < 0) {
        if (code >= clear) return null
        idx(out) = code.toByte
        out += 1
        prev = code
      } else {
        if (code > next || code == end || code == clear) return null
        // expand the code (KwKwK when code == next) onto the stack
        var sp = 0
        var cur = code
        if (code == next) {
          // first char of prev's expansion
          var p = prev
          while (p >= clear + 2) p = prefix(p)
          stack(sp) = p.toByte; sp += 1
          cur = prev
        }
        while (cur >= clear + 2) {
          stack(sp) = suffix(cur); sp += 1
          cur = prefix(cur)
        }
        stack(sp) = cur.toByte; sp += 1
        val firstChar = cur
        if (next < 4096) {
          prefix(next) = prev
          suffix(next) = firstChar.toByte
          next += 1
          if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        while (sp > 0 && out < n) {
          sp -= 1
          idx(out) = stack(sp)
          out += 1
        }
        prev = code
      }
    }
    if (out < n) return null // ran out of codes before the frame filled
    if (!interlaced) idx
    else {
      val mapped = new Array[Byte](n)
      var k = 0
      while (k < h) {
        System.arraycopy(idx, k * w, mapped, rows(k) * w, w)
        k += 1
      }
      mapped
    }
  }
}

/** Codegen'd GIF encode: `gif_encode_gray(pixels, w, h)` -> BINARY
  * GIF89a with an identity gray table (null for unusable input). */
case class GifEncodeGray(data: Expression, w: Expression, h: Expression)
    extends TernaryExpression {
  override def first: Expression = data
  override def second: Expression = w
  override def third: Expression = h
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (data.dataType == BinaryType && w.dataType == IntegerType &&
      h.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gif_encode_gray expects (BINARY, INT, INT), got " +
        s"(${data.dataType}, ${w.dataType}, ${h.dataType})")

  override def nullSafeEval(d: Any, wv: Any, hv: Any): Any =
    GifCodecUtil.gifEncodeGray(d.asInstanceOf[Array[Byte]],
      wv.asInstanceOf[Int], hv.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (d, wv, hv) => s"""
      ${ev.value} = graft.functions.GifCodecUtil.gifEncodeGray($d, $wv, $hv);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): GifEncodeGray =
    copy(data = newFirst, w = newSecond, h = newThird)
}

/** Codegen'd GIF decode: `gif_decode(binary)` -> struct(width, height,
  * channels, pixels) with palette-resolved luma pixels. */
case class GifDecodeGray(child: Expression) extends UnaryExpression {
  override def dataType: DataType = PngDecodeGray.schema // same shape
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gif_decode expects BINARY, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    GifCodecUtil.gifDecodeGray(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.GifCodecUtil.gifDecodeGray($c);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(newChild: Expression): GifDecodeGray =
    copy(child = newChild)
}

/** Codegen'd animated-GIF encode: `gif_encode_frames(pixels, w, h, n)`
  * -> BINARY GIF89a with `n` frames sliced from the concatenated pixel
  * buffer, per-frame Graphic Control Extensions and a NETSCAPE loop
  * block (null for unusable input). */
case class GifEncodeFrames(data: Expression, w: Expression, h: Expression,
    n: Expression) extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {
  override def first: Expression = data
  override def second: Expression = w
  override def third: Expression = h
  override def fourth: Expression = n
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (data.dataType == BinaryType && w.dataType == IntegerType &&
      h.dataType == IntegerType && n.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gif_encode_frames expects (BINARY, INT, INT, INT), got " +
        s"(${data.dataType}, ${w.dataType}, ${h.dataType}, ${n.dataType})")

  override def nullSafeEval(d: Any, wv: Any, hv: Any, nv: Any): Any =
    GifCodecUtil.gifEncodeGrayFrames(d.asInstanceOf[Array[Byte]],
      wv.asInstanceOf[Int], hv.asInstanceOf[Int], nv.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (d, wv, hv, nv) => s"""
      ${ev.value} = graft.functions.GifCodecUtil.gifEncodeGrayFrames($d, $wv, $hv, $nv);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression,
      newFourth: Expression): GifEncodeFrames =
    copy(data = newFirst, w = newSecond, h = newThird, n = newFourth)
}

/** Codegen'd animated-GIF decode: `gif_frames(binary)` ->
  * ARRAY<struct(width, height, channels, pixels)> — every frame,
  * standalone, palette-resolved luma; null when the first frame is
  * undecodable. Feeds keyframe selection and video near-dup directly
  * from real GIF payloads. */
case class GifFrames(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(PngDecodeGray.schema, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gif_frames expects BINARY, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    GifCodecUtil.gifDecodeFrames(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.GifCodecUtil.gifDecodeFrames($c);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(newChild: Expression): GifFrames =
    copy(child = newChild)
}

/** Codegen'd composited animated-GIF decode:
  * `gif_frames_composited(binary)` -> ARRAY<struct(width, height,
  * channels, pixels)> — each element the full logical-screen canvas as a
  * viewer sees it after that frame renders (offsets, GCE transparency,
  * disposal 1/2/3); null when no frame composites. */
case class GifCompositedFrames(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(PngDecodeGray.schema, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gif_frames_composited expects BINARY, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    GifCodecUtil.gifCompositedFrames(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.GifCodecUtil.gifCompositedFrames($c);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(
      newChild: Expression): GifCompositedFrames =
    copy(child = newChild)
}

/** Codegen'd animation metadata WITHOUT pixel decode:
  * `gif_frame_meta(binary)` -> ARRAY<struct(left, top, width, height,
  * delay_cs, disposal, transparent, start_cs)> — per-frame rects, timing
  * (incl. the cumulative start time keyframe timestamps need), and
  * disposal/transparency, skipping LZW data by sub-block lengths. */
case class GifFrameMeta(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(GifCodecUtil.frameMetaSchema, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gif_frame_meta expects BINARY, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    GifCodecUtil.gifFrameMeta(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.GifCodecUtil.gifFrameMeta($c);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(newChild: Expression): GifFrameMeta =
    copy(child = newChild)
}

/** Fixture builder: `synth_anim(seed, mode)` -> an animated GIF whose
  * compositing behavior (offsets, transparency, all three disposal
  * methods by `mode`) and per-frame pixel sums derive from `seed` in
  * closed form — see [[GifCodecUtil.synthAnim]]. */
case class SynthAnim(seed: Expression, mode: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def left: Expression = seed
  override def right: Expression = mode
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (seed.dataType == LongType && mode.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"synth_anim expects (BIGINT, INT), got " +
        s"(${seed.dataType}, ${mode.dataType})")

  override def nullSafeEval(sv: Any, mv: Any): Any =
    GifCodecUtil.synthAnim(sv.asInstanceOf[Long], mv.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sv, mv) => s"""
      ${ev.value} = graft.functions.GifCodecUtil.synthAnim($sv, $mv);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SynthAnim =
    copy(seed = newLeft, mode = newRight)
}
