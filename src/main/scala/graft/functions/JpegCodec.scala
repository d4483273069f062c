package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** A baseline JPEG codec in pure byte math — the LAST codec seam of the
  * multimodal family made real, with no image library: ITU T.81 baseline
  * sequential decode (canonical Huffman per F.2.2.3, dequantization,
  * separable IDCT, interleaved MCUs with arbitrary sampling factors,
  * restart markers, byte-stuffing) for 8-bit frames of 1..4 components;
  * the luma output is component 0's plane (nearest-upsampled if the
  * frame ever puts luma below full resolution), which is exactly what
  * [[ImageBytesUtil.dhash64]] and every perceptual-dup path consume —
  * chroma blocks are entropy-decoded to keep the bitstream in sync and
  * then dropped, never allocated per pixel.
  *
  * The encoder is the fixture half (like [[PngCodecUtil]]'s): grayscale
  * single-component JFIF with the Annex K luminance Huffman tables and a
  * flat quantization table, so gates can plant real compressed payloads
  * whose decode provably preserves planted gradients (quant q bounds the
  * per-pixel error well under a step-12 [[ImageBytesUtil.synthImageStep]]
  * fixture's gradient).
  *
  * Hostile input yields null, never a throw: marker segments are
  * bounds-checked, declared dimensions are capped before allocation,
  * Huffman tables are validated, and a truncated entropy stream fails
  * cleanly.
  */
object JpegCodecUtil {

  val MaxSamples: Long = 1L << 26

  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // ITU T.81 Annex K.3.3: typical luminance Huffman tables
  private val DcLumBits =
    Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
  private val AcLumBits =
    Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
    0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  private val CosTable: Array[Double] = {
    val t = new Array[Double](8 * 8) // t(x*8+u) = cos((2x+1)u*pi/16)
    for (x <- 0 until 8; u <- 0 until 8)
      t(x * 8 + u) = math.cos((2 * x + 1) * u * math.Pi / 16)
    t
  }
  private val InvSqrt2 = 1.0 / math.sqrt(2.0)

  // --- encoder ----------------------------------------------------------

  /** Canonical Huffman (codes, lengths) per symbol from BITS/HUFFVAL. */
  private def buildCodes(
      bits: Array[Int], vals: Array[Int]): (Array[Int], Array[Int]) = {
    val codes = new Array[Int](256)
    val lens = new Array[Int](256)
    var code = 0
    var k = 0
    for (l <- 1 to 16) {
      var i = 0
      while (i < bits(l)) {
        codes(vals(k)) = code
        lens(vals(k)) = l
        code += 1; k += 1; i += 1
      }
      code <<= 1
    }
    (codes, lens)
  }

  private final class BitWriter(bos: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nBits = 0
    def put(code: Int, len: Int): Unit = {
      acc = (acc << len) | (code & ((1 << len) - 1))
      nBits += len
      while (nBits >= 8) {
        val b = (acc >>> (nBits - 8)) & 0xff
        bos.write(b)
        if (b == 0xff) bos.write(0x00) // byte stuffing
        nBits -= 8
      }
    }
    def flush(): Unit =
      if (nBits > 0) put((1 << (8 - nBits)) - 1, 8 - nBits) // pad with 1s
  }

  private def category(v: Int): Int = 32 - Integer.numberOfLeadingZeros(math.abs(v))

  /** Encode a `w x h` single-channel buffer as a grayscale baseline JFIF
    * JPEG with a FLAT quantization table of value `quant` (1..32; small
    * values bound the decode error to a few units per pixel). Null for
    * unusable input. */
  def jpegEncodeGray(
      gray: Array[Byte], w: Int, h: Int, quant: Int): Array[Byte] = {
    if (w < 1 || h < 1 || quant < 1 || quant > 32 ||
      w.toLong * h > MaxSamples || gray.length < w.toLong * h) return null
    val (dcCodes, dcLens) = buildCodes(DcLumBits, DcLumVals)
    val (acCodes, acLens) = buildCodes(AcLumBits, AcLumVals)
    val bos = new java.io.ByteArrayOutputStream(w * h / 2 + 1024)
    def b(v: Int): Unit = bos.write(v & 0xff)
    def b2(v: Int): Unit = { b(v >> 8); b(v) }
    // SOI + APP0/JFIF
    b2(0xffd8)
    b2(0xffe0); b2(16); bos.write("JFIF".getBytes, 0, 4); b(0)
    b2(0x0101); b(0); b2(1); b2(1); b(0); b(0)
    // DQT: table 0, 8-bit, flat, stored in zigzag order
    b2(0xffdb); b2(67); b(0)
    for (_ <- 0 until 64) b(quant)
    // SOF0: 8-bit, 1 component, 1x1 sampling, quant table 0
    b2(0xffc0); b2(11); b(8); b2(h); b2(w); b(1); b(1); b(0x11); b(0)
    // DHT: DC class 0 id 0, AC class 1 id 0
    b2(0xffc4); b2(2 + 1 + 16 + DcLumVals.length + 1 + 16 + AcLumVals.length)
    b(0x00); for (l <- 1 to 16) b(DcLumBits(l)); DcLumVals.foreach(b)
    b(0x10); for (l <- 1 to 16) b(AcLumBits(l)); AcLumVals.foreach(b)
    // SOS
    b2(0xffda); b2(8); b(1); b(1); b(0x00); b(0); b(63); b(0)
    val bw = new BitWriter(bos)
    val coef = new Array[Int](64)
    var prevDc = 0
    val blocksY = (h + 7) / 8
    val blocksX = (w + 7) / 8
    var by = 0
    while (by < blocksY) {
      var bx = 0
      while (bx < blocksX) {
        // forward DCT of the (edge-replicated) block, flat-quantized
        var v = 0
        while (v < 8) {
          var u = 0
          while (u < 8) {
            var s = 0.0
            var y = 0
            while (y < 8) {
              val py = math.min(h - 1, by * 8 + y)
              var x = 0
              while (x < 8) {
                val px = math.min(w - 1, bx * 8 + x)
                s += ((gray(py * w + px) & 0xff) - 128) *
                  CosTable(x * 8 + u) * CosTable(y * 8 + v)
                x += 1
              }
              y += 1
            }
            val cu = if (u == 0) InvSqrt2 else 1.0
            val cv = if (v == 0) InvSqrt2 else 1.0
            val q = math.round(s * cu * cv / 4.0 / quant).toInt
            coef(zz(v * 8 + u)) = math.max(-1023, math.min(1023, q))
            u += 1
          }
          v += 1
        }
        // DC
        val diff = coef(0) - prevDc
        prevDc = coef(0)
        val s0 = if (diff == 0) 0 else category(diff)
        bw.put(dcCodes(s0), dcLens(s0))
        if (s0 > 0) bw.put(if (diff < 0) diff + (1 << s0) - 1 else diff, s0)
        // AC with run-lengths
        var run = 0
        var k = 1
        while (k < 64) {
          val ac = coef(k)
          if (ac == 0) run += 1
          else {
            while (run >= 16) { bw.put(acCodes(0xf0), acLens(0xf0)); run -= 16 }
            val sz = category(ac)
            val sym = (run << 4) | sz
            bw.put(acCodes(sym), acLens(sym))
            bw.put(if (ac < 0) ac + (1 << sz) - 1 else ac, sz)
            run = 0
          }
          k += 1
        }
        if (run > 0) bw.put(acCodes(0x00), acLens(0x00)) // EOB
        bx += 1
      }
      by += 1
    }
    bw.flush()
    b2(0xffd9)
    bos.toByteArray
  }

  // natural index -> zigzag position
  private val zz: Array[Int] = {
    val inv = new Array[Int](64)
    for (i <- 0 until 64) inv(ZigZag(i)) = i
    inv
  }

  // --- decoder ----------------------------------------------------------

  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    // F.2.2.3 canonical decode tables per code length 1..16
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      for (l <- 1 to 16) {
        if (bits(l) > 0) {
          valPtr(l) = k
          minCode(l) = code
          code += bits(l); k += bits(l)
          maxCode(l) = code - 1
        }
        code <<= 1
      }
      require(k == vals.length, "huffman table count mismatch")
    }
    def value(l: Int, code: Int): Int = vals(valPtr(l) + code - minCode(l))
  }

  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nBits = 0
    var hitMarker = false // a non-RST marker ends the entropy stream

    def nextBit(): Int = {
      if (nBits == 0) {
        if (pos >= data.length) { hitMarker = true; return -1 }
        var byte0 = data(pos) & 0xff
        pos += 1
        if (byte0 == 0xff) {
          if (pos >= data.length) { hitMarker = true; return -1 }
          val m = data(pos) & 0xff
          if (m == 0x00) pos += 1 // stuffed FF
          else { hitMarker = true; pos -= 1; return -1 }
        }
        acc = byte0; nBits = 8
      }
      nBits -= 1
      (acc >>> nBits) & 1
    }

    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val bit = nextBit()
        if (bit < 0) throw new IllegalStateException("truncated stream")
        v = (v << 1) | bit
        i += 1
      }
      v
    }

    def decodeHuff(t: HuffTable): Int = {
      var code = 0
      var l = 0
      do {
        val bit = nextBit()
        if (bit < 0) throw new IllegalStateException("truncated stream")
        code = (code << 1) | bit
        l += 1
        if (l > 16) throw new IllegalStateException("bad huffman code")
      } while (code > t.maxCode(l))
      t.value(l, code)
    }

    /** Byte-align and consume an expected RSTn marker. */
    def restart(expected: Int): Unit = {
      nBits = 0
      if (pos + 2 > data.length || (data(pos) & 0xff) != 0xff ||
        (data(pos + 1) & 0xff) != (0xd0 + expected))
        throw new IllegalStateException("missing restart marker")
      pos += 2
      hitMarker = false
    }
  }

  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  /** Decode a baseline (SOF0/SOF1) JPEG to struct(width, height,
    * channels, pixels) where `pixels` is component 0's plane (luma for
    * JFIF YCbCr, the only component for grayscale) cropped to the frame
    * size. All components are entropy-decoded so interleaved scans stay
    * in sync; only component 0 is inverse-transformed. Null for
    * progressive/arithmetic/12-bit frames or any malformed stream. */
  def jpegDecodeGray(data: Array[Byte]): InternalRow = {
    try decodeOrNull(data)
    catch { case scala.util.control.NonFatal(_) => null }
  }

  private def decodeOrNull(data: Array[Byte]): InternalRow = {
    if (data.length < 4 || (data(0) & 0xff) != 0xff ||
      (data(1) & 0xff) != 0xd8) return null
    var pos = 2
    def u16(i: Int): Int = ((data(i) & 0xff) << 8) | (data(i + 1) & 0xff)
    val quantTables = new Array[Array[Int]](4) // natural order
    val dcTables = new Array[HuffTable](4)
    val acTables = new Array[HuffTable](4)
    var w = 0
    var h = 0
    var nComp = 0
    var compId: Array[Int] = null
    var compH: Array[Int] = null
    var compV: Array[Int] = null
    var compQ: Array[Int] = null
    var restartInterval = 0
    var sofSeen = false

    while (true) {
      // seek the next marker (skip fill bytes)
      while (pos < data.length && (data(pos) & 0xff) != 0xff) pos += 1
      while (pos < data.length && (data(pos) & 0xff) == 0xff) pos += 1
      if (pos >= data.length) return null
      val marker = data(pos) & 0xff
      pos += 1
      marker match {
        case 0xd9 => return null // EOI before SOS
        case m if m >= 0xd0 && m <= 0xd7 => () // stray RST: no segment
        case 0x01 => ()
        case 0xc0 | 0xc1 =>
          if (pos + 2 > data.length) return null
          val len = u16(pos)
          if (pos + len > data.length || len < 8) return null
          if (sofSeen || (data(pos + 2) & 0xff) != 8) return null
          sofSeen = true
          h = u16(pos + 3)
          w = u16(pos + 5)
          nComp = data(pos + 7) & 0xff
          if (w <= 0 || h <= 0 || nComp < 1 || nComp > 4 ||
            len != 8 + 3 * nComp ||
            w.toLong * h * nComp > MaxSamples) return null
          compId = new Array[Int](nComp)
          compH = new Array[Int](nComp)
          compV = new Array[Int](nComp)
          compQ = new Array[Int](nComp)
          for (c <- 0 until nComp) {
            compId(c) = data(pos + 8 + 3 * c) & 0xff
            val hv = data(pos + 9 + 3 * c) & 0xff
            compH(c) = hv >> 4
            compV(c) = hv & 0xf
            compQ(c) = data(pos + 10 + 3 * c) & 0xff
            if (compH(c) < 1 || compH(c) > 4 || compV(c) < 1 ||
              compV(c) > 4 || compQ(c) > 3) return null
          }
          pos += len
        case 0xc4 =>
          if (pos + 2 > data.length) return null
          val len = u16(pos)
          if (pos + len > data.length) return null
          var p = pos + 2
          while (p < pos + len) {
            val tcTh = data(p) & 0xff
            val tc = tcTh >> 4
            val th = tcTh & 0xf
            if (tc > 1 || th > 3 || p + 17 > pos + len) return null
            val bits = new Array[Int](17)
            var total = 0
            for (l <- 1 to 16) { bits(l) = data(p + l) & 0xff; total += bits(l) }
            if (total > 256 || p + 17 + total > pos + len) return null
            val vals = new Array[Int](total)
            for (i <- 0 until total) vals(i) = data(p + 17 + i) & 0xff
            val t = new HuffTable(bits, vals)
            if (tc == 0) dcTables(th) = t else acTables(th) = t
            p += 17 + total
          }
          pos += len
        case 0xdb =>
          if (pos + 2 > data.length) return null
          val len = u16(pos)
          if (pos + len > data.length) return null
          var p = pos + 2
          while (p < pos + len) {
            val pqTq = data(p) & 0xff
            val pq = pqTq >> 4
            val tq = pqTq & 0xf
            if (pq > 1 || tq > 3) return null
            val n = if (pq == 0) 64 else 128
            if (p + 1 + n > pos + len) return null
            val t = new Array[Int](64)
            for (i <- 0 until 64) {
              val v = if (pq == 0) data(p + 1 + i) & 0xff
                else u16(p + 1 + 2 * i)
              t(ZigZag(i)) = v // stored zigzag -> natural
            }
            quantTables(tq) = t
            p += 1 + n
          }
          pos += len
        case 0xdd =>
          if (pos + 4 > data.length || u16(pos) != 4) return null
          restartInterval = u16(pos + 2)
          pos += 4
        case 0xda =>
          if (!sofSeen || pos + 2 > data.length) return null
          val len = u16(pos)
          if (pos + len > data.length) return null
          val ns = data(pos + 2) & 0xff
          // baseline: one interleaved scan covering every frame component
          if (ns != nComp || len != 6 + 2 * ns) return null
          val scanDc = new Array[HuffTable](nComp)
          val scanAc = new Array[HuffTable](nComp)
          for (s <- 0 until ns) {
            val cid = data(pos + 3 + 2 * s) & 0xff
            val c = compId.indexOf(cid)
            if (c < 0) return null
            val tdTa = data(pos + 4 + 2 * s) & 0xff
            val dcT = dcTables(tdTa >> 4)
            val acT = acTables(tdTa & 0xf)
            if (dcT == null || acT == null) return null
            scanDc(c) = dcT
            scanAc(c) = acT
          }
          for (c <- 0 until nComp)
            if (quantTables(compQ(c)) == null) return null
          return decodeScan(data, pos + len, w, h, nComp, compH, compV,
            compQ.map(quantTables(_)), scanDc, scanAc, restartInterval)
        case 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
            0xcd | 0xce | 0xcf =>
          return null // progressive / hierarchical / arithmetic
        case _ =>
          if (pos + 2 > data.length) return null
          val len = u16(pos)
          if (len < 2 || pos + len > data.length) return null
          pos += len
      }
    }
    null
  }

  private def decodeScan(
      data: Array[Byte], start: Int, w: Int, h: Int, nComp: Int,
      compH: Array[Int], compV: Array[Int], quant: Array[Array[Int]],
      dcT: Array[HuffTable], acT: Array[HuffTable],
      restartInterval: Int): InternalRow = {
    val hMax = compH.max
    val vMax = compV.max
    val mcuW = 8 * hMax
    val mcuH = 8 * vMax
    val mcusX = (w + mcuW - 1) / mcuW
    val mcusY = (h + mcuH - 1) / mcuH
    // component 0's plane, at its own resolution
    val p0W = mcusX * compH(0) * 8
    val p0H = mcusY * compV(0) * 8
    if (p0W.toLong * p0H > MaxSamples * 2) return null
    val plane0 = new Array[Byte](p0W * p0H)
    val br = new BitReader(data, start)
    val pred = new Array[Int](nComp)
    val coef = new Array[Int](64)
    var rstCount = 0
    var rstExpect = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && rstCount == restartInterval) {
          br.restart(rstExpect)
          rstExpect = (rstExpect + 1) & 7
          rstCount = 0
          java.util.Arrays.fill(pred, 0)
        }
        var c = 0
        while (c < nComp) {
          var v = 0
          while (v < compV(c)) {
            var u = 0
            while (u < compH(c)) {
              // one 8x8 block: DC then AC per F.2.2
              java.util.Arrays.fill(coef, 0)
              val s0 = br.decodeHuff(dcT(c))
              if (s0 > 11) throw new IllegalStateException("bad DC size")
              pred(c) += extend(br.receive(s0), s0)
              coef(0) = pred(c) * quant(c)(0)
              var k = 1
              while (k < 64) {
                val rs = br.decodeHuff(acT(c))
                val r = rs >> 4
                val sz = rs & 0xf
                if (sz == 0) {
                  if (r == 15) k += 16 // ZRL
                  else k = 64 // EOB
                } else {
                  k += r
                  if (k > 63) throw new IllegalStateException("AC overrun")
                  val nat = ZigZag(k)
                  coef(nat) = extend(br.receive(sz), sz) * quant(c)(nat)
                  k += 1
                }
              }
              if (c == 0) {
                // IDCT into component 0's plane (others stay dropped)
                val bx = (mx * compH(0) + u) * 8
                val byy = (my * compV(0) + v) * 8
                var y = 0
                while (y < 8) {
                  var x = 0
                  while (x < 8) {
                    var s = 0.0
                    var vv = 0
                    while (vv < 8) {
                      val cv = if (vv == 0) InvSqrt2 else 1.0
                      var uu = 0
                      while (uu < 8) {
                        val cu = if (uu == 0) InvSqrt2 else 1.0
                        val f = coef(vv * 8 + uu)
                        if (f != 0)
                          s += cu * cv * f * CosTable(x * 8 + uu) *
                            CosTable(y * 8 + vv)
                        uu += 1
                      }
                      vv += 1
                    }
                    val px = math.max(0,
                      math.min(255, math.round(s / 4.0).toInt + 128))
                    plane0((byy + y) * p0W + bx + x) = px.toByte
                    x += 1
                  }
                  y += 1
                }
              }
              u += 1
            }
            v += 1
          }
          c += 1
        }
        rstCount += 1
        mx += 1
      }
      my += 1
    }
    // crop (and nearest-upsample if component 0 is below full resolution)
    val out = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      val sy = y * compV(0) / vMax
      var x = 0
      while (x < w) {
        out(y * w + x) = plane0(sy * p0W + x * compH(0) / hMax)
        x += 1
      }
      y += 1
    }
    InternalRow(w, h, nComp, out)
  }
}

/** Codegen'd baseline JPEG encode: `jpeg_encode_gray(pixels, w, h, quant)`
  * -> BINARY grayscale JFIF (flat quant table; null for unusable input). */
case class JpegEncodeGray(
    data: Expression, w: Expression, h: Expression, quant: Expression)
    extends QuaternaryExpression {
  override def first: Expression = data
  override def second: Expression = w
  override def third: Expression = h
  override def fourth: Expression = quant
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (data.dataType == BinaryType && w.dataType == IntegerType &&
      h.dataType == IntegerType && quant.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jpeg_encode_gray expects (BINARY, INT, INT, INT), got " +
        s"(${data.dataType}, ${w.dataType}, ${h.dataType}, ${quant.dataType})")

  override def nullSafeEval(d: Any, wv: Any, hv: Any, qv: Any): Any =
    JpegCodecUtil.jpegEncodeGray(d.asInstanceOf[Array[Byte]],
      wv.asInstanceOf[Int], hv.asInstanceOf[Int], qv.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (d, wv, hv, qv) => s"""
      ${ev.value} = graft.functions.JpegCodecUtil.jpegEncodeGray($d, $wv, $hv, $qv);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression,
      newFourth: Expression): JpegEncodeGray =
    copy(data = newFirst, w = newSecond, h = newThird, quant = newFourth)
}

/** Codegen'd baseline JPEG decode: `jpeg_decode(binary)` -> struct(width,
  * height, channels, pixels) with component-0 (luma) pixels; null for
  * non-baseline or malformed streams. */
case class JpegDecodeGray(child: Expression) extends UnaryExpression {
  override def dataType: DataType = PngDecodeGray.schema // same shape
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jpeg_decode expects BINARY, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    JpegCodecUtil.jpegDecodeGray(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.JpegCodecUtil.jpegDecodeGray($c);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(newChild: Expression): JpegDecodeGray =
    copy(child = newChild)
}
