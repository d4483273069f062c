package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import scala.util.control.NonFatal

/** Multi-codec content (de)compression for crawl-scale text ingestion.
  *
  * The reference stores article text zlib-compressed and inflates at read
  * time (`text_content.content`, principal_schema.py:417-437;
  * util/__init__.py `unpack`) — [[InflateText]] is that exact seam. A real
  * 100 TB crawl, though, arrives in whatever each upstream chose: WARC
  * bodies gzip'd, data lakes zstd'd, queue payloads lz4- or snappy-framed.
  * This kernel makes the ingest row-format-agnostic: sniff the codec from
  * the payload's magic bytes and decompress inside whole-stage codegen, so
  * compressed bytes never leave the scan projection and a mixed-codec
  * corpus needs neither a pre-pass nor per-source plumbing.
  *
  * All five codecs come from jars Spark itself ships (java.util.zip,
  * zstd-jni, lz4-java, snappy-java) — no new dependencies. Hostile input
  * yields null, never a crash: every stream is read through a hard output
  * cap (decompression-bomb guard, [[CodecsUtil.MaxOutput]] default), and
  * any codec error is swallowed to null (the curation posture: a corrupt
  * row is dropped by a downstream filter, not a job failure).
  *
  * Codec names: "zlib", "gzip", "zstd", "lz4" (frame format), "snappy"
  * (framed format, self-identifying), "snappy_raw" (block format — no
  * magic, so never sniffed; explicit only), "deflate" (the HTTP
  * Content-Encoding semantics: zlib-wrapped per RFC 9110, raw-deflate
  * fallback for the classically-broken servers — explicit only; the
  * zlib-wrapped case is also reachable via sniff), and "auto" (sniff).
  */
/** Per-thread reusable zlib machinery (optimization guide §1.2 step 2:
  * per-task work). `new Inflater()`/`new Deflater()` run a JNI
  * inflateInit/deflateInit allocating a fresh native window per call —
  * measured as a dominant per-row cost on small payloads when every
  * codegen'd (de)compression allocated its own. One instance of each
  * flavor lives per task thread, `reset()` between uses (reset restores
  * the exact post-construction state, so semantics are unchanged);
  * `end()` is never called — the handful of retained native windows per
  * executor thread is bounded and tiny. Single-threaded use only (an
  * expression eval never suspends mid-row), which Spark's task model
  * guarantees. */
object ZlibPool {
  private val infWrapped =
    ThreadLocal.withInitial[java.util.zip.Inflater](
      () => new java.util.zip.Inflater())
  private val infRaw =
    ThreadLocal.withInitial[java.util.zip.Inflater](
      () => new java.util.zip.Inflater(true))
  private val defWrapped =
    ThreadLocal.withInitial[java.util.zip.Deflater](
      () => new java.util.zip.Deflater())
  private val defRaw =
    ThreadLocal.withInitial[java.util.zip.Deflater](
      () => new java.util.zip.Deflater(
        java.util.zip.Deflater.DEFAULT_COMPRESSION, true))
  private val crc32 =
    ThreadLocal.withInitial[java.util.zip.CRC32](
      () => new java.util.zip.CRC32())

  /** A reset inflater; `nowrap = true` for raw deflate streams. */
  def inflater(nowrap: Boolean): java.util.zip.Inflater = {
    val i = if (nowrap) infRaw.get() else infWrapped.get()
    i.reset(); i
  }

  /** A reset deflater; `nowrap = true` writes raw deflate (the gzip
    * member body — same parameters GZIPOutputStream uses, so compressed
    * bytes are identical). */
  def deflater(nowrap: Boolean): java.util.zip.Deflater = {
    val d = if (nowrap) defRaw.get() else defWrapped.get()
    d.reset(); d
  }

  def crc(): java.util.zip.CRC32 = { val c = crc32.get(); c.reset(); c }
}

object CodecsUtil {

  /** Decompressed-output cap: a compression bomb (a few KB declaring GBs)
    * is bounded to this many bytes before the decode aborts to null. 64 MB
    * is far beyond any document this engine curates while keeping the
    * worst per-task allocation executor-safe. */
  val MaxOutput: Int = 1 << 26

  /** Codec sniffed from the payload's leading bytes, or null. Raw snappy
    * and raw deflate have no signature and are never sniffed. */
  def sniff(b: Array[Byte]): String = {
    if (b == null || b.length < 2) return null
    val b0 = b(0) & 0xff
    val b1 = b(1) & 0xff
    if (b0 == 0x1f && b1 == 0x8b) return "gzip"
    if (b.length >= 4) {
      if (b0 == 0x28 && b1 == 0xb5 && (b(2) & 0xff) == 0x2f &&
        (b(3) & 0xff) == 0xfd) return "zstd"
      if (b0 == 0x04 && b1 == 0x22 && (b(2) & 0xff) == 0x4d &&
        (b(3) & 0xff) == 0x18) return "lz4"
    }
    // snappy framed: stream identifier chunk ff 06 00 00 "sNaPpY"
    if (b.length >= 10 && b0 == 0xff && b1 == 0x06 && b(2) == 0 && b(3) == 0 &&
      b(4) == 's' && b(5) == 'N' && b(6) == 'a' && b(7) == 'P' &&
      b(8) == 'p' && b(9) == 'Y') return "snappy"
    // zlib: CMF/FLG — deflate method (low nibble 8), window <= 32k
    // (high nibble <= 7), and the spec's mod-31 check word
    if ((b0 & 0x0f) == 8 && (b0 >> 4) <= 7 && ((b0 << 8) | b1) % 31 == 0)
      return "zlib"
    null
  }

  def sniffOrNull(b: Array[Byte]): UTF8String = {
    val c = sniff(b)
    if (c == null) null else UTF8String.fromString(c)
  }

  /** Copy `in` to a byte array, aborting to null past `maxOut` bytes. */
  private def drain(in: java.io.InputStream, maxOut: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(8192)
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) {
      if (out.size().toLong + n > maxOut) return null
      out.write(buf, 0, n)
      n = in.read(buf)
    }
    out.toByteArray
  }

  /** Decompress with the named codec ("auto" sniffs); null for unknown
    * codecs, corrupt streams, or output past `maxOut`. */
  def decompress(b: Array[Byte], codec: String, maxOut: Int): Array[Byte] = {
    if (b == null || codec == null) return null
    val c = if (codec == "auto") sniff(b) else codec
    if (c == null) return null
    try {
      c match {
        case "zlib" =>
          val inf = ZlibPool.inflater(nowrap = false)
          inf.setInput(b)
          val out = new java.io.ByteArrayOutputStream(math.min(
            maxOut.toLong, b.length.toLong * 4).toInt.max(64))
          val buf = new Array[Byte](8192)
          while (!inf.finished()) {
            val n = inf.inflate(buf)
            // 0 bytes while not finished = truncated stream (empty input
            // buffer) or an FDICT preset-dictionary request — this engine
            // never has the dictionary, and without the check a 7-byte
            // FDICT payload makes inflate() return 0 with
            // needsInput()==false forever (executor-thread wedge).
            // (finished+needsInput is the legal empty-payload case.)
            if (n == 0 && !inf.finished() &&
              (inf.needsInput() || inf.needsDictionary())) return null
            if (out.size().toLong + n > maxOut) return null
            out.write(buf, 0, n)
          }
          out.toByteArray
        case "gzip" => gunzip(b, maxOut)
        case "zstd" =>
          // one-shot JNI when the frame declares its content size (what
          // Zstd.compress writes) — skips the per-row native stream
          // context; anything else (unknown size, multi-frame, error)
          // falls back to the streaming path with identical results
          val oneShot: Array[Byte] =
            try {
              val sz = com.github.luben.zstd.Zstd.decompressedSize(b)
              if (sz > 0 && sz <= maxOut) {
                val dst = new Array[Byte](sz.toInt)
                val n = com.github.luben.zstd.Zstd.decompress(dst, b)
                if (n == sz) dst else null
              } else null
            } catch { case NonFatal(_) => null }
          if (oneShot != null) oneShot
          else {
            val in = new com.github.luben.zstd.ZstdInputStreamNoFinalizer(
              new java.io.ByteArrayInputStream(b))
            try drain(in, maxOut) finally in.close()
          }
        case "lz4" =>
          drain(new net.jpountz.lz4.LZ4FrameInputStream(
            new java.io.ByteArrayInputStream(b)), maxOut)
        case "snappy" =>
          drain(new org.xerial.snappy.SnappyFramedInputStream(
            new java.io.ByteArrayInputStream(b)), maxOut)
        case "snappy_raw" =>
          if (!org.xerial.snappy.Snappy.isValidCompressedBuffer(b)) null
          else {
            val len = org.xerial.snappy.Snappy.uncompressedLength(b)
            if (len > maxOut) null
            else org.xerial.snappy.Snappy.uncompress(b)
          }
        case "deflate" =>
          // the HTTP Content-Encoding mess: "deflate" means zlib-wrapped
          // per RFC 9110, but broken servers (classically IIS) send RAW
          // deflate; browsers try zlib and fall back, so this does too
          val z = decompress(b, "zlib", maxOut)
          if (z != null) z else inflateRaw(b, maxOut)
        case _ => null
      }
    } catch { case NonFatal(_) => null }
  }

  /** Raw (nowrap) deflate with the same truncation/FDICT/bomb guards as
    * the zlib branch. */
  private def inflateRaw(b: Array[Byte], maxOut: Int): Array[Byte] = {
    val inf = ZlibPool.inflater(nowrap = true)
    inf.setInput(b)
    val out = new java.io.ByteArrayOutputStream(math.min(
      maxOut.toLong, b.length.toLong * 4).toInt.max(64))
    val buf = new Array[Byte](8192)
    try {
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && !inf.finished() &&
          (inf.needsInput() || inf.needsDictionary())) return null
        if (out.size().toLong + n > maxOut) return null
        out.write(buf, 0, n)
      }
      out.toByteArray
    } catch { case NonFatal(_) => null }
  }

  /** End offset of the gzip member header starting at `off`, or -1 when
    * the bytes there are not a complete well-formed header (magic, CM=8,
    * optional FEXTRA/FNAME/FCOMMENT/FHCRC fields; FHCRC verified like
    * GZIPInputStream does). */
  private def gzipHeaderEnd(b: Array[Byte], off: Int): Int = {
    if (off + 10 > b.length) return -1
    if ((b(off) & 0xff) != 0x1f || (b(off + 1) & 0xff) != 0x8b ||
      (b(off + 2) & 0xff) != 8) return -1
    val flg = b(off + 3) & 0xff
    var p = off + 10
    if ((flg & 4) != 0) { // FEXTRA
      if (p + 2 > b.length) return -1
      p += 2 + ((b(p) & 0xff) | ((b(p + 1) & 0xff) << 8))
      if (p > b.length) return -1
    }
    if ((flg & 8) != 0) { // FNAME
      while (p < b.length && b(p) != 0) p += 1
      if (p >= b.length) return -1
      p += 1
    }
    if ((flg & 16) != 0) { // FCOMMENT
      while (p < b.length && b(p) != 0) p += 1
      if (p >= b.length) return -1
      p += 1
    }
    if ((flg & 2) != 0) { // FHCRC: CRC16 of the header bytes so far
      if (p + 2 > b.length) return -1
      val c = ZlibPool.crc()
      c.update(b, off, p - off)
      val want = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
      if ((c.getValue & 0xffff).toInt != want) return -1
      p += 2
    }
    if (p >= b.length) -1 else p
  }

  private def readUIntLE(b: Array[Byte], p: Int): Long =
    ((b(p) & 0xffL)) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)

  /** gzip decompression matching java.util.zip.GZIPInputStream semantics
    * — multi-member concatenation, per-member CRC32 + ISIZE verification
    * (mismatch/truncation anywhere fails the WHOLE payload to null), and
    * a malformed next-member header after a complete member treated as
    * trailing garbage (ignored) — but with the per-thread pooled raw
    * inflater instead of a fresh native stream per row. */
  private def gunzip(b: Array[Byte], maxOut: Int): Array[Byte] = {
    if (b == null) return null
    val out = new java.io.ByteArrayOutputStream(math.min(
      maxOut.toLong, b.length.toLong * 4).toInt.max(64))
    val buf = new Array[Byte](8192)
    var off = 0
    var first = true
    try {
      while (true) {
        val p = gzipHeaderEnd(b, off)
        if (p < 0) return if (first) null else out.toByteArray
        val inf = ZlibPool.inflater(nowrap = true)
        inf.setInput(b, p, b.length - p)
        val crc = new java.util.zip.CRC32()
        var memberLen = 0L
        while (!inf.finished()) {
          val n = inf.inflate(buf)
          if (n == 0 && !inf.finished() &&
            (inf.needsInput() || inf.needsDictionary())) return null
          if (out.size().toLong + n > maxOut) return null
          crc.update(buf, 0, n)
          memberLen += n
          out.write(buf, 0, n)
        }
        val trailer = p + inf.getBytesRead.toInt
        // truncated trailer = truncated stream (GZIPInputStream EOFs)
        if (trailer + 8 > b.length) return null
        if (readUIntLE(b, trailer) != crc.getValue ||
          readUIntLE(b, trailer + 4) != (memberLen & 0xffffffffL))
          return null
        off = trailer + 8
        first = false
        if (off >= b.length) return out.toByteArray
      }
      null // unreachable
    } catch { case NonFatal(_) => null }
  }

  def decompressText(b: Array[Byte], codec: UTF8String): UTF8String = {
    if (codec == null) return null
    val out = decompress(b, codec.toString, MaxOutput)
    if (out == null) null else UTF8String.fromBytes(out)
  }

  /** Compress with the named codec — the inverse fixture/sink-side op.
    * Null for unknown codecs or unusable input. */
  def compress(b: Array[Byte], codec: String): Array[Byte] = {
    if (b == null || codec == null) return null
    try {
      codec match {
        case "zlib" => graft.sources.Content.deflate(b)
        case "gzip" =>
          // hand-rolled GZIPOutputStream equivalent (same 10-byte header,
          // same default-level raw deflate, same CRC32+ISIZE trailer —
          // byte-identical output) over the pooled deflater: the stream
          // class allocates a fresh native deflater per row
          val bos = new java.io.ByteArrayOutputStream(b.length / 2 + 64)
          bos.write(0x1f); bos.write(0x8b); bos.write(8)
          var i = 0
          while (i < 7) { bos.write(0); i += 1 }
          val d = ZlibPool.deflater(nowrap = true)
          d.setInput(b); d.finish()
          val buf = new Array[Byte](8192)
          while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
          val crc = new java.util.zip.CRC32()
          crc.update(b)
          val t = crc.getValue
          bos.write((t & 0xff).toInt); bos.write(((t >> 8) & 0xff).toInt)
          bos.write(((t >> 16) & 0xff).toInt)
          bos.write(((t >> 24) & 0xff).toInt)
          bos.write(b.length & 0xff); bos.write((b.length >> 8) & 0xff)
          bos.write((b.length >> 16) & 0xff)
          bos.write((b.length >> 24) & 0xff)
          bos.toByteArray
        case "zstd" => com.github.luben.zstd.Zstd.compress(b, 3)
        case "lz4" =>
          val bos = new java.io.ByteArrayOutputStream(b.length / 2 + 64)
          // 64 KB blocks, not the class default 4 MB: the frame writer
          // allocates (and zeroes) TWO block-sized arrays per call, so the
          // default costs ~8 MB of allocation per row regardless of
          // payload size — the single largest per-row cost this kernel
          // had. Output bytes differ (block-size bit in the frame header)
          // but decompress to the same payload; nothing gates on the
          // compressed image.
          val out = new net.jpountz.lz4.LZ4FrameOutputStream(bos,
            net.jpountz.lz4.LZ4FrameOutputStream.BLOCKSIZE.SIZE_64KB)
          out.write(b); out.close()
          bos.toByteArray
        case "snappy" =>
          val bos = new java.io.ByteArrayOutputStream(b.length / 2 + 64)
          val out = new org.xerial.snappy.SnappyFramedOutputStream(bos)
          out.write(b); out.close()
          bos.toByteArray
        case "snappy_raw" => org.xerial.snappy.Snappy.compress(b)
        case _ => null
      }
    } catch { case NonFatal(_) => null }
  }

  def compressBytes(b: Array[Byte], codec: UTF8String): Array[Byte] =
    if (codec == null) null else compress(b, codec.toString)

  /** Member-count cap for the gzip-member walk (a WARC chunk holds
    * hundreds of records, not millions; a hostile payload of empty
    * members is bounded). */
  val MaxMembers: Int = 1 << 14

  /** Split a CONCATENATED-gzip payload (the WARC convention: every
    * record its own gzip member) into its DECOMPRESSED members. Parses
    * each member's header (FEXTRA/FNAME/FCOMMENT/FHCRC optional fields),
    * inflates raw-deflate to the member boundary via the inflater's
    * consumed-byte count, and steps over the CRC32+ISIZE trailer.
    * Tolerant: a corrupt member ends the walk and the good prefix
    * survives (null when the FIRST member fails). Total decompressed
    * output capped by [[MaxOutput]]. */
  def gzipMembers(b: Array[Byte]): org.apache.spark.sql.catalyst.util.ArrayData = {
    if (b == null) return null
    val members = scala.collection.mutable.ArrayBuffer.empty[Any]
    var off = 0
    var totalOut = 0L
    def result: org.apache.spark.sql.catalyst.util.ArrayData =
      if (members.isEmpty) null
      else new org.apache.spark.sql.catalyst.util.GenericArrayData(
        members.toArray)
    try {
      while (off + 18 <= b.length && members.size < MaxMembers) {
        if ((b(off) & 0xff) != 0x1f || (b(off + 1) & 0xff) != 0x8b ||
          (b(off + 2) & 0xff) != 8) return result
        val flg = b(off + 3) & 0xff
        var p = off + 10
        if ((flg & 4) != 0) { // FEXTRA: 2-byte LE length + payload
          if (p + 2 > b.length) return result
          p += 2 + ((b(p) & 0xff) | ((b(p + 1) & 0xff) << 8))
        }
        if ((flg & 8) != 0) { // FNAME: NUL-terminated
          while (p < b.length && b(p) != 0) p += 1
          p += 1
        }
        if ((flg & 16) != 0) { // FCOMMENT: NUL-terminated
          while (p < b.length && b(p) != 0) p += 1
          p += 1
        }
        if ((flg & 2) != 0) p += 2 // FHCRC
        if (p >= b.length) return result
        val inf = ZlibPool.inflater(nowrap = true)
        inf.setInput(b, p, b.length - p)
        val out = new java.io.ByteArrayOutputStream(8192)
        val buf = new Array[Byte](8192)
        while (!inf.finished()) {
          val n = inf.inflate(buf)
          // raw deflate has no FDICT flag, but guard the dictionary
          // request anyway — same wedge shape as the zlib loop above
          if (n == 0 && !inf.finished() &&
            (inf.needsInput() || inf.needsDictionary())) return result
          if (totalOut + out.size() + n > MaxOutput) return result
          out.write(buf, 0, n)
        }
        val consumed = inf.getBytesRead.toInt
        totalOut += out.size()
        members += out.toByteArray
        off = p + consumed + 8 // CRC32 + ISIZE trailer
      }
      result
    } catch { case NonFatal(_) => result }
  }

  // ---------------------------------------------------------------- WARC

  val warcSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("version",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("headers",
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.StringType,
          valueContainsNull = false), nullable = false),
      org.apache.spark.sql.types.StructField("body",
        BinaryType, nullable = false)))

  /** Header-count cap: real WARC records carry tens of headers; a
    * hostile 64 MB member of 4-byte "a:b" lines would otherwise build
    * ~16M map entries (a 20-30x allocation amplifier per row). Past the
    * cap, lines are still WALKED to find the body boundary but no
    * longer collected. */
  val MaxWarcHeaders: Int = 1024

  /** Parse one WARC record: "WARC/x.y" version line, "Name: value"
    * header lines to the first blank line, body = everything after.
    * CRLF and bare-LF line endings both accepted; headers keep their
    * written case (lookups use the exact WARC-* names). Repeated header
    * names (legal in WARC, e.g. WARC-Concurrent-To) keep the FIRST
    * occurrence — a MAP with duplicate keys has undefined downstream
    * behavior. Null unless the payload starts with "WARC/". */
  def warcRecord(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 6 || b(0) != 'W' || b(1) != 'A' ||
      b(2) != 'R' || b(3) != 'C' || b(4) != '/') return null
    // find the header/body split and keep header text small
    def lineEnd(from: Int): Int = {
      var i = from
      while (i < b.length && b(i) != '\n') i += 1
      i
    }
    var i = lineEnd(0)
    if (i >= b.length) return null
    val version = new String(b, 0, if (i > 0 && b(i - 1) == '\r') i - 1 else i,
      java.nio.charset.StandardCharsets.UTF_8)
    i += 1
    val keys = scala.collection.mutable.ArrayBuffer.empty[Any]
    val vals = scala.collection.mutable.ArrayBuffer.empty[Any]
    val seen = scala.collection.mutable.HashSet.empty[String]
    var bodyStart = b.length
    var done = false
    while (!done && i < b.length) {
      val e = lineEnd(i)
      val len = (if (e > i && b(e - 1) == '\r') e - 1 else e) - i
      if (len == 0) { bodyStart = math.min(e + 1, b.length); done = true }
      else {
        if (keys.size < MaxWarcHeaders) {
          val line = new String(b, i, len,
            java.nio.charset.StandardCharsets.UTF_8)
          val colon = line.indexOf(':')
          if (colon > 0) {
            val k = line.substring(0, colon).trim
            if (seen.add(k)) { // first occurrence wins
              keys += UTF8String.fromString(k)
              vals += UTF8String.fromString(line.substring(colon + 1).trim)
            }
          } // malformed header lines are skipped, not fatal
        }
        i = e + 1
      }
    }
    val body = java.util.Arrays.copyOfRange(b, bodyStart, b.length)
    InternalRow(UTF8String.fromString(version),
      org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
        keys.toArray, vals.toArray),
      body)
  }

  /** Case-insensitive first-match lookup in a header MAP. WARC headers
    * preserve the case each writer used (`WARC-Type:` vs `warc-type:`
    * are the same field per the spec's "field names are not case
    * sensitive"), so consumers must not key on one spelling —
    * `element_at(headers, 'Content-Type')` silently loses a record
    * written `content-type:`. ASCII-fold compare, first entry wins
    * (matching [[warcRecord]]'s first-occurrence-wins map build). */
  def headerGet(
      m: org.apache.spark.sql.catalyst.util.MapData,
      key: UTF8String): UTF8String = {
    if (m == null || key == null) return null
    val want = key.toString
    val keys = m.keyArray()
    var i = 0
    while (i < m.numElements()) {
      val k = keys.getUTF8String(i)
      if (k != null && k.toString.equalsIgnoreCase(want))
        return m.valueArray().getUTF8String(i)
      i += 1
    }
    null
  }

  // ---------------------------------------------------------------- HTTP

  val httpSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("version",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("status",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("reason",
        org.apache.spark.sql.types.StringType, nullable = true),
      org.apache.spark.sql.types.StructField("headers",
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.StringType,
          valueContainsNull = false), nullable = false),
      org.apache.spark.sql.types.StructField("body",
        BinaryType, nullable = false)))

  /** Parse an HTTP response message (a WARC response record's body):
    * "HTTP/x.y NNN reason" status line, header lines to the first blank
    * line (repeated names keep the FIRST occurrence — RFC 9110 treats
    * later duplicates of singleton fields as errors), body = the rest.
    * CRLF and bare-LF accepted. Null unless the payload starts with
    * "HTTP/" and carries a 3-digit status. The body is RAW: still
    * chunked if Transfer-Encoding said so ([[httpDechunk]]), still
    * compressed if Content-Encoding said so (decompress_bytes). */
  def httpResponse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 12 || b(0) != 'H' || b(1) != 'T' ||
      b(2) != 'T' || b(3) != 'P' || b(4) != '/') return null
    def lineEnd(from: Int): Int = {
      var i = from
      while (i < b.length && b(i) != '\n') i += 1
      i
    }
    var i = lineEnd(0)
    val statusLine = new String(b, 0,
      if (i > 0 && b(i - 1) == '\r') i - 1 else i,
      java.nio.charset.StandardCharsets.UTF_8)
    val sp1 = statusLine.indexOf(' ')
    if (sp1 < 0 || sp1 + 4 > statusLine.length) return null
    val d0 = statusLine.charAt(sp1 + 1)
    val d1 = statusLine.charAt(sp1 + 2)
    val d2 = statusLine.charAt(sp1 + 3)
    if (!d0.isDigit || !d1.isDigit || !d2.isDigit) return null
    if (sp1 + 4 < statusLine.length && statusLine.charAt(sp1 + 4) != ' ')
      return null
    val status = (d0 - '0') * 100 + (d1 - '0') * 10 + (d2 - '0')
    val reason =
      if (sp1 + 5 <= statusLine.length) statusLine.substring(
        math.min(sp1 + 5, statusLine.length)).trim
      else ""
    i += 1
    val keys = scala.collection.mutable.ArrayBuffer.empty[Any]
    val vals = scala.collection.mutable.ArrayBuffer.empty[Any]
    val seen = scala.collection.mutable.HashSet.empty[String]
    var bodyStart = b.length
    var done = false
    while (!done && i < b.length) {
      val e = lineEnd(i)
      val len = (if (e > i && b(e - 1) == '\r') e - 1 else e) - i
      if (len == 0) { bodyStart = math.min(e + 1, b.length); done = true }
      else {
        if (keys.size < MaxWarcHeaders) {
          val line = new String(b, i, len,
            java.nio.charset.StandardCharsets.UTF_8)
          val colon = line.indexOf(':')
          if (colon > 0) {
            // HTTP header lookup is case-insensitive; normalize the key
            // to lowercase so map consumers need one spelling
            val k = line.substring(0, colon).trim
              .toLowerCase(java.util.Locale.ROOT)
            if (seen.add(k)) {
              keys += UTF8String.fromString(k)
              vals += UTF8String.fromString(line.substring(colon + 1).trim)
            }
          }
        }
        i = e + 1
      }
    }
    InternalRow(
      UTF8String.fromString(statusLine.substring(0, sp1)),
      status,
      if (reason.isEmpty) null else UTF8String.fromString(reason),
      org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
        keys.toArray, vals.toArray),
      java.util.Arrays.copyOfRange(b, bodyStart, b.length))
  }

  /** Chunk-count cap for [[httpDechunk]] (a hostile stream of zero-byte
    * chunks must not spin; real responses carry a few thousand at most). */
  val MaxChunks: Int = 1 << 16

  /** Decode a Transfer-Encoding: chunked body: hex-size line, that many
    * raw bytes, CRLF, repeat; a 0-size chunk ends the stream (trailers
    * ignored). Chunk extensions (";ext=val" after the size) accepted.
    * Null on malformed sizes, truncation mid-chunk, or output past
    * [[MaxOutput]] — hostile input degrades, never throws or spins. */
  def httpDechunk(b: Array[Byte]): Array[Byte] = {
    if (b == null) return null
    val out = new java.io.ByteArrayOutputStream(math.min(b.length, 1 << 16))
    var i = 0
    var chunks = 0
    while (chunks < MaxChunks) {
      // parse hex size up to ';' or line end
      var size = 0L
      var p = i
      var any = false
      while (p < b.length && {
        val c = b(p) & 0xff
        val v =
          if (c >= '0' && c <= '9') c - '0'
          else if (c >= 'a' && c <= 'f') c - 'a' + 10
          else if (c >= 'A' && c <= 'F') c - 'A' + 10
          else -1
        if (v >= 0) {
          size = size * 16 + v
          if (size > MaxOutput) return null
          any = true; true
        } else false
      }) p += 1
      if (!any) return null
      // skip extensions to end of line
      while (p < b.length && b(p) != '\n') p += 1
      if (p >= b.length) return if (size == 0) out.toByteArray else null
      p += 1
      if (size == 0) return out.toByteArray // trailers ignored
      if (p + size > b.length) return null // truncated mid-chunk
      if (out.size() + size > MaxOutput) return null
      out.write(b, p, size.toInt)
      p += size.toInt
      // consume the chunk-terminating CRLF / LF
      if (p < b.length && b(p) == '\r') p += 1
      if (p < b.length && b(p) == '\n') p += 1
      i = p
      chunks += 1
    }
    null // chunk-count cap: treat as hostile
  }
}

/** Codegen'd multi-codec decompression to UTF-8 text:
  * `decompress_text(bin, codec)` — codec in {zlib, gzip, zstd, lz4,
  * snappy, snappy_raw, auto}; null on unknown codec, corrupt stream, or
  * decompression-bomb cap. */
case class DecompressText(data: Expression, codec: Expression)
    extends BinaryExpression {
  override def left: Expression = data
  override def right: Expression = codec
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (data.dataType == BinaryType && codec.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"decompress_text expects (BINARY, STRING), got " +
        s"(${data.dataType}, ${codec.dataType})")

  override def nullSafeEval(d: Any, c: Any): Any =
    CodecsUtil.decompressText(d.asInstanceOf[Array[Byte]],
      c.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (d, c) => s"""
      ${ev.value} = graft.functions.CodecsUtil.decompressText($d, $c);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DecompressText =
    copy(data = newLeft, codec = newRight)
}

/** Codegen'd compression: `compress_bytes(bin, codec)` -> BINARY (the
  * sink-side inverse of [[DecompressText]] and the fixture builder for
  * its gates). */
case class CompressBytes(data: Expression, codec: Expression)
    extends BinaryExpression {
  override def left: Expression = data
  override def right: Expression = codec
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (data.dataType == BinaryType && codec.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"compress_bytes expects (BINARY, STRING), got " +
        s"(${data.dataType}, ${codec.dataType})")

  override def nullSafeEval(d: Any, c: Any): Any =
    CodecsUtil.compressBytes(d.asInstanceOf[Array[Byte]],
      c.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (d, c) => s"""
      ${ev.value} = graft.functions.CodecsUtil.compressBytes($d, $c);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CompressBytes =
    copy(data = newLeft, codec = newRight)
}

/** Codegen'd codec sniff: `codec_sniff(bin)` -> STRING in {zlib, gzip,
  * zstd, lz4, snappy} or null (raw snappy/deflate carry no signature). */
case class CodecSniff(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"codec_sniff expects BINARY, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    CodecsUtil.sniffOrNull(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.CodecsUtil.sniffOrNull($c);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(newChild: Expression): CodecSniff =
    copy(child = newChild)
}

/** Codegen'd concatenated-gzip split: `gzip_members(bin)` ->
  * ARRAY<BINARY> of DECOMPRESSED members (the WARC convention: one
  * record per member). Tolerant of a corrupt tail; null when the first
  * member fails. */
case class GzipMembers(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(BinaryType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gzip_members expects BINARY, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    CodecsUtil.gzipMembers(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.CodecsUtil.gzipMembers($c);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(newChild: Expression): GzipMembers =
    copy(child = newChild)
}

/** Codegen'd WARC record parse: `warc_record(bin)` -> struct(version,
  * headers MAP<STRING,STRING>, body BINARY); null unless the payload
  * starts with "WARC/". */
case class WarcRecord(child: Expression) extends UnaryExpression {
  override def dataType: DataType = CodecsUtil.warcSchema
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"warc_record expects BINARY, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    CodecsUtil.warcRecord(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.CodecsUtil.warcRecord($c);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(newChild: Expression): WarcRecord =
    copy(child = newChild)
}

/** Codegen'd case-insensitive header lookup:
  * `header_get(map<string,string>, name)` -> STRING value of the first
  * entry whose key ASCII-equals `name` ignoring case, else null. The
  * read-side twin of [[WarcRecord]]'s case-preserving header map. */
case class HeaderGet(map: Expression, key: Expression)
    extends BinaryExpression {
  override def left: Expression = map
  override def right: Expression = key
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = map.dataType match {
    case org.apache.spark.sql.types.MapType(StringType, StringType, _)
      if key.dataType == StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"header_get expects (MAP<STRING,STRING>, STRING), got " +
        s"(${map.dataType}, ${key.dataType})")
  }

  override def nullSafeEval(m: Any, k: Any): Any =
    CodecsUtil.headerGet(
      m.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData],
      k.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (m, k) => s"""
      ${ev.value} = graft.functions.CodecsUtil.headerGet($m, $k);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HeaderGet =
    copy(map = newLeft, key = newRight)
}

/** Codegen'd binary decompression: `decompress_bytes(bin, codec)` ->
  * BINARY — the byte-preserving twin of [[DecompressText]] for payloads
  * that are NOT UTF-8 yet (an HTTP body whose charset decode comes
  * AFTER its Content-Encoding decompression). */
case class DecompressBytes(data: Expression, codec: Expression)
    extends BinaryExpression {
  override def left: Expression = data
  override def right: Expression = codec
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (data.dataType == BinaryType && codec.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"decompress_bytes expects (BINARY, STRING), got " +
        s"(${data.dataType}, ${codec.dataType})")

  override def nullSafeEval(d: Any, c: Any): Any =
    CodecsUtil.decompress(d.asInstanceOf[Array[Byte]],
      c.asInstanceOf[UTF8String].toString, CodecsUtil.MaxOutput)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (d, c) => s"""
      ${ev.value} = graft.functions.CodecsUtil.decompress($d, $c.toString(),
        graft.functions.CodecsUtil.MaxOutput());
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DecompressBytes =
    copy(data = newLeft, codec = newRight)
}

/** Codegen'd HTTP response parse: `http_response(bin)` ->
  * struct(version, status, reason, headers MAP (lowercased keys,
  * first occurrence wins), body BINARY — still chunked/compressed as
  * transferred); null unless the payload starts with an HTTP status
  * line. */
case class HttpResponse(child: Expression) extends UnaryExpression {
  override def dataType: DataType = CodecsUtil.httpSchema
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"http_response expects BINARY, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    CodecsUtil.httpResponse(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.CodecsUtil.httpResponse($c);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(newChild: Expression): HttpResponse =
    copy(child = newChild)
}

/** Codegen'd chunked-transfer decode: `http_dechunk(bin)` -> BINARY;
  * null on malformed/truncated/bomb input. */
case class HttpDechunk(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"http_dechunk expects BINARY, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    CodecsUtil.httpDechunk(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.CodecsUtil.httpDechunk($c);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(newChild: Expression): HttpDechunk =
    copy(child = newChild)
}

/** Column wrappers for the content codecs. */
object codecs {
  import org.apache.spark.sql.GraftBridge

  def decompress_text(data: Column, codec: Column): Column =
    GraftBridge.column(DecompressText(GraftBridge.expression(data),
      GraftBridge.expression(codec)))

  def decompress_bytes(data: Column, codec: Column): Column =
    GraftBridge.column(DecompressBytes(GraftBridge.expression(data),
      GraftBridge.expression(codec)))

  def http_response(data: Column): Column =
    GraftBridge.column(HttpResponse(GraftBridge.expression(data)))

  def http_dechunk(data: Column): Column =
    GraftBridge.column(HttpDechunk(GraftBridge.expression(data)))

  def compress_bytes(data: Column, codec: Column): Column =
    GraftBridge.column(CompressBytes(GraftBridge.expression(data),
      GraftBridge.expression(codec)))

  def codec_sniff(data: Column): Column =
    GraftBridge.column(CodecSniff(GraftBridge.expression(data)))

  def gzip_members(data: Column): Column =
    GraftBridge.column(GzipMembers(GraftBridge.expression(data)))

  def warc_record(data: Column): Column =
    GraftBridge.column(WarcRecord(GraftBridge.expression(data)))

  def header_get(map: Column, key: Column): Column =
    GraftBridge.column(HeaderGet(GraftBridge.expression(map),
      GraftBridge.expression(key)))
}
