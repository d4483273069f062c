package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Video/audio CONTAINER metadata from header bytes — the formats a web
  * crawl actually contains where pixel/sample decode is out of scope:
  * ISO base-media (MP4/MOV, ISO 14496-12: length-prefixed box tree,
  * `moov/mvhd` movie header, per-`trak` `tkhd`/`hdlr`/`stsd`) and AVI
  * (RIFF `hdrl` LIST with the `avih` main header and `strl`/`strh`
  * stream headers). Pure byte math in whole-stage codegen, same family
  * as [[ImageBytesUtil.imageMeta]]: a 100 TB media-metadata pass reads a
  * few hundred header bytes per row and never touches a codec.
  *
  * Hostile input yields null or a partial row, never a crash or an
  * unbounded loop: every box/chunk advance is monotone (a non-advancing
  * size aborts the walk), declared extents are clamped to the buffer,
  * and fourcc fields are reported only when printable ASCII.
  */
object ContainerBytesUtil {

  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("brand", StringType, nullable = true),
    StructField("duration_ms", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_tracks", IntegerType, nullable = false),
    StructField("video_codec", StringType, nullable = true),
    StructField("audio_codec", StringType, nullable = true)))

  private def be4(d: Array[Byte], i: Int): Long =
    ((d(i) & 0xffL) << 24) | ((d(i + 1) & 0xffL) << 16) |
      ((d(i + 2) & 0xffL) << 8) | (d(i + 3) & 0xffL)

  private def be8(d: Array[Byte], i: Int): Long =
    (be4(d, i) << 32) | be4(d, i + 4)

  private def le4(d: Array[Byte], i: Int): Long =
    (d(i) & 0xffL) | ((d(i + 1) & 0xffL) << 8) |
      ((d(i + 2) & 0xffL) << 16) | ((d(i + 3) & 0xffL) << 24)

  private def tag(d: Array[Byte], i: Int, s: String): Boolean =
    i + 4 <= d.length &&
      d(i) == s.charAt(0) && d(i + 1) == s.charAt(1) &&
      d(i + 2) == s.charAt(2) && d(i + 3) == s.charAt(3)

  /** The 4 bytes at `i` as a string when all are printable ASCII (the
    * only fourcc values worth reporting — AVI audio handlers are often
    * numeric codes, and corrupt headers are arbitrary bytes). */
  private def fourccOrNull(d: Array[Byte], i: Int): String = {
    if (i + 4 > d.length) return null
    var k = 0
    while (k < 4) {
      val c = d(i + k) & 0xff
      if (c < 0x20 || c > 0x7e) return null
      k += 1
    }
    val s = new String(d, i, 4, "US-ASCII").trim
    if (s.isEmpty) null else s
  }

  def containerMeta(data: Array[Byte]): InternalRow = {
    if (data.length >= 16 && tag(data, 4, "ftyp")) return mp4Meta(data)
    if (data.length >= 12 && tag(data, 0, "RIFF") && tag(data, 8, "AVI "))
      return aviMeta(data)
    null
  }

  // ---------------------------------------------------------------- MP4

  /** Exclusive end of the ISO-BMFF box starting at `i`, clamped to
    * `end`; -1 when the header is corrupt or would not advance. Size 0
    * means "to end of enclosing scope", size 1 carries a 64-bit
    * largesize. */
  private def boxEnd(d: Array[Byte], i: Int, end: Int): Int = {
    if (i + 8 > end) return -1
    val sz = be4(d, i)
    val e =
      if (sz == 0) end.toLong
      else if (sz == 1) {
        if (i + 16 > end) return -1
        val l = be8(d, i + 8)
        if (l < 16) return -1
        i + l
      } else if (sz < 8) return -1
      else i + sz
    math.min(e, end.toLong).toInt
  }

  /** Content offset of the box (past the 8- or 16-byte header). */
  private def boxContent(d: Array[Byte], i: Int): Int =
    if (be4(d, i) == 1) i + 16 else i + 8

  /** Offset of the first `typ` box in [from, end), or -1. */
  private def findBox(d: Array[Byte], from: Int, end: Int,
      typ: String): Int = {
    var p = from
    while (p + 8 <= end) {
      val e = boxEnd(d, p, end)
      if (e <= p) return -1
      if (tag(d, p + 4, typ)) return p
      p = e
    }
    -1
  }

  private def mp4Meta(d: Array[Byte]): InternalRow = {
    val brand = fourccOrNull(d, 8)
    var durationMs = -1L
    var width = -1
    var height = -1
    var nTracks = 0
    var videoCodec: String = null
    var audioCodec: String = null

    val moov = findBox(d, 0, d.length, "moov")
    if (moov >= 0) {
      val moovEnd = boxEnd(d, moov, d.length)
      val c0 = boxContent(d, moov)
      val mvhd = findBox(d, c0, moovEnd, "mvhd")
      if (mvhd >= 0) {
        val c = boxContent(d, mvhd)
        if (c < moovEnd) {
          val v = d(c) & 0xff
          // FullBox: version(1) flags(3), then v0 times are u32, v1 u64
          val (tsOff, durOff, durLen) =
            if (v == 1) (c + 20, c + 24, 8) else (c + 12, c + 16, 4)
          if (durOff + durLen <= moovEnd) {
            val timescale = be4(d, tsOff)
            val dur = if (durLen == 8) be8(d, durOff) else be4(d, durOff)
            if (timescale > 0 && dur >= 0)
              durationMs = dur * 1000L / timescale
          }
        }
      }
      // per-track: tkhd (dimensions, 16.16 fixed), mdia/hdlr (handler),
      // mdia/minf/stbl/stsd (first sample-entry fourcc = codec)
      var p = c0
      while (p >= 0 && p + 8 <= moovEnd) {
        val e = boxEnd(d, p, moovEnd)
        if (e <= p) p = -1
        else {
          if (tag(d, p + 4, "trak")) {
            nTracks += 1
            val tc = boxContent(d, p)
            var w = -1
            var h = -1
            val tkhd = findBox(d, tc, e, "tkhd")
            if (tkhd >= 0) {
              val c = boxContent(d, tkhd)
              val v = if (c < e) d(c) & 0xff else 0
              // v0 content: fullbox(4) + times/id/reserved/duration(20)
              // + reserved(8) + layer..(8) + matrix(36) -> width at +76;
              // v1's 64-bit times push it to +88
              val wOff = if (v == 1) c + 88 else c + 76
              if (wOff + 8 <= e) {
                w = (be4(d, wOff) >> 16).toInt
                h = (be4(d, wOff + 4) >> 16).toInt
              }
            }
            var handler: String = null
            var codec: String = null
            val mdia = findBox(d, tc, e, "mdia")
            if (mdia >= 0) {
              val me = boxEnd(d, mdia, e)
              val mc = boxContent(d, mdia)
              val hdlr = findBox(d, mc, me, "hdlr")
              if (hdlr >= 0)
                handler = fourccOrNull(d, boxContent(d, hdlr) + 8)
              val minf = findBox(d, mc, me, "minf")
              if (minf >= 0) {
                val fe = boxEnd(d, minf, me)
                val stbl = findBox(d, boxContent(d, minf), fe, "stbl")
                if (stbl >= 0) {
                  val se = boxEnd(d, stbl, fe)
                  val stsd = findBox(d, boxContent(d, stbl), se, "stsd")
                  if (stsd >= 0) {
                    // stsd content: fullbox(4) + entry_count(4), then the
                    // first sample entry's own (size, fourcc) header
                    val sc = boxContent(d, stsd)
                    if (sc + 16 <= se && be4(d, sc + 4) >= 1)
                      codec = fourccOrNull(d, sc + 12)
                  }
                }
              }
            }
            if (handler == "vide" && videoCodec == null) {
              videoCodec = codec; width = w; height = h
            } else if (handler == "soun" && audioCodec == null)
              audioCodec = codec
          }
          p = e
        }
      }
    }
    InternalRow(UTF8String.fromString("mp4"),
      if (brand == null) null else UTF8String.fromString(brand),
      durationMs, width, height, nTracks,
      if (videoCodec == null) null else UTF8String.fromString(videoCodec),
      if (audioCodec == null) null else UTF8String.fromString(audioCodec))
  }

  // ---------------------------------------------------------------- AVI

  /** Offset of the first chunk with fourcc `typ` (for LIST chunks,
    * matching on the list TYPE at +8 instead) in [from, end), or -1.
    * RIFF chunks are word-aligned: odd sizes carry a pad byte. */
  private def findChunk(d: Array[Byte], from: Int, end: Int, typ: String,
      listType: Boolean): Int = {
    var p = from
    while (p + 8 <= end) {
      val sz = le4(d, p + 4)
      val hit =
        if (listType) tag(d, p, "LIST") && tag(d, p + 8, typ)
        else tag(d, p, typ)
      if (hit) return p
      val next = p.toLong + 8L + sz + (sz & 1L)
      if (next <= p) return -1
      p = if (next > end) end else next.toInt
    }
    -1
  }

  private def aviMeta(d: Array[Byte]): InternalRow = {
    var durationMs = -1L
    var width = -1
    var height = -1
    var nTracks = 0
    var videoCodec: String = null
    var audioCodec: String = null

    val hdrl = findChunk(d, 12, d.length, "hdrl", listType = true)
    if (hdrl >= 0) {
      val he = math.min(
        hdrl.toLong + 8L + le4(d, hdrl + 4), d.length.toLong).toInt
      val avih = findChunk(d, hdrl + 12, he, "avih", listType = false)
      if (avih >= 0 && avih + 48 <= he) {
        val c = avih + 8
        val usPerFrame = le4(d, c)
        val totalFrames = le4(d, c + 16)
        nTracks = le4(d, c + 24).toInt
        width = le4(d, c + 32).toInt
        height = le4(d, c + 36).toInt
        if (usPerFrame > 0 && totalFrames >= 0)
          durationMs = usPerFrame * totalFrames / 1000L
      }
      // stream headers: each strl LIST's strh carries (fccType,
      // fccHandler); the handler is the codec fourcc when printable
      var p = hdrl + 12
      while (p >= 0 && p + 8 <= he) {
        val strl = findChunk(d, p, he, "strl", listType = true)
        if (strl < 0) p = -1
        else {
          val se = math.min(
            strl.toLong + 8L + le4(d, strl + 4), he.toLong).toInt
          val strh = findChunk(d, strl + 12, se, "strh", listType = false)
          if (strh >= 0 && strh + 16 <= se) {
            val fccType = fourccOrNull(d, strh + 8)
            val handler = fourccOrNull(d, strh + 12)
            if (fccType == "vids" && videoCodec == null) videoCodec = handler
            else if (fccType == "auds" && audioCodec == null)
              audioCodec = handler
          }
          p = se
        }
      }
    }
    InternalRow(UTF8String.fromString("avi"), null,
      durationMs, width, height, nTracks,
      if (videoCodec == null) null else UTF8String.fromString(videoCodec),
      if (audioCodec == null) null else UTF8String.fromString(audioCodec))
  }
}

/** Codegen'd container-metadata parse: `container_meta(binary)` ->
  * struct(format, brand, duration_ms, width, height, n_tracks,
  * video_codec, audio_codec), null when neither an ISO-BMFF nor a RIFF
  * AVI signature is present. */
case class ContainerMeta(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ContainerBytesUtil.schema
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"container_meta expects BINARY, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    ContainerBytesUtil.containerMeta(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.ContainerBytesUtil.containerMeta($c);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(newChild: Expression): ContainerMeta =
    copy(child = newChild)
}
