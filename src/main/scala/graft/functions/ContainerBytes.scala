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

  // ------------------------------------------------------------- tracks

  val trackSchema: StructType = StructType(Seq(
    StructField("track_id", IntegerType, nullable = false),
    StructField("handler", StringType, nullable = true),
    StructField("codec", StringType, nullable = true),
    StructField("duration_ms", LongType, nullable = false),
    StructField("timescale", LongType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  /** Per-track metadata: MP4 `trak` walk (tkhd id+dims, mdhd timescale +
    * duration in the TRACK's own timescale — the movie-header duration
    * the flat [[containerMeta]] reports is in movie ticks — hdlr routing,
    * stsd codec, stts sample-count sum) or AVI `strl`/`strh` streams
    * (fccType/handler, dwScale/dwRate/dwLength: duration = length *
    * scale / rate, n_samples = length). Null for unrecognized payloads;
    * unparseable fields are -1/null (partial rows beat dropped rows in a
    * crawl metadata pass). */
  def containerTracks(data: Array[Byte]): org.apache.spark.sql.catalyst.util.ArrayData = {
    val rows: Seq[InternalRow] =
      if (data.length >= 16 && tag(data, 4, "ftyp")) mp4Tracks(data)
      else if (data.length >= 12 && tag(data, 0, "RIFF") &&
        tag(data, 8, "AVI ")) aviTracks(data)
      else null
    if (rows == null) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(
      rows.toArray[Any])
  }

  private def utf8OrNull(s: String): UTF8String =
    if (s == null) null else UTF8String.fromString(s)

  private def mp4Tracks(d: Array[Byte]): Seq[InternalRow] = {
    val moov = findBox(d, 0, d.length, "moov")
    if (moov < 0) return Seq.empty
    val moovEnd = boxEnd(d, moov, d.length)
    val rows = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var p = boxContent(d, moov)
    while (p >= 0 && p + 8 <= moovEnd) {
      val e = boxEnd(d, p, moovEnd)
      if (e <= p) p = -1
      else {
        if (tag(d, p + 4, "trak")) {
          val tc = boxContent(d, p)
          var trackId = -1
          var w = -1
          var h = -1
          val tkhd = findBox(d, tc, e, "tkhd")
          if (tkhd >= 0) {
            val c = boxContent(d, tkhd)
            val v = if (c < e) d(c) & 0xff else 0
            // v0: fullbox(4) ctime(4) mtime(4) id(4); v1 has 64-bit times
            val idOff = if (v == 1) c + 20 else c + 12
            if (idOff + 4 <= e) trackId = be4(d, idOff).toInt
            val wOff = if (v == 1) c + 88 else c + 76
            if (wOff + 8 <= e) {
              w = (be4(d, wOff) >> 16).toInt
              h = (be4(d, wOff + 4) >> 16).toInt
            }
          }
          var handler: String = null
          var codec: String = null
          var timescale = -1L
          var durationMs = -1L
          var nSamples = -1L
          val mdia = findBox(d, tc, e, "mdia")
          if (mdia >= 0) {
            val me = boxEnd(d, mdia, e)
            val mc = boxContent(d, mdia)
            val mdhd = findBox(d, mc, me, "mdhd")
            if (mdhd >= 0) {
              val c = boxContent(d, mdhd)
              val v = if (c < me) d(c) & 0xff else 0
              // v0: fullbox(4) ctime(4) mtime(4) timescale(4) duration(4)
              // v1: 64-bit times push timescale to +20, duration u64
              val tsOff = if (v == 1) c + 20 else c + 12
              val durLen = if (v == 1) 8 else 4
              if (tsOff + 4 + durLen <= me) {
                val ts = be4(d, tsOff)
                val dur =
                  if (durLen == 8) be8(d, tsOff + 4) else be4(d, tsOff + 4)
                if (ts > 0 && dur >= 0) {
                  timescale = ts
                  durationMs = dur * 1000L / ts
                }
              }
            }
            val hdlr = findBox(d, mc, me, "hdlr")
            if (hdlr >= 0)
              handler = fourccOrNull(d, boxContent(d, hdlr) + 8)
            val minf = findBox(d, mc, me, "minf")
            if (minf >= 0) {
              val fe = boxEnd(d, minf, me)
              val stbl = findBox(d, boxContent(d, minf), fe, "stbl")
              if (stbl >= 0) {
                val se = boxEnd(d, stbl, fe)
                val sc0 = boxContent(d, stbl)
                val stsd = findBox(d, sc0, se, "stsd")
                if (stsd >= 0) {
                  val sc = boxContent(d, stsd)
                  if (sc + 16 <= se && be4(d, sc + 4) >= 1)
                    codec = fourccOrNull(d, sc + 12)
                }
                val stts = findBox(d, sc0, se, "stts")
                if (stts >= 0) {
                  val ste = boxEnd(d, stts, se)
                  val c = boxContent(d, stts)
                  if (c + 8 <= ste) {
                    val nEntries = be4(d, c + 4)
                    // clamp the walk to entries fully inside the box
                    val avail = (ste - (c + 8)) / 8
                    val n = math.min(nEntries, avail.toLong)
                    var sum = 0L
                    var k = 0L
                    var off = c + 8
                    while (k < n) {
                      sum += be4(d, off)
                      off += 8
                      k += 1
                    }
                    if (n == nEntries) nSamples = sum
                  }
                }
              }
            }
          }
          rows += InternalRow(trackId, utf8OrNull(handler),
            utf8OrNull(codec), durationMs, timescale, nSamples, w, h)
        }
        p = e
      }
    }
    rows.toSeq
  }

  private def aviTracks(d: Array[Byte]): Seq[InternalRow] = {
    val hdrl = findChunk(d, 12, d.length, "hdrl", listType = true)
    if (hdrl < 0) return Seq.empty
    val he = math.min(
      hdrl.toLong + 8L + le4(d, hdrl + 4), d.length.toLong).toInt
    val rows = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var p = hdrl + 12
    var trackIdx = 0
    while (p >= 0 && p + 8 <= he) {
      val strl = findChunk(d, p, he, "strl", listType = true)
      if (strl < 0) p = -1
      else {
        val se = math.min(
          strl.toLong + 8L + le4(d, strl + 4), he.toLong).toInt
        val strh = findChunk(d, strl + 12, se, "strh", listType = false)
        if (strh >= 0 && strh + 44 <= se) {
          val c = strh + 8
          trackIdx += 1
          val fccType = fourccOrNull(d, c)
          val handler =
            if (fccType == "vids") "vide"
            else if (fccType == "auds") "soun" else fccType
          val codec = fourccOrNull(d, c + 4)
          // strh: fccType(4) fccHandler(4) flags(4) prio(2) lang(2)
          // initialFrames(4) scale(4) rate(4) start(4) length(4)
          val scale = le4(d, c + 20)
          val rate = le4(d, c + 24)
          val length = le4(d, c + 32)
          val durationMs =
            if (rate > 0 && scale > 0) length * scale * 1000L / rate else -1L
          val timescale =
            if (scale > 0 && rate % scale == 0) rate / scale else -1L
          rows += InternalRow(trackIdx, utf8OrNull(handler),
            utf8OrNull(codec), durationMs, timescale, length, -1, -1)
        }
        p = se
      }
    }
    rows.toSeq
  }

  /** Fixture builder: a standards-layout MP4 whose per-track boxes carry
    * the FULL metadata [[containerTracks]] reads — per-trak mdhd
    * (timescale + duration in track ticks), hdlr, stsd codec, and a
    * TWO-entry stts whose sample counts must be summed. Every field
    * derives from `seed` so a gate's oracle stays closed-form:
    * movie timescale [250,500,1000][seed%3], movie ticks seed%86400;
    * video track 1: timescale [200,500,1000][seed%3] (divisors of 1000),
    * ticks seed%7200, samples seed%1000+1 split (n/2, n-n/2), dims
    * (seed%1904+16, seed%1064+16), codec [avc1,hev1,av01][seed%3];
    * audio track 2 when `withAudio`: timescale 8000, ticks (seed%3600)*8,
    * samples seed%500+1, codec mp4a. */
  def synthMp4(seed: Long, withAudio: Boolean): Array[Byte] = {
    val s = if (seed < 0) -seed else seed
    val mts = Array(250, 500, 1000)((s % 3).toInt)
    val mDur = (s % 86400).toInt
    val vts = Array(200, 500, 1000)((s % 3).toInt)
    val vDur = (s % 7200).toInt
    val vSamples = (s % 1000 + 1).toInt
    val w = (s % 1904 + 16).toInt
    val h = (s % 1064 + 16).toInt
    val vCodecs = Array("avc1", "hev1", "av01")
    val vCodec = vCodecs((s % 3).toInt)
    val aSamples = (s % 500 + 1).toInt

    val bos = new java.io.ByteArrayOutputStream(1024)
    def b4(v: Long): Unit = {
      bos.write(((v >> 24) & 0xff).toInt); bos.write(((v >> 16) & 0xff).toInt)
      bos.write(((v >> 8) & 0xff).toInt); bos.write((v & 0xff).toInt)
    }
    def ascii(t: String): Unit =
      bos.write(t.getBytes("US-ASCII"), 0, t.length)
    def box(typ: String)(body: => Unit): Unit = {
      val sizeAt = bos.size()
      b4(0); ascii(typ)
      body
      val all = bos.toByteArray // small fixtures: re-patching is fine
      val sz = all.length - sizeAt
      all(sizeAt) = ((sz >> 24) & 0xff).toByte
      all(sizeAt + 1) = ((sz >> 16) & 0xff).toByte
      all(sizeAt + 2) = ((sz >> 8) & 0xff).toByte
      all(sizeAt + 3) = (sz & 0xff).toByte
      bos.reset(); bos.write(all, 0, all.length)
    }
    def trak(id: Int, handler: String, codec: String, ts: Int, dur: Int,
        samples: Array[Int], ww: Int, hh: Int): Unit = box("trak") {
      box("tkhd") {
        b4(0) // v0 fullbox
        b4(0); b4(0) // ctime mtime
        b4(id); b4(0) // track id, reserved
        b4(mDur) // duration in MOVIE ticks
        b4(0); b4(0) // reserved
        b4(0); b4(0) // layer/alt-group, volume/reserved
        var k = 0 // identity matrix
        val m = Array(0x10000L, 0, 0, 0, 0x10000L, 0, 0, 0, 0x40000000L)
        while (k < 9) { b4(m(k)); k += 1 }
        b4(ww.toLong << 16); b4(hh.toLong << 16)
      }
      box("mdia") {
        box("mdhd") {
          b4(0) // v0
          b4(0); b4(0) // ctime mtime
          b4(ts); b4(dur) // TRACK timescale + duration in track ticks
          b4(0x55c40000L) // language 'und' + pre_defined
        }
        box("hdlr") {
          b4(0); b4(0) // fullbox, pre_defined
          ascii(handler)
          b4(0); b4(0); b4(0) // reserved
          bos.write(0) // empty name, NUL
        }
        box("minf") {
          box("stbl") {
            box("stsd") {
              b4(0); b4(1) // fullbox, entry_count
              box(codec) { b4(0); b4(0) } // minimal sample entry
            }
            box("stts") {
              b4(0); b4(samples.length)
              var k = 0
              while (k < samples.length) {
                b4(samples(k)); b4(33 + k) // count, delta
                k += 1
              }
            }
          }
        }
      }
    }
    box("ftyp") { ascii("isom"); b4(0) }
    box("moov") {
      box("mvhd") {
        b4(0) // v0
        b4(0); b4(0) // ctime mtime
        b4(mts); b4(mDur)
        b4(0x10000); b4(0x01000000L) // rate, volume+reserved
        b4(0); b4(0) // reserved
        val m = Array(0x10000L, 0, 0, 0, 0x10000L, 0, 0, 0, 0x40000000L)
        var k = 0
        while (k < 9) { b4(m(k)); k += 1 }
        k = 0
        while (k < 6) { b4(0); k += 1 } // pre_defined
        b4(if (withAudio) 3 else 2) // next track id
      }
      trak(1, "vide", vCodec, vts, vDur,
        Array(vSamples / 2, vSamples - vSamples / 2), w, h)
      if (withAudio)
        trak(2, "soun", "mp4a", 8000, (s % 3600).toInt * 8,
          Array(aSamples), 0, 0)
    }
    bos.toByteArray
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

/** Codegen'd per-track container metadata: `container_tracks(binary)` ->
  * ARRAY<struct(track_id, handler, codec, duration_ms, timescale,
  * n_samples, width, height)> — MP4 trak walk (mdhd per-track durations
  * in the track's own timescale, stts sample-count sum) or AVI strh
  * streams (dwScale/dwRate/dwLength); null when neither signature is
  * present. */
case class ContainerTracks(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(ContainerBytesUtil.trackSchema, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"container_tracks expects BINARY, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    ContainerBytesUtil.containerTracks(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.ContainerBytesUtil.containerTracks($c);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(newChild: Expression): ContainerTracks =
    copy(child = newChild)
}

/** Fixture builder: `synth_mp4(seed, with_audio)` -> a standards-layout
  * MP4 whose mvhd/tkhd/mdhd/hdlr/stsd/stts fields all derive from `seed`
  * in closed form — see [[ContainerBytesUtil.synthMp4]]. */
case class SynthMp4(seed: Expression, withAudio: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def left: Expression = seed
  override def right: Expression = withAudio
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (seed.dataType == LongType && withAudio.dataType == BooleanType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"synth_mp4 expects (BIGINT, BOOLEAN), got " +
        s"(${seed.dataType}, ${withAudio.dataType})")

  override def nullSafeEval(sv: Any, av: Any): Any =
    ContainerBytesUtil.synthMp4(sv.asInstanceOf[Long],
      av.asInstanceOf[Boolean])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sv, av) => s"""
      ${ev.value} = graft.functions.ContainerBytesUtil.synthMp4($sv, $av);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SynthMp4 =
    copy(seed = newLeft, withAudio = newRight)
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
