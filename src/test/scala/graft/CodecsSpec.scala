package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.CodecsUtil

import java.nio.charset.StandardCharsets.UTF_8

/** Multi-codec content (de)compression kernel: bit-exact round trips for
  * every codec, magic-byte sniffing, the auto path over a mixed-codec
  * column through codegen, and hostile-input hardening — truncation,
  * garbage, the decompression-bomb output cap — all to null, never a
  * throw. */
class CodecsSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("codecs-test")

  private val Codecs = Seq("zlib", "gzip", "zstd", "lz4", "snappy",
    "snappy_raw")

  private def bytes(s: String): Array[Byte] = s.getBytes(UTF_8)

  test("every codec round-trips bit-exact") {
    val payloads = Seq("", "x", "hello codec world " * 50,
      "é世界 unicode 😀", "a" * 100000)
    for (c <- Codecs; p <- payloads) {
      val comp = CodecsUtil.compress(bytes(p), c)
      assert(comp != null, s"$c compress")
      val out = CodecsUtil.decompress(comp, c, CodecsUtil.MaxOutput)
      assert(out != null && new String(out, UTF_8) == p, s"$c round trip")
    }
  }

  test("sniff identifies every self-identifying codec; raw formats do not") {
    val p = bytes("sniff me " * 20)
    for (c <- Seq("zlib", "gzip", "zstd", "lz4", "snappy"))
      assert(CodecsUtil.sniff(CodecsUtil.compress(p, c)) == c, c)
    assert(CodecsUtil.sniff(CodecsUtil.compress(p, "snappy_raw")) == null)
    assert(CodecsUtil.sniff(bytes("plain text, no magic")) == null)
    assert(CodecsUtil.sniff(Array[Byte](0x78.toByte)) == null) // too short
  }

  test("auto decompression routes by magic bytes") {
    val p = bytes("auto routing " * 30)
    for (c <- Seq("zlib", "gzip", "zstd", "lz4", "snappy")) {
      val out = CodecsUtil.decompress(
        CodecsUtil.compress(p, c), "auto", CodecsUtil.MaxOutput)
      assert(out != null && java.util.Arrays.equals(out, p), c)
    }
    // raw snappy has no signature: auto cannot route it, explicit can
    val raw = CodecsUtil.compress(p, "snappy_raw")
    assert(CodecsUtil.decompress(raw, "auto", CodecsUtil.MaxOutput) == null)
    assert(java.util.Arrays.equals(
      CodecsUtil.decompress(raw, "snappy_raw", CodecsUtil.MaxOutput), p))
  }

  test("hostile input: truncation and corruption yield null, never throw") {
    val p = bytes("hostile sweep payload " * 40)
    for (c <- Codecs) {
      val comp = CodecsUtil.compress(p, c)
      // every strict prefix
      var n = 0
      while (n < comp.length) {
        val out = CodecsUtil.decompress(
          java.util.Arrays.copyOf(comp, n), c, CodecsUtil.MaxOutput)
        // a prefix either fails to null or decodes to a prefix-consistent
        // result; it must never throw (this loop completing is the test)
        if (out != null) assert(out.length <= p.length + 1)
        n += 1
      }
      // every single-byte corruption (first 64 positions bound the sweep)
      var i = 0
      while (i < math.min(comp.length, 64)) {
        val bad = comp.clone()
        bad(i) = (bad(i) ^ 0x5a).toByte
        CodecsUtil.decompress(bad, c, CodecsUtil.MaxOutput) // no throw
        CodecsUtil.decompress(bad, "auto", CodecsUtil.MaxOutput)
        i += 1
      }
    }
    assert(CodecsUtil.decompress(bytes("garbage"), "nope",
      CodecsUtil.MaxOutput) == null)
    assert(CodecsUtil.decompress(null, "zlib", CodecsUtil.MaxOutput) == null)
    assert(CodecsUtil.decompress(bytes("x"), null,
      CodecsUtil.MaxOutput) == null)
  }

  test("zlib FDICT preset-dictionary request aborts to null, never spins") {
    // CMF 0x78 FLG 0x20: deflate/32k, FDICT set, (0x7820 % 31) == 0 so the
    // sniffer routes it to zlib; before the needsDictionary() guard this
    // 7-byte payload wedged the inflate loop forever (inflate()==0,
    // needsInput()==false, finished()==false)
    val fdict = Array[Byte](0x78, 0x20, 0x11, 0x22, 0x33, 0x44, 0x55)
    assert(CodecsUtil.sniff(fdict) == "zlib")
    assert(CodecsUtil.decompress(fdict, "zlib", CodecsUtil.MaxOutput) == null)
    assert(CodecsUtil.decompress(fdict, "auto", CodecsUtil.MaxOutput) == null)
  }

  test("'deflate' codec: zlib-wrapped per RFC 9110, raw-deflate fallback") {
    val p = bytes("content-encoding deflate " * 30)
    val zl = CodecsUtil.compress(p, "zlib")
    // conformant servers send zlib-wrapped
    assert(java.util.Arrays.equals(
      CodecsUtil.decompress(zl, "deflate", CodecsUtil.MaxOutput), p))
    // broken servers send RAW deflate = zlib minus header(2) + adler(4)
    val raw = java.util.Arrays.copyOfRange(zl, 2, zl.length - 4)
    assert(CodecsUtil.decompress(raw, "auto", CodecsUtil.MaxOutput) == null,
      "raw deflate must not be sniffable")
    assert(java.util.Arrays.equals(
      CodecsUtil.decompress(raw, "deflate", CodecsUtil.MaxOutput), p))
    // hostile: garbage null, FDICT zlib null (and raw path rejects too)
    assert(CodecsUtil.decompress(bytes("garbage!"), "deflate",
      CodecsUtil.MaxOutput) == null)
    val fdict = Array[Byte](0x78, 0x20, 0x11, 0x22, 0x33, 0x44, 0x55)
    assert(CodecsUtil.decompress(fdict, "deflate",
      CodecsUtil.MaxOutput) == null)
    // bomb cap applies on the raw fallback path as well
    val bomb = CodecsUtil.compress(new Array[Byte](1 << 20), "zlib")
    val rawBomb = java.util.Arrays.copyOfRange(bomb, 2, bomb.length - 4)
    assert(CodecsUtil.decompress(rawBomb, "deflate", 1 << 16) == null)
  }

  test("decompression-bomb cap: oversized output aborts to null") {
    val bomb = new Array[Byte](1 << 20) // 1 MB of zeros compresses tiny
    for (c <- Codecs) {
      val comp = CodecsUtil.compress(bomb, c)
      assert(comp.length < bomb.length / 10, s"$c should squash zeros")
      assert(CodecsUtil.decompress(comp, c, 1 << 16) == null, s"$c capped")
      assert(CodecsUtil.decompress(comp, c, 1 << 21) != null, s"$c fits")
    }
  }

  private def gz(s: String): Array[Byte] = CodecsUtil.compress(bytes(s), "gzip")

  private def members(b: Array[Byte]): Option[Seq[String]] =
    Option(CodecsUtil.gzipMembers(b)).map { arr =>
      (0 until arr.numElements()).map(i => new String(arr.getBinary(i), UTF_8))
    }

  test("gzip_members: concatenated members split and decompress in order") {
    val payload = gz("alpha") ++ gz("") ++ gz("beta " * 100)
    assert(members(payload).contains(Seq("alpha", "", "beta " * 100)))
    assert(members(gz("solo")).contains(Seq("solo")))
  }

  test("gzip_members: optional header fields (FEXTRA/FNAME/FCOMMENT/FHCRC) walk") {
    // hand-build a member with every optional field set around the same
    // deflate body a plain member carries
    val plain = gz("optional fields")
    val deflateAndTrailer = java.util.Arrays.copyOfRange(plain, 10, plain.length)
    val header = Array[Byte](0x1f.toByte, 0x8b.toByte, 8,
      (1 | 2 | 4 | 8 | 16).toByte, // FTEXT|FHCRC|FEXTRA|FNAME|FCOMMENT
      0, 0, 0, 0, 0, 0) ++
      Array[Byte](4, 0) ++ bytes("EXTR") ++ // FEXTRA: len 4 LE + payload
      (bytes("name.txt") :+ 0.toByte) ++
      (bytes("a comment") :+ 0.toByte) ++
      Array[Byte](0x12, 0x34) // FHCRC (unvalidated)
    val fancy = header ++ deflateAndTrailer
    assert(members(fancy).contains(Seq("optional fields")))
    assert(members(fancy ++ gz("tail")).contains(
      Seq("optional fields", "tail")))
  }

  test("gzip_members: corrupt tail keeps the good prefix; corrupt head is null") {
    val good = gz("keep me")
    val corruptTail = good ++ bytes("garbage that is not gzip at all")
    assert(members(corruptTail).contains(Seq("keep me")))
    // truncated second member: good prefix survives
    val second = gz("truncated away")
    val truncated = good ++ java.util.Arrays.copyOf(second, second.length / 2)
    assert(members(truncated).contains(Seq("keep me")))
    assert(members(bytes("no gzip here")).isEmpty)
    assert(members(Array.empty[Byte]).isEmpty)
    // every prefix: never throws
    val p = gz("a") ++ gz("b")
    for (n <- 0 to p.length) members(java.util.Arrays.copyOf(p, n))
  }

  private def warc(b: Array[Byte]): Option[(String, Map[String, String], String)] =
    Option(CodecsUtil.warcRecord(b)).map { r =>
      val m = r.getMap(1)
      val keys = (0 until m.numElements()).map(i =>
        m.keyArray.getUTF8String(i).toString)
      val vals = (0 until m.numElements()).map(i =>
        m.valueArray.getUTF8String(i).toString)
      (r.getUTF8String(0).toString, keys.zip(vals).toMap,
        new String(r.getBinary(2), UTF_8))
    }

  test("warc_record: hostile header floods are capped, body still found") {
    val flood = "WARC/1.0\r\n" +
      (1 to 50000).map(i => s"h$i: v").mkString("\r\n") +
      "\r\n\r\nthe body"
    val r = CodecsUtil.warcRecord(bytes(flood))
    assert(r != null)
    assert(r.getMap(1).numElements() == CodecsUtil.MaxWarcHeaders)
    assert(new String(r.getBinary(2), UTF_8) == "the body")
  }

  test("warc_record: version, headers, body; CRLF and bare-LF; hostile") {
    val crlf = "WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 4\r\n\r\nbody"
    assert(warc(bytes(crlf)).contains(("WARC/1.0",
      Map("WARC-Type" -> "response", "Content-Length" -> "4"), "body")))
    val lf = "WARC/1.1\nA: 1\nB:  spaced  \n\nrest\nlines"
    assert(warc(bytes(lf)).contains(("WARC/1.1",
      Map("A" -> "1", "B" -> "spaced"), "rest\nlines")))
    // malformed header line skipped; empty body; missing blank line
    assert(warc(bytes("WARC/1.0\r\nnocolon\r\nC: 2\r\n\r\n")).contains(
      ("WARC/1.0", Map("C" -> "2"), "")))
    assert(warc(bytes("WARC/1.0\r\nA: 1\r\n")).contains(
      ("WARC/1.0", Map("A" -> "1"), "")))
    assert(warc(bytes("HTTP/1.1 200 OK\r\n\r\n")).isEmpty)
    assert(warc(Array.empty[Byte]).isEmpty)
  }

  test("warc_record: repeated header names keep the first occurrence only") {
    // WARC-Concurrent-To may legally repeat; a MAP with duplicate keys
    // has undefined downstream behavior, so the parser dedups
    val rec = "WARC/1.0\r\nWARC-Concurrent-To: <urn:a>\r\n" +
      "WARC-Concurrent-To: <urn:b>\r\nWARC-Type: response\r\n\r\nbody"
    val r = CodecsUtil.warcRecord(bytes(rec))
    assert(r.getMap(1).numElements() == 2) // no duplicate key entries
    assert(warc(bytes(rec)).contains(("WARC/1.0",
      Map("WARC-Concurrent-To" -> "<urn:a>", "WARC-Type" -> "response"),
      "body")))
  }

  test("http_response: status line, lowercased first-wins headers, body") {
    val msg = "HTTP/1.1 301 Moved Permanently\r\nLocation: /new\r\n" +
      "Content-Type: text/html\r\ncontent-type: text/plain\r\n\r\nthe body"
    val r = CodecsUtil.httpResponse(bytes(msg))
    assert(r.getUTF8String(0).toString == "HTTP/1.1")
    assert(r.getInt(1) == 301)
    assert(r.getUTF8String(2).toString == "Moved Permanently")
    val m = r.getMap(3)
    val hdrs = (0 until m.numElements()).map(i =>
      m.keyArray.getUTF8String(i).toString ->
        m.valueArray.getUTF8String(i).toString).toMap
    assert(hdrs == Map("location" -> "/new",
      "content-type" -> "text/html")) // case-insensitive, first wins
    assert(new String(r.getBinary(4), UTF_8) == "the body")
    // no reason phrase -> null reason; bare-LF accepted
    val bare = CodecsUtil.httpResponse(bytes("HTTP/1.0 204\nA: 1\n\n"))
    assert(bare.getInt(1) == 204 && bare.isNullAt(2))
    // hostile: non-HTTP, garbage status, truncation — null, never throw
    assert(CodecsUtil.httpResponse(bytes("WARC/1.0\r\n\r\n")) == null)
    assert(CodecsUtil.httpResponse(bytes("HTTP/1.1 20x OK\r\n\r\n")) == null)
    assert(CodecsUtil.httpResponse(bytes("HTTP/1.1 2000 OK\r\n\r\n")) == null)
    assert(CodecsUtil.httpResponse(bytes("HTTP/")) == null)
    for (n <- 0 to msg.length)
      CodecsUtil.httpResponse(bytes(msg.substring(0, n))) // no throw
  }

  test("http_dechunk: sizes, extensions, trailers, hostile bounds") {
    def dechunk(s: String): Option[String] =
      Option(CodecsUtil.httpDechunk(bytes(s))).map(new String(_, UTF_8))
    assert(dechunk("5\r\nhello\r\n6\r\n world\r\n0\r\n\r\n")
      .contains("hello world"))
    // chunk extensions after the size; uppercase hex; bare LF; trailers
    assert(dechunk("A;ext=1\r\n0123456789\r\n0\r\nX-Trail: v\r\n\r\n")
      .contains("0123456789"))
    assert(dechunk("b\nhello world\n0\n\n").contains("hello world"))
    // hostile: bad size, truncated mid-chunk, declared-size bomb
    assert(dechunk("zz\r\nnope\r\n").isEmpty)
    assert(dechunk("ff\r\nshort\r\n").isEmpty)
    assert(dechunk("ffffffffff\r\nx").isEmpty) // size > MaxOutput aborts
    assert(dechunk("").isEmpty)
    // a flood of zero-progress chunks hits the chunk-count cap, no spin
    assert(dechunk("1\r\na\r\n" * 100000 + "0\r\n\r\n").isEmpty)
  }

  test("expression path: mixed-codec column decompresses through codegen") {
    import spark.implicits._
    val df = (0 until 24).map { i =>
      (i.toLong, s"row-$i " * (i % 5 + 1), Codecs(i % Codecs.length))
    }.toDF("id", "text", "codec")
    val out = df
      .select(col("id"), col("codec"),
        graft.functions.codecs.compress_bytes(
          col("text").cast("binary"), col("codec")).as("data"))
      .select(col("id"), col("codec"),
        graft.functions.codecs.codec_sniff(col("data")).as("sniffed"),
        graft.functions.codecs.decompress_text(col("data"),
          when(col("codec") === "snappy_raw", lit("snappy_raw"))
            .otherwise(lit("auto"))).as("text"))
      .collect()
    assert(out.length == 24)
    for (r <- out) {
      val id = r.getLong(0)
      assert(r.getString(3) == s"row-$id " * (id.toInt % 5 + 1))
      val expectSniff =
        if (r.getString(1) == "snappy_raw") null else r.getString(1)
      assert(r.getString(2) == expectSniff)
    }
    // SQL registration
    val viaSql = spark.sql(
      "SELECT decompress_text(compress_bytes(CAST('sql path' AS BINARY), " +
        "'zstd'), 'auto') AS t").collect().head.getString(0)
    assert(viaSql == "sql path")
    assert(spark.sql("SELECT codec_sniff(compress_bytes(" +
      "CAST('x' AS BINARY), 'lz4')) AS c").collect().head.getString(0) == "lz4")
  }

  test("header_get: case-insensitive lookup; warcPages charset hint " +
    "survives any written header casing") {
    import spark.implicits._
    // kernel: first case-insensitive match wins; miss and null are null
    val rec = "WARC/1.0\r\ncontent-type: text/html; charset=shift_jis\r\n" +
      "WARC-Type: response\r\n\r\n"
    val r = CodecsUtil.warcRecord(bytes(rec))
    assert(CodecsUtil.headerGet(r.getMap(1),
      org.apache.spark.unsafe.types.UTF8String.fromString("Content-Type"))
      .toString == "text/html; charset=shift_jis")
    assert(CodecsUtil.headerGet(r.getMap(1),
      org.apache.spark.unsafe.types.UTF8String.fromString("WARC-TYPE"))
      .toString == "response")
    assert(CodecsUtil.headerGet(r.getMap(1),
      org.apache.spark.unsafe.types.UTF8String.fromString("absent")) == null)
    // end to end: a record writing "content-type:" (lowercase) keeps its
    // Shift_JIS hint — exact-case element_at would fall back to sniffing
    // and mojibake the page (no UTF-8 validity, no meta, no BOM)
    val payload = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "content-type: text/html; charset=shift_jis\r\n\r\n").getBytes(UTF_8) ++
      "日本語ページ".getBytes("windows-31j")
    val chunk = CodecsUtil.compress(payload, "gzip")
    val out = graft.sources.Content.warcPages(
        Seq((1L, chunk)).toDF("doc_id", "chunk"), "doc_id", "chunk")
      .select("charset", "text").collect().head
    assert(out.getString(0) == "shift_jis")
    assert(out.getString(1) == "日本語ページ")
    // SQL registration
    assert(spark.sql("SELECT header_get(map('X-A', '1'), 'x-a') v")
      .collect().head.getString(0) == "1")
  }
}
