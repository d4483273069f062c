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

  test("decompression-bomb cap: oversized output aborts to null") {
    val bomb = new Array[Byte](1 << 20) // 1 MB of zeros compresses tiny
    for (c <- Codecs) {
      val comp = CodecsUtil.compress(bomb, c)
      assert(comp.length < bomb.length / 10, s"$c should squash zeros")
      assert(CodecsUtil.decompress(comp, c, 1 << 16) == null, s"$c capped")
      assert(CodecsUtil.decompress(comp, c, 1 << 21) != null, s"$c fits")
    }
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
}
