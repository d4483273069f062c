package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.CharsetUtil

import java.nio.charset.Charset

/** Charset-aware byte→text decode: the WHATWG sniffing order (BOM >
  * transport hint > meta prescan > strict UTF-8 > windows-1252), label
  * resolution, legacy CJK decodes cross-checked against the JDK's own
  * encoders, and hostile-input hardening. */
class CharsetSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("charset-test")

  private def dec(b: Array[Byte], hint: String = null): String = {
    val out = CharsetUtil.decodeText(b, hint)
    if (out == null) null else out.toString
  }
  private def det(b: Array[Byte], hint: String = null): String =
    CharsetUtil.detect(b, hint)
  private def enc(s: String, cs: String): Array[Byte] =
    s.getBytes(Charset.forName(cs))

  // multilingual probe: latin + accent + CJK + astral
  private val probe = "café 世界 😀 ok"

  test("BOMs are authoritative and stripped") {
    val utf8bom = Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++
      enc(probe, "UTF-8")
    assert(det(utf8bom) == "utf-8" && dec(utf8bom) == probe)
    val le = Array[Byte](0xff.toByte, 0xfe.toByte) ++ enc(probe, "UTF-16LE")
    assert(det(le) == "utf-16le" && dec(le) == probe)
    val be = Array[Byte](0xfe.toByte, 0xff.toByte) ++ enc(probe, "UTF-16BE")
    assert(det(be) == "utf-16be" && dec(be) == probe)
    // Java's "UTF-16" encoder writes a BE BOM itself
    assert(dec(enc(probe, "UTF-16")) == probe)
    // BOM beats a contradicting hint AND a contradicting meta
    val misdeclared = Array[Byte](0xff.toByte, 0xfe.toByte) ++
      enc("<meta charset=\"shift_jis\">" + probe, "UTF-16LE")
    assert(det(misdeclared, "text/html; charset=EUC-KR") == "utf-16le")
    assert(dec(misdeclared, "text/html; charset=EUC-KR") ==
      "<meta charset=\"shift_jis\">" + probe)
  }

  test("transport hint: Content-Type parameter and bare labels resolve") {
    val sjis = enc("日本語", "windows-31j")
    assert(det(sjis, "text/html; charset=Shift_JIS") == "shift_jis")
    assert(dec(sjis, "text/html; charset=Shift_JIS") == "日本語")
    assert(dec(sjis, "sjis") == "日本語") // bare label
    assert(dec(sjis, "charset=\"shift_jis\"; x=y") == "日本語")
    // per WHATWG, latin1/ascii labels mean windows-1252: 0x93 must
    // decode as a curly quote, not the C1 control U+0093
    val smart = Array[Byte](0x93.toByte, 'h', 'i', 0x94.toByte)
    for (h <- Seq("iso-8859-1", "latin1", "us-ascii", "windows-1252"))
      assert(dec(smart, s"text/plain; charset=$h") == "“hi”", h)
    // unresolvable hints fall through to the next step, not to garbage
    assert(det(enc("plain", "UTF-8"), "charset=klingon") == "utf-8")
    assert(det(enc("plain", "UTF-8"), "") == "utf-8")
    // "charset=" must sit at a token boundary (start, ';', whitespace)
    // per the media-type parameter grammar: a parameter whose NAME
    // merely ends in "charset" is not the declaration
    assert(det(sjis, "text/plain; nocharset=shift_jis") == "windows-1252")
    assert(dec(smart, "text/plain; x-charset=utf-8") == "“hi”")
    // and the scan continues PAST a non-boundary hit to the real one
    assert(det(sjis, "text/plain; nocharset=x; charset=shift_jis") ==
      "shift_jis")
    assert(det(sjis, "text/html;charset=shift_jis") == "shift_jis")
  }

  test("meta prescan: charset attr, http-equiv form, quoting, utf-16 rule") {
    def page(decl: String) =
      s"""<html><head>$decl</head><body>€ body</body>"""
    // meta-declared iso-8859-15: 0xA4 is the EURO sign (cp1252/latin1
    // would give the generic currency sign) — proves the meta is used
    val m15 = enc(page("<meta charset=iso-8859-15>"), "ISO-8859-15")
    assert(det(m15) == "iso-8859-15")
    assert(dec(m15).contains("€ body"))
    val httpEquiv = enc(page("<meta http-equiv=\"Content-Type\" " +
      "content=\"text/html; charset=ISO-8859-15\">"), "ISO-8859-15")
    assert(det(httpEquiv) == "iso-8859-15")
    for (q <- Seq("'iso-8859-15'", "\"iso-8859-15\"", "iso-8859-15"))
      assert(det(enc(page(s"<meta charset=$q>"), "ISO-8859-15")) ==
        "iso-8859-15", q)
    // meta-declared UTF-16 resolves to UTF-8 (the meta was readable as
    // ASCII, so the document cannot be UTF-16)
    assert(det(enc("<meta charset=utf-16le>hi", "UTF-8")) == "utf-8")
    // prescan window: a declaration past 1024 bytes is not seen
    val far = enc("x" * 1200 + "<meta charset=shift_jis>", "UTF-8")
    assert(det(far) == "utf-8")
    // hint outranks meta
    assert(det(m15, "text/html; charset=windows-1251") == "windows-1251")
    // first RESOLVING declaration wins; junk labels are skipped
    assert(det(enc("<meta charset=bogus><meta charset=koi8-r>" + "ÿ",
      "ISO-8859-1")) == "koi8-r")
  }

  test("heuristic tail: strict UTF-8 else windows-1252; repair-free") {
    assert(det(enc(probe, "UTF-8")) == "utf-8")
    assert(dec(enc(probe, "UTF-8")) == probe)
    // undeclared latin1 bytes: é (0xE9) + currency (0xA4) — not valid
    // UTF-8, so the cp1252 fallback decodes them
    val latin = enc("café ¤", "ISO-8859-1")
    assert(det(latin) == "windows-1252")
    assert(dec(latin) == "café ¤")
    assert(dec(Array.empty[Byte]) == "" && det(Array.empty[Byte]) == "utf-8")
    assert(dec(null) == null && det(null) == null)
  }

  test("legacy CJK decodes round-trip against the JDK encoders") {
    val cases = Seq(
      ("shift_jis", "windows-31j", "日本語テスト"),
      ("euc-jp", "EUC-JP", "日本語"),
      ("gbk", "GBK", "中文测试"),
      ("gb18030", "GB18030", "中文😀"),
      ("big5", "Big5", "中文測試"),
      ("euc-kr", "x-windows-949", "한국어"),
      ("windows-1251", "windows-1251", "русский"),
      ("koi8-r", "KOI8-R", "текст"),
      ("iso-8859-7", "ISO-8859-7", "ελληνικά"),
      ("windows-874", "x-windows-874", "ไทย"))
    for ((label, jdk, text) <- cases) {
      val b = text.getBytes(Charset.forName(jdk))
      assert(det(b, label) == label, label)
      assert(dec(b, label) == text, label)
    }
  }

  test("hostile input: malformed bytes degrade to U+FFFD, never throw") {
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 200) {
      val b = new Array[Byte](rnd.nextInt(64))
      rnd.nextBytes(b)
      for (h <- Seq(null, "", "utf-8", "shift_jis", "charset=gb18030")) {
        val out = dec(b, h)
        assert(out != null) // binary always decodes to SOMETHING
      }
    }
    // declared utf-8 with a malformed byte: U+FFFD substitution, not null
    val bad = enc("ok ", "UTF-8") ++ Array[Byte](0xc3.toByte) // dangling lead
    assert(dec(bad, "utf-8") == "ok �")
    // odd-length utf-16 payload after BOM
    val odd = Array[Byte](0xff.toByte, 0xfe.toByte, 'a', 0, 'b')
    assert(dec(odd) == "a�")
    // truncated multi-byte at the end of undeclared bytes -> cp1252 path
    assert(dec(Array[Byte](0xe4.toByte, 0xb8.toByte)) != null)
  }

  test("expression path through codegen, null-hint tolerance, SQL") {
    import spark.implicits._
    val rows = Seq(
      (1L, enc(probe, "UTF-8"), null.asInstanceOf[String]),
      (2L, Array[Byte](0xff.toByte, 0xfe.toByte) ++ enc("page two", "UTF-16LE"),
        null.asInstanceOf[String]),
      (3L, enc("café ¤", "ISO-8859-1"), null.asInstanceOf[String]),
      (4L, enc("日本", "windows-31j"), "text/html; charset=shift_jis"))
    val out = rows.toDF("id", "body", "ct")
      .select(col("id"),
        graft.functions.charsets.charset_detect(col("body"), col("ct"))
          .as("cs"),
        graft.functions.charsets.decode_text(col("body"), col("ct"))
          .as("text"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2)))
      .toMap
    assert(out(1L) == ("utf-8", probe))
    assert(out(2L) == ("utf-16le", "page two"))
    assert(out(3L) == ("windows-1252", "café ¤")) // null hint ok
    assert(out(4L) == ("shift_jis", "日本"))
    // SQL registration: 1-arg and 2-arg arities
    assert(spark.sql("SELECT decode_text(CAST('plain' AS BINARY)) t")
      .collect().head.getString(0) == "plain")
    assert(spark.sql("SELECT charset_detect(CAST('plain' AS BINARY), " +
      "'charset=koi8-r') c").collect().head.getString(0) == "koi8-r")
    assert(spark.sql("SELECT decode_text(CAST('x' AS BINARY), " +
      "CAST(NULL AS STRING)) t").collect().head.getString(0) == "x")
  }
}
