package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import java.nio.ByteBuffer
import java.nio.charset.{Charset, CodingErrorAction}
import scala.util.control.NonFatal

/** Charset-aware byte→text decoding — the seam between raw crawl bytes
  * (WARC record bodies, HTTP payloads) and the text pipeline
  * ([[WebTextUtil.htmlText]] and everything downstream). A real crawl is
  * NOT UTF-8: pages arrive in cp1252, Shift_JIS, GBK, … declared (or
  * not) by a BOM, an HTTP `Content-Type` header, or a `<meta charset>`
  * tag. Reading them as UTF-8 produces mojibake that [[WebTextUtil
  * .fixMojibake]] can only partially repair (and only for the
  * latin1/cp1252 misread).
  *
  * Detection follows the WHATWG HTML encoding-sniffing order
  * (https://html.spec.whatwg.org/multipage/parsing.html#determining-the-character-encoding),
  * simplified to its deterministic core:
  *
  *   1. BOM — authoritative: UTF-8 (EF BB BF), UTF-16LE (FF FE),
  *      UTF-16BE (FE FF); the BOM is stripped from the output.
  *   2. Transport hint — a `Content-Type` header value (the `charset=`
  *      parameter is extracted) or a bare label. Empty/unresolvable
  *      hints fall through.
  *   3. `<meta charset=…>` prescan over the first 1024 bytes (ASCII
  *      scan; catches `<meta charset="x">` and the http-equiv
  *      `content="text/html; charset=x"` form). A meta-declared UTF-16
  *      resolves to UTF-8 per the spec (the meta was readable as ASCII,
  *      so the document cannot be UTF-16).
  *   4. Strict UTF-8 decode — the dominant modern case, accepted only
  *      if every sequence is well-formed.
  *   5. windows-1252 fallback — the WHATWG default; a superset of the
  *      printable latin1 range, and what browsers use for undeclared
  *      legacy bytes.
  *
  * Labels resolve through the WHATWG label table (subset covering the
  * encodings with non-trivial web share); per that table ASCII and
  * ISO-8859-1 are windows-1252, Shift_JIS is the windows-31j superset,
  * GB2312 is GBK. Declared-charset decodes REPLACE malformed sequences
  * with U+FFFD (the browser behavior) — only step 4 is strict, because
  * there the well-formedness itself is the evidence. Hostile input
  * yields U+FFFD-substituted text or null, never a throw.
  */
object CharsetUtil {

  /** Meta-prescan window (the HTML spec's prescan byte budget). */
  val PrescanBytes: Int = 1024

  /** WHATWG label → normalized encoding name (which is also a valid
    * label, so the map is idempotent). */
  private val labelMap: java.util.HashMap[String, String] = {
    val m = new java.util.HashMap[String, String]()
    def put(norm: String, labels: String*): Unit = {
      m.put(norm, norm); labels.foreach(l => m.put(l, norm))
    }
    put("utf-8", "utf8", "unicode-1-1-utf-8", "unicode11utf8",
      "unicode20utf8", "x-unicode20utf8")
    put("utf-16le", "utf-16", "ucs-2", "unicode", "unicodefeff",
      "csunicode", "iso-10646-ucs-2")
    put("utf-16be", "unicodefffe")
    put("windows-1252", "ascii", "us-ascii", "ansi_x3.4-1968", "cp1252",
      "cp819", "csisolatin1", "ibm819", "iso-8859-1", "iso-ir-100",
      "iso8859-1", "iso88591", "iso_8859-1", "iso_8859-1:1987", "l1",
      "latin1", "x-cp1252")
    put("iso-8859-15", "iso8859-15", "iso885915", "iso_8859-15", "l9",
      "latin9", "csisolatin9")
    put("shift_jis", "shift-jis", "sjis", "ms_kanji", "ms932",
      "csshiftjis", "windows-31j", "x-sjis")
    put("euc-jp", "x-euc-jp", "cseucpkdfmtjapanese")
    put("gbk", "gb2312", "csgb2312", "chinese", "csiso58gb231280",
      "gb_2312", "gb_2312-80", "iso-ir-58", "x-gbk")
    put("gb18030")
    put("big5", "big5-hkscs", "cn-big5", "csbig5", "x-x-big5")
    put("euc-kr", "korean", "ks_c_5601-1987", "ks_c_5601-1989",
      "ksc5601", "ksc_5601", "cseuckr", "csksc56011987", "iso-ir-149",
      "windows-949")
    put("windows-1250", "cp1250", "x-cp1250")
    put("windows-1251", "cp1251", "x-cp1251")
    put("windows-1253", "cp1253", "x-cp1253")
    put("windows-1254", "cp1254", "x-cp1254", "iso-8859-9", "iso8859-9",
      "iso88599", "l5", "latin5", "csisolatin5")
    put("windows-1255", "cp1255", "x-cp1255")
    put("windows-1256", "cp1256", "x-cp1256")
    put("windows-1257", "cp1257", "x-cp1257")
    put("windows-1258", "cp1258", "x-cp1258")
    put("windows-874", "dos-874", "iso-8859-11", "iso8859-11",
      "iso885911", "tis-620")
    put("iso-8859-2", "iso8859-2", "iso88592", "iso_8859-2", "l2",
      "latin2", "csisolatin2")
    put("iso-8859-7", "iso8859-7", "iso88597", "iso_8859-7", "greek",
      "greek8", "ecma-118", "elot_928", "csisolatingreek",
      "sun_eu_greek")
    put("koi8-r", "koi", "koi8", "koi8_r", "cskoi8r")
    m
  }

  /** Normalized name → JVM charset (WHATWG decode semantics: shift_jis
    * is windows-31j, euc-kr is the windows-949 superset). */
  private def javaName(norm: String): String = norm match {
    case "shift_jis" => "windows-31j"
    case "euc-kr" => "x-windows-949"
    case "windows-874" => "x-windows-874"
    case other => other
  }

  /** Resolve a bare label (already whatever case the source used) to
    * the normalized encoding name, or null. */
  def resolveLabel(label: String): String = {
    if (label == null) return null
    val t = label.trim.toLowerCase(java.util.Locale.ROOT)
    if (t.isEmpty) null else labelMap.get(t)
  }

  /** Resolve a transport hint: a `Content-Type` value (`text/html;
    * charset=utf-8`) has its charset parameter extracted; anything
    * without `charset=` is tried as a bare label. */
  def resolveHint(hint: String): String = {
    if (hint == null) return null
    val lower = hint.toLowerCase(java.util.Locale.ROOT)
    // The charset parameter must start at a token boundary (string
    // start, ';', or whitespace, per the media-type parameter grammar):
    // a bare substring match would misread a parameter whose NAME merely
    // ends in "charset" (nocharset=x, x-charset=…) as the declaration.
    // Scan forward past non-boundary hits to a boundary occurrence.
    var at = lower.indexOf("charset=")
    while (at >= 0 && !(at == 0 || lower.charAt(at - 1) == ';' ||
        lower.charAt(at - 1) == ' ' || lower.charAt(at - 1) == '\t'))
      at = lower.indexOf("charset=", at + 1)
    if (at < 0) return resolveLabel(lower)
    var i = at + 8
    while (i < lower.length &&
      (lower.charAt(i) == ' ' || lower.charAt(i) == '\t' ||
        lower.charAt(i) == '"' || lower.charAt(i) == '\'')) i += 1
    val start = i
    while (i < lower.length && !";\"' \t".contains(lower.charAt(i))) i += 1
    resolveLabel(lower.substring(start, i))
  }

  /** ASCII prescan of the first [[PrescanBytes]] bytes for a
    * `charset=value` declaration (covers `<meta charset>` and the
    * http-equiv content attribute). The first occurrence that resolves
    * wins; a resolved UTF-16 variant becomes UTF-8 per the HTML spec. */
  def prescanMeta(b: Array[Byte]): String = {
    val n = math.min(b.length, PrescanBytes)
    val marker = "charset"
    var i = 0
    while (i + marker.length <= n) {
      var k = 0
      while (k < marker.length && {
        val c = b(i + k) & 0xff
        (c | 0x20) == marker.charAt(k)
      }) k += 1
      if (k == marker.length) {
        var p = i + marker.length
        while (p < n && (b(p) == ' ' || b(p) == '\t')) p += 1
        if (p < n && b(p) == '=') {
          p += 1
          while (p < n && (b(p) == ' ' || b(p) == '\t')) p += 1
          var quote = 0
          if (p < n && (b(p) == '"' || b(p) == '\'')) { quote = b(p); p += 1 }
          val start = p
          while (p < n && {
            val c = b(p) & 0xff
            if (quote != 0) c != quote
            else c > ' ' && c != ';' && c != '>' && c != '"' && c != '\''
          }) p += 1
          if (p > start) {
            val label = new String(b, start, p - start,
              java.nio.charset.StandardCharsets.US_ASCII)
            val norm = resolveLabel(label)
            if (norm != null)
              return if (norm == "utf-16le" || norm == "utf-16be") "utf-8"
              else norm
          }
        }
        i += marker.length
      } else i += 1
    }
    null
  }

  /** Detection steps 1-3: (normalized name, bytes to skip) or null when
    * undeclared (caller heuristics decide). `hint` may be null/empty. */
  def declared(b: Array[Byte], hint: String): (String, Int) = {
    if (b.length >= 3 && (b(0) & 0xff) == 0xef && (b(1) & 0xff) == 0xbb &&
      (b(2) & 0xff) == 0xbf) return ("utf-8", 3)
    if (b.length >= 2) {
      val b0 = b(0) & 0xff
      val b1 = b(1) & 0xff
      if (b0 == 0xff && b1 == 0xfe) return ("utf-16le", 2)
      if (b0 == 0xfe && b1 == 0xff) return ("utf-16be", 2)
    }
    if (hint != null && hint.nonEmpty) {
      val h = resolveHint(hint)
      if (h != null) return (h, 0)
    }
    val m = prescanMeta(b)
    if (m != null) (m, 0) else null
  }

  /** True iff the buffer is well-formed UTF-8 throughout. */
  def isStrictUtf8(b: Array[Byte], off: Int): Boolean = {
    try {
      val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
      dec.decode(ByteBuffer.wrap(b, off, b.length - off))
      true
    } catch { case NonFatal(_) => false }
  }

  private def decodeWith(b: Array[Byte], off: Int, norm: String): UTF8String = {
    try {
      val dec = Charset.forName(javaName(norm)).newDecoder()
        .onMalformedInput(CodingErrorAction.REPLACE)
        .onUnmappableCharacter(CodingErrorAction.REPLACE)
      UTF8String.fromString(
        dec.decode(ByteBuffer.wrap(b, off, b.length - off)).toString)
    } catch { case NonFatal(_) => null }
  }

  /** The chosen normalized encoding name for a payload (what
    * [[decodeText]] will decode it as). */
  def detect(b: Array[Byte], hint: String): String = {
    if (b == null) return null
    declared(b, hint) match {
      case (norm, _) => norm
      case null => if (isStrictUtf8(b, 0)) "utf-8" else "windows-1252"
    }
  }

  def detectU(b: Array[Byte], hint: UTF8String): UTF8String = {
    val d = detect(b, if (hint == null) null else hint.toString)
    if (d == null) null else UTF8String.fromString(d)
  }

  /** Decode crawl bytes to text under the detection order above. */
  def decodeText(b: Array[Byte], hint: String): UTF8String = {
    if (b == null) return null
    declared(b, hint) match {
      case (norm, skip) =>
        // utf-8 chosen by BOM/declaration still REPLACE-decodes: the
        // declaration is the authority, malformed bytes become U+FFFD
        decodeWith(b, skip, norm)
      case null =>
        if (isStrictUtf8(b, 0)) UTF8String.fromBytes(b) // zero-copy
        else decodeWith(b, 0, "windows-1252")
    }
  }

  def decodeTextU(b: Array[Byte], hint: UTF8String): UTF8String =
    decodeText(b, if (hint == null) null else hint.toString)
}

/** Codegen'd charset-aware decode: `decode_text(bin[, hint])` -> STRING.
  * `hint` is a `Content-Type` value or bare charset label; empty string
  * (or omitted) means no transport hint. Null only for null input bytes
  * (malformed sequences become U+FFFD, the browser posture — a crawl
  * row should degrade, not disappear, on a few bad bytes). */
case class DecodeText(data: Expression, hint: Expression)
    extends BinaryExpression {
  override def left: Expression = data
  override def right: Expression = hint
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (data.dataType == BinaryType && hint.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"decode_text expects (BINARY, STRING), got " +
        s"(${data.dataType}, ${hint.dataType})")

  override def nullSafeEval(d: Any, h: Any): Any =
    CharsetUtil.decodeTextU(d.asInstanceOf[Array[Byte]],
      h.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (d, h) => s"""
      ${ev.value} = graft.functions.CharsetUtil.decodeTextU($d, $h);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DecodeText =
    copy(data = newLeft, hint = newRight)
}

/** Codegen'd charset detection: `charset_detect(bin[, hint])` -> the
  * normalized encoding name [[DecodeText]] would decode with (utf-8,
  * utf-16le, windows-1252, shift_jis, …). */
case class CharsetDetect(data: Expression, hint: Expression)
    extends BinaryExpression {
  override def left: Expression = data
  override def right: Expression = hint
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (data.dataType == BinaryType && hint.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"charset_detect expects (BINARY, STRING), got " +
        s"(${data.dataType}, ${hint.dataType})")

  override def nullSafeEval(d: Any, h: Any): Any =
    CharsetUtil.detectU(d.asInstanceOf[Array[Byte]],
      h.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (d, h) => s"""
      ${ev.value} = graft.functions.CharsetUtil.detectU($d, $h);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CharsetDetect =
    copy(data = newLeft, hint = newRight)
}

/** Column wrappers. The hint is coalesced to '' so a null hint column
  * (a missing Content-Type header) means "no hint", not a null row. */
object charsets {
  import org.apache.spark.sql.GraftBridge
  import org.apache.spark.sql.functions.{coalesce, lit}

  def decode_text(data: Column): Column = decode_text(data, lit(""))

  def decode_text(data: Column, hint: Column): Column =
    GraftBridge.column(DecodeText(GraftBridge.expression(data),
      GraftBridge.expression(coalesce(hint, lit("")))))

  def charset_detect(data: Column): Column = charset_detect(data, lit(""))

  def charset_detect(data: Column, hint: Column): Column =
    GraftBridge.column(CharsetDetect(GraftBridge.expression(data),
      GraftBridge.expression(coalesce(hint, lit("")))))
}
