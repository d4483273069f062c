package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Web-corpus text kernels: HTML text extraction and URL
  * canonicalization — the two operators between "crawl bytes" and every
  * text-quality / dedup stage this engine already has. Both are single-
  * pass char machines inside whole-stage codegen: at 100 TB the raw HTML
  * never leaves the scan projection, and URL-level dedup groups on a
  * canonical string computed without a parse library.
  *
  * Hostile input never throws: the HTML machine is a forward-only state
  * walk (unclosed tags, stray '<', nested scripts all degrade to
  * dropping or emitting text), and the URL parser returns null for
  * strings without a scheme://host shape.
  */
object WebTextUtil {

  /** Block-ish closers that separate words even with no whitespace in
    * the source ("</p><p>" must not glue words). Inline tags (b, i, a,
    * span, em, ...) do NOT separate — matching browser text layout would
    * need CSS; a training-pipeline extractor wants word-safe splitting,
    * so every tag boundary inserts a space and the collapse pass cleans
    * up. That choice is documented behavior, not an accident. */
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'

  /** Decode the entity starting at `i` (which points at '&'); returns
    * (decoded char or -1 if not an entity, index AFTER the entity). Only
    * the named entities a crawl actually contains plus full numeric
    * forms; unknown names stay literal. */
  private def entity(s: String, i: Int): (Int, Int) = {
    val semi = {
      var j = i + 1
      val lim = math.min(s.length, i + 12)
      while (j < lim && s.charAt(j) != ';') j += 1
      if (j < lim && j > i + 1) j else -1
    }
    if (semi < 0) return (-1, i + 1)
    val name = s.substring(i + 1, semi)
    val code: Int = name match {
      case "amp" => '&'
      case "lt" => '<'
      case "gt" => '>'
      case "quot" => '"'
      case "apos" => '\''
      case "nbsp" => ' '
      case _ =>
        if (name.length > 1 && name.charAt(0) == '#') {
          try {
            val v =
              if (name.charAt(1) == 'x' || name.charAt(1) == 'X')
                Integer.parseInt(name.substring(2), 16)
              else Integer.parseInt(name.substring(1))
            // surrogate code points (U+D800..U+DFFF) would emit lone
            // surrogates (ill-formed strings); the HTML spec maps these
            // NCRs to U+FFFD
            if (v >= 0xd800 && v <= 0xdfff) 0xfffd
            else if (v > 0 && v <= 0x10ffff) v else -1
          } catch { case _: NumberFormatException => -1 }
        } else -1
    }
    if (code < 0) (-1, i + 1) else (code, semi + 1)
  }

  /** True when s[i..] starts (case-insensitively) with `t`. */
  private def startsAt(s: String, i: Int, t: String): Boolean = {
    if (i + t.length > s.length) return false
    var k = 0
    while (k < t.length) {
      if (Character.toLowerCase(s.charAt(i + k)) != t.charAt(k)) return false
      k += 1
    }
    true
  }

  /** Skip a raw-text element (script/style): content is NOT parsed as
    * markup; scan for the case-insensitive close tag. Returns the index
    * after the close tag, or length if unclosed. */
  private def skipRawElement(s: String, from: Int, close: String): Int = {
    var i = from
    while (i < s.length) {
      if (s.charAt(i) == '<' && startsAt(s, i, close)) {
        var j = i + close.length
        while (j < s.length && s.charAt(j) != '>') j += 1
        return if (j < s.length) j + 1 else s.length
      }
      i += 1
    }
    s.length
  }

  /** Visible text: tags dropped (each boundary word-separating),
    * script/style/comment content removed, entities decoded, whitespace
    * collapsed, trimmed. `titleOnly` extracts the FIRST <title> content
    * instead. */
  def htmlText(html: String, titleOnly: Boolean): String = {
    val out = new java.lang.StringBuilder(
      if (titleOnly) 64 else html.length / 2 + 16)
    var i = 0
    var pendingSpace = false
    var inTitle = false
    var sawTitle = false
    def emit(c: Int): Unit = {
      if (isWs(c.toChar) && c <= 0xffff) pendingSpace = out.length() > 0
      else {
        if (pendingSpace) { out.append(' '); pendingSpace = false }
        out.appendCodePoint(c)
      }
    }
    while (i < html.length) {
      val c = html.charAt(i)
      if (c == '<') {
        // removed blocks word-separate just like plain tag boundaries
        if (startsAt(html, i, "<!--")) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) html.length else e + 3
          pendingSpace = out.length() > 0
        } else if (startsAt(html, i, "<script")) {
          var j = i + 7
          while (j < html.length && html.charAt(j) != '>') j += 1
          i = if (j < html.length) skipRawElement(html, j + 1, "</script")
              else html.length
          pendingSpace = out.length() > 0
        } else if (startsAt(html, i, "<style")) {
          var j = i + 6
          while (j < html.length && html.charAt(j) != '>') j += 1
          i = if (j < html.length) skipRawElement(html, j + 1, "</style")
              else html.length
          pendingSpace = out.length() > 0
        } else {
          if (titleOnly) {
            if (startsAt(html, i, "<title")) { inTitle = true; sawTitle = true }
            else if (startsAt(html, i, "</title")) {
              if (inTitle) i = html.length // first title only
              inTitle = false
            }
          }
          if (i < html.length) {
            var j = i + 1
            while (j < html.length && html.charAt(j) != '>') j += 1
            i = if (j < html.length) j + 1 else html.length
            pendingSpace = out.length() > 0 // tag boundary separates words
          }
        }
      } else if (!titleOnly || inTitle) {
        if (c == '&') {
          val (code, next) = entity(html, i)
          if (code >= 0) { emit(code); i = next }
          else { emit('&'); i += 1 }
        } else { emit(c); i = i + 1 }
      } else i += 1
    }
    if (titleOnly && !sawTitle) null else out.toString
  }

  def htmlTextU(html: UTF8String): UTF8String =
    UTF8String.fromString(htmlText(html.toString, titleOnly = false))

  /** href values of anchor tags, in document order, entity-decoded
    * (hrefs legally contain &amp;). Quoted (single/double) and unquoted
    * attribute forms; script/style/comment content skipped with the
    * same machinery as [[htmlText]]. Empty hrefs dropped. */
  def htmlLinks(html: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < html.length) {
      if (html.charAt(i) == '<') {
        if (startsAt(html, i, "<!--")) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) html.length else e + 3
        } else if (startsAt(html, i, "<script")) {
          var j = i + 7
          while (j < html.length && html.charAt(j) != '>') j += 1
          i = if (j < html.length) skipRawElement(html, j + 1, "</script")
              else html.length
        } else if (startsAt(html, i, "<style")) {
          var j = i + 6
          while (j < html.length && html.charAt(j) != '>') j += 1
          i = if (j < html.length) skipRawElement(html, j + 1, "</style")
              else html.length
        } else {
          var j = i + 1
          while (j < html.length && html.charAt(j) != '>') j += 1
          val isAnchor = i + 2 < html.length && j < html.length &&
            (html.charAt(i + 1) == 'a' || html.charAt(i + 1) == 'A') &&
            (i + 2 >= j || !Character.isLetterOrDigit(html.charAt(i + 2)))
          if (isAnchor) {
            // scan the tag span for an href attribute (preceded by
            // whitespace or a quote, so data-href does not match)
            var k = i + 2
            var found: String = null
            while (found == null && k + 5 <= j) {
              val before = html.charAt(k - 1)
              if (startsAt(html, k, "href") &&
                (isWs(before) || before == '"' || before == '\'')) {
                var v = k + 4
                while (v < j && isWs(html.charAt(v))) v += 1
                if (v < j && html.charAt(v) == '=') {
                  v += 1
                  while (v < j && isWs(html.charAt(v))) v += 1
                  if (v < j) {
                    val q = html.charAt(v)
                    val (s0, e0) =
                      if (q == '"' || q == '\'') {
                        val e = html.indexOf(q, v + 1)
                        (v + 1, if (e < 0 || e > j) j else e)
                      } else {
                        var e = v
                        while (e < j && !isWs(html.charAt(e))) e += 1
                        (v, e)
                      }
                    found = decodeEntities(html.substring(s0, e0))
                  }
                }
              }
              k += 1
            }
            if (found != null && found.nonEmpty) out += found
          }
          i = if (j < html.length) j + 1 else html.length
        }
      } else i += 1
    }
    out.toSeq
  }

  /** (href, anchor text) pairs of anchor tags in document order — the
    * link-graph edge WITH its label (anchor text is the strongest
    * public relevance/spam signal a crawl carries per the classic
    * anchor-text retrieval literature). href handling matches
    * [[htmlLinks]]; anchor text is the visible text to the matching
    * `</a>` (inner tags dropped word-separating, entities decoded,
    * whitespace collapsed, "" for image-only anchors). An unclosed
    * anchor auto-closes at the next `<a` — the browser recovery rule —
    * or at end of input. */
  def htmlAnchors(html: String): Seq[(String, String)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    def isAnchorOpen(k: Int): Boolean =
      k + 1 < html.length && html.charAt(k) == '<' &&
        (html.charAt(k + 1) == 'a' || html.charAt(k + 1) == 'A') &&
        (k + 2 >= html.length || !Character.isLetterOrDigit(html.charAt(k + 2)))
    var i = 0
    while (i < html.length) {
      if (html.charAt(i) == '<') {
        if (startsAt(html, i, "<!--")) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) html.length else e + 3
        } else if (startsAt(html, i, "<script")) {
          var j = i + 7
          while (j < html.length && html.charAt(j) != '>') j += 1
          i = if (j < html.length) skipRawElement(html, j + 1, "</script")
              else html.length
        } else if (startsAt(html, i, "<style")) {
          var j = i + 6
          while (j < html.length && html.charAt(j) != '>') j += 1
          i = if (j < html.length) skipRawElement(html, j + 1, "</style")
              else html.length
        } else {
          var j = i + 1
          while (j < html.length && html.charAt(j) != '>') j += 1
          if (isAnchorOpen(i) && j < html.length) {
            // href attribute scan — identical contract to htmlLinks
            var k = i + 2
            var found: String = null
            while (found == null && k + 5 <= j) {
              val before = html.charAt(k - 1)
              if (startsAt(html, k, "href") &&
                (isWs(before) || before == '"' || before == '\'')) {
                var v = k + 4
                while (v < j && isWs(html.charAt(v))) v += 1
                if (v < j && html.charAt(v) == '=') {
                  v += 1
                  while (v < j && isWs(html.charAt(v))) v += 1
                  if (v < j) {
                    val q = html.charAt(v)
                    val (s0, e0) =
                      if (q == '"' || q == '\'') {
                        val e = html.indexOf(q, v + 1)
                        (v + 1, if (e < 0 || e > j) j else e)
                      } else {
                        var e = v
                        while (e < j && !isWs(html.charAt(e))) e += 1
                        (v, e)
                      }
                    found = decodeEntities(html.substring(s0, e0))
                  }
                }
              }
              k += 1
            }
            // collect the anchor's visible text to </a> / auto-close
            val sb = new java.lang.StringBuilder(32)
            var pendingSpace = false
            def emit(c: Int): Unit = {
              if (isWs(c.toChar) && c <= 0xffff) pendingSpace = sb.length() > 0
              else {
                if (pendingSpace) { sb.append(' '); pendingSpace = false }
                sb.appendCodePoint(c)
              }
            }
            var t = j + 1
            var next = html.length // where the outer loop resumes
            var done = false
            while (!done && t < html.length) {
              val c = html.charAt(t)
              if (c == '<') {
                if (startsAt(html, t, "</a") && (t + 3 >= html.length ||
                  html.charAt(t + 3) == '>' || isWs(html.charAt(t + 3)))) {
                  var g = t + 3
                  while (g < html.length && html.charAt(g) != '>') g += 1
                  next = if (g < html.length) g + 1 else html.length
                  done = true
                } else if (isAnchorOpen(t)) {
                  next = t // browser auto-close: reprocess the new anchor
                  done = true
                } else if (startsAt(html, t, "<!--")) {
                  val e = html.indexOf("-->", t + 4)
                  t = if (e < 0) html.length else e + 3
                  pendingSpace = sb.length() > 0
                } else if (startsAt(html, t, "<script")) {
                  // raw elements inside an open anchor: their bodies are
                  // script/CSS, never label text — same skip rule as the
                  // outer scan (a </a> inside a script string does not
                  // close the anchor in a browser either)
                  var g = t + 7
                  while (g < html.length && html.charAt(g) != '>') g += 1
                  t = if (g < html.length) skipRawElement(html, g + 1, "</script")
                      else html.length
                  pendingSpace = sb.length() > 0
                } else if (startsAt(html, t, "<style")) {
                  var g = t + 6
                  while (g < html.length && html.charAt(g) != '>') g += 1
                  t = if (g < html.length) skipRawElement(html, g + 1, "</style")
                      else html.length
                  pendingSpace = sb.length() > 0
                } else {
                  var g = t + 1
                  while (g < html.length && html.charAt(g) != '>') g += 1
                  t = if (g < html.length) g + 1 else html.length
                  pendingSpace = sb.length() > 0
                }
              } else if (c == '&') {
                val (code, n) = entity(html, t)
                if (code >= 0) { emit(code); t = n }
                else { emit('&'); t += 1 }
              } else { emit(c); t += 1 }
            }
            if (found != null && found.nonEmpty)
              out += ((found, sb.toString))
            i = next
          } else i = if (j < html.length) j + 1 else html.length
        }
      } else i += 1
    }
    out.toSeq
  }

  def htmlAnchorsArray(html: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      htmlAnchors(html.toString).map { case (h, t) =>
        InternalRow(UTF8String.fromString(h), UTF8String.fromString(t)): Any
      }.toArray)

  val anchorSchema: StructType = StructType(Seq(
    StructField("href", StringType, nullable = false),
    StructField("text", StringType, nullable = false)))

  /** Value of an attribute inside a tag span [from, until), or null.
    * Case-insensitive name (pass lowercase), boundary-checked on both
    * sides (so `name` does not match `longname` or `namex`), quoted
    * and unquoted values, entity-decoded. */
  private def attrInTag(
      html: String, from: Int, until: Int, name: String): String = {
    var k = from
    while (k + name.length + 1 <= until) {
      val before = html.charAt(k - 1)
      val afterIdx = k + name.length
      if (startsAt(html, k, name) &&
        (isWs(before) || before == '"' || before == '\'') &&
        afterIdx < until &&
        (isWs(html.charAt(afterIdx)) || html.charAt(afterIdx) == '=')) {
        var v = afterIdx
        while (v < until && isWs(html.charAt(v))) v += 1
        if (v < until && html.charAt(v) == '=') {
          v += 1
          while (v < until && isWs(html.charAt(v))) v += 1
          if (v < until) {
            val q = html.charAt(v)
            val (s0, e0) =
              if (q == '"' || q == '\'') {
                val e = html.indexOf(q, v + 1)
                (v + 1, if (e < 0 || e > until) until else e)
              } else {
                var e = v
                while (e < until && !isWs(html.charAt(e))) e += 1
                (v, e)
              }
            return decodeEntities(html.substring(s0, e0))
          }
        }
      }
      k += 1
    }
    null
  }

  /** Entry cap for [[htmlMeta]]: real pages carry tens of meta tags; a
    * hostile page of millions must not build a giant map. */
  val MaxMetaEntries: Int = 256

  /** Meta tags as a map: lowercase key from `name`, `http-equiv`, or
    * `property` (whichever the tag carries, tried in that order) ->
    * `content`; a bare `<meta charset=X>` lands under key "charset".
    * First occurrence of a key wins; comment/script/style regions
    * skipped with the usual machinery. The curation consumers:
    * robots noindex/nofollow compliance, description/og:* quality
    * signals, declared charset. */
  def htmlMeta(html: String): Seq[(String, String)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val seen = scala.collection.mutable.HashSet.empty[String]
    var i = 0
    while (i < html.length && out.size < MaxMetaEntries) {
      if (html.charAt(i) == '<') {
        if (startsAt(html, i, "<!--")) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) html.length else e + 3
        } else if (startsAt(html, i, "<script")) {
          var j = i + 7
          while (j < html.length && html.charAt(j) != '>') j += 1
          i = if (j < html.length) skipRawElement(html, j + 1, "</script")
              else html.length
        } else if (startsAt(html, i, "<style")) {
          var j = i + 6
          while (j < html.length && html.charAt(j) != '>') j += 1
          i = if (j < html.length) skipRawElement(html, j + 1, "</style")
              else html.length
        } else {
          var j = i + 1
          while (j < html.length && html.charAt(j) != '>') j += 1
          val isMeta = startsAt(html, i, "<meta") &&
            i + 5 < html.length &&
            !Character.isLetterOrDigit(html.charAt(i + 5))
          if (isMeta && j <= html.length) {
            val end = math.min(j, html.length)
            val cs = attrInTag(html, i + 5, end, "charset")
            if (cs != null) {
              if (seen.add("charset")) out += (("charset", cs))
            } else {
              var key = attrInTag(html, i + 5, end, "name")
              if (key == null) key = attrInTag(html, i + 5, end, "http-equiv")
              if (key == null) key = attrInTag(html, i + 5, end, "property")
              val content = attrInTag(html, i + 5, end, "content")
              if (key != null && content != null) {
                val k = key.trim.toLowerCase(java.util.Locale.ROOT)
                if (k.nonEmpty && seen.add(k)) out += ((k, content))
              }
            }
          }
          i = if (j < html.length) j + 1 else html.length
        }
      } else i += 1
    }
    out.toSeq
  }

  def htmlMetaMap(html: UTF8String): org.apache.spark.sql.catalyst.util.MapData = {
    val pairs = htmlMeta(html.toString)
    org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
      pairs.map(p => UTF8String.fromString(p._1): Any).toArray,
      pairs.map(p => UTF8String.fromString(p._2): Any).toArray)
  }

  /** Entity-decode a short attribute value with [[entity]]. */
  private def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '&') {
        val (code, next) = entity(s, i)
        if (code >= 0) { out.appendCodePoint(code); i = next }
        else { out.append('&'); i += 1 }
      } else { out.append(s.charAt(i)); i += 1 }
    }
    out.toString
  }

  def htmlLinksArray(html: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      htmlLinks(html.toString).map(x =>
        UTF8String.fromString(x): Any).toArray)

  def htmlTitleU(html: UTF8String): UTF8String = {
    val t = htmlText(html.toString, titleOnly = true)
    if (t == null) null else UTF8String.fromString(t)
  }

  // -------------------------------------------- main-content extraction

  /** Block-segmenting tags (jusText's segmentation set, Pomikálek 2011:
    * text between block-level tag boundaries forms one classification
    * unit; inline tags like <a>/<b>/<span> do not split). */
  private val BlockTags = Set("address", "article", "aside", "blockquote",
    "body", "caption", "center", "dd", "dir", "div", "dl", "dt",
    "fieldset", "figcaption", "figure", "footer", "form", "h1", "h2",
    "h3", "h4", "h5", "h6", "header", "hr", "li", "main", "menu", "nav",
    "ol", "p", "pre", "section", "table", "tbody", "td", "tfoot", "th",
    "thead", "tr", "ul")

  /** Boilerplate-classification thresholds (documented contract; the
    * closed-form gates depend on these exact values):
    *   - link-dense: 3 * linkLen > len  -> bad (nav / sidebar / footer
    *     link blocks — Boilerpipe's strongest single feature)
    *   - len >= 80                      -> good (text-dense content)
    *   - len < 25                       -> bad (stubs, copyright lines)
    *   - otherwise                      -> short: kept iff the nearest
    *     decisively-classified block on EITHER side is good (jusText's
    *     context-sensitive short-block resolution; document edges count
    *     as bad) — headlines and captions survive next to content,
    *     promo stubs between nav and footer do not. */
  val GoodMinLen = 80
  val MinLen = 25

  /** One classification unit: collapsed visible text, the portion of it
    * (in chars) that sat inside <a> elements, and the final keep
    * decision after short-block resolution. */
  final case class TextBlock(text: String, linkLen: Int, kept: Boolean)

  /** Segment HTML into classified blocks. Title, script, style, and
    * comment content are excluded entirely (a title is metadata, not
    * body content — [[htmlText]]'s title inclusion is the "all visible
    * text" contract, this is the "what a reader came for" contract). */
  def htmlBlocks(html: String): Seq[TextBlock] = {
    val texts = scala.collection.mutable.ArrayBuffer.empty[String]
    val links = scala.collection.mutable.ArrayBuffer.empty[Int]
    val sb = new java.lang.StringBuilder(128)
    var linkLen = 0
    var linkDepth = 0
    var pendingSpace = false
    def flush(): Unit = {
      if (sb.length() > 0) {
        texts += sb.toString; links += linkLen
        sb.setLength(0)
      }
      linkLen = 0
      pendingSpace = false
    }
    def emit(c: Int): Unit = {
      if (isWs(c.toChar) && c <= 0xffff) pendingSpace = sb.length() > 0
      else {
        if (pendingSpace) {
          sb.append(' ')
          if (linkDepth > 0) linkLen += 1
          pendingSpace = false
        }
        val before = sb.length()
        sb.appendCodePoint(c)
        if (linkDepth > 0) linkLen += sb.length() - before
      }
    }
    var i = 0
    while (i < html.length) {
      val c = html.charAt(i)
      if (c == '<') {
        if (startsAt(html, i, "<!--")) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) html.length else e + 3
          pendingSpace = sb.length() > 0
        } else if (startsAt(html, i, "<script")) {
          var j = i + 7
          while (j < html.length && html.charAt(j) != '>') j += 1
          i = if (j < html.length) skipRawElement(html, j + 1, "</script")
              else html.length
          pendingSpace = sb.length() > 0
        } else if (startsAt(html, i, "<style")) {
          var j = i + 6
          while (j < html.length && html.charAt(j) != '>') j += 1
          i = if (j < html.length) skipRawElement(html, j + 1, "</style")
              else html.length
          pendingSpace = sb.length() > 0
        } else if (startsAt(html, i, "<title")) {
          var j = i + 6
          while (j < html.length && html.charAt(j) != '>') j += 1
          i = if (j < html.length) skipRawElement(html, j + 1, "</title")
              else html.length
          pendingSpace = sb.length() > 0
        } else {
          // tag name: optional '/', then letters/digits
          var k = i + 1
          val closing = k < html.length && html.charAt(k) == '/'
          if (closing) k += 1
          val nameStart = k
          while (k < html.length && (Character.isLetterOrDigit(
            html.charAt(k)))) k += 1
          val name = html.substring(nameStart, k)
            .toLowerCase(java.util.Locale.ROOT)
          if (name == "a") {
            if (closing) linkDepth = math.max(0, linkDepth - 1)
            else linkDepth += 1
          } else if (BlockTags.contains(name)) flush()
          var j = i + 1
          while (j < html.length && html.charAt(j) != '>') j += 1
          i = if (j < html.length) j + 1 else html.length
          pendingSpace = sb.length() > 0
        }
      } else if (c == '&') {
        val (code, next) = entity(html, i)
        if (code >= 0) { emit(code); i = next }
        else { emit('&'); i += 1 }
      } else { emit(c); i += 1 }
    }
    flush()
    // decisive classification: 1 good, 0 short, -1 bad
    val n = texts.length
    val cls = new Array[Int](n)
    var x = 0
    while (x < n) {
      val len = texts(x).length
      cls(x) =
        if (3 * links(x) > len) -1
        else if (len >= GoodMinLen) 1
        else if (len < MinLen) -1
        else 0
      x += 1
    }
    // short-block resolution: nearest decisive neighbor on either side
    val prevD = new Array[Int](n) // nearest decisive class before (edge=-1)
    var run = -1
    x = 0
    while (x < n) {
      prevD(x) = run
      if (cls(x) != 0) run = cls(x)
      x += 1
    }
    val nextD = new Array[Int](n)
    run = -1
    x = n - 1
    while (x >= 0) {
      nextD(x) = run
      if (cls(x) != 0) run = cls(x)
      x -= 1
    }
    (0 until n).map { b =>
      val kept =
        if (cls(b) == 1) true
        else if (cls(b) == -1) false
        else prevD(b) == 1 || nextD(b) == 1
      TextBlock(texts(b), links(b), kept)
    }
  }

  /** [[htmlMarkdown]] nesting caps: hostile pages nest lists/quotes
    * arbitrarily deep; indentation and stack growth clamp here (content
    * is still converted, just without further indent). */
  val MaxMdDepth = 32

  /** Structured HTML -> Markdown, one left-to-right pass (no DOM).
    * LLM pipelines increasingly keep document STRUCTURE that
    * [[mainText]] flattens; this kernel preserves it under the
    * documented contract:
    *
    *   - h1..h6 -> "#"*n headings; p -> paragraphs; br -> hard break
    *   - ul/ol/li -> "-" / "k." items, nested lists indented two
    *     spaces per level (capped at [[MaxMdDepth]]); one structure =
    *     one tight block (items joined by single newlines), separate
    *     structures separated by blank lines
    *   - pre -> fenced code block: inner tags dropped, entities
    *     decoded, whitespace PRESERVED verbatim (leading/trailing
    *     newlines trimmed); inline code -> backticks
    *   - table/tr/th/td -> "| a | b |" rows; a first row containing a
    *     th gets a "| --- |" separator row sized to its cell count
    *   - b/strong -> **, i/em -> *, a[href] -> [text](href),
    *     img -> ![alt](src); markers are tag-driven, so unbalanced
    *     hostile input yields unbalanced markers, never a crash
    *   - blockquote -> "> " per nesting level, applied per line
    *   - script/style/title/comment content excluded; all other tags
    *     drop word-separating (the [[htmlText]] rule)
    *
    * Inline whitespace collapses exactly as [[htmlText]]; blocks join
    * with blank lines. Linear in the input (every scan is span-bounded),
    * allocation bounded by input length. */
  def htmlMarkdown(html: String): String = {
    // (text, group): group 0 = regular block (always blank-line
    // separated); >0 = tight group id (list items / table rows of ONE
    // structure join with single newlines)
    val blocks = scala.collection.mutable.ArrayBuffer.empty[(String, Int)]
    val sb = new java.lang.StringBuilder(128)
    var pendingSpace = false
    var blockPrefix = ""
    var group = 0      // current tight group id (0 = none)
    var nextGroup = 1
    var quoteDepth = 0
    // list stack: 'u' or 'o' paired with the running item counter
    val listKind = new Array[Char](MaxMdDepth)
    val listCount = new Array[Int](MaxMdDepth)
    var listDepth = 0
    // table state
    var inTable = false
    var inRow = false
    var rowHadTh = false
    var firstRow = true
    var inCell = false
    val cells = scala.collection.mutable.ArrayBuffer.empty[String]
    val linkHrefs = scala.collection.mutable.ArrayBuffer.empty[String]

    def emit(c: Int): Unit = {
      if (isWs(c.toChar) && c <= 0xffff) pendingSpace = sb.length() > 0
      else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.appendCodePoint(c)
      }
    }
    def raw(s: String): Unit = {
      if (pendingSpace && sb.length() > 0) sb.append(' ')
      pendingSpace = false
      sb.append(s)
    }
    def flushBlock(): Unit = {
      if (sb.length() > 0 || blockPrefix.nonEmpty) {
        var text = blockPrefix + sb.toString
        if (quoteDepth > 0) {
          val q = "> " * math.min(quoteDepth, MaxMdDepth)
          text = text.split("\n", -1).map(q + _).mkString("\n")
        }
        blocks += ((text, group))
      }
      sb.setLength(0)
      blockPrefix = ""
      pendingSpace = false
    }
    def flushCell(): Unit = {
      if (inCell) { cells += sb.toString; sb.setLength(0)
        pendingSpace = false; inCell = false }
    }
    def flushRow(): Unit = {
      flushCell()
      if (inRow) {
        if (cells.nonEmpty) {
          blocks += ((cells.mkString("| ", " | ", " |"), group))
          if (firstRow && rowHadTh)
            blocks += ((Seq.fill(cells.size)("---")
              .mkString("| ", " | ", " |"), group))
          firstRow = false
        }
        cells.clear(); inRow = false; rowHadTh = false
      }
    }
    var i = 0
    while (i < html.length) {
      val c = html.charAt(i)
      if (c == '<') {
        if (startsAt(html, i, "<!--")) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) html.length else e + 3
          pendingSpace = sb.length() > 0
        } else if (startsAt(html, i, "<script")) {
          var j = i + 7
          while (j < html.length && html.charAt(j) != '>') j += 1
          i = if (j < html.length) skipRawElement(html, j + 1, "</script")
              else html.length
          pendingSpace = sb.length() > 0
        } else if (startsAt(html, i, "<style")) {
          var j = i + 6
          while (j < html.length && html.charAt(j) != '>') j += 1
          i = if (j < html.length) skipRawElement(html, j + 1, "</style")
              else html.length
          pendingSpace = sb.length() > 0
        } else if (startsAt(html, i, "<title")) {
          var j = i + 6
          while (j < html.length && html.charAt(j) != '>') j += 1
          i = if (j < html.length) skipRawElement(html, j + 1, "</title")
              else html.length
          pendingSpace = sb.length() > 0
        } else {
          var k = i + 1
          val closing = k < html.length && html.charAt(k) == '/'
          if (closing) k += 1
          val nameStart = k
          while (k < html.length &&
            Character.isLetterOrDigit(html.charAt(k))) k += 1
          val name = html.substring(nameStart, k)
            .toLowerCase(java.util.Locale.ROOT)
          var j = i + 1
          while (j < html.length && html.charAt(j) != '>') j += 1
          val tagEnd = j // span [i, tagEnd) holds the attributes
          name match {
            case "h1" | "h2" | "h3" | "h4" | "h5" | "h6" =>
              flushBlock()
              if (!closing) {
                blockPrefix = "#" * (name.charAt(1) - '0') + " "
              }
            case "p" => flushBlock()
            case "br" => raw("\n")
            case "blockquote" =>
              flushBlock()
              quoteDepth = math.max(0,
                quoteDepth + (if (closing) -1 else 1))
            case "ul" | "ol" =>
              if (!closing) {
                if (listDepth == 0) { flushBlock(); group = nextGroup
                  nextGroup += 1 }
                else flushBlock() // item text before a nested list
                if (listDepth < MaxMdDepth) {
                  listKind(listDepth) = name.charAt(0)
                  listCount(listDepth) = 0
                }
                listDepth += 1
              } else if (listDepth > 0) {
                flushBlock()
                listDepth -= 1
                if (listDepth == 0) group = 0
              }
            case "li" =>
              flushBlock()
              if (!closing && listDepth > 0) {
                val d = math.min(listDepth, MaxMdDepth) - 1
                listCount(d) += 1
                blockPrefix = "  " * d +
                  (if (listKind(d) == 'o') s"${listCount(d)}. " else "- ")
              }
            case "pre" if !closing =>
              flushBlock()
              // raw span to </pre>: inner tags dropped, entities
              // decoded, whitespace preserved
              val body = new java.lang.StringBuilder(128)
              var t = if (tagEnd < html.length) tagEnd + 1 else html.length
              var done = false
              while (!done && t < html.length) {
                val ch = html.charAt(t)
                if (ch == '<') {
                  if (startsAt(html, t, "</pre")) {
                    var g = t + 5
                    while (g < html.length && html.charAt(g) != '>') g += 1
                    t = if (g < html.length) g + 1 else html.length
                    done = true
                  } else {
                    var g = t + 1
                    while (g < html.length && html.charAt(g) != '>') g += 1
                    t = if (g < html.length) g + 1 else html.length
                  }
                } else if (ch == '&') {
                  val (code, n2) = entity(html, t)
                  if (code >= 0) { body.appendCodePoint(code); t = n2 }
                  else { body.append('&'); t += 1 }
                } else { body.append(ch); t += 1 }
              }
              var s0 = 0
              var e0 = body.length()
              while (s0 < e0 && (body.charAt(s0) == '\n' ||
                body.charAt(s0) == '\r')) s0 += 1
              while (e0 > s0 && (body.charAt(e0 - 1) == '\n' ||
                body.charAt(e0 - 1) == '\r' ||
                body.charAt(e0 - 1) == ' ')) e0 -= 1
              blocks += (("```\n" + body.substring(s0, e0) + "\n```", 0))
              i = t
              // the pre span consumed its own input; skip the shared
              // tag advance below
              pendingSpace = false
              // continue the outer loop without the common i update
              // (handled via early jump)
              // NOTE: fallthrough prevented by setting j so that the
              // generic advance lands on t
              j = i - 1
            case "code" => raw("`")
            case "b" | "strong" => raw("**")
            case "i" | "em" => raw("*")
            case "a" =>
              if (!closing) {
                val href = attrInTag(html, i + 2, tagEnd, "href")
                if (href != null && href.nonEmpty) {
                  linkHrefs += href; raw("[")
                } else linkHrefs += null
              } else if (linkHrefs.nonEmpty) {
                val href = linkHrefs.remove(linkHrefs.length - 1)
                if (href != null) { sb.append("]("); sb.append(href)
                  sb.append(')') }
              }
            case "img" if !closing =>
              val src = attrInTag(html, i + 4, tagEnd, "src")
              val alt = attrInTag(html, i + 4, tagEnd, "alt")
              if (src != null && src.nonEmpty)
                raw("![" + (if (alt == null) "" else alt) + "](" + src + ")")
            case "table" =>
              if (!closing) { flushBlock(); inTable = true; firstRow = true
                group = nextGroup; nextGroup += 1 }
              else { flushRow(); inTable = false; group = 0 }
            case "tr" =>
              flushRow()
              if (!closing && inTable) inRow = true
            case "td" | "th" =>
              if (!closing && inRow) {
                flushCell() // unclosed previous cell
                inCell = true
                if (name == "th") rowHadTh = true
                pendingSpace = false
              } else if (closing) flushCell()
            case _ => pendingSpace = sb.length() > 0
          }
          i = if (j < html.length) j + 1 else html.length
        }
      } else if (c == '&') {
        val (code, next) = entity(html, i)
        if (code >= 0) { emit(code); i = next }
        else { emit('&'); i += 1 }
      } else { emit(c); i += 1 }
    }
    flushRow()
    flushBlock()
    // join: same nonzero tight group -> single newline, else blank line
    val outSb = new java.lang.StringBuilder(256)
    var b = 0
    while (b < blocks.length) {
      if (b > 0) {
        val tight = blocks(b - 1)._2 != 0 &&
          blocks(b - 1)._2 == blocks(b)._2
        outSb.append(if (tight) "\n" else "\n\n")
      }
      outSb.append(blocks(b)._1)
      b += 1
    }
    outSb.toString
  }

  def htmlMarkdownU(html: UTF8String): UTF8String =
    UTF8String.fromString(htmlMarkdown(html.toString))

  /** Main-content text: kept blocks joined by '\n'. */
  def mainText(html: String): String =
    htmlBlocks(html).iterator.filter(_.kept).map(_.text).mkString("\n")

  def mainTextU(html: UTF8String): UTF8String =
    UTF8String.fromString(mainText(html.toString))

  val blockSchema: StructType = StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("link_len", IntegerType, nullable = false),
    StructField("kept", org.apache.spark.sql.types.BooleanType,
      nullable = false)))

  def htmlBlocksArray(html: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      htmlBlocks(html.toString).map { b =>
        InternalRow(UTF8String.fromString(b.text), b.linkLen, b.kept): Any
      }.toArray)

  // ----------------------------------------------------------------- URL

  val urlSchema: StructType = StructType(Seq(
    StructField("scheme", StringType, nullable = false),
    StructField("host", StringType, nullable = false),
    StructField("registered_domain", StringType, nullable = false),
    StructField("port", IntegerType, nullable = false),
    StructField("path", StringType, nullable = false),
    StructField("query", StringType, nullable = true)))

  /** Second-level labels under which a two-letter ccTLD delegates
    * registrations (the high-frequency slice of the public-suffix list;
    * a full PSL is data, not code — this heuristic covers the crawl-
    * dominant cases and is deterministic/documented). */
  private val SecondLevel =
    Set("co", "com", "net", "org", "gov", "ac", "edu")

  /** (scheme, host, port, path, query) or null when there is no
    * scheme://host shape. Fragment dropped. Host lowercased, trailing
    * dot stripped; userinfo dropped. */
  def parseUrl(url: String): (String, String, Int, String, String) = {
    val sep = url.indexOf("://")
    if (sep <= 0) return null
    val scheme = url.substring(0, sep).toLowerCase
    var k = 0
    while (k < scheme.length) {
      val c = scheme.charAt(k)
      if (!(c >= 'a' && c <= 'z') && !(c >= '0' && c <= '9') &&
        c != '+' && c != '-' && c != '.') return null
      k += 1
    }
    var i = sep + 3
    val authEnd = {
      var j = i
      while (j < url.length && url.charAt(j) != '/' && url.charAt(j) != '?' &&
        url.charAt(j) != '#') j += 1
      j
    }
    var auth = url.substring(i, authEnd)
    val at = auth.lastIndexOf('@')
    if (at >= 0) auth = auth.substring(at + 1)
    var host = auth
    var port = -1
    val colon = auth.lastIndexOf(':')
    if (colon >= 0 && auth.indexOf(']') < colon) { // not inside IPv6 [...]
      val p = auth.substring(colon + 1)
      if (p.nonEmpty && p.forall(c => c >= '0' && c <= '9') &&
        p.length <= 5 && p.toInt <= 65535) { // TCP port range only
        port = p.toInt
        host = auth.substring(0, colon)
      }
    }
    host = host.toLowerCase
    if (host.endsWith(".")) host = host.substring(0, host.length - 1)
    if (host.isEmpty) return null
    i = authEnd
    val frag = url.indexOf('#', i)
    val end = if (frag < 0) url.length else frag
    val qmark = {
      val q = url.indexOf('?', i)
      if (q < 0 || q > end) -1 else q
    }
    val path = {
      val p = url.substring(i, if (qmark < 0) end else qmark)
      if (p.isEmpty) "/" else p
    }
    val query = if (qmark < 0) null else url.substring(qmark + 1, end)
    (scheme, host, port, path, query)
  }

  /** eTLD+1 under the [[SecondLevel]] heuristic; IPs and single-label
    * hosts pass through. */
  def registeredDomain(host: String): String = {
    if (host.forall(c => (c >= '0' && c <= '9') || c == '.')) return host
    if (host.startsWith("[")) return host // IPv6 literal
    val labels = host.split('.')
    if (labels.length <= 2) return host
    val tld = labels(labels.length - 1)
    val second = labels(labels.length - 2)
    val keep =
      if (tld.length == 2 && SecondLevel.contains(second)) 3 else 2
    labels.takeRight(keep).mkString(".")
  }

  def parseUrlRow(url: UTF8String): InternalRow = {
    val p = parseUrl(url.toString)
    if (p == null) return null
    val (scheme, host, port, path, query) = p
    InternalRow(UTF8String.fromString(scheme), UTF8String.fromString(host),
      UTF8String.fromString(registeredDomain(host)), port,
      UTF8String.fromString(path),
      if (query == null) null else UTF8String.fromString(query))
  }

  /** Tracking parameters stripped by canonicalization: the utm_ prefix
    * plus the click/mail identifiers ad and analytics stacks append.
    * Everything else is preserved IN ORDER (sorting would conflate
    * semantically ordered APIs). */
  private def isTracking(name: String): Boolean = {
    val n = name.toLowerCase
    n.startsWith("utm_") || n == "gclid" || n == "fbclid" ||
      n == "msclkid" || n == "yclid" || n == "igshid" || n == "mc_eid" ||
      n == "mc_cid" || n == "ref_src" || n == "spm"
  }

  /** Canonical form for URL-level dedup: lowercase scheme+host, default
    * ports (http 80 / https 443) and fragments dropped, tracking params
    * removed, empty path -> "/", empty residual query dropped. Null when
    * unparseable. */
  def canonicalizeUrl(url: String): String = {
    val p = parseUrl(url)
    if (p == null) return null
    val (scheme, host, port, path, query) = p
    val sb = new java.lang.StringBuilder(url.length)
    sb.append(scheme).append("://").append(host)
    val defaultPort =
      (scheme == "http" && port == 80) || (scheme == "https" && port == 443)
    if (port >= 0 && !defaultPort) sb.append(':').append(port)
    sb.append(path)
    if (query != null) {
      val kept = query.split('&').filter { kv =>
        val eq = kv.indexOf('=')
        val name = if (eq < 0) kv else kv.substring(0, eq)
        name.nonEmpty && !isTracking(name)
      }
      if (kept.nonEmpty) {
        sb.append('?')
        var k = 0
        while (k < kept.length) {
          if (k > 0) sb.append('&')
          sb.append(kept(k))
          k += 1
        }
      }
    }
    sb.toString
  }

  def canonicalizeUrlU(url: UTF8String): UTF8String = {
    val c = canonicalizeUrl(url.toString)
    if (c == null) null else UTF8String.fromString(c)
  }

  // ----------------------------------------------------------- text fix

  /** cp1252's 0x80-0x9F graphic characters, reverse-mapped (char -> the
    * byte that produced it). Mojibake routed through cp1252 shows these
    * (€ ™ curly quotes …) where latin1 routing shows C1 control chars;
    * both must map back for the repair to reconstruct the UTF-8 bytes. */
  private val Cp1252Rev: Map[Char, Byte] = Map(
    '€' -> 0x80, '‚' -> 0x82, 'ƒ' -> 0x83, '„' -> 0x84,
    '…' -> 0x85, '†' -> 0x86, '‡' -> 0x87, 'ˆ' -> 0x88,
    '‰' -> 0x89, 'Š' -> 0x8a, '‹' -> 0x8b, 'Œ' -> 0x8c,
    'Ž' -> 0x8e, '‘' -> 0x91, '’' -> 0x92, '“' -> 0x93,
    '”' -> 0x94, '•' -> 0x95, '–' -> 0x96, '—' -> 0x97,
    '˜' -> 0x98, '™' -> 0x99, 'š' -> 0x9a, '›' -> 0x9b,
    'œ' -> 0x9c, 'ž' -> 0x9e, 'Ÿ' -> 0x9f
  ).map { case (c, b) => c -> b.toByte }

  /** The byte this char encodes to under latin1-or-cp1252 decoding, or
    * -1 when it cannot be a mojibake artifact. */
  private def mojibakeByte(c: Char): Int =
    if (c >= 0x80 && c <= 0xff) c.toInt
    else Cp1252Rev.get(c).map(_ & 0xff).getOrElse(-1)

  /** Repair UTF-8-read-as-latin1/cp1252 mojibake ("café" seen as
    * "cafÃ©"): maximal runs of artifact-range chars are mapped back to
    * the bytes that produced them and re-decoded as STRICT UTF-8; a run
    * that decodes (and actually contained a multi-byte sequence) is
    * replaced, anything else is left untouched — so legitimately
    * latin1-ish text ("café" itself: a lone é is not valid UTF-8) never
    * changes. The documented false-positive is text that intentionally
    * spells a valid UTF-8 byte sequence in artifact chars — the same
    * tradeoff every mojibake fixer makes. */
  def fixMojibake(s: String): String = {
    var i = 0
    var found = false
    while (i < s.length && !found) {
      if (mojibakeByte(s.charAt(i)) >= 0xc2) found = true
      i += 1
    }
    if (!found) return s // fast path: no possible lead byte anywhere
    val out = new java.lang.StringBuilder(s.length)
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    i = 0
    while (i < s.length) {
      val b0 = mojibakeByte(s.charAt(i))
      if (b0 < 0x80) { out.append(s.charAt(i)); i += 1 }
      else {
        var j = i
        val bytes = new java.io.ByteArrayOutputStream(8)
        while (j < s.length && mojibakeByte(s.charAt(j)) >= 0x80) {
          bytes.write(mojibakeByte(s.charAt(j)))
          j += 1
        }
        val arr = bytes.toByteArray
        val repaired: String =
          if (arr.exists(b => (b & 0xff) >= 0xc2)) {
            try {
              dec.reset()
              dec.decode(java.nio.ByteBuffer.wrap(arr)).toString
            } catch { case _: java.nio.charset.CharacterCodingException => null }
          } else null
        if (repaired != null) out.append(repaired)
        else out.append(s, i, j)
        i = j
      }
    }
    out.toString
  }

  def fixMojibakeU(s: UTF8String): UTF8String =
    UTF8String.fromString(fixMojibake(s.toString))

  /** Unicode normalization via the JDK's Normalizer; `form` in
    * NFC/NFD/NFKC/NFKD (case-insensitive), null for other forms. */
  def normalizeText(s: UTF8String, form: UTF8String): UTF8String = {
    if (form == null) return null
    val f = form.toString.toUpperCase match {
      case "NFC" => java.text.Normalizer.Form.NFC
      case "NFD" => java.text.Normalizer.Form.NFD
      case "NFKC" => java.text.Normalizer.Form.NFKC
      case "NFKD" => java.text.Normalizer.Form.NFKD
      case _ => return null
    }
    UTF8String.fromString(java.text.Normalizer.normalize(s.toString, f))
  }
}

/** Codegen'd HTML text extraction: `html_text(str)` — tags dropped
  * (word-separating), script/style/comments removed, entities decoded,
  * whitespace collapsed. */
case class HtmlText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"html_text expects STRING, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    WebTextUtil.htmlTextU(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WebTextUtil.htmlTextU($c)")

  override protected def withNewChildInternal(newChild: Expression): HtmlText =
    copy(child = newChild)
}

/** Codegen'd title extraction: `html_title(str)` — the first <title>
  * content (entity-decoded, collapsed), null when absent. */
case class HtmlTitle(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"html_title expects STRING, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    WebTextUtil.htmlTitleU(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.WebTextUtil.htmlTitleU($c);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(newChild: Expression): HtmlTitle =
    copy(child = newChild)
}

/** Codegen'd link extraction: `html_links(str)` -> ARRAY<STRING> of
  * anchor href values in document order, entity-decoded. */
case class HtmlLinks(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"html_links expects STRING, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    WebTextUtil.htmlLinksArray(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WebTextUtil.htmlLinksArray($c)")

  override protected def withNewChildInternal(newChild: Expression): HtmlLinks =
    copy(child = newChild)
}

/** Codegen'd meta-tag extraction: `html_meta(str)` ->
  * MAP<STRING,STRING> keyed by lowercase name/http-equiv/property
  * (first wins; bare charset under "charset"). */
case class HtmlMeta(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.MapType(StringType, StringType,
      valueContainsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"html_meta expects STRING, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    WebTextUtil.htmlMetaMap(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WebTextUtil.htmlMetaMap($c)")

  override protected def withNewChildInternal(newChild: Expression): HtmlMeta =
    copy(child = newChild)
}

/** Codegen'd anchor extraction with labels: `html_anchors(str)` ->
  * ARRAY<STRUCT<href, text>> in document order. */
case class HtmlAnchors(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(WebTextUtil.anchorSchema,
      containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"html_anchors expects STRING, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    WebTextUtil.htmlAnchorsArray(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WebTextUtil.htmlAnchorsArray($c)")

  override protected def withNewChildInternal(newChild: Expression): HtmlAnchors =
    copy(child = newChild)
}

/** Codegen'd main-content extraction: `html_main_text(str)` —
  * boilerplate (link-dense blocks, stubs, orphaned short blocks)
  * removed under the documented jusText-style contract; kept blocks
  * joined by newline. */
case class HtmlMainText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"html_main_text expects STRING, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    WebTextUtil.mainTextU(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WebTextUtil.mainTextU($c)")

  override protected def withNewChildInternal(newChild: Expression): HtmlMainText =
    copy(child = newChild)
}

/** Codegen'd structured HTML -> Markdown
  * ([[WebTextUtil.htmlMarkdown]]'s contract): headings, lists, tables,
  * fenced code blocks, inline emphasis/links preserved as markdown. */
case class HtmlMarkdown(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"html_markdown expects STRING, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    WebTextUtil.htmlMarkdownU(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WebTextUtil.htmlMarkdownU($c)")

  override protected def withNewChildInternal(newChild: Expression): HtmlMarkdown =
    copy(child = newChild)
}

/** Codegen'd block segmentation: `html_blocks(str)` ->
  * ARRAY<STRUCT<text, link_len, kept>> — the classification units
  * behind [[HtmlMainText]], for per-block quality pipelines. */
case class HtmlBlocks(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(WebTextUtil.blockSchema,
      containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"html_blocks expects STRING, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    WebTextUtil.htmlBlocksArray(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WebTextUtil.htmlBlocksArray($c)")

  override protected def withNewChildInternal(newChild: Expression): HtmlBlocks =
    copy(child = newChild)
}

/** Codegen'd lenient URL parse: `url_parse(str)` -> struct(scheme, host,
  * registered_domain, port, path, query); null without a scheme://host
  * shape. */
case class UrlParse(child: Expression) extends UnaryExpression {
  override def dataType: DataType = WebTextUtil.urlSchema
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"url_parse expects STRING, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    WebTextUtil.parseUrlRow(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.WebTextUtil.parseUrlRow($c);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(newChild: Expression): UrlParse =
    copy(child = newChild)
}

/** Codegen'd URL canonicalization for dedup keys: `url_canonical(str)`. */
case class UrlCanonical(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"url_canonical expects STRING, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    WebTextUtil.canonicalizeUrlU(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.WebTextUtil.canonicalizeUrlU($c);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(newChild: Expression): UrlCanonical =
    copy(child = newChild)
}

/** Codegen'd mojibake repair: `fix_text(str)` — UTF-8-read-as-
  * latin1/cp1252 artifact runs re-decoded strictly; non-artifacts
  * untouched. */
case class FixText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"fix_text expects STRING, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    WebTextUtil.fixMojibakeU(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WebTextUtil.fixMojibakeU($c)")

  override protected def withNewChildInternal(newChild: Expression): FixText =
    copy(child = newChild)
}

/** Codegen'd Unicode normalization: `normalize_text(str, form)` with
  * form in NFC/NFD/NFKC/NFKD; null for unknown forms. */
case class NormalizeText(data: Expression, form: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def left: Expression = data
  override def right: Expression = form
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (data.dataType == StringType && form.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"normalize_text expects (STRING, STRING), got " +
        s"(${data.dataType}, ${form.dataType})")

  override def nullSafeEval(d: Any, f: Any): Any =
    WebTextUtil.normalizeText(d.asInstanceOf[UTF8String],
      f.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (d, f) => s"""
      ${ev.value} = graft.functions.WebTextUtil.normalizeText($d, $f);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NormalizeText =
    copy(data = newLeft, form = newRight)
}

/** Column wrappers for the web-text kernels. */
object web {
  import org.apache.spark.sql.GraftBridge

  def html_text(c: Column): Column =
    GraftBridge.column(HtmlText(GraftBridge.expression(c)))

  def html_title(c: Column): Column =
    GraftBridge.column(HtmlTitle(GraftBridge.expression(c)))

  def html_links(c: Column): Column =
    GraftBridge.column(HtmlLinks(GraftBridge.expression(c)))

  def html_anchors(c: Column): Column =
    GraftBridge.column(HtmlAnchors(GraftBridge.expression(c)))

  def html_meta(c: Column): Column =
    GraftBridge.column(HtmlMeta(GraftBridge.expression(c)))

  def html_main_text(c: Column): Column =
    GraftBridge.column(HtmlMainText(GraftBridge.expression(c)))

  def html_markdown(c: Column): Column =
    GraftBridge.column(HtmlMarkdown(GraftBridge.expression(c)))

  def html_blocks(c: Column): Column =
    GraftBridge.column(HtmlBlocks(GraftBridge.expression(c)))

  def url_parse(c: Column): Column =
    GraftBridge.column(UrlParse(GraftBridge.expression(c)))

  def url_canonical(c: Column): Column =
    GraftBridge.column(UrlCanonical(GraftBridge.expression(c)))

  def fix_text(c: Column): Column =
    GraftBridge.column(FixText(GraftBridge.expression(c)))

  def normalize_text(c: Column, form: Column): Column =
    GraftBridge.column(NormalizeText(GraftBridge.expression(c),
      GraftBridge.expression(form)))
}
