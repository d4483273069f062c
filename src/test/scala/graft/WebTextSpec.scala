package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.WebTextUtil

/** HTML text extraction + URL canonicalization kernels: extraction
  * semantics (raw-text elements, entities, word-separating tag
  * boundaries, title), lenient URL parsing (IPv6, userinfo, ports,
  * public-suffix heuristic), canonical dedup keys, and hostile input —
  * nothing throws, unparseable degrades to null. */
class WebTextSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("webtext-test")

  private def text(h: String): String =
    WebTextUtil.htmlText(h, titleOnly = false)
  private def title(h: String): String =
    WebTextUtil.htmlText(h, titleOnly = true)

  test("html_text: tags, raw-text elements, comments, entities, collapse") {
    assert(text("<p>hello <b>world</b></p>") == "hello world")
    // tag boundaries word-separate even with no source whitespace
    assert(text("<p>one</p><p>two</p>") == "one two")
    // script/style content is raw text — markup inside is NOT parsed,
    // a quoted "</" does not close it, a '<' does not open a tag
    assert(text("a<script>if(1<2){x='</';}</script>b") == "a b")
    assert(text("a<style>p>i{color:red}</style>b") == "a b")
    assert(text("a<SCRIPT>x</SCRIPT>b") == "a b") // case-insensitive
    assert(text("a<!-- <p>no</p> -->b") == "a b")
    // entities: named, decimal, hex, nbsp-as-space, unknown stays
    assert(text("A &amp; B &lt;t&gt; &#65;&#x42;&nbsp;C") == "A & B <t> AB C")
    assert(text("5 &notanentity; 6") == "5 &notanentity; 6")
    assert(text("bare & ampersand") == "bare & ampersand")
    // whitespace collapses, leading/trailing trimmed
    assert(text("  a \n\t b  ") == "a b")
    assert(text("<div>   </div>") == "")
  }

  test("html_title: first title only, entity-decoded, null when absent") {
    assert(title("<title> A &amp; B </title>") == "A & B")
    assert(title("<html><head><title>one</title></head>" +
      "<body><title>two</title></body>") == "one")
    assert(title("<p>no title</p>") == null)
    // unclosed title runs to EOF but tags inside still drop
    assert(title("<title>cut <b>bold</b>") == "cut bold")
  }

  test("html hostile: unclosed/garbage structures never throw") {
    val cases = Seq("<", "<p", "<script>never closed", "<!-- open",
      "<title", "&#xZZ;", "&#99999999999;", "a<b>c" * 1000,
      "<<<>>>", "</>", "\u0000<p>\u0000</p>", "&" * 500)
    for (c <- cases) { text(c); title(c) } // completing is the test
    assert(text("<script>never closed") == "")
    assert(text("&#xZZ;x") == "&#xZZ;x") // bad numeric stays literal
    // surrogate-range NCRs map to U+FFFD (HTML spec), never lone surrogates
    assert(text("a&#xD800;b") == "a�b")
    assert(text("a&#xDFFF;b") == "a�b")
    assert(text("a&#55296;b") == "a�b")
    assert(text("ok&#x1F600;ok") == "ok😀ok") // astral still fine
  }

  test("html_main_text: boilerplate classification laws") {
    val good = ("word " * 17).trim // 84 chars -> text-dense, always kept
    def main(h: String): String = WebTextUtil.mainText(h)
    // long text-dense block kept; link-dense block dropped
    assert(main(s"<p>${good}</p>") == good)
    assert(main("<nav><a href='/'>Home</a> <a href='/a'>About page</a> " +
      "<a href='/c'>Contact us</a></nav>") == "")
    // a link-DENSE long block drops even at good length (3*link > len)
    val linky = (1 to 12).map(i => s"<a href='/$i'>related item $i</a>")
      .mkString(" ")
    assert(main(s"<div>$linky</div>") == "")
    // short stub dropped; title excluded; script/style/comments excluded
    assert(main("<p>tiny stub</p>") == "")
    assert(main(s"<title>My Title</title><p>${good}</p>") == good)
    assert(main(s"<script>var x=1;</script><style>p{}</style>" +
      s"<!-- c --><p>${good}</p>") == good)
    // short-block resolution: a headline/caption next to good content
    // is kept; the same block surrounded by bad blocks is dropped
    val headline = "A forty-character headline for the test" // 39 chars
    assert(main(s"<h1>$headline</h1><p>${good}</p>") ==
      s"$headline\n${good}")
    assert(main(s"<nav><a href='/'>Home page link</a></nav>" +
      s"<p>$headline</p>" +
      s"<div><a href='/x'>Another link-only sidebar</a></div>") == "")
    // document edge with no good neighbor counts as bad
    assert(main(s"<p>$headline</p>") == "")
    // inline tags do not split a block: <b>/<span> inside one paragraph
    val styled = s"<p>${"word " * 8}<b>bold</b> <span>${"word " * 8}</span></p>"
    assert(main(styled) == ("word " * 8 + "bold " + ("word " * 8).trim))
    // html_blocks exposes the decisions
    val blocks = WebTextUtil.htmlBlocks(
      s"<nav><a href='/'>Home About Contact</a></nav><p>${good}</p>")
    assert(blocks.map(b => (b.kept, b.linkLen > 0)) ==
      Seq((false, true), (true, false)))
    // hostile sweep: never throws
    for (h <- Seq("", "<", "<p", "<a href", "</a></a>", "&#xZZ;",
      "<div" * 200, "a<p>b</p>" * 500)) main(h)
  }

  test("html_anchors: labels, nesting recovery, skipped regions, hostile") {
    val a = WebTextUtil.htmlAnchors _
    assert(a("""<a href="http://x.com/">Click <b>here</b> now</a>""") ==
      Seq(("http://x.com/", "Click here now")))
    // entities decode in text and href; image-only anchor -> ""
    assert(a("<a href=\"/p?a=1&amp;b=2\">A &amp; B</a>" +
      "<a href='/i'><img src=x></a>") ==
      Seq(("/p?a=1&b=2", "A & B"), ("/i", "")))
    // unclosed anchor auto-closes at the next <a (browser recovery)
    assert(a("""<a href="/1">one <a href="/2">two</a>""") ==
      Seq(("/1", "one"), ("/2", "two")))
    // </abbr> is not </a>; comments inside drop; hrefless anchors skip
    assert(a("""<a href="/x">an <abbr>abbr</abbr><!-- c --> end</a>""") ==
      Seq(("/x", "an abbr end")))
    assert(a("""<a name="top">no href</a>""") == Nil)
    // href parity with html_links
    val page = """<a href="/1">x</a><p><a href='/2'>y</a></p>"""
    assert(a(page).map(_._1) == WebTextUtil.htmlLinks(page))
    // script/CSS bodies inside an open anchor never leak into the
    // label (raw-element skip, same rule as the outer scan) — and a
    // </a> inside a script string does not close the anchor
    assert(a("<a href='/s'>go<script>var x = 1; //</a></script> now</a>") ==
      Seq(("/s", "go now")))
    assert(a("<a href='/c'>big<style>.a{color:red}</style> sale</a>") ==
      Seq(("/c", "big sale")))
    // hostile: never throws, unclosed tail collected to EOF
    for (h <- Seq("<a", "<a href", "<a href=\"", "<a href='/x'>unclosed",
      "</a></a>", "<a href=/x>" + "t" * 10000,
      "<a href='/x'>t<script>unclosed raw", "<a href='/x'><style>")) a(h)
    assert(a("<a href='/x'>tail runs out") == Seq(("/x", "tail runs out")))
  }

  test("html_markdown: headings, lists, tables, code, inline, hostile") {
    val md = WebTextUtil.htmlMarkdown _
    // block structure: headings + paragraphs + blank-line separation
    assert(md("<h1>Top</h1><p>Body text</p><h3>Sub</h3>") ==
      "# Top\n\nBody text\n\n### Sub")
    // lists: markers, ordered counters, nesting indents, tight joins,
    // and two ADJACENT lists stay separate structures
    assert(md("<ul><li>a<ul><li>a1</li><li>a2</li></ul></li><li>b</li></ul>" +
      "<ol><li>one</li><li>two</li></ol>") ==
      "- a\n  - a1\n  - a2\n- b\n\n1. one\n2. two")
    // fenced code: inner tags dropped, entities decoded, whitespace
    // preserved; inline code backticked
    assert(md("<pre><code>if (a &lt; b) {\n  go()\n}</code></pre>" +
      "<p>call <code>go()</code> now</p>") ==
      "```\nif (a < b) {\n  go()\n}\n```\n\ncall `go()` now")
    // tables: header separator sized to the th row, data rows tight
    assert(md("<table><tr><th>k</th><th>v</th></tr>" +
      "<tr><td>a</td><td>1</td></tr><tr><td>b</td><td>2</td></tr></table>") ==
      "| k | v |\n| --- | --- |\n| a | 1 |\n| b | 2 |")
    // headerless table: no separator row
    assert(md("<table><tr><td>a</td><td>1</td></tr></table>") ==
      "| a | 1 |")
    // inline: emphasis, links, images, hard breaks, blockquote per line
    assert(md("<p><b>B</b> <em>E</em> <a href=\"/x?a=1&amp;b=2\">go</a> " +
      "<img src='/i.png' alt='pic'></p>") ==
      "**B** *E* [go](/x?a=1&b=2) ![pic](/i.png)")
    assert(md("<blockquote>line one<br>line two</blockquote>") ==
      "> line one\n> line two")
    assert(md("<blockquote><blockquote>deep</blockquote></blockquote>") ==
      "> > deep")
    // script/style/title excluded; unknown tags word-separate
    assert(md("<title>T</title><script>var a=1;</script>" +
      "<p>only<span>this</span></p>") == "only this")
    // hrefless anchor contributes no link syntax
    assert(md("<p><a name='top'>plain</a></p>") == "plain")
    // hostile: never throws; nesting caps hold; linear time on floods
    val deep = "<ul><li>" * 100 + "x" + "</li></ul>" * 100
    md(deep)
    val t0 = System.nanoTime()
    md(("<p>word</p>" * 20000) + "<pre>" + ("a\n" * 20000))
    val ms = (System.nanoTime() - t0) / 1e6
    assert(ms < 2000, s"looks quadratic: $ms ms")
    for (h <- Seq("", "<", "<table><td>", "<pre>", "</pre>", "<li>loose</li>",
      "</ul></ol></blockquote>", "<a href='/x'>unclosed <b>bold",
      "<table><tr><th>h</th>", "&#xZZ;<h7>not a heading</h7>")) md(h)
  }

  test("html_meta: key sources, first-wins, charset, hostile") {
    val m = (h: String) => WebTextUtil.htmlMeta(h).toMap
    val page = "<head><meta charset='UTF-8'>" +
      "<meta name=\"Robots\" content=\"noindex\">" +
      "<meta http-equiv=\"Refresh\" content=\"5\">" +
      "<meta property=\"og:type\" content=\"article\">" +
      "<meta name=\"robots\" content=\"dup loses\">" +
      "<meta name=\"nocontent\">" + // content-less: skipped
      "<!-- <meta name=\"c\" content=\"no\"> -->" +
      "<script>var s='<meta name=\"s\" content=\"no\">';</script></head>"
    assert(m(page) == Map("charset" -> "UTF-8", "robots" -> "noindex",
      "refresh" -> "5", "og:type" -> "article"))
    // attribute-name boundaries: longname/namex do not match name
    assert(m("<meta longname=\"x\" content=\"y\">") == Map())
    assert(m("<meta namex=\"x\" content=\"y\">") == Map())
    // <meta is a word boundary: <metadata> is not a meta tag
    assert(m("<metadata name=\"x\" content=\"y\"></metadata>") == Map())
    // hostile: floods capped, garbage never throws
    val flood = "<meta name=\"k0\" content=\"v\">" * 1 +
      (1 to 5000).map(i => s"<meta name='k$i' content='v'>").mkString
    assert(WebTextUtil.htmlMeta(flood).size == WebTextUtil.MaxMetaEntries)
    for (h <- Seq("<meta", "<meta name", "<meta name=", "<meta name='x'",
      "", "<" * 300)) WebTextUtil.htmlMeta(h)
  }

  test("url_parse: shapes, ports, userinfo, IPv6, registered domain") {
    assert(WebTextUtil.parseUrl("HTTP://WWW.Ex.COM:80/P?q=1#f") ==
      ("http", "www.ex.com", 80, "/P", "q=1"))
    assert(WebTextUtil.parseUrl("https://user:pw@Host.Net./") ==
      ("https", "host.net", -1, "/", null))
    assert(WebTextUtil.parseUrl("http://[::1]:8080/x") ==
      ("http", "[::1]", 8080, "/x", null))
    assert(WebTextUtil.parseUrl("http://[::1]/x") ==
      ("http", "[::1]", -1, "/x", null))
    assert(WebTextUtil.parseUrl("http://ex.com") ==
      ("http", "ex.com", -1, "/", null))
    // fragment before query chars: ? inside fragment is not a query
    assert(WebTextUtil.parseUrl("http://ex.com/p#frag?notq") ==
      ("http", "ex.com", -1, "/p", null))
    // out-of-range ports (>65535) are not ports: the split is not taken
    assert(WebTextUtil.parseUrl("http://ex.com:65535/x") ==
      ("http", "ex.com", 65535, "/x", null))
    assert(WebTextUtil.parseUrl("http://ex.com:65536/x") ==
      ("http", "ex.com:65536", -1, "/x", null))
    assert(WebTextUtil.parseUrl("http://ex.com:99999/x") ==
      ("http", "ex.com:99999", -1, "/x", null))
    assert(WebTextUtil.parseUrl("no-scheme.com/x") == null)
    assert(WebTextUtil.parseUrl("http://") == null)
    assert(WebTextUtil.parseUrl("ht tp://x.com") == null)
    assert(WebTextUtil.registeredDomain("a.b.example.co.uk") == "example.co.uk")
    assert(WebTextUtil.registeredDomain("a.example.com") == "example.com")
    assert(WebTextUtil.registeredDomain("example.com") == "example.com")
    assert(WebTextUtil.registeredDomain("localhost") == "localhost")
    assert(WebTextUtil.registeredDomain("10.0.0.1") == "10.0.0.1")
  }

  test("url_canonical: dedup-key invariances and preserved semantics") {
    val c = WebTextUtil.canonicalizeUrl _
    // spelling variants of one page map to one key
    val canon = "http://site.example.com/page"
    assert(c("HTTP://SITE.Example.COM:80/page") == canon)
    assert(c("http://site.example.com/page#top") == canon)
    assert(c("http://site.example.com/page?utm_source=a&gclid=1") == canon)
    // non-tracking params survive IN ORDER; non-default ports survive
    assert(c("http://ex.com/p?b=2&utm_x=1&a=1") == "http://ex.com/p?b=2&a=1")
    assert(c("https://ex.com:444/p") == "https://ex.com:444/p")
    assert(c("https://ex.com:443/p") == "https://ex.com/p")
    assert(c("not a url") == null)
  }

  test("html_links: quote styles, entities, skipped regions, hostile") {
    val links = WebTextUtil.htmlLinks _
    assert(links("""<a href="http://a.com/x">t</a>""") == Seq("http://a.com/x"))
    assert(links("""<a class="z" HREF='http://b.com/'>t</a>""") ==
      Seq("http://b.com/"))
    assert(links("""<a href=http://c.com/u >t</a>""") == Seq("http://c.com/u"))
    // entity-decoded; relative links pass through untouched
    assert(links("""<a href="/p?a=1&amp;b=2">t</a>""") == Seq("/p?a=1&b=2"))
    // comments/script content skipped; <abbr is not <a; empty href dropped
    assert(links("""<!-- <a href="http://no.com/"> -->
      <script>var s='<a href="http://nope.com/">';</script>
      <abbr href="http://not-anchor.com/">x</abbr>
      <a href="">e</a><a name="n">no href</a>
      <A href="http://yes.com/">Y</A>""") == Seq("http://yes.com/"))
    // hostile: unclosed tags/quotes never throw
    for (h <- Seq("<a href=\"unclosed", "<a href=", "<a", "<a >",
      "<a href='x", "<" * 100))
      links(h)
    assert(links("<a href=\"unclosed") == Seq())
  }

  test("fix_text: latin1 and cp1252 mojibake repair; no false repairs") {
    val fix = WebTextUtil.fixMojibake _
    def breakAs(s: String, cs: String): String =
      new String(s.getBytes("UTF-8"), java.nio.charset.Charset.forName(cs))
    // latin1-routed mojibake: 2- and 3-byte sequences
    assert(fix(breakAs("café", "ISO-8859-1")) == "café")
    assert(fix(breakAs("em — dash № 7", "ISO-8859-1")) == "em — dash № 7")
    assert(fix(breakAs("добрый день", "ISO-8859-1")) == "добрый день")
    assert(fix(breakAs("日本語テスト", "ISO-8859-1")) == "日本語テスト")
    // cp1252-routed mojibake: 0x80-0x9F bytes come back as €/™/quotes
    assert(fix(breakAs("curly “quote — ok", "windows-1252")) ==
      "curly “quote — ok")
    assert(fix(breakAs("€100 ™ œuf", "windows-1252")) == "€100 ™ œuf")
    // bytes UNDEFINED in cp1252 (0x9D in ”) decode to U+FFFD upstream —
    // the information is destroyed before repair can see it; the run
    // stays as-is rather than guessing
    assert(fix(breakAs("”", "windows-1252")).contains('�'))
    // legitimate latin1-ish text never changes: a lone é is invalid UTF-8
    assert(fix("café") == "café")
    assert(fix("naïve résumé") == "naïve résumé")
    assert(fix("plain ascii stays") == "plain ascii stays")
    assert(fix("math: 3 × 4 ÷ 2") == "math: 3 × 4 ÷ 2")
    // idempotent on already-repaired text
    assert(fix(fix(breakAs("café №", "ISO-8859-1"))) == "café №")
    assert(fix("") == "")
  }

  test("normalize_text: NFC composes, NFD decomposes, NFKC folds; bad form null") {
    val n = (s: String, f: String) => {
      val r = WebTextUtil.normalizeText(
        org.apache.spark.unsafe.types.UTF8String.fromString(s),
        org.apache.spark.unsafe.types.UTF8String.fromString(f))
      if (r == null) null else r.toString
    }
    assert(n("é", "NFC") == "é")
    assert(n("é", "NFD") == "é")
    assert(n("ﬁle ①", "NFKC") == "file 1")
    assert(n("x", "nfc") == "x") // case-insensitive form
    assert(n("x", "NFX") == null)
  }

  test("expressions run through codegen and SQL registration") {
    import spark.implicits._
    val rows = Seq(
      ("<p>A &amp; B</p>", "http://EX.com:80/p?utm_source=1&k=2"))
      .toDF("html", "url")
      .select(
        graft.functions.web.html_text(col("html")).as("t"),
        graft.functions.web.url_canonical(col("url")).as("c"),
        graft.functions.web.url_parse(col("url")).as("u"))
      .select(col("t"), col("c"), col("u.registered_domain"), col("u.port"))
      .collect()
    assert(rows.head.getString(0) == "A & B")
    assert(rows.head.getString(1) == "http://ex.com/p?k=2")
    assert(rows.head.getString(2) == "ex.com")
    assert(rows.head.getInt(3) == 80)
    val viaSql = spark.sql("SELECT html_title('<title>T</title>') t, " +
      "url_canonical('HTTP://A.com/#f') c").collect().head
    assert(viaSql.getString(0) == "T" && viaSql.getString(1) == "http://a.com/")
  }
}
