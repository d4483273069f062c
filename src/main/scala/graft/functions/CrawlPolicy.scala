package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Crawl-policy + sentence-boundary kernels.
  *
  * robots.txt evaluation is the gate between "URL discovered" and "URL
  * fetched/kept": compliance filtering of a crawl dump is a per-row
  * decision over (domain's robots payload, URL path), which this kernel
  * makes inside codegen — the policy join broadcasts robots bodies (a
  * few KB per domain) rather than shuffling documents.
  *
  * Semantics follow the de-facto standard (RFC 9309): records grouped
  * under User-agent lines (a group may list several agents), most
  * specific agent match wins ('*' is the fallback), within the group the
  * LONGEST matching rule path wins, Allow beats Disallow on equal
  * length, and an empty Disallow means allow-all. Only prefix rules are
  * implemented; '*' wildcards inside rule paths match any span and '$'
  * anchors the end.
  */
object CrawlPolicyUtil {

  val ruleSchema: StructType = StructType(Seq(
    StructField("agent", StringType, nullable = false),
    StructField("directive", StringType, nullable = false),
    StructField("path", StringType, nullable = false)))

  /** Rule-count cap (crawlers conventionally parse at most ~500 KB of
    * robots.txt; a hostile multi-MB body must not amplify into millions
    * of rule tuples that then sit in the per-thread memo). Rules past
    * the cap are dropped — for a file that large the policy is
    * effectively unparseable anyway. */
  val MaxRules: Int = 4096

  /** Parsed (agent, directive, path) rows — allow/disallow rules fanned
    * out per agent of their group; comments and unknown directives
    * dropped. Null for null input only (an empty/meaningless file is an
    * empty array: everything allowed). Bounded by [[MaxRules]]. */
  def parseRules(txt: String): Seq[(String, String, String)] = {
    val rules = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
    var agents = List.empty[String]
    var groupOpen = false // false once rules started: next UA starts a new group
    for (raw <- txt.split("\n")) {
      val line = {
        val h = raw.indexOf('#')
        (if (h >= 0) raw.substring(0, h) else raw).trim
      }
      if (line.nonEmpty) {
        val colon = line.indexOf(':')
        if (colon > 0) {
          val key = line.substring(0, colon).trim.toLowerCase
          val value = line.substring(colon + 1).trim
          key match {
            case "user-agent" =>
              if (!groupOpen) agents = Nil
              agents = value.toLowerCase :: agents
              groupOpen = true
            case "allow" | "disallow" =>
              groupOpen = false
              for (a <- agents if rules.size < MaxRules)
                rules += ((a, key, value))
            case _ => groupOpen = false // crawl-delay, sitemap, unknown
          }
        }
      }
    }
    rules.toSeq
  }

  /** True when `rulePath` (with '*' spans and an optional trailing '$'
    * end anchor) matches a prefix of `path`. Empty rule paths match
    * nothing (an empty Disallow = allow-all by standard). */
  def ruleMatches(rulePath: String, path: String): Boolean = {
    if (rulePath.isEmpty) return false
    val anchored = rulePath.endsWith("$")
    val body =
      if (anchored) rulePath.substring(0, rulePath.length - 1) else rulePath
    // prefix match == full match of body+'*'; standard single-backtrack
    // greedy wildcard match, O(|pat|*|path|) even on hostile star runs
    val pat = if (anchored) body else body + "*"
    var pi = 0
    var si = 0
    var star = -1
    var mark = 0
    while (si < path.length) {
      if (pi < pat.length && pat.charAt(pi) == '*') {
        star = pi; mark = si; pi += 1
      } else if (pi < pat.length && pat.charAt(pi) == path.charAt(si)) {
        pi += 1; si += 1
      } else if (star >= 0) {
        pi = star + 1; mark += 1; si = mark
      } else return false
    }
    while (pi < pat.length && pat.charAt(pi) == '*') pi += 1
    pi == pat.length
  }

  /** Effective rule length for specificity ordering (a '$' anchor does
    * not add specificity over the same literal). */
  private def ruleLen(rulePath: String): Int =
    if (rulePath.endsWith("$")) rulePath.length - 1 else rulePath.length

  /** RFC 9309 decision for (robots body, agent, path): the most
    * specific matching agent's group (exact token containment beats the
    * '*' fallback), longest matching rule wins, Allow beats Disallow on
    * ties, no matching rule = allowed. */
  /** Per-thread memo of parsed robots bodies: a compliance filter
    * evaluates ONE domain's policy for thousands of that domain's URLs
    * (domain-sorted or broadcast-joined input), and re-parsing per row
    * would dominate the decision. 64 entries, access-ordered; keys are
    * the body text (hit cost = one string equality, far below a parse). */
  private val ruleCache: ThreadLocal[java.util.LinkedHashMap[String, Seq[(String, String, String)]]] =
    new ThreadLocal[java.util.LinkedHashMap[String, Seq[(String, String, String)]]] {
      override def initialValue() =
        new java.util.LinkedHashMap[String, Seq[(String, String, String)]](
          64, 0.75f, true) {
          override def removeEldestEntry(
              e: java.util.Map.Entry[String, Seq[(String, String, String)]]): Boolean =
            size() > 64
        }
    }

  private def parseRulesCached(txt: String): Seq[(String, String, String)] = {
    // don't let hostile multi-MB bodies pin 64x their size as cache keys
    if (txt.length > 512 * 1024) return parseRules(txt)
    val m = ruleCache.get()
    var r = m.get(txt)
    if (r == null) {
      r = parseRules(txt)
      m.put(txt, r)
    }
    r
  }

  def allowed(txt: String, agent: String, path: String): Boolean = {
    val rules = parseRulesCached(txt)
    val a = agent.toLowerCase
    // agent specificity: exact/substring token match > '*'
    val named = rules.filter(r => r._1 != "*" && a.contains(r._1))
    val pool =
      if (named.nonEmpty) {
        val best = named.map(_._1.length).max
        named.filter(_._1.length == best)
      } else rules.filter(_._1 == "*")
    var bestLen = -1
    var bestAllow = true
    for ((_, directive, rp) <- pool if ruleMatches(rp, path)) {
      val len = ruleLen(rp)
      val isAllow = directive == "allow"
      if (len > bestLen || (len == bestLen && isAllow && !bestAllow)) {
        bestLen = len
        bestAllow = isAllow
      }
    }
    bestLen < 0 || bestAllow
  }

  /** Crawl-delay (seconds) for the most specific agent group, or null
    * when no applicable group declares one. Not in RFC 9309 but the
    * de-facto politeness contract most large sites publish; group
    * selection mirrors [[allowed]] (named-agent groups shadow '*'),
    * the last declaration of the winning pool applies, and unparseable
    * or negative values are ignored. */
  def crawlDelay(txt: String, agent: String): java.lang.Double = {
    val delays = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    var agents = List.empty[String]
    var groupOpen = false
    for (raw <- txt.split("\n")) {
      val line = {
        val h = raw.indexOf('#')
        (if (h >= 0) raw.substring(0, h) else raw).trim
      }
      if (line.nonEmpty) {
        val colon = line.indexOf(':')
        if (colon > 0) {
          val key = line.substring(0, colon).trim.toLowerCase
          val value = line.substring(colon + 1).trim
          key match {
            case "user-agent" =>
              if (!groupOpen) agents = Nil
              agents = value.toLowerCase :: agents
              groupOpen = true
            case "crawl-delay" =>
              groupOpen = false
              try {
                val d = java.lang.Double.parseDouble(value)
                if (d >= 0 && !d.isNaN && !d.isInfinite)
                  for (a <- agents if delays.size < MaxRules)
                    delays += ((a, d))
              } catch { case _: NumberFormatException => () }
            case _ => groupOpen = false
          }
        }
      }
    }
    val a = agent.toLowerCase
    val named = delays.filter(d => d._1 != "*" && a.contains(d._1))
    val pool =
      if (named.nonEmpty) {
        val best = named.map(_._1.length).max
        named.filter(_._1.length == best)
      } else delays.filter(_._1 == "*")
    if (pool.isEmpty) null else Double.box(pool.last._2)
  }

  def crawlDelayU(txt: UTF8String, agent: UTF8String): Any =
    crawlDelay(txt.toString, agent.toString)

  /** `Sitemap:` directive URLs in declaration order (site-wide, outside
    * any agent group per the original sitemaps.org extension); case of
    * the URL preserved, empty values dropped, bounded by [[MaxRules]]. */
  def robotsSitemaps(txt: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    for (raw <- txt.split("\n") if out.size < MaxRules) {
      val line = {
        val h = raw.indexOf('#')
        (if (h >= 0) raw.substring(0, h) else raw).trim
      }
      val colon = line.indexOf(':')
      if (colon > 0 &&
        line.substring(0, colon).trim.toLowerCase == "sitemap") {
        val v = line.substring(colon + 1).trim
        if (v.nonEmpty) out += v
      }
    }
    out.toSeq
  }

  def robotsSitemapsArray(txt: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      robotsSitemaps(txt.toString).map(x =>
        UTF8String.fromString(x): Any).toArray)

  def rulesArray(txt: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val rows = parseRules(txt.toString).map { case (a, d, p) =>
      InternalRow(UTF8String.fromString(a), UTF8String.fromString(d),
        UTF8String.fromString(p)): Any
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows.toArray)
  }

  def allowedU(txt: UTF8String, agent: UTF8String, path: UTF8String): Boolean =
    allowed(txt.toString, agent.toString, path.toString)

  // ------------------------------------------------------------ sentences

  /** Abbreviations that do NOT end a sentence even before an uppercase
    * start (the deterministic high-frequency slice; a full list is data,
    * not code). Lowercase, with the trailing dot. */
  private val Abbrev = Set("mr.", "mrs.", "ms.", "dr.", "prof.", "st.",
    "vs.", "etc.", "e.g.", "i.e.", "fig.", "no.", "jr.", "sr.", "inc.",
    "ltd.", "co.", "u.s.", "a.m.", "p.m.")

  /** Split into sentences: a boundary is [.!?]+ (plus closing quotes /
    * brackets) followed by whitespace and an uppercase letter, digit, or
    * opening quote — unless the terminator belongs to a known
    * abbreviation or a single capital initial ("J. Smith"). Whitespace
    * around sentences is trimmed; empty pieces dropped. */
  def splitSentences(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '.' || c == '!' || c == '?') {
        var j = i + 1
        while (j < s.length && (s.charAt(j) == '.' || s.charAt(j) == '!' ||
          s.charAt(j) == '?' || s.charAt(j) == '"' || s.charAt(j) == '\'' ||
          s.charAt(j) == ')' || s.charAt(j) == ']')) j += 1
        val hasGap = j < s.length && Character.isWhitespace(s.charAt(j))
        var k = j
        while (k < s.length && Character.isWhitespace(s.charAt(k))) k += 1
        val upNext = k < s.length &&
          (Character.isUpperCase(s.charAt(k)) ||
            Character.isDigit(s.charAt(k)) ||
            s.charAt(k) == '"' || s.charAt(k) == '“')
        val boundary = (hasGap && upNext) || j >= s.length
        if (boundary && c == '.') {
          // last token before the dot, dot included
          var t = i - 1
          while (t >= 0 && !Character.isWhitespace(s.charAt(t))) t -= 1
          val token = s.substring(t + 1, i + 1).toLowerCase
          val initial = i - t - 1 == 1 &&
            Character.isUpperCase(s.charAt(i - 1))
          if (!Abbrev.contains(token) && !initial) {
            val piece = s.substring(start, j).trim
            if (piece.nonEmpty) out += piece
            start = k
          }
        } else if (boundary) {
          val piece = s.substring(start, j).trim
          if (piece.nonEmpty) out += piece
          start = k
        }
        i = j
      } else i += 1
    }
    val tail = s.substring(start).trim
    if (tail.nonEmpty) out += tail
    out.toSeq
  }

  def splitSentencesArray(s: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      splitSentences(s.toString).map(x =>
        UTF8String.fromString(x): Any).toArray)

  // ------------------------------------------------------------- sitemaps

  val sitemapEntrySchema: StructType = StructType(Seq(
    StructField("loc", StringType, nullable = false),
    StructField("lastmod", StringType, nullable = true),
    StructField("changefreq", StringType, nullable = true),
    StructField("priority", DoubleType, nullable = true)))

  /** Per-file entry cap — the sitemaps.org protocol caps a sitemap at
    * 50,000 URLs; entries past it are dropped (a file that large is
    * out of protocol anyway). */
  val MaxSitemapEntries: Int = 50000

  /** ASCII-case-insensitive startsWith (t must be lowercase ASCII). */
  private def startsAtIC(s: String, i: Int, t: String): Boolean = {
    if (i < 0 || i + t.length > s.length) return false
    var k = 0
    while (k < t.length) {
      if (Character.toLowerCase(s.charAt(i + k)) != t.charAt(k)) return false
      k += 1
    }
    true
  }

  private def indexOfIC(s: String, t: String, from: Int, until: Int): Int = {
    var i = math.max(from, 0)
    val lim = math.min(until, s.length) - t.length
    while (i <= lim) {
      if (startsAtIC(s, i, t)) return i
      i += 1
    }
    -1
  }

  /** Index AFTER '>' of the next `<name ...>` opening tag in
    * [from, until), requiring a real name boundary (so `<url` does not
    * match `<urlset`). -1 when absent. The `until` bound is what keeps
    * per-entry field lookups O(entry span): without it a corpus of
    * loc-only entries would re-scan to end-of-document for every absent
    * optional field — a hostile quadratic. */
  private def findElem(s: String, from: Int, until: Int, name: String): Int = {
    val probe = "<" + name
    var i = from
    while (i >= 0 && i < until) {
      i = indexOfIC(s, probe, i, until)
      if (i < 0) return -1
      val after = i + probe.length
      if (after >= s.length) return -1
      val c = s.charAt(after)
      if (c == '>') return after + 1
      if (Character.isWhitespace(c) || c == '/') {
        val gt = s.indexOf('>', after)
        return if (gt < 0) -1 else gt + 1
      }
      i = after
    }
    -1
  }

  /** Minimal XML entity decode for element text (the five predefined
    * entities plus numeric references — the sitemap protocol requires
    * URLs entity-escaped). */
  private def decodeXmlEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        val name = if (semi > i && semi <= i + 10) s.substring(i + 1, semi)
          else null
        val code: Int = name match {
          case "amp" => '&'
          case "lt" => '<'
          case "gt" => '>'
          case "quot" => '"'
          case "apos" => '\''
          case null => -1
          case n if n.length > 1 && n.charAt(0) == '#' =>
            try {
              val v = if (n.charAt(1) == 'x' || n.charAt(1) == 'X')
                Integer.parseInt(n.substring(2), 16)
              else Integer.parseInt(n.substring(1))
              if (v >= 0xd800 && v <= 0xdfff) 0xfffd
              else if (v > 0 && v <= 0x10ffff) v else -1
            } catch { case _: NumberFormatException => -1 }
          case _ => -1
        }
        if (code >= 0) { out.appendCodePoint(code); i = semi + 1 }
        else { out.append('&'); i += 1 }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** Trimmed, entity-decoded text of the FIRST `<name>` child inside
    * [from, end), or null. */
  private def elemText(s: String, from: Int, end: Int, name: String): String = {
    val open = findElem(s, from, end, name)
    if (open < 0 || open >= end) return null
    val close = indexOfIC(s, "</" + name, open, end)
    val stop = if (close < 0) end else close
    val t = decodeXmlEntities(s.substring(open, stop).trim)
    if (t.isEmpty) null else t
  }

  /** Next `<url ...>` or `<sitemap ...>` opening tag at or past `from`,
    * in ONE left-to-right scan — two independent per-name searches
    * would rescan the whole tail for the absent name on every entry (a
    * urlset never contains `<sitemap>` at all), a hostile quadratic.
    * Returns (index after '>', close tag) or null. */
  private def nextEntry(s: String, from: Int): (Int, String) = {
    var i = from
    while (i >= 0 && i < s.length) {
      i = s.indexOf('<', i)
      if (i < 0) return null
      var name: String = null
      if (startsAtIC(s, i, "<url")) name = "url"
      else if (startsAtIC(s, i, "<sitemap")) name = "sitemap"
      if (name != null) {
        val after = i + 1 + name.length
        if (after >= s.length) return null
        val c = s.charAt(after)
        if (c == '>') return (after + 1, "</" + name)
        if (Character.isWhitespace(c) || c == '/') {
          val gt = s.indexOf('>', after)
          return if (gt < 0) null else (gt + 1, "</" + name)
        }
        // name-boundary miss (<urlset, <sitemapindex): keep scanning
      }
      i += 1
    }
    null
  }

  /** Document kind: "urlset" (a sitemap of pages), "sitemapindex" (a
    * sitemap of sitemaps), or null — whichever root element appears
    * first. */
  def sitemapKind(xml: String): String = {
    val us = findElem(xml, 0, xml.length, "urlset")
    val si = findElem(xml, 0, xml.length, "sitemapindex")
    if (us < 0 && si < 0) null
    else if (si < 0 || (us >= 0 && us < si)) "urlset"
    else "sitemapindex"
  }

  /** Entries of a sitemap OR sitemap index, in document order: one row
    * per `<url>` / `<sitemap>` element with a non-empty `<loc>` —
    * (loc, lastmod, changefreq, priority). Index entries naturally
    * carry null changefreq/priority. Unparseable priorities are null;
    * entries without a loc are skipped (the protocol requires one).
    * Bounded by [[MaxSitemapEntries]]; a truncated trailing element
    * yields its fields up to end-of-input. */
  def sitemapEntries(xml: String): Seq[InternalRow] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var i = 0
    while (i < xml.length && out.size < MaxSitemapEntries) {
      val ne = nextEntry(xml, i)
      val (open, closeTag) = if (ne == null) (-1, null) else ne
      if (open < 0) i = xml.length
      else {
        val close = indexOfIC(xml, closeTag, open, xml.length)
        val end = if (close < 0) xml.length else close
        val loc = elemText(xml, open, end, "loc")
        if (loc != null) {
          val pr = elemText(xml, open, end, "priority")
          val prD: Any =
            if (pr == null) null
            else try java.lang.Double.parseDouble(pr)
            catch { case _: NumberFormatException => null }
          out += InternalRow(
            UTF8String.fromString(loc),
            Option(elemText(xml, open, end, "lastmod"))
              .map(UTF8String.fromString).orNull,
            Option(elemText(xml, open, end, "changefreq"))
              .map(UTF8String.fromString).orNull,
            prD)
        }
        i = if (close < 0) xml.length else close + closeTag.length
      }
    }
    out.toSeq
  }

  def sitemapKindU(xml: UTF8String): UTF8String = {
    val k = sitemapKind(xml.toString)
    if (k == null) null else UTF8String.fromString(k)
  }

  def sitemapEntriesArray(xml: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      sitemapEntries(xml.toString).map(x => x: Any).toArray)
}

/** Codegen'd robots.txt parse: `robots_rules(str)` ->
  * ARRAY<struct(agent, directive, path)>. */
case class RobotsRules(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(CrawlPolicyUtil.ruleSchema, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"robots_rules expects STRING, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    CrawlPolicyUtil.rulesArray(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CrawlPolicyUtil.rulesArray($c)")

  override protected def withNewChildInternal(newChild: Expression): RobotsRules =
    copy(child = newChild)
}

/** Codegen'd robots.txt decision: `robots_allowed(txt, agent, path)` —
  * RFC 9309 longest-match with Allow-beats-Disallow ties and the '*'
  * agent fallback. */
case class RobotsAllowed(txt: Expression, agent: Expression, path: Expression)
    extends TernaryExpression {
  override def first: Expression = txt
  override def second: Expression = agent
  override def third: Expression = path
  override def dataType: DataType = BooleanType
  override def nullable: Boolean =
    txt.nullable || agent.nullable || path.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (txt.dataType == StringType && agent.dataType == StringType &&
      path.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"robots_allowed expects (STRING, STRING, STRING), got " +
        s"(${txt.dataType}, ${agent.dataType}, ${path.dataType})")

  override def nullSafeEval(t: Any, a: Any, p: Any): Any =
    CrawlPolicyUtil.allowedU(t.asInstanceOf[UTF8String],
      a.asInstanceOf[UTF8String], p.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, a, p) =>
      s"graft.functions.CrawlPolicyUtil.allowedU($t, $a, $p)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): RobotsAllowed =
    copy(txt = newFirst, agent = newSecond, path = newThird)
}

/** Codegen'd sentence segmentation: `split_sentences(str)` ->
  * ARRAY<STRING> with abbreviation- and initial-aware boundaries. */
case class SplitSentences(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"split_sentences expects STRING, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    CrawlPolicyUtil.splitSentencesArray(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CrawlPolicyUtil.splitSentencesArray($c)")

  override protected def withNewChildInternal(newChild: Expression): SplitSentences =
    copy(child = newChild)
}

/** Codegen'd crawl-delay lookup: `crawl_delay(txt, agent)` -> seconds
  * (DOUBLE) from the most specific agent group, null when undeclared. */
case class CrawlDelay(txt: Expression, agent: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def left: Expression = txt
  override def right: Expression = agent
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (txt.dataType == StringType && agent.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"crawl_delay expects (STRING, STRING), got " +
        s"(${txt.dataType}, ${agent.dataType})")

  override def nullSafeEval(t: Any, a: Any): Any =
    CrawlPolicyUtil.crawlDelayU(t.asInstanceOf[UTF8String],
      a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, a) => {
      val r = ctx.freshName("delay")
      s"""
      Object $r = graft.functions.CrawlPolicyUtil.crawlDelayU($t, $a);
      if ($r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ((Double) $r).doubleValue(); }"""
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CrawlDelay =
    copy(txt = newLeft, agent = newRight)
}

/** Codegen'd robots sitemap discovery: `robots_sitemaps(txt)` ->
  * ARRAY<STRING> of Sitemap: directive URLs in declaration order. */
case class RobotsSitemaps(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"robots_sitemaps expects STRING, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    CrawlPolicyUtil.robotsSitemapsArray(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CrawlPolicyUtil.robotsSitemapsArray($c)")

  override protected def withNewChildInternal(newChild: Expression): RobotsSitemaps =
    copy(child = newChild)
}

/** Codegen'd sitemap kind: `sitemap_kind(str)` -> 'urlset' /
  * 'sitemapindex' / null. */
case class SitemapKind(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sitemap_kind expects STRING, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    CrawlPolicyUtil.sitemapKindU(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.CrawlPolicyUtil.sitemapKindU($c);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(newChild: Expression): SitemapKind =
    copy(child = newChild)
}

/** Codegen'd sitemap parse: `sitemap_entries(str)` ->
  * ARRAY<struct(loc, lastmod, changefreq, priority)> for both urlset
  * and sitemapindex documents (sitemaps.org protocol). */
case class SitemapEntries(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(CrawlPolicyUtil.sitemapEntrySchema, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sitemap_entries expects STRING, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    CrawlPolicyUtil.sitemapEntriesArray(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CrawlPolicyUtil.sitemapEntriesArray($c)")

  override protected def withNewChildInternal(newChild: Expression): SitemapEntries =
    copy(child = newChild)
}

/** Column wrappers for the crawl-policy kernels. */
object crawl {
  import org.apache.spark.sql.GraftBridge

  def robots_rules(c: Column): Column =
    GraftBridge.column(RobotsRules(GraftBridge.expression(c)))

  def robots_allowed(txt: Column, agent: Column, path: Column): Column =
    GraftBridge.column(RobotsAllowed(GraftBridge.expression(txt),
      GraftBridge.expression(agent), GraftBridge.expression(path)))

  def split_sentences(c: Column): Column =
    GraftBridge.column(SplitSentences(GraftBridge.expression(c)))

  def sitemap_kind(c: Column): Column =
    GraftBridge.column(SitemapKind(GraftBridge.expression(c)))

  def sitemap_entries(c: Column): Column =
    GraftBridge.column(SitemapEntries(GraftBridge.expression(c)))

  def crawl_delay(txt: Column, agent: Column): Column =
    GraftBridge.column(CrawlDelay(GraftBridge.expression(txt),
      GraftBridge.expression(agent)))

  def robots_sitemaps(c: Column): Column =
    GraftBridge.column(RobotsSitemaps(GraftBridge.expression(c)))
}
