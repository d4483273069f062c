package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.CrawlPolicyUtil

/** robots.txt evaluation (RFC 9309 longest-match semantics, wildcard
  * rule paths, agent-group selection) and sentence segmentation
  * (abbreviations, initials, terminator runs) — plus hostile input. */
class CrawlPolicySpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("crawlpolicy-test")

  private val robots =
    """# comment
      |User-agent: *
      |Disallow: /tmp
      |Allow: /tmp/keep
      |Crawl-delay: 2
      |
      |User-agent: badbot
      |User-agent: meanbot
      |Disallow: /
      |
      |User-agent: nicebot
      |Disallow:
      |Sitemap: http://x.example/sitemap.xml
      |""".stripMargin

  test("robots: group selection, longest match, allow ties, empty disallow") {
    val ok = (a: String, p: String) => CrawlPolicyUtil.allowed(robots, a, p)
    // '*' group
    assert(ok("somebot", "/page"))
    assert(!ok("somebot", "/tmp/x"))
    assert(ok("somebot", "/tmp/keep/x")) // longer Allow wins
    // multi-agent group: both names blocked everywhere
    assert(!ok("badbot/2.0", "/page"))
    assert(!ok("MeanBot", "/tmp/keep/x")) // named group SHADOWS '*'
    // empty Disallow = allow-all
    assert(ok("nicebot", "/tmp/x"))
    // no rules at all
    assert(CrawlPolicyUtil.allowed("", "any", "/p"))
    assert(CrawlPolicyUtil.allowed("garbage no colons", "any", "/p"))
  }

  test("robots: wildcard and end-anchored rule paths, hostile star runs") {
    val txt = "User-agent: *\nDisallow: /*.pdf$\nDisallow: /dl/*/raw\n"
    val ok = (p: String) => CrawlPolicyUtil.allowed(txt, "bot", p)
    assert(!ok("/docs/file.pdf"))
    assert(ok("/docs/file.pdf.html")) // '$' anchors the end
    assert(!ok("/dl/a/b/raw"))
    assert(!ok("/dl/x/rawstuff")) // prefix rule: /dl/*/raw matches prefix
    assert(ok("/dl/x/ra"))
    // hostile: long star runs must stay linear-ish, not exponential
    val hostile = "User-agent: *\nDisallow: /" + "*" * 64 + "a$\n"
    val t0 = System.nanoTime()
    assert(!CrawlPolicyUtil.allowed(hostile, "bot", "/" + "b" * 2000 + "a"))
    assert(CrawlPolicyUtil.allowed(hostile, "bot", "/" + "b" * 2000))
    assert((System.nanoTime() - t0) < 2e9, "wildcard match too slow")
  }

  test("robots: parse rows fan out per agent of the group") {
    val rules = CrawlPolicyUtil.parseRules(robots)
    assert(rules.count(_._1 == "*") == 2)
    assert(rules.filter(_._1 == "badbot") ==
      Seq(("badbot", "disallow", "/")))
    assert(rules.filter(_._1 == "meanbot") ==
      Seq(("meanbot", "disallow", "/")))
    assert(rules.filter(_._1 == "nicebot") ==
      Seq(("nicebot", "disallow", "")))
  }

  test("robots: hostile rule floods are capped, decisions still sane") {
    val flood = "User-agent: *\n" +
      (1 to 100000).map(i => s"Disallow: /x$i").mkString("\n")
    assert(CrawlPolicyUtil.parseRules(flood).size ==
      CrawlPolicyUtil.MaxRules)
    // paths outside the flood stay allowed; an in-cap rule still blocks
    assert(CrawlPolicyUtil.allowed(flood, "bot", "/elsewhere"))
    assert(!CrawlPolicyUtil.allowed(flood, "bot", "/x1/page"))
  }

  test("sentences: terminators, abbreviations, initials, runs") {
    val split = CrawlPolicyUtil.splitSentences _
    assert(split("One. Two! Three?") == Seq("One.", "Two!", "Three?"))
    assert(split("Dr. Smith met Mr. Jones. They left.") ==
      Seq("Dr. Smith met Mr. Jones.", "They left."))
    assert(split("J. Smith wrote it. Fine.") ==
      Seq("J. Smith wrote it.", "Fine."))
    assert(split("Really?! Yes... and no. ok then") ==
      Seq("Really?!", "Yes... and no. ok then")) // lowercase 'ok': no split
    assert(split("End with \"quote.\" Next one.") ==
      Seq("End with \"quote.\"", "Next one."))
    assert(split("v2.5 is out. It works.") ==
      Seq("v2.5 is out.", "It works.")) // dot inside token: no split
    assert(split("No terminator at all") == Seq("No terminator at all"))
    assert(split("") == Seq())
    assert(split("   ") == Seq())
  }

  test("expressions and SQL registration") {
    import spark.implicits._
    val rows = Seq(("User-agent: *\nDisallow: /x\n", "/x/1", "a. B c."))
      .toDF("robots", "path", "text")
      .select(
        graft.functions.crawl.robots_allowed(col("robots"), lit("bot"),
          col("path")).as("ok"),
        size(graft.functions.crawl.robots_rules(col("robots"))).as("n"),
        graft.functions.crawl.split_sentences(col("text")).as("sents"))
      .collect()
    assert(!rows.head.getBoolean(0))
    assert(rows.head.getInt(1) == 1)
    assert(rows.head.getSeq[String](2) == Seq("a.", "B c."))
    val viaSql = spark.sql(
      "SELECT robots_allowed('User-agent: *\nAllow: /', 'b', '/p') a, " +
        "size(split_sentences('Hi there. Bye.')) n").collect().head
    assert(viaSql.getBoolean(0) && viaSql.getInt(1) == 2)
  }

  test("sitemap: urlset entries, entity-escaped locs, optional fields") {
    import graft.functions.CrawlPolicyUtil
    val xml = """<?xml version="1.0" encoding="UTF-8"?>
      <urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        <url><loc> https://ex.com/a?x=1&amp;y=2 </loc>
          <lastmod>2024-06-01</lastmod>
          <changefreq>weekly</changefreq><priority>0.9</priority></url>
        <url><loc>https://ex.com/b</loc></url>
        <url><lastmod>2024-01-01</lastmod></url>
        <url><loc>https://ex.com/c</loc><priority>high</priority></url>
      </urlset>"""
    assert(CrawlPolicyUtil.sitemapKind(xml) == "urlset")
    val es = CrawlPolicyUtil.sitemapEntries(xml)
    // the loc-less entry is skipped (protocol requires loc)
    assert(es.size == 3)
    assert(es(0).getUTF8String(0).toString == "https://ex.com/a?x=1&y=2")
    assert(es(0).getUTF8String(1).toString == "2024-06-01")
    assert(es(0).getUTF8String(2).toString == "weekly")
    assert(es(0).getDouble(3) == 0.9)
    assert(es(1).getUTF8String(0).toString == "https://ex.com/b")
    assert(es(1).isNullAt(1) && es(1).isNullAt(2) && es(1).isNullAt(3))
    // unparseable priority -> null, entry survives
    assert(es(2).getUTF8String(0).toString == "https://ex.com/c")
    assert(es(2).isNullAt(3))
  }

  test("sitemap: index documents, tag-name boundaries, case, hostile") {
    import graft.functions.CrawlPolicyUtil
    val idx = "<SITEMAPINDEX><SITEMAP><LOC>https://ex.com/s1.xml</LOC>" +
      "<LASTMOD>2024-02-02</LASTMOD></SITEMAP>" +
      "<sitemap><loc>https://ex.com/s2.xml</loc></sitemap></SITEMAPINDEX>"
    assert(CrawlPolicyUtil.sitemapKind(idx) == "sitemapindex")
    val es = CrawlPolicyUtil.sitemapEntries(idx)
    assert(es.size == 2)
    assert(es(0).getUTF8String(0).toString == "https://ex.com/s1.xml")
    assert(es(0).getUTF8String(1).toString == "2024-02-02")
    assert(es(1).getUTF8String(0).toString == "https://ex.com/s2.xml")
    // <url never matches <urlset's prefix: a bare urlset root is no entry
    assert(CrawlPolicyUtil.sitemapEntries("<urlset></urlset>").isEmpty)
    assert(CrawlPolicyUtil.sitemapKind("<html><body>nope</body>") == null)
    assert(CrawlPolicyUtil.sitemapKind("") == null)
    // truncated trailing element still yields its loc
    val trunc = "<urlset><url><loc>https://ex.com/t</loc><lastmod>2024"
    val te = CrawlPolicyUtil.sitemapEntries(trunc)
    assert(te.size == 1 &&
      te(0).getUTF8String(0).toString == "https://ex.com/t")
    // hostile sweep: prefixes never throw
    val full = idx + "<urlset><url><loc>x</loc></url></urlset>"
    for (n <- 0 to full.length)
      CrawlPolicyUtil.sitemapEntries(full.substring(0, n))
  }

  test("crawl_delay and robots_sitemaps: groups, shadowing, junk values") {
    import graft.functions.CrawlPolicyUtil
    val txt = "Sitemap: https://e.com/a.xml\n" +
      "User-agent: fastbot\nCrawl-delay: 0.25\n\n" +
      "User-agent: *\nCrawl-delay: 5\nDisallow: /x\n" +
      "Sitemap: https://e.com/b.xml"
    // named group shadows '*'; '*' serves everyone else
    assert(CrawlPolicyUtil.crawlDelay(txt, "FastBot/1.0") == 0.25)
    assert(CrawlPolicyUtil.crawlDelay(txt, "otherbot") == 5.0)
    // no applicable group -> null
    assert(CrawlPolicyUtil.crawlDelay(
      "User-agent: x\nCrawl-delay: 3", "y") == null)
    // junk / negative values are ignored, later valid one wins
    assert(CrawlPolicyUtil.crawlDelay(
      "User-agent: *\nCrawl-delay: soon\nCrawl-delay: -2\nCrawl-delay: 7",
      "b") == 7.0)
    // sitemaps: declaration order, case preserved, group-independent
    assert(CrawlPolicyUtil.robotsSitemaps(txt) ==
      Seq("https://e.com/a.xml", "https://e.com/b.xml"))
    assert(CrawlPolicyUtil.robotsSitemaps("User-agent: *\nAllow: /").isEmpty)
  }

  test("frontier scale mode: salted two-phase top-k selects identically") {
    import spark.implicits._
    import graft.operators.Crawl
    import org.apache.spark.sql.functions.col
    // one giant domain (500 candidates, budget 7) plus a singleton: the
    // global top-budget is always a subset of the union of per-salt
    // top-budgets, so the pruned two-phase mode must pick the SAME urls
    // with the SAME ranks as the full audit mode
    val cands = ((1 to 500).map(i =>
      (f"http://big.com/p$i%04d", ((i * 37) % 211).toLong)) ++
      Seq(("http://small.com/x", 5L))).toDF("url", "score")
    val robots = Seq(("big.com", "User-agent: *\nAllow: /"))
      .toDF("domain", "robots_txt")
    val budgets = Seq(("big.com", 7L)).toDF("domain", "budget")
    def run(audit: Boolean) = Crawl.frontierSample(cands, "url", "bot",
      robots, budgets, 3L, Some("score"), auditAll = audit)
    val full = run(audit = true).where(col("selected")).collect()
      .map(r => (r.getString(0), r.getLong(3))).toSet
    val fast = run(audit = false).collect()
      .map(r => (r.getString(0), r.getLong(3))).toSet
    assert(fast == full)
    assert(full.count(_._1.startsWith("http://big.com")) == 7)
    assert(full.count(_._1.startsWith("http://small.com")) == 1)
  }

  test("frontierDelta: zero-state == batch; spend and done arithmetic") {
    import spark.implicits._
    import graft.operators.Crawl
    import org.apache.spark.sql.functions.col
    val cands = Seq(
      ("http://a.com/p1", 9L), ("http://a.com/p2", 8L),
      ("http://a.com/p3", 7L), ("http://b.com/q1", 1L)
    ).toDF("url", "score")
    val robots = Seq(("a.com", "User-agent: *\nAllow: /"))
      .toDF("domain", "robots_txt")
    val budgets = Seq(("a.com", 2L)).toDF("domain", "budget")
    val noSpent = Seq.empty[(String, Long)].toDF("domain", "n_selected")
    val noDone = Seq.empty[(String, String)].toDF("k", "url").select("url")
    def sel(d: org.apache.spark.sql.DataFrame) =
      d.where(col("selected")).collect().map(_.getString(0)).toSet
    // no spend, no history: identical to the batch operator
    assert(sel(Crawl.frontierDelta(cands, "url", "bot", robots, budgets,
      1L, noSpent, noDone, Some("score"))) ==
      sel(Crawl.frontierSample(cands, "url", "bot", robots, budgets, 1L,
        Some("score"))))
    // one unit of a.com's budget already spent: only the top-1 survives
    val spent1 = Seq(("a.com", 1L)).toDF("domain", "n_selected")
    assert(sel(Crawl.frontierDelta(cands, "url", "bot", robots, budgets,
      1L, spent1, noDone, Some("score"))) ==
      Set("http://a.com/p1", "http://b.com/q1"))
    // overspent domains clamp to zero, never negative
    val spent9 = Seq(("a.com", 9L)).toDF("domain", "n_selected")
    assert(sel(Crawl.frontierDelta(cands, "url", "bot", robots, budgets,
      1L, spent9, noDone, Some("score"))) == Set("http://b.com/q1"))
    // already-done URLs are excluded BEFORE ranking: the next one in
    // score order takes the slot
    val done = Seq("HTTP://A.com:80/p1").toDF("url") // canonical match
    assert(sel(Crawl.frontierDelta(cands, "url", "bot", robots, budgets,
      1L, spent1, done, Some("score"))) ==
      Set("http://a.com/p2", "http://b.com/q1"))
  }

  test("frontierDelta scale mode: salted prune on the REMAINING budget " +
    "selects identically at a hot host") {
    import spark.implicits._
    import graft.operators.Crawl
    import org.apache.spark.sql.functions.col
    // one giant domain (500 candidates, budget 9, of which 2 already
    // spent -> remaining 7) plus a singleton, and a handful of the hot
    // host's URLs already done: the pruned mode must select exactly the
    // audit mode's rows WITH the same ranks — the prune cap must be the
    // remaining budget, not the raw one
    val cands = ((1 to 500).map(i =>
      (f"http://big.com/p$i%04d", ((i * 37) % 211).toLong)) ++
      Seq(("http://small.com/x", 5L))).toDF("url", "score")
    val robots = Seq(("big.com", "User-agent: *\nAllow: /"))
      .toDF("domain", "robots_txt")
    val budgets = Seq(("big.com", 9L)).toDF("domain", "budget")
    val spent = Seq(("big.com", 2L)).toDF("domain", "n_selected")
    val done = (1 to 10).map(i => f"http://big.com/p$i%04d").toDF("url")
    def run(audit: Boolean) = Crawl.frontierDelta(cands, "url", "bot",
      robots, budgets, 3L, spent, done, Some("score"), auditAll = audit)
    val full = run(audit = true).where(col("selected")).collect()
      .map(r => (r.getString(0), r.getLong(3))).toSet
    val fast = run(audit = false).collect()
      .map(r => (r.getString(0), r.getLong(3))).toSet
    assert(fast == full)
    assert(full.count(_._1.startsWith("http://big.com")) == 7)
    assert(full.count(_._1.startsWith("http://small.com")) == 1)
  }

  test("recrawlSet: canonical collapse, max lastmod/fetch, hostile dates") {
    import spark.implicits._
    import graft.operators.Crawl
    val entries = Seq(
      ("HTTP://A.com:80/p", "2026-01-01"), // collapses with the next row,
      ("http://a.com/p", "2026-05-01"),    // latest lastmod wins
      ("http://b.com/q", "9999-junk"),     // unparseable -> age rule
      ("http://c.com/r", "2026-06-01")     // never fetched
    ).toDF("loc", "lastmod")
    val log = Seq(
      ("http://a.com/p#frag", "2026-03-01"), // collapses with the next,
      ("http://a.com/p", "2026-04-01"),      // latest fetch wins
      ("http://b.com/q", "2026-07-20")
    ).toDF("url", "last_fetched")
    val out = Crawl.recrawlSet(entries, log, "2026-08-01", maxAgeDays = 30)
      .collect().map(r => r.getString(0) ->
        (r.getBoolean(3), r.getString(4))).toMap
    assert(out.size == 3)
    assert(out("http://a.com/p") == ((true, "modified"))) // 05-01 > 04-01
    assert(out("http://b.com/q") == ((false, "fresh")))   // 12 days < 30
    assert(out("http://c.com/r") == ((true, "never_fetched")))
    // the same world with a 10-day age bar: the undeclared URL ages out
    val aged = Crawl.recrawlSet(entries, log, "2026-08-01", maxAgeDays = 10)
      .collect().map(r => r.getString(0) -> r.getString(4)).toMap
    assert(aged("http://b.com/q") == "aged_out")
  }

  test("recrawlSet: junk lastmod never shadows a parseable date; " +
    "mixed W3C forms compare as instants") {
    import spark.implicits._
    import graft.operators.Crawl
    val entries = Seq(
      // a hostile sitemap entry sorts above every ISO date
      // lexicographically — it must LOSE to the parseable declaration
      ("http://a.com/p", "not-a-date"),
      ("http://a.com/p", "2026-05-01"),
      // mixed offset forms on one URL: the -05:00 evening IS the later
      // instant (04:30Z on the 2nd beats 01:00Z on the 2nd) though its
      // string sorts LOWER — lexicographic max would pick the wrong
      // representative day
      ("http://b.com/q", "2026-05-01T23:30:00-05:00"),
      ("http://b.com/q", "2026-05-02T01:00:00Z"),
      // all-junk URL keeps the raw-string max and falls to the age rule
      ("http://c.com/r", "junk"),
      ("http://c.com/r", "also-junk")
    ).toDF("loc", "lastmod")
    val log = Seq(
      ("http://a.com/p", "2026-04-01"),
      ("http://b.com/q", "2026-05-01"),
      ("http://c.com/r", "2026-07-30")
    ).toDF("url", "last_fetched")
    val out = Crawl.recrawlSet(entries, log, "2026-08-01", maxAgeDays = 90)
      .collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(4))).toMap
    assert(out("http://a.com/p") == (("2026-05-01", "modified")))
    // the -05:00 form won the max (later instant); its declared-day
    // prefix (05-01) is not > the 05-01 fetch, so the URL stays fresh
    // at the documented day granularity
    assert(out("http://b.com/q") ==
      (("2026-05-01T23:30:00-05:00", "fresh")))
    assert(out("http://c.com/r") == (("junk", "fresh")))
  }

  test("sitemap: large loc-only urlset parses in linear time") {
    import graft.functions.CrawlPolicyUtil
    // loc-only entries are the hostile shape for per-entry field lookups:
    // an unbounded search for the absent optional fields (or for the
    // never-present <sitemap> tag) would rescan the tail per entry —
    // quadratic. ~0.9 MB / 20k entries must parse in linear time.
    val xml = "<urlset>" + (1 to 20000)
      .map(i => s"<url><loc>https://e.com/$i</loc></url>").mkString +
      "</urlset>"
    val t0 = System.nanoTime()
    val es = CrawlPolicyUtil.sitemapEntries(xml)
    val ms = (System.nanoTime() - t0) / 1e6
    assert(es.size == 20000)
    assert(ms < 2000, s"looks quadratic: $ms ms for 20k loc-only entries")
  }

  test("frontier: dedup, robots, budget default, deterministic ranking") {
    import spark.implicits._
    import graft.operators.Crawl
    val cands = Seq(
      ("HTTP://A.com:80/p1#frag", 9L), // canonicalizes with the next row
      ("http://a.com/p1", 5L),         // ...highest score wins the dedup
      ("http://a.com/p2", 8L),
      ("http://a.com/p3", 7L),
      ("http://a.com/private/x", 99L), // robots-blocked, never ranked
      ("http://b.com/q1", 1L),         // no robots row -> allowed
      ("http://b.com/q2", 2L),         // no budget row -> default applies
      ("not a url", 50L)               // unparseable -> dropped
    ).toDF("url", "score")
    val robots = Seq(("a.com", "User-agent: *\nDisallow: /private"))
      .toDF("domain", "robots_txt")
    val budgets = Seq(("a.com", 2L)).toDF("domain", "budget")
    val out = Crawl.frontierSample(cands, "url", "bot", robots, budgets,
        defaultBudget = 1L, scoreCol = Some("score"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))).toMap
    assert(out.size == 5) // 3 on a.com (dup collapsed, private dropped) + 2
    assert(out("http://a.com/p1") == ((9L, 1L, 2L, true))) // max(9,5) kept
    assert(out("http://a.com/p2") == ((8L, 2L, 2L, true)))
    assert(out("http://a.com/p3") == ((7L, 3L, 2L, false))) // past budget
    assert(out("http://b.com/q2") == ((2L, 1L, 1L, true))) // default budget
    assert(out("http://b.com/q1") == ((1L, 2L, 1L, false)))
    assert(!out.contains("http://a.com/private/x"))
    // unscored mode: the hash priority is deterministic across runs
    val h1 = Crawl.frontierSample(cands, "url", "bot", robots, budgets, 1L)
      .orderBy("url").collect().toSeq
    val h2 = Crawl.frontierSample(cands, "url", "bot", robots, budgets, 1L)
      .orderBy("url").collect().toSeq
    assert(h1 == h2 && h1.nonEmpty)
  }

  test("politeness invariant: budgets -> frontier -> schedule composed " +
    "never violates a host's declared contract") {
    import spark.implicits._
    import graft.operators.Crawl
    import graft.functions.CrawlPolicyUtil
    import org.apache.spark.sql.functions.col
    // The three operators are individually gated; this law pins the
    // COMPOSED contract so they can never drift apart: for every host
    // in a fetchSchedule output, (a) the selected count stays within
    // budgetsFromRobots' window allowance, (b) consecutive fetch_at_ms
    // gaps are >= the host's declared Crawl-delay, (c) every scheduled
    // URL is robots-allowed for the agent. Planted policies sweep the
    // interesting shapes: declared delays, zero delay (unthrottled),
    // junk delay, no robots at all, and a Disallow the candidates probe.
    val agent = "graftbot"
    val windowSec = 60.0
    val robotsRows = Seq(
      ("h0.com", "User-agent: *\nCrawl-delay: 10\nDisallow: /no"),
      ("h1.com", "User-agent: *\nCrawl-delay: 2.5"),
      ("h2.com", "User-agent: *\nCrawl-delay: 0"),          // unthrottled
      ("h3.com", "User-agent: *\nCrawl-delay: soon"),       // junk -> default
      ("h4.com", s"User-agent: $agent\nCrawl-delay: 30\n" +
        "User-agent: *\nCrawl-delay: 1"))                   // named group wins
      // h5.com has no robots row at all
    val robots = robotsRows.toDF("domain", "robots_txt")
    val cands = (for (h <- 0 to 5; i <- 1 to 40) yield (
      s"http://h$h.com" + (if (i % 7 == 0) s"/no/$i" else s"/p/$i"),
      ((i * 31 + h) % 97).toLong)).toDF("url", "score")
    val budgets = Crawl.budgetsFromRobots(robots, agent, windowSec,
      defaultBudget = 8L)
    val sel = Crawl.frontierSample(cands, "url", agent, robots, budgets,
      defaultBudget = 8L, scoreCol = Some("score"))
    val sched = Crawl.fetchSchedule(sel, robots, agent,
      defaultDelaySec = 0.5).collect()
    assert(sched.nonEmpty)
    val robotsMap = robotsRows.toMap
    val byHost = sched.groupBy(_.getString(1))
    assert(byHost.keySet == Set("h0.com", "h1.com", "h2.com", "h3.com",
      "h4.com", "h5.com"))
    for ((host, rows) <- byHost) {
      val declared = robotsMap.get(host)
        .flatMap(t => Option(CrawlPolicyUtil.crawlDelay(t, agent))
          .map(_.doubleValue))
        .filter(_ > 0)
      // (a) count <= floor(window / delay) (declared), else the default
      val allowance = declared.map(d =>
        math.max(math.floor(windowSec / d).toLong, 1L)).getOrElse(8L)
      assert(rows.length <= allowance, s"$host over budget")
      // (b) consecutive gaps >= declared delay (default-delay hosts get
      // the scheduler's default spacing)
      val gapFloorMs = (declared.getOrElse(0.5) * 1000).toLong
      val times = rows.map(_.getLong(4)).sorted
      for (Array(a, b) <- times.sliding(2).map(_.toArray))
        assert(b - a >= gapFloorMs, s"$host gap $a -> $b under $gapFloorMs")
      // (c) robots compliance for every scheduled URL
      for (r <- rows; txt <- robotsMap.get(host)) {
        val path = r.getString(0).replaceFirst("^https?://[^/]+", "")
        assert(CrawlPolicyUtil.allowed(txt, agent, path),
          s"disallowed ${r.getString(0)} scheduled")
      }
    }
  }
}
