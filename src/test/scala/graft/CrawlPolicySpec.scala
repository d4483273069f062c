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
}
