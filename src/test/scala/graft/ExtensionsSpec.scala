package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Content, Tables}

/** SQL registration of custom expressions via SparkSessionExtensions, and
  * zlib content round-trip through the mapPartitions decompressor.
  */
class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("ext-test")

  /** True when the plan contains any hash/merge equi-join operator. */
  private def hasEquiJoin(plan: String): Boolean =
    Seq("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
      .exists(plan.contains)

  test("custom expressions are callable from SQL") {
    val r = spark.sql(
      "SELECT stable_hash64('abc') AS h, poly_hash('abc') AS p").collect().head
    assert(r.getLong(0) == -8070080442485551184L)
    // fold: ((0*31+97)%M*31+98)%M*31+99 = 97*961 + 98*31 + 99
    assert(r.getLong(1) == (97L * 31 * 31 + 98L * 31 + 99L))
    val dot = spark.sql(
      "SELECT float_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))," +
        " array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
      .collect().head.getDouble(0)
    assert(dot == 11.0)
  }

  test("round-10 crawl-ingest registrations are callable from SQL") {
    // every function registered this round answers through the SQL name,
    // so a registration typo cannot rot silently behind the Column API
    val r = spark.sql(
      "SELECT decompress_text(compress_bytes(CAST('t' AS BINARY), 'zstd'), 'auto') AS a," +
        " codec_sniff(compress_bytes(CAST('t' AS BINARY), 'gzip')) AS b," +
        " size(gzip_members(compress_bytes(CAST('t' AS BINARY), 'gzip'))) AS c," +
        " warc_record(CAST('WARC/1.0\r\nK: v\r\n\r\nbody' AS BINARY)).headers['K'] AS d," +
        " html_text('<p>x &amp; y</p>') AS e," +
        " html_title('<title>T</title>') AS f," +
        " html_links('<a href=\"http://x.com/\">l</a>')[0] AS g," +
        " url_parse('http://a.b.com/p').registered_domain AS h," +
        " url_canonical('HTTP://A.com:80/p#f') AS i," +
        " fix_text('cafÃ©') AS j," +
        " normalize_text('é', 'NFC') AS k," +
        " robots_allowed('User-agent: *\nDisallow: /x', 'b', '/x/y') AS l," +
        " size(robots_rules('User-agent: *\nDisallow: /x')) AS m," +
        " size(split_sentences('One. Two.')) AS n," +
        " byte_sum(CAST('ab' AS BINARY)) AS o," +
        " size(container_tracks(synth_mp4(CAST(7 AS BIGINT), true))) AS p," +
        " size(gif_frame_meta(synth_anim(CAST(3 AS BIGINT), 0))) AS q," +
        " size(gif_frames_composited(synth_anim(CAST(3 AS BIGINT), 0))) AS r," +
        " byte_sum(image_resize(synth_gradient(CAST(0 AS BIGINT), 3, 3)," +
        "   3, 3, 1, 1)) AS s" // gradient a=1,b=1,c=0: center pixel = 2
    ).collect().head
    assert(r.getString(0) == "t")
    assert(r.getString(1) == "gzip")
    assert(r.getInt(2) == 1)
    assert(r.getString(3) == "v")
    assert(r.getString(4) == "x & y")
    assert(r.getString(5) == "T")
    assert(r.getString(6) == "http://x.com/")
    assert(r.getString(7) == "b.com")
    assert(r.getString(8) == "http://a.com/p")
    assert(r.getString(9) == "café")
    assert(r.getString(10) == "é")
    assert(!r.getBoolean(11))
    assert(r.getInt(12) == 1)
    assert(r.getInt(13) == 2)
    assert(r.getLong(14) == 'a' + 'b')
    assert(r.getInt(15) == 2) // video + audio trak
    assert(r.getInt(16) == 4) // synth_anim nFrames = 4 + seed % 3
    assert(r.getInt(17) == r.getInt(16))
    assert(r.getLong(18) == 2L)
  }

  test("round-11 charset registrations are callable from SQL") {
    val r = spark.sql(
      "SELECT decode_text(CAST('plain' AS BINARY)) AS a," +
        " decode_text(CAST('x' AS BINARY), 'charset=utf-8') AS b," +
        " decode_text(CAST('y' AS BINARY), CAST(NULL AS STRING)) AS c," +
        " charset_detect(CAST('z' AS BINARY)) AS d," +
        " charset_detect(CAST('z' AS BINARY), 'text/html; charset=sjis') AS e," +
        " html_main_text(concat('<p>', repeat('word ', 17), '</p>')) AS f," +
        " size(html_blocks('<p>tiny</p><div>x</div>')) AS g," +
        " sitemap_kind('<urlset><url><loc>u</loc></url></urlset>') AS h," +
        " sitemap_entries('<urlset><url><loc>https://e.com/x</loc>" +
        "</url></urlset>')[0].loc AS i," +
        " crawl_delay('User-agent: *\nCrawl-delay: 2.5', 'bot') AS j," +
        " robots_sitemaps('Sitemap: https://e.com/s.xml')[0] AS k," +
        " http_response(CAST('HTTP/1.1 200 OK\r\nA: b\r\n\r\nhi' AS BINARY))" +
        ".status AS l," +
        " CAST(http_dechunk(CAST('2\r\nhi\r\n0\r\n\r\n' AS BINARY)) AS STRING)" +
        " AS m," +
        " CAST(decompress_bytes(compress_bytes(CAST('x' AS BINARY), 'zstd')," +
        " 'auto') AS STRING) AS n," +
        " html_anchors('<a href=\"/l\">the <b>label</b></a>')[0].text AS o," +
        " html_meta('<meta name=\"robots\" content=\"noindex\">')['robots']" +
        " AS p"
    ).collect().head
    assert(r.getString(0) == "plain")
    assert(r.getString(1) == "x")
    assert(r.getString(2) == "y") // null hint = no hint, not a null row
    assert(r.getString(3) == "utf-8")
    assert(r.getString(4) == "shift_jis")
    assert(r.getString(5) == ("word " * 17).trim)
    assert(r.getInt(6) == 2)
    assert(r.getString(7) == "urlset")
    assert(r.getString(8) == "https://e.com/x")
    assert(r.getDouble(9) == 2.5)
    assert(r.getString(10) == "https://e.com/s.xml")
    assert(r.getInt(11) == 200)
    assert(r.getString(12) == "hi")
    assert(r.getString(13) == "x")
    assert(r.getString(14) == "the label")
    assert(r.getString(15) == "noindex")
  }

  test("round-12 registrations are callable from SQL") {
    val r = spark.sql(
      "SELECT html_markdown('<h2>T</h2><ul><li>a</li><li>b</li></ul>') AS a," +
        " header_get(map('Content-Type', 'text/html'), 'content-type') AS b," +
        " header_get(map('X', '1'), 'absent') AS c"
    ).collect().head
    assert(r.getString(0) == "## T\n\n- a\n- b")
    assert(r.getString(1) == "text/html")
    assert(r.isNullAt(2))
  }

  test("array kernels are callable from SQL and match the Scala API") {
    val sh = spark.sql(
      "SELECT word_shingles('a b c d', 3) AS s").collect().head.getSeq[String](0)
    assert(sh == Seq("a b c", "b c d"))
    // minhash over a known hash array: h_0 = min((131*0+7)*h + 3) mod p
    val mh = spark.sql(
      "SELECT minhash_sig(array(CAST(5 AS BIGINT), CAST(9 AS BIGINT)), 2) AS m")
      .collect().head.getSeq[Long](0)
    assert(mh(0) == math.min(7L * 5 + 3, 7L * 9 + 3))
    val b = spark.sql(
      "SELECT sign_lsh_bucket(array(CAST(1.0 AS FLOAT)), 2) AS b")
      .collect().head.getLong(0)
    val viaApi = spark.range(1).select(
      graft.operators.Similarity.signBucket(
        org.apache.spark.sql.functions.array(
          org.apache.spark.sql.functions.lit(1.0f)), 2, 1).as("b"))
      .collect().head.getLong(0)
    assert(b == viaApi)
  }

  test("zlib content decompression round-trips the documents corpus") {
    import spark.implicits._
    val docs = Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    // compress per-partition (the form the principal store keeps), then
    // run the real decompress path and compare
    val compressed = docs.as[(Long, String)]
      .mapPartitions(_.map { case (id, t) =>
        (id, Content.deflate(t.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      }).toDF("doc_id", "content")
    val restored = Content.decompress(compressed, "doc_id", "content")
    val diff = restored.join(docs.withColumnRenamed("text", "orig"), "doc_id")
      .filter(col("text") =!= col("orig")).count()
    assert(diff == 0)
    assert(restored.count() == docs.count())
    // the codegen'd columnar inflate agrees and keeps sibling columns
    val viaExpr = compressed
      .select(col("doc_id"), Content.inflateText(col("content")).as("text"))
    assert(viaExpr.join(docs.withColumnRenamed("text", "orig"), "doc_id")
      .filter(col("text") =!= col("orig")).count() == 0)
  }

  test("content client: reader output and text retrieval by pmid") {
    import spark.implicits._
    def z(s: String) =
      Content.deflate(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val textRefs = Seq((10L, 101L), (20L, 102L), (30L, 103L))
      .toDF("trid", "pmid")
    val textContent = Seq(
      (1L, 10L, "pubmed", "text", "abstract", z("abs one")),
      (2L, 10L, "pmc_oa", "xml", "fulltext", z("full\tone\nline two")),
      (3L, 20L, "pubmed", "text", "abstract", z("abs two")),
    ).toDF("tcid", "trid", "source", "format", "text_type", "content")
    val readings = Seq(
      (100L, 1L, "REACH", "1.0", z("{\"out\":1}")),
      (101L, 1L, "SPARSER", "2.0", z("{\"out\":2}")),
    ).toDF("rid", "tcid", "reader", "reader_version", "bytes")

    val ro = Content.readerOutput(readings, reader = Some("reach"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(ro.toSeq == Seq((1L, "REACH", "{\"out\":1}")))

    val byRef = Content.contentByRefs(textRefs, textContent,
        pmids = Some(Seq(101L, 102L)), sources = Some(Seq("pubmed")))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(byRef == Set((101L, "abs one"), (102L, "abs two")))
    intercept[IllegalArgumentException] {
      Content.contentByRefs(textRefs, textContent)
    }

    val texts = Content.textByPmids(textRefs, textContent,
        Seq(101L), "fulltext")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // tabs -> spaces, then newlines -> tabs, as in the reference
    assert(texts.toSeq == Seq((101L, "full one\tline two")))
  }
  test("inequality-only interval joins auto-rewrite to binned equi-joins") {
    import graft.sources.Tables
    val dir = "/root/testdata/sf0.001"
    Tables.table(spark, dir, "orders").createOrReplaceTempView("rj_orders")
    Tables.table(spark, dir, "lineitem")
      .where(col("l_quantity") > 45)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_shipdate").as("s"),
        (col("l_shipdate") + expr("INTERVAL 3 DAYS")).as("e"))
      .createOrReplaceTempView("rj_iv")
    val sql = """SELECT o.o_orderkey, iv.l_orderkey, iv.l_linenumber
      FROM rj_orders o JOIN rj_iv iv
      ON o.o_orderdate >= iv.s AND o.o_orderdate <= iv.e"""
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

    val rewritten = spark.sql(sql)
    val opt = rewritten.queryExecution.optimizedPlan.toString
    assert(opt.contains("__graft_range_bin"), s"rule did not fire:\n$opt")
    // bounded/overflow split: a Union whose fallback branch carries the
    // re-entry marker
    assert(opt.contains("Union"), s"no overflow split:\n$opt")
    assert(opt.toLowerCase.contains("graftrangefallbackmarker"))
    val got = rows(rewritten)
    // the binned branch must plan as a real equi join (the overflow
    // branch keeps a nested loop, but only over the capped subset —
    // empty here, since every interval is 3 days)
    val finalPlan = rewritten.queryExecution.executedPlan.toString
    assert(hasEquiJoin(finalPlan), s"binned branch not an equi join:\n$finalPlan")

    spark.conf.set("spark.graft.rangeJoin.enabled", "false")
    try {
      val naive = spark.sql(sql)
      assert(naive.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"))
      assert(got == rows(naive))
      assert(got.nonEmpty)
    } finally spark.conf.set("spark.graft.rangeJoin.enabled", "true")

    // mirrored orientation: point side on the right
    val mirrored = spark.sql("""SELECT o.o_orderkey, iv.l_orderkey
      FROM rj_iv iv JOIN rj_orders o
      ON o.o_orderdate >= iv.s AND o.o_orderdate <= iv.e""")
    assert(mirrored.queryExecution.optimizedPlan.toString
      .contains("__graft_range_bin"))
    mirrored.collect()
    assert(hasEquiJoin(mirrored.queryExecution.executedPlan.toString))

    // a join that already has an equi key is left alone
    val equi = spark.sql("""SELECT o.o_orderkey FROM rj_orders o
      JOIN rj_iv iv ON o.o_orderkey = iv.l_orderkey
      AND o.o_orderdate >= iv.s AND o.o_orderdate <= iv.e""")
    assert(!equi.queryExecution.optimizedPlan.toString
      .contains("__graft_range_bin"))
  }
  test("EXISTS / NOT EXISTS range subqueries rewrite to binned semi/anti joins") {
    import graft.sources.Tables
    val dir = "/root/testdata/sf0.001"
    Tables.table(spark, dir, "orders").createOrReplaceTempView("ex_orders")
    Tables.table(spark, dir, "lineitem")
      .where(col("l_quantity") > 45)
      .select(col("l_shipdate").as("s"),
        (col("l_shipdate") + expr("INTERVAL 3 DAYS")).as("e"))
      .createOrReplaceTempView("ex_iv")
    val existsSql = """SELECT o.o_orderkey FROM ex_orders o
      WHERE o.o_totalprice > 1000 AND EXISTS (
        SELECT 1 FROM ex_iv iv
        WHERE o.o_orderdate >= iv.s AND o.o_orderdate <= iv.e)"""
    val notExistsSql = existsSql.replace("AND EXISTS", "AND NOT EXISTS")
    def keys(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.getLong(0)).toSet

    val ex = spark.sql(existsSql)
    val exOpt = ex.queryExecution.optimizedPlan.toString
    assert(exOpt.contains("__graft_range_bin"),
      s"EXISTS rewrite did not fire:\n$exOpt")
    val nex = spark.sql(notExistsSql)
    assert(nex.queryExecution.optimizedPlan.toString
      .contains("__graft_range_bin"), "NOT EXISTS rewrite did not fire")
    val gotEx = keys(ex)
    val gotNex = keys(nex)
    // the two partitions of the o_totalprice-filtered orders
    assert(gotEx.nonEmpty && gotNex.nonEmpty)
    assert(gotEx.intersect(gotNex).isEmpty)

    spark.conf.set("spark.graft.rangeJoin.enabled", "false")
    try {
      val naiveEx = spark.sql(existsSql)
      assert(naiveEx.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"))
      assert(keys(naiveEx) == gotEx)
      assert(keys(spark.sql(notExistsSql)) == gotNex)
    } finally spark.conf.set("spark.graft.rangeJoin.enabled", "true")

    // an EXISTS whose join condition carries an equality stays with the
    // built-in subquery rewrite (hash join, no binning)
    val equi = spark.sql("""SELECT o.o_orderkey FROM ex_orders o
      WHERE EXISTS (SELECT 1 FROM ex_iv iv
        WHERE o.o_orderdate = iv.s AND o.o_orderdate <= iv.e)""")
    assert(!equi.queryExecution.optimizedPlan.toString
      .contains("__graft_range_bin"))
    equi.collect()
  }

  test("interval-overlap theta joins rewrite with a first-shared-bin dedup") {
    import graft.sources.Tables
    val dir = "/root/testdata/sf0.001"
    Tables.table(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderdate").as("os"),
        (col("o_orderdate") + expr("INTERVAL 7 DAYS")).as("oe"))
      .createOrReplaceTempView("rj_oiv")
    Tables.table(spark, dir, "lineitem")
      .where(col("l_quantity") > 45)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_shipdate").as("ss"),
        (col("l_shipdate") + expr("INTERVAL 3 DAYS")).as("se"))
      .createOrReplaceTempView("rj_siv")
    val sql = """SELECT a.o_orderkey, b.l_orderkey, b.l_linenumber
      FROM rj_oiv a JOIN rj_siv b ON a.os <= b.se AND b.ss <= a.oe"""
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))

    val rewritten = spark.sql(sql)
    val opt = rewritten.queryExecution.optimizedPlan.toString
    assert(opt.contains("__graft_range_bin_l") &&
      opt.contains("__graft_range_bin_r"), s"interval form did not fire:\n$opt")
    val got = rows(rewritten)
    // the both-bounded branch must plan as a real equi join on the bins
    assert(hasEquiJoin(rewritten.queryExecution.executedPlan.toString))

    spark.conf.set("spark.graft.rangeJoin.enabled", "false")
    try {
      val naive = rows(spark.sql(sql))
      assert(got.length == naive.length, "duplicate or lost pairs")
      assert(got.toSet == naive.toSet)
      assert(got.nonEmpty)
    } finally spark.conf.set("spark.graft.rangeJoin.enabled", "true")
  }

  test("overflow intervals fall back exactly; outer/semi/anti rewrite too") {
    import graft.sources.Tables
    val dir = "/root/testdata/sf0.001"
    Tables.table(spark, dir, "orders").createOrReplaceTempView("rc_orders")
    // interval side with planted open-ended sentinels (the SCD shape the
    // fan-out cap exists for): 3-day intervals plus rows whose end is
    // 9999-12-31 — ~2.9M one-day bins, far past the 4096-bin cap
    Tables.table(spark, dir, "lineitem")
      .where(col("l_quantity") > 48)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_shipdate").as("s"),
        when(col("l_linenumber") === 1,
          lit("9999-12-31 00:00:00").cast("timestamp_ntz"))
          .otherwise(col("l_shipdate") + expr("INTERVAL 3 DAYS")).as("e"))
      .createOrReplaceTempView("rc_iv")

    def check(sql: String, expectBin: Boolean = true): Unit = {
      val rewritten = spark.sql(sql)
      val opt = rewritten.queryExecution.optimizedPlan.toString
      if (expectBin)
        assert(opt.contains("__graft_range_bin"), s"did not fire:\n$sql\n$opt")
      val got = rewritten.collect().map(_.toSeq).toSeq
        .sortBy(_.mkString("|"))
      spark.conf.set("spark.graft.rangeJoin.enabled", "false")
      try {
        val naive = spark.sql(sql).collect().map(_.toSeq).toSeq
          .sortBy(_.mkString("|"))
        assert(got == naive, s"mismatch for:\n$sql")
        assert(got.nonEmpty, s"vacuous check:\n$sql")
      } finally spark.conf.set("spark.graft.rangeJoin.enabled", "true")
    }

    // inner: sentinel rows must still match every later order (via the
    // fallback branch), bounded rows via the binned branch
    check("""SELECT o.o_orderkey, iv.l_orderkey, iv.l_linenumber
      FROM rc_orders o JOIN rc_iv iv
      ON o.o_orderdate >= iv.s AND o.o_orderdate <= iv.e""")
    // left outer, point side preserved: unmatched orders null-extend
    check("""SELECT o.o_orderkey, iv.l_orderkey
      FROM rc_orders o LEFT JOIN rc_iv iv
      ON o.o_orderdate >= iv.s AND o.o_orderdate <= iv.e""")
    // right outer, point side preserved on the right
    check("""SELECT o.o_orderkey, iv.l_orderkey
      FROM rc_iv iv RIGHT JOIN rc_orders o
      ON o.o_orderdate >= iv.s AND o.o_orderdate <= iv.e""")
    // semi / anti: explicit join syntax (EXISTS subqueries convert to
    // LeftSemi only in the RewriteSubquery batch, after injected rules)
    check("""SELECT o.o_orderkey FROM rc_orders o LEFT SEMI JOIN rc_iv iv
      ON o.o_orderdate >= iv.s AND o.o_orderdate <= iv.e""")
    check("""SELECT o.o_orderkey FROM rc_orders o LEFT ANTI JOIN rc_iv iv
      ON o.o_orderdate >= iv.s AND o.o_orderdate <= iv.e""")
    // outer join preserving the INTERVAL side is declined (exploded rows
    // could not be deduplicated) and must stay untouched
    val declined = spark.sql("""SELECT iv.l_orderkey, o.o_orderkey
      FROM rc_iv iv LEFT JOIN rc_orders o
      ON o.o_orderdate >= iv.s AND o.o_orderdate <= iv.e""")
    assert(!declined.queryExecution.optimizedPlan.toString
      .contains("__graft_range_bin"))

    // REVERSED intervals (end < start — the sentinel landing in the
    // start column) must route to the fallback, not explode backward:
    // these rows match nothing, exactly like the unrewritten join
    Tables.table(spark, dir, "lineitem")
      .where(col("l_quantity") > 48)
      .select(col("l_orderkey"), col("l_linenumber"),
        when(col("l_linenumber") === 1,
          lit("9999-12-31 00:00:00").cast("timestamp_ntz"))
          .otherwise(col("l_shipdate")).as("s"),
        (col("l_shipdate") + expr("INTERVAL 3 DAYS")).as("e"))
      .createOrReplaceTempView("rc_rev")
    check("""SELECT o.o_orderkey, iv.l_orderkey, iv.l_linenumber
      FROM rc_orders o JOIN rc_rev iv
      ON o.o_orderdate >= iv.s AND o.o_orderdate <= iv.e""")
  }

  test("asof_join / range_join table functions match the Scala API") {
    import graft.operators.Temporal
    val dir = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, dir)
    val facts = ev.where(col("event_type") === "purchase")
      .select("user_id", "event_id", "ts")
    val dims = ev.where(col("event_type") =!= "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("t_id"),
        col("event_type").as("t_type"))
    facts.createOrReplaceTempView("tvf_facts")
    dims.createOrReplaceTempView("tvf_dims")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.mkString("|")).sorted.toSeq

    val viaSql = spark.sql("""SELECT user_id, event_id, t_id, t_type
      FROM asof_join('tvf_facts', 'user_id', 'ts', 'tvf_dims', 'user_id',
        'ts', 't_id', 't_id', 't_type')""")
    val viaApi = Temporal.asofJoin(facts, "user_id", "ts",
        dims, "user_id", "ts", payload = Seq("t_id", "t_type"),
        rightTieBreak = "t_id")
      .select("user_id", "event_id", "t_id", "t_type")
    assert(rows(viaSql) == rows(viaApi))
    assert(rows(viaSql).nonEmpty)

    facts.createOrReplaceTempView("tvf_points")
    dims.select(col("ts").as("s"),
        (col("ts") + expr("INTERVAL 2 DAYS")).as("e"), col("t_id"))
      .createOrReplaceTempView("tvf_iv")
    val rangeSql = spark.sql("""SELECT event_id, t_id
      FROM range_join('tvf_points', 'ts', 'tvf_iv', 's', 'e',
        345600000000)""")
    val rangeApi = Temporal.rangeJoin(facts, "ts",
        spark.table("tvf_iv"), "s", "e", binUs = 4L * 86400L * 1000000L)
      .select("event_id", "t_id")
    assert(rows(rangeSql) == rows(rangeApi))
    assert(rows(rangeSql).nonEmpty)
  }
}
