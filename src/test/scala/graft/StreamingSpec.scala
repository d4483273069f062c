package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables
import graft.streaming.Streams

/** Structured-Streaming semantics: the shared rollup transform must produce
  * identical results via readStream (memory sink, AvailableNow-style drain)
  * and via the batch path; stateful per-key processing via
  * mapGroupsWithState must conserve counts.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("streaming-test")
  val dir = "/root/testdata/sf0.001"

  /** The streaming file source wants a directory; stage the events parquet
    * into one. */
  lazy val eventsDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      d.resolve("events.parquet"))
    d.toString
  }

  test("streaming rollup == batch rollup on the same events") {
    val batchEvents = Tables.events(spark, dir)
    val expected = Streams.hourlyRollup(batchEvents)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet

    val streamEvents = Tables.normalizeTs(spark.readStream
      .schema(Tables.table(spark, dir, "events").schema)
      .parquet(eventsDir))
    val q = Streams.hourlyRollup(streamEvents)
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("rollup_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("rollup_out")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(got == expected)
    } finally q.stop()
  }

  test("streaming WARC ingest == batch: stateless chain, same transform") {
    import graft.sources.Content
    // the full crawl-ingest chain (compress -> member split -> record
    // parse -> charset-aware decode -> url/html extraction) is
    // stateless, so the SAME transform must drain identically through
    // readStream in Append mode. Member 0 declares its charset in the
    // Content-Type header (hint path); member 1 has no header and takes
    // the strict-UTF-8 sniff path.
    def ingested(df: org.apache.spark.sql.DataFrame) = {
      val rec = (i: Int) => graft.functions.codecs.compress_bytes(concat(
        lit("WARC/1.0\r\nWARC-Target-URI: HTTP://S"),
        pmod(col("doc_id"), lit(9)).cast("string"),
        lit(s".Example.COM:80/p/$i?utm_source=x\r\n" +
          (if (i == 0) "Content-Type: text/html; charset=UTF-8\r\n" else "") +
          "\r\n<p>"),
        col("text"), lit("</p>")).cast("binary"), lit("gzip"))
      Content.warcPages(
          df.select(col("doc_id"), concat(rec(0), rec(1)).as("chunk")),
          "doc_id", "chunk")
        .select(col("doc_id"), col("member_idx"),
          graft.functions.web.url_canonical(
            element_at(col("headers"), "WARC-Target-URI")).as("url"),
          concat(col("charset"), lit("|"),
            graft.functions.web.html_text(col("text"))).as("text"))
    }
    val batch = Tables.table(spark, dir, "documents")
    val expected = ingested(batch).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getString(3)))
      .toSet
    assert(expected.size == 1000) // 500 docs x 2 members
    assert(expected.forall(_._3.startsWith("http://s")))
    assert(expected.forall(_._4.startsWith("utf-8|")))
    val docsDir = java.nio.file.Files.createTempDirectory("graft-warc")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/documents.parquet"),
      docsDir.resolve("documents.parquet"))
    val stream = spark.readStream.schema(batch.schema)
      .parquet(docsDir.toString)
    val q = ingested(stream).writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("warc_ingest_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("warc_ingest_out").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getString(3)))
        .toSet
      assert(got == expected)
    } finally q.stop()
  }

  test("streaming quality-funnel report == batch report (shared transform)") {
    import graft.operators.{Curate, TextAnalysis}
    def tagged(df: org.apache.spark.sql.DataFrame) =
      Curate.filterFunnel(
        TextAnalysis.qualityStats(df.select("doc_id", "text"), "text",
            TextAnalysis.langProfiles.head._2)
          .withColumn("lang_pred", TextAnalysis.langId(col("text"))),
        Seq(
          Curate.FilterStage("short", col("n_tokens") >= 60),
          Curate.FilterStage("lang", col("lang_pred") === "en"),
          Curate.FilterStage("ttr", col("ttr") >= 0.5)))
    val batch = Tables.table(spark, dir, "documents")
    val expected = Curate.funnelReport(tagged(batch))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet

    val docsDir = java.nio.file.Files.createTempDirectory("graft-docs")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/documents.parquet"),
      docsDir.resolve("documents.parquet"))
    val stream = spark.readStream.schema(batch.schema).parquet(docsDir.toString)
    val q = Curate.funnelReport(tagged(stream))
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("funnel_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("funnel_out")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == expected)
      assert(got.map(_._2).sum == batch.count())
    } finally q.stop()
  }

  test("streaming preassembly drains incrementally with checkpointed dedup") {
    import spark.implicits._
    def js(subj: String, obj: String) =
      s"""{"type":"Activation","subj":{"name":"$subj"},"obj":{"name":"$obj"}}"""
    val rawDir = java.nio.file.Files.createTempDirectory("raw-stream")
    val ckDir = java.nio.file.Files.createTempDirectory("raw-ck").toString
    val outDir = java.nio.file.Files.createTempDirectory("raw-out").toString

    // batch 1: two unique statements, one duplicated
    Seq((1L, "reach", js("A", "B")), (2L, "reach", js("A", "B")),
        (3L, "sparser", js("C", "D")))
      .toDF("raw_stmt_id", "src", "raw_json")
      .coalesce(1).write.mode("append").parquet(rawDir.toString)
    val q1 = Streams.streamingPreassembly(
      spark, rawDir.toString, ckDir, outDir)
    q1.awaitTermination()
    val after1 = spark.read.parquet(outDir)
    assert(after1.count() == 2)
    assert(after1.select("matches_key").as[String].collect().toSet ==
      Set("Activation(A, B, None)", "Activation(C, D, None)"))

    // batch 2: one already-seen statement, one genuinely new — only the
    // new hash lands (checkpoint state remembers batch 1 across queries)
    Seq((4L, "reach", js("A", "B")), (5L, "medscan", js("E", "F")))
      .toDF("raw_stmt_id", "src", "raw_json")
      .coalesce(1).write.mode("append").parquet(rawDir.toString)
    val q2 = Streams.streamingPreassembly(
      spark, rawDir.toString, ckDir, outDir)
    q2.awaitTermination()
    val after2 = spark.read.parquet(outDir)
    assert(after2.count() == 3)
    assert(after2.filter(col("matches_key") === "Activation(E, F, None)")
      .count() == 1)
  }

  test("streaming near-dup probes the persisted index and grows it per run") {
    import spark.implicits._
    import graft.operators.Dedup
    val base = Tables.table(spark, dir, "documents").select("doc_id", "text")
    Dedup.writeIndex(base, "doc_id", "text", "graft_stream_idx", buckets = 4)
    val docsDir = java.nio.file.Files.createTempDirectory("nd-docs").toString
    val ckDir = java.nio.file.Files.createTempDirectory("nd-ck").toString
    val outDir = java.nio.file.Files.createTempDirectory("nd-out").toString +
      "/pairs"
    // run 1: exact copies of every 5th doc under shifted ids — every pair
    // must come from probing the PERSISTED base index
    val copies = base.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 100000).as("doc_id"), col("text"))
    copies.coalesce(1).write.mode("append").parquet(docsDir)
    Streams.streamingNearDups(spark, docsDir, "graft_stream_idx",
      indexBuckets = 4, ckDir, outDir).awaitTermination()
    val run1 = spark.read.parquet(outDir)
    val planted = copies.select("doc_id").as[Long].collect().toSet
    val found1 = run1.select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(planted.forall(c => found1.contains((c - 100000, c))),
      s"missing planted pairs: ${planted.filterNot(c => found1.contains((c - 100000, c)))}")
    // run 2: exact copies of RUN 1's docs — these pair with the +100000
    // ids only if run 1's batch was appended to the index
    copies.select((col("doc_id") + 100000).as("doc_id"), col("text"))
      .coalesce(1).write.mode("append").parquet(docsDir)
    // run 2 also opts into the in-stream LSM policy: with the base write
    // plus run 1's append on disk the hottest bucket exceeds 1 file, so
    // the batch ends with a compaction
    Streams.streamingNearDups(spark, docsDir, "graft_stream_idx",
      indexBuckets = 4, ckDir, outDir, maxFilesPerBucket = 1)
      .awaitTermination()
    val found2 = spark.read.parquet(outDir)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(planted.forall(c => found2.contains((c, c + 100000))),
      "run-2 docs must match run-1 docs through the grown index")
    assert(Dedup.indexFileCounts(spark, "graft_stream_idx").values.max == 1
      && Dedup.indexFileCounts(spark, "graft_stream_idx", "shingles")
        .values.max == 1,
      "in-stream compaction should have rewritten the index")
  }

  test("streaming frontier == two-step batch delta; spend is exactly-once") {
    import spark.implicits._
    import graft.operators.Crawl
    val candsDir = java.nio.file.Files.createTempDirectory("fr-cands").toString
    val ckDir = java.nio.file.Files.createTempDirectory("fr-ck").toString
    val outDir = java.nio.file.Files.createTempDirectory("fr-out").toString +
      "/sel"
    val robots = Seq(("a.com", "User-agent: *\nAllow: /"))
      .toDF("domain", "robots_txt")
    val budgets = Seq(("a.com", 2L)).toDF("domain", "budget")
    // drain 1: a.com over-subscribed (budget 2), b.com on default budget
    val b1 = Seq(("http://a.com/p1", 9L), ("http://a.com/p2", 8L),
      ("http://a.com/p3", 7L), ("http://b.com/q1", 1L)).toDF("url", "score")
    b1.coalesce(1).write.mode("append").parquet(candsDir)
    Streams.streamingFrontier(spark, candsDir, "bot", robots, budgets,
      defaultBudget = 2L, ckDir, outDir).awaitTermination()
    val run1 = spark.read.parquet(outDir)
      .select("url").as[String].collect().toSet
    assert(run1 == Set("http://a.com/p1", "http://a.com/p2",
      "http://b.com/q1"))
    // drain 2: a late 99-score URL on the exhausted host wins NOTHING
    // (earlier picks are never revisited — the batch law), a re-discovered
    // done URL does not re-spend, and b.com's remaining slot fills
    val b2 = Seq(("http://a.com/p9", 99L), ("http://b.com/q2", 2L),
      ("http://b.com/q1", 50L), ("http://a.com/p3", 7L)).toDF("url", "score")
    b2.coalesce(1).write.mode("append").parquet(candsDir)
    Streams.streamingFrontier(spark, candsDir, "bot", robots, budgets,
      defaultBudget = 2L, ckDir, outDir).awaitTermination()
    val byBatch = spark.read.parquet(outDir)
      .select("batch_id", "url").as[(Long, String)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    assert(byBatch(1L) == Set("http://b.com/q2"))
    // streamed two-drain result == the two-step batch delta law
    val noState = Seq.empty[(String, Long)].toDF("domain", "n_selected")
    val noDone = Seq.empty[(String, String)].toDF("k", "url").select("url")
    def sel(d: org.apache.spark.sql.DataFrame) =
      d.where(col("selected"))
    val s1 = sel(Crawl.frontierDelta(b1, "url", "bot", robots, budgets, 2L,
      noState, noDone, Some("score"))).cache()
    val spent1 = s1.groupBy("domain").agg(count(lit(1)).as("n_selected"))
    val s2 = sel(Crawl.frontierDelta(b2, "url", "bot", robots, budgets, 2L,
      spent1, s1.select("url"), Some("score")))
    val twoStep = (s1.select("url").as[String].collect() ++
      s2.select("url").as[String].collect()).toSet
    assert(byBatch.values.flatten.toSet == twoStep)
  }

  test("streaming line dedup probes accumulated df and grows the index") {
    import spark.implicits._
    import graft.operators.Dedup
    val idxDb = "graft_stream_line_idx"
    spark.sql(s"DROP DATABASE IF EXISTS $idxDb CASCADE")
    spark.sql(s"CREATE DATABASE $idxDb")
    val docsDir = java.nio.file.Files.createTempDirectory("ld-docs").toString
    val ckDir = java.nio.file.Files.createTempDirectory("ld-ck").toString
    val outDir = java.nio.file.Files.createTempDirectory("ld-out").toString +
      "/clean"
    val docs = Tables.table(spark, dir, "documents")
      .select(col("doc_id"),
        concat(lit("shared header\n"), col("text")).as("text"))
    // seed the index with the first half of the corpus
    Dedup.writeLineIndex(docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", idxDb, buckets = 4)
    // run 1: a quarter of the odd docs; header df (evens + batch) >= 30
    val b1 = docs.filter(col("doc_id") % 4 === 1)
    b1.coalesce(1).write.mode("append").parquet(docsDir)
    Streams.streamingLineDedup(spark, docsDir, idxDb, indexBuckets = 4,
      ckDir, outDir, minDf = 30L).awaitTermination()
    val run1 = spark.read.parquet(outDir)
    val expected1 = Dedup.lineDedupDelta(b1, "doc_id", "text",
      Dedup.docLineHashes(docs.filter(col("doc_id") % 2 === 0),
        "doc_id", "text"), 30L)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "clean_text", "n_lines", "n_dropped")
        .collect().map(_.toString).sorted.toSeq
    assert(canon(run1) == canon(expected1))
    assert(run1.filter(col("n_dropped") === 0).count() == 0,
      "the shared header must drop from every doc")
    // run 2: the rest of the odd docs — the accumulated index now holds
    // evens + run 1, so the stand-in is the delta against that union
    val b2 = docs.filter(col("doc_id") % 4 === 3)
    b2.coalesce(1).write.mode("append").parquet(docsDir)
    Streams.streamingLineDedup(spark, docsDir, idxDb, indexBuckets = 4,
      ckDir, outDir, minDf = 30L).awaitTermination()
    val run2 = spark.read.parquet(outDir)
      .filter(col("batch_id") === 1)
    val expected2 = Dedup.lineDedupDelta(b2, "doc_id", "text",
      Dedup.docLineHashes(
        docs.filter(col("doc_id") % 2 === 0).unionByName(b1),
        "doc_id", "text"), 30L)
    assert(canon(run2) == canon(expected2))
  }

  test("streaming corpus stats fold to the batch card and sketch") {
    import graft.operators.TextAnalysis
    val docsDir = java.nio.file.Files.createTempDirectory("cs-docs").toString
    val ckDir = java.nio.file.Files.createTempDirectory("cs-ck").toString
    val statsDir = java.nio.file.Files.createTempDirectory("cs-out").toString
    val docs = Tables.table(spark, dir, "documents")
      .select("doc_id", "text", "lang", "source")
    val b1 = docs.filter(col("doc_id") % 2 === 0)
    val b2 = docs.filter(col("doc_id") % 2 === 1)
    b1.coalesce(1).write.mode("append").parquet(docsDir)
    Streams.streamingCorpusStats(spark, docsDir, statsDir, ckDir,
      d = 3, w = 64).awaitTermination()
    b2.coalesce(1).write.mode("append").parquet(docsDir)
    Streams.streamingCorpusStats(spark, docsDir, statsDir, ckDir,
      d = 3, w = 64).awaitTermination()
    val (card, sketch, hh) = Streams.loadCorpusStats(spark, statsDir)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    // folded deltas == one batch build over the whole corpus
    val batchCard = docs.groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(TextAnalysis.tokens(col("text"))).cast("long"))
          .as("n_tokens"))
    assert(canon(card) == canon(batchCard))
    val batchSketch = TextAnalysis.cmsBuild(docs.select("text"), "text",
      d = 3, w = 64)
    assert(canon(sketch) == canon(batchSketch))
    // and the merge law directly: build(all) == merge(build(b1), build(b2))
    val merged = TextAnalysis.cmsMerge(
      TextAnalysis.cmsBuild(b1.select("text"), "text", d = 3, w = 64),
      TextAnalysis.cmsBuild(b2.select("text"), "text", d = 3, w = 64))
    assert(canon(merged) == canon(batchSketch))
    // per-lang heavy hitters folded across batches keep the MG contract
    // over the WHOLE stream: every term above N_lang/(k+1) present, no
    // overcount, undercount bounded — regardless of the batch split
    val k = 32
    val got = hh.select(col("lang"), explode(col("mg")))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val toks = docs
      .select(col("lang"), explode(TextAnalysis.tokens(col("text"))).as("t"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    for ((lang, xs) <- toks.groupBy(_._1)) {
      val n = xs.length.toLong
      val bound = n / (k + 1)
      val exact = xs.groupBy(_._2).map { case (t, ys) => t -> ys.length.toLong }
      assert(got.keys.count(_._1 == lang) <= k)
      got.collect { case ((`lang`, t), est) =>
        assert(est <= exact(t), s"$lang/$t overcounted")
        assert(exact(t) - est <= bound, s"$lang/$t est=$est")
      }
      exact.filter(_._2 > bound).keys.foreach(t =>
        assert(got.contains((lang, t)), s"guaranteed $lang/$t missing"))
    }
  }

  test("streaming curate-and-pack equals the batch funnel + packing") {
    import spark.implicits._
    import graft.operators.{Curate, TextAnalysis}
    val docs = Tables.table(spark, dir, "documents").select("doc_id", "text")
    val docsDir = java.nio.file.Files.createTempDirectory("cp-docs").toString
    val ckDir = java.nio.file.Files.createTempDirectory("cp-ck").toString
    val outDir = java.nio.file.Files.createTempDirectory("cp-out").toString +
      "/shards"
    docs.coalesce(1).write.mode("append").parquet(docsDir)
    val stages = Seq(
      Curate.FilterStage("short", col("n_tokens") >= 60),
      Curate.FilterStage("lang", col("lang_pred") === "en"))
    Streams.streamingCurateAndPack(spark, docsDir, ckDir, outDir,
      stages, budget = 512L, shards = 4).awaitTermination()
    val out = spark.read.parquet(outDir)
    // exactly the batch funnel's kept set survives
    val keptBatch = Curate.filterFunnel(
        TextAnalysis.qualityStats(docs, "text",
            TextAnalysis.langProfiles.head._2)
          .withColumn("lang_pred", TextAnalysis.langId(col("text"))),
        stages)
      .filter(col("verdict") === "kept")
      .select("doc_id").as[Long].collect().toSet
    assert(out.select("doc_id").as[Long].collect().toSet == keptBatch)
    assert(keptBatch.nonEmpty)
    // every emitted bin respects the budget; fills tile from zero.
    // seq_id is batch-scoped, so bins key by (batch_id, seq_id)
    val bins = out.select("batch_id", "seq_id", "n_tokens", "bin_offset")
      .as[(Long, Long, Long, Long)].collect().groupBy(r => (r._1, r._2))
      .view.mapValues(_.map(r => (r._2, r._3, r._4)).toSeq).toMap
    bins.values.foreach { b =>
      val total = b.sortBy(_._3).foldLeft(0L) { case (fill, (_, n, off)) =>
        assert(off == fill); fill + n
      }
      assert(total <= 512L)
    }
  }

  test("stateful per-user counting via mapGroupsWithState conserves totals") {
    import spark.implicits._
    val events = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id")).as[(Long, Long)]
    // batch shape of the state function: per user, a running count
    val counted = events.groupByKey(_._1)
      .mapGroups((user, it) => (user, it.size.toLong))
      .toDF("user_id", "n")
    val total = counted.agg(sum("n")).collect().head.getLong(0)
    assert(total == Tables.events(spark, dir).count())

    val streamEvents = spark.readStream
      .schema(Tables.table(spark, dir, "events").schema)
      .parquet(eventsDir)
      .select(col("user_id"), col("event_id")).as[(Long, Long)]
    def stateFn(user: Long, rows: Iterator[(Long, Long)],
        state: GroupState[Long]): (Long, Long) = {
      val n = state.getOption.getOrElse(0L) + rows.size
      state.update(n)
      (user, n)
    }
    val q = streamEvents.groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(stateFn)
      .toDF("user_id", "n")
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("state_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("state_out")
        .groupBy("user_id").agg(max("n").as("n"))
        .agg(sum("n")).collect().head.getLong(0)
      assert(streamed == total)
    } finally q.stop()
  }

  test("incremental supplement: delta isolation and count merge") {
    import spark.implicits._
    val raw = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("raw_stmt_id", "x")
    val links = Seq(Tuple1(1L), Tuple1(2L)).toDF("raw_stmt_id")
    val fresh = Streams.newRawStatements(raw, links).collect()
    assert(fresh.map(_.getLong(0)).toSeq == Seq(3L))

    val a = Seq((10L, Map("reach" -> 2L))).toDF("mk_hash", "src_json")
    val b = Seq((10L, Map("reach" -> 1L, "pc" -> 1L)),
      (11L, Map("signor" -> 1L))).toDF("mk_hash", "src_json")
    val merged = Streams.mergeSourceCounts(a, b)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Map[String, Long]]("src_json"), r.getAs[Long]("ev_count"))).toMap
    assert(merged(10L) == (Map("reach" -> 3L, "pc" -> 1L), 4L))
    assert(merged(11L) == (Map("signor" -> 1L), 1L))

    // the typed MapSum aggregator gives the same pointwise merge without
    // exploding rows
    val viaAgg = a.unionByName(b)
      .groupBy("mk_hash")
      .agg(graft.functions.MapSum.map_sum(col("src_json")).as("src_json"))
      .collect().map(r => r.getLong(0) -> r.getAs[Map[String, Long]]("src_json"))
      .toMap
    assert(viaAgg(10L) == Map("reach" -> 3L, "pc" -> 1L))
    assert(viaAgg(11L) == Map("signor" -> 1L))
  }

  test("streaming readonly upsert == full rebuild; untouched shards stay put") {
    import spark.implicits._
    import graft.assembly.{IncrementalReadonly, Preassembly, ReadonlyBuilder,
      StatementWorld}
    def js(subj: String, obj: String) =
      s"""{"type":"Activation","subj":{"name":"$subj"},"obj":{"name":"$obj"}}"""
    val rawDir = java.nio.file.Files.createTempDirectory("ro-raw").toString
    val ckDir = java.nio.file.Files.createTempDirectory("ro-ck").toString
    val db = "graft_ro_stream"
    val shards = 16
    IncrementalReadonly.reset(spark, db)

    // batch 1: eight base statements (one with two evidence rows)
    val b1 = (1L to 8L).map(i =>
      (i, if (i % 2 == 0) "reach" else "signor",
        js(s"A$i", s"B$i"))) :+ ((9L, "medscan", js("A2", "B2")))
    b1.toDF("raw_stmt_id", "src", "raw_json")
      .coalesce(1).write.mode("append").parquet(rawDir)
    Streams.streamingReadonly(spark, rawDir, ckDir, db, shards)
      .awaitTermination()

    def shardFiles(table: String): Map[String, Set[String]] = {
      val warehouse = spark.conf.get("spark.sql.warehouse.dir")
      val root = new org.apache.hadoop.fs.Path(s"$warehouse/$db.db/$table")
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(root).filter(_.isDirectory).map { d =>
        d.getPath.getName ->
          fs.listStatus(d.getPath).map(f =>
            f.getPath.getName + ":" + f.getModificationTime).toSet
      }.toMap
    }
    val before = shardFiles("r_source_meta")

    // batch 2: one more evidence row for A2-B2, one brand-new statement
    val b2 = Seq((10L, "reach", js("A2", "B2")), (11L, "reach", js("E", "F")))
    b2.toDF("raw_stmt_id", "src", "raw_json")
      .coalesce(1).write.mode("append").parquet(rawDir)
    Streams.streamingReadonly(spark, rawDir, ckDir, db, shards)
      .awaitTermination()

    // parity: the delta-maintained tables equal a from-scratch rebuild
    // over ALL raw rows (null belief, like the streaming path)
    val all = (b1 ++ b2).toDF("raw_stmt_id", "src", "raw_json")
    val (valid, _) = Preassembly.partitionValid(Preassembly.parse(all))
    val v = valid.localCheckpoint(false)
    val fullWorld = StatementWorld(
      statements = v.select(col("mk_hash"), col("stmt.type").as("stype"))
        .distinct().withColumn("belief", lit(null).cast("double")),
      evidence = v.select(col("raw_stmt_id").as("sid"), col("mk_hash"),
        col("src"), col("raw_stmt_id").as("rid"),
        lit(null).cast("long").as("pmid")),
      agents = Preassembly.agentRows(v),
      mesh = v.select(col("raw_stmt_id").as("sid"), lit(0L).as("mesh_num"),
        lit(0).cast("int").as("is_concept")).limit(0),
      refs = v.select(col("raw_stmt_id").as("rid"),
        lit(null).cast("long").as("pmid")).limit(0))
    val full = ReadonlyBuilder.build(spark, fullWorld,
      graft.core.TypeRegistry.indra, Seq("reach", "medscan"), Seq("signor"))
    val inc = IncrementalReadonly.load(spark, db)
    def canon(df: org.apache.spark.sql.DataFrame) = {
      val d = if (df.columns.contains("src_json"))
        df.withColumn("src_json", graft.assembly.Sif.srcStr(col("src_json")))
      else df
      d.collect().map(_.toString).sorted.toSeq
    }
    assert(canon(inc.sourceMeta) == canon(full.sourceMeta))
    assert(canon(inc.nameMeta) == canon(full.nameMeta))
    assert(canon(inc.agentInteractions) == canon(full.agentInteractions))
    assert(canon(inc.fastRawPaLink) == canon(full.fastRawPaLink))

    // only the touched shards' partitions were rewritten
    val touched = Preassembly.parse(b2.toDF("raw_stmt_id", "src", "raw_json"))
      .select(pmod(col("mk_hash"), lit(shards)).cast("int")).distinct()
      .collect().map(r => s"mk_shard=${r.getInt(0)}").toSet
    val after = shardFiles("r_source_meta")
    val untouchedBefore = before.keySet -- touched
    assert(untouchedBefore.nonEmpty,
      "vacuous test: every base shard was touched by batch 2")
    untouchedBefore.foreach { sh =>
      assert(after(sh) == before(sh),
        s"untouched shard $sh was rewritten by the delta batch")
    }
    // and the touched shards DID rewrite (files or mtimes changed)
    assert(touched.exists(sh => before.get(sh) != after.get(sh)))

    // compaction: the sharded store rewrites into the bucketed serving
    // form with identical rows, and mk_hash joins stop shuffling
    IncrementalReadonly.compactInto(spark, db, "graft_ro_stream_c",
      buckets = 4)
    val compacted = graft.assembly.Deploy.load(spark, "graft_ro_stream_c")
    assert(canon(compacted.sourceMeta) == canon(inc.sourceMeta))
    assert(canon(compacted.agentInteractions) == canon(inc.agentInteractions))
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = compacted.sourceMeta.join(
        compacted.agentInteractions.select("mk_hash", "agent_str"), "mk_hash")
      val p = j.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange hashpartitioning"),
        s"compacted join should be exchange-free:\n$p")
      assert(j.count() > 0)
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)

    // compaction POLICY: pressure = appended files in p_evidence's hottest
    // shard (the A2-B2 shard was touched by both batches, so 2) — a loose
    // threshold declines, a tight one fires -> the identical bucketed store
    val counts = IncrementalReadonly.shardFileCounts(spark, db)
    assert(counts.values.max >= 2 && counts.values.min >= 1)
    assert(!IncrementalReadonly.compactIfNeeded(spark, db,
      "graft_ro_stream_p", buckets = 4, maxFilesPerShard = 100))
    assert(!spark.catalog.databaseExists("graft_ro_stream_p") ||
      !spark.catalog.tableExists("graft_ro_stream_p.source_meta"))
    assert(IncrementalReadonly.compactIfNeeded(spark, db,
      "graft_ro_stream_p", buckets = 4, maxFilesPerShard = 1))
    val policyOut = graft.assembly.Deploy.load(spark, "graft_ro_stream_p")
    assert(canon(policyOut.sourceMeta) == canon(inc.sourceMeta))
  }

  test("streaming SCORED readonly == batch refinement+belief rebuild") {
    import spark.implicits._
    import graft.assembly.{Belief, IncrementalBelief, IncrementalReadonly,
      Pipeline, Preassembly, ReadonlyBuilder, Refinement, StatementWorld}
    def complexJs(members: String*) =
      s"""{"type":"Complex","members":[${members.map(m =>
        s"""{"name":"$m"}""").mkString(",")}]}"""
    val rawDir = java.nio.file.Files.createTempDirectory("sro-raw").toString
    val ckDir = java.nio.file.Files.createTempDirectory("sro-ck").toString
    val db = "graft_sro_stream"
    val bdb = "graft_sro_belief"
    IncrementalReadonly.reset(spark, db)
    IncrementalBelief.reset(spark, bdb)

    // batch 1: Complex[A] (refined by Complex[A,B]), plus an unrelated pair
    val b1 = Seq(
      (1L, "signor", complexJs("A")),
      (2L, "reach", complexJs("A", "B")),
      (3L, "reach", complexJs("C", "D")))
    b1.toDF("raw_stmt_id", "src", "raw_json")
      .coalesce(1).write.mode("append").parquet(rawDir)
    Streams.streamingScoredReadonly(spark, rawDir, ckDir, db, bdb, 16)
      .awaitTermination()

    // batch 2: a deeper descendant (new edges to BOTH stored statements)
    // and a counts-only event: more evidence for Complex[A,B] must lift
    // the belief of Complex[A] — an untouched-principal, belief-only
    // rewrite of an old hash
    val b2 = Seq(
      (4L, "medscan", complexJs("A", "B", "C")),
      (5L, "signor", complexJs("A", "B")))
    b2.toDF("raw_stmt_id", "src", "raw_json")
      .coalesce(1).write.mode("append").parquet(rawDir)
    Streams.streamingScoredReadonly(spark, rawDir, ckDir, db, bdb, 16)
      .awaitTermination()

    // batch oracle: full refinement + belief + readonly rebuild
    val all = (b1 ++ b2).toDF("raw_stmt_id", "src", "raw_json")
    val (valid, _) = Preassembly.partitionValid(Preassembly.parse(all))
    val v = valid.localCheckpoint(false)
    val uniq = v.select(col("mk_hash"), col("stmt.type").as("stype")).distinct()
    val agents = Preassembly.agentRows(v)
    val closure = Refinement.transitiveClosure(
      Pipeline.refinementEdges(uniq, agents))
    val srcCounts = v.groupBy("mk_hash", "src").agg(count(lit(1)).as("cnt"))
      .groupBy("mk_hash")
      .agg(map_from_entries(collect_list(struct(col("src"), col("cnt"))))
        .as("src_json"))
    val belief = Belief.scoreWithRefinements(srcCounts, closure)
      .select("mk_hash", "belief")
    val fullWorld = StatementWorld(
      statements = uniq.join(belief, "mk_hash"),
      evidence = v.select(col("raw_stmt_id").as("sid"), col("mk_hash"),
        col("src"), col("raw_stmt_id").as("rid"),
        lit(null).cast("long").as("pmid")),
      agents = agents,
      mesh = v.select(col("raw_stmt_id").as("sid"), lit(0L).as("mesh_num"),
        lit(0).cast("int").as("is_concept")).limit(0),
      refs = v.select(col("raw_stmt_id").as("rid"),
        lit(null).cast("long").as("pmid")).limit(0))
    val full = ReadonlyBuilder.build(spark, fullWorld,
      graft.core.TypeRegistry.indra, Seq("reach", "medscan"), Seq("signor"))
    val inc = IncrementalReadonly.load(spark, db)
    def canon(df: org.apache.spark.sql.DataFrame) = {
      val d = if (df.columns.contains("src_json"))
        df.withColumn("src_json", graft.assembly.Sif.srcStr(col("src_json")))
      else df
      d.collect().map(_.toString).sorted.toSeq
    }
    assert(canon(inc.sourceMeta) == canon(full.sourceMeta))
    assert(canon(inc.nameMeta) == canon(full.nameMeta))
    // belief actually flowed: the Complex[A] row scores its descendants'
    // evidence (signor own + reach/signor via A,B + medscan via A,B,C)
    val beliefByHash = inc.sourceMeta.select("mk_hash", "belief").distinct()
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val oracleBelief = belief.collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(beliefByHash == oracleBelief)
    assert(beliefByHash.values.exists(_ > 0.9)) // multi-source ancestor
  }

  test("streaming scored readonly with an ontology dimension") {
    import spark.implicits._
    import graft.assembly.{Belief, IncrementalBelief, IncrementalOntologyEdges,
      IncrementalReadonly, Pipeline, Preassembly, Refinement}
    def act(subjRefs: String, subjName: String) =
      s"""{"type":"Activation","subj":{"name":"$subjName","db_refs":{$subjRefs}},"obj":{"name":"B","db_refs":{"HGNC":"9"}}}"""
    val rawDir = java.nio.file.Files.createTempDirectory("ont-raw").toString
    val ckDir = java.nio.file.Files.createTempDirectory("ont-ck").toString
    val db = "graft_ont_stream"
    val bdb = "graft_ont_belief"
    val odb = "graft_ont_sigs"
    Seq(db).foreach(IncrementalReadonly.reset(spark, _))
    IncrementalBelief.reset(spark, bdb)
    IncrementalOntologyEdges.reset(spark, odb)
    val ontology = Seq(("HGNC:1", "FPLX:FAM")).toDF("desc", "anc")

    // batch 1: the SPECIFIC statement (HGNC-grounded subject)
    Seq((1L, "reach", act("\"HGNC\":\"1\"", "A1")))
      .toDF("raw_stmt_id", "src", "raw_json")
      .coalesce(1).write.mode("append").parquet(rawDir)
    Streams.streamingScoredReadonly(spark, rawDir, ckDir, db, bdb, 16,
      ontology = Some(ontology), ontologyDb = odb).awaitTermination()

    // batch 2: the FAMILY-level statement arrives later — an OLD-desc ->
    // NEW-anc ontology edge the signature index must find, lifting the
    // family statement's belief with the specific one's evidence
    Seq((2L, "signor", act("\"FPLX\":\"FAM\"", "FAM")))
      .toDF("raw_stmt_id", "src", "raw_json")
      .coalesce(1).write.mode("append").parquet(rawDir)
    Streams.streamingScoredReadonly(spark, rawDir, ckDir, db, bdb, 16,
      ontology = Some(ontology), ontologyDb = odb).awaitTermination()

    // batch oracle: union edges (key-subset + ontology walk) -> closure ->
    // refinement-aware belief, as Pipeline.run does
    val all = Seq(
      (1L, "reach", act("\"HGNC\":\"1\"", "A1")),
      (2L, "signor", act("\"FPLX\":\"FAM\"", "FAM")))
      .toDF("raw_stmt_id", "src", "raw_json")
    val (valid, _) = Preassembly.partitionValid(Preassembly.parse(all))
    val v = valid.localCheckpoint(false)
    val uniq = v.select(col("mk_hash"), col("stmt.type").as("stype")).distinct()
    val agents = Preassembly.agentRows(v)
    val closure = Refinement.transitiveClosure(
      Pipeline.refinementEdges(uniq, agents).unionByName(
        Refinement.ontologyRefinementEdges(uniq, agents, ontology))
        .distinct())
    assert(closure.count() == 1) // exactly the specific -> family edge
    val srcCounts = v.groupBy("mk_hash", "src").agg(count(lit(1)).as("cnt"))
      .groupBy("mk_hash")
      .agg(map_from_entries(collect_list(struct(col("src"), col("cnt"))))
        .as("src_json"))
    val oracle = Belief.scoreWithRefinements(srcCounts, closure)
      .select("mk_hash", "belief").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val served = IncrementalReadonly.load(spark, db).sourceMeta
      .select("mk_hash", "belief").distinct().collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(served == oracle)
    // the family statement carries two sources' evidence, the specific one
    val famHash = closure.select("anc").head().getLong(0)
    val specHash = closure.select("desc").head().getLong(0)
    assert(served(famHash) > served(specHash))
  }
  test("streaming as-of enrichment == batch as-of join, exactly-once batches") {
    import graft.operators.Temporal
    val ev = Tables.events(spark, dir)
    val purchases = ev.where(col("event_type") === "purchase")
      .select("user_id", "event_id", "ts")
    val dim = ev.where(col("event_type") =!= "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("touch_event_id"),
        col("event_type").as("touch_type"))
    val expected = Temporal.asofJoin(purchases, "user_id", "ts",
        dim, "user_id", "ts",
        payload = Seq("touch_event_id", "touch_type"),
        rightTieBreak = "touch_event_id")
      .select("user_id", "event_id", "touch_event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.get(2))).toSet

    val tmp = java.nio.file.Files.createTempDirectory("graft-asof-stream")
    val factsDir = s"$tmp/facts"
    // two files -> two micro-batches under maxFilesPerTrigger=1
    purchases.where(col("event_id") % 2 === 0)
      .coalesce(1).write.parquet(s"$factsDir/a")
    purchases.where(col("event_id") % 2 === 1)
      .coalesce(1).write.parquet(s"$factsDir/b")
    val factsGlob = spark.read.parquet(factsDir + "/*")
    val q = Streams.streamingAsofEnrich(spark, factsDir + "/*",
      factsGlob.schema, dim, "user_id", "ts", "user_id", "ts",
      Seq("touch_event_id", "touch_type"), "touch_event_id",
      s"$tmp/out", s"$tmp/ckpt", maxFilesPerTrigger = Some(1))
    try q.processAllAvailable() finally q.stop()

    val out = spark.read.parquet(s"$tmp/out")
    assert(out.select("batch_id").distinct().count() >= 2,
      "expected multiple micro-batches")
    val got = out.select("user_id", "event_id", "touch_event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.get(2))).toSet
    assert(got == expected)
    assert(out.count() == purchases.count()) // exactly-once, no dup rows
  }

  test("streaming media dedup probes the persisted dhash index per drain") {
    import spark.implicits._
    import graft.functions.images
    val tmp = java.nio.file.Files.createTempDirectory("graft-media")
    val mediaDir = s"$tmp/media"
    def mediaOf(ids: Seq[Long]): org.apache.spark.sql.DataFrame =
      ids.toDF("media_id")
        .select(col("media_id"), lit(16).as("w"), lit(12).as("h"),
          images.synth_image((col("media_id") % 3 * 77 + 5).cast("long"),
            lit(16), lit(12), (col("media_id") % 2 + 1).cast("int"))
            .as("data"))
        .select("media_id", "data", "w", "h")
    // batch 1: ids 0..5 (groups of two per seed); batch 2: ids 6..11
    mediaOf(0L to 5L).coalesce(1).write.parquet(s"$mediaDir/a")
    def drain(): Unit = {
      val q = Streams.streamingMediaDedup(spark, mediaDir + "/*",
        s"$tmp/index", s"$tmp/ckpt", s"$tmp/pairs")
      try q.processAllAvailable() finally q.stop()
    }
    drain()
    mediaOf(6L to 11L).coalesce(1).write.parquet(s"$mediaDir/b")
    drain()
    val got = spark.read.parquet(s"$tmp/pairs")
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // accumulated delta pairs == one batch run over everything, no dups
    val expected = graft.operators.Multimodal.dhashNearDups(
        mediaOf(0L to 11L), "media_id", "data", "w", "h", maxHamming = 0)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == got.distinct.length, "pair emitted twice")
    assert(got.toSet == expected.toSet)
    assert(got.nonEmpty)
    // second drain with no new files adds nothing (checkpointed)
    drain()
    assert(spark.read.parquet(s"$tmp/pairs").count() == got.length)
  }

  test("streaming audio dedup probes the persisted fingerprint index per drain") {
    import spark.implicits._
    import graft.functions.images
    val tmp = java.nio.file.Files.createTempDirectory("graft-audio")
    val audioDir = s"$tmp/audio"
    def clipsOf(ids: Seq[Long]): org.apache.spark.sql.DataFrame =
      ids.toDF("media_id")
        .select(col("media_id"),
          images.synth_audio((col("media_id") % 3 * 77 + 5).cast("long"),
            (col("media_id") % 2 + 2).cast("int"),
            (col("media_id") % 2 + 1).cast("int")).as("data"))
    clipsOf(0L to 5L).coalesce(1).write.parquet(s"$audioDir/a")
    def drain(): Unit = {
      val q = Streams.streamingAudioDedup(spark, audioDir + "/*",
        s"$tmp/index", s"$tmp/ckpt", s"$tmp/pairs")
      try q.processAllAvailable() finally q.stop()
    }
    drain()
    clipsOf(6L to 11L).coalesce(1).write.parquet(s"$audioDir/b")
    drain()
    val got = spark.read.parquet(s"$tmp/pairs")
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = graft.operators.Multimodal.audioNearDups(
        clipsOf(0L to 11L), "media_id", "data", maxHamming = 0)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == got.distinct.length, "pair emitted twice")
    assert(got.toSet == expected.toSet)
    assert(got.nonEmpty)
  }

  test("stream-stream interval join == batch join over out-of-order batches") {
    import org.apache.spark.sql.streaming.Trigger
    val ev = Tables.events(spark, dir)
    val facts = ev.where(col("event_type") === "purchase")
      .select(col("user_id").as("f_user"), col("event_id").as("f_id"),
        col("ts").as("f_ts"))
    // late-arriving dimension deltas: per-event validity windows derived
    // from the other event types
    val dims = ev.where(col("event_type") =!= "purchase")
      .select(col("user_id").as("d_user"), col("event_id").as("d_id"),
        col("ts").as("valid_from"),
        (col("ts") + expr("INTERVAL 6 HOURS")).as("valid_to"))

    val expected = facts.join(dims,
        col("f_user") === col("d_user") &&
          col("f_ts") >= col("valid_from") && col("f_ts") <= col("valid_to"))
      .select("f_id", "d_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val tmp = java.nio.file.Files.createTempDirectory("graft-ss-join")
    // out-of-order arrival on BOTH sides: each side splits into two files
    // whose time ranges interleave (odd/even ids, not a time split)
    facts.where(col("f_id") % 2 === 0).coalesce(1)
      .write.parquet(s"$tmp/facts/a")
    facts.where(col("f_id") % 2 === 1).coalesce(1)
      .write.parquet(s"$tmp/facts/b")
    dims.where(col("d_id") % 2 === 0).coalesce(1)
      .write.parquet(s"$tmp/dims/a")
    dims.where(col("d_id") % 2 === 1).coalesce(1)
      .write.parquet(s"$tmp/dims/b")

    val factsStream = spark.readStream
      .schema(facts.schema).option("maxFilesPerTrigger", "1")
      .parquet(s"$tmp/facts/*")
    val dimsStream = spark.readStream
      .schema(dims.schema).option("maxFilesPerTrigger", "1")
      .parquet(s"$tmp/dims/*")
    // generous watermark: all arrivals are within horizon, so streamed
    // must equal batch exactly; maxValidity matches the 6h window
    val joined = Streams.streamStreamIntervalJoin(
      factsStream, "f_user", "f_ts",
      dimsStream, "d_user", "valid_from", "valid_to",
      watermarkDelay = "3650 days", maxValidity = "6 HOURS")
    val q = joined.select("f_id", "d_id").writeStream
      .format("memory").queryName("ss_join_out")
      .outputMode("append").trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$tmp/ckpt").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("ss_join_out")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
    // append-only exactly-once: no duplicate pairs
    assert(spark.table("ss_join_out").count() == got.size)
  }
}
