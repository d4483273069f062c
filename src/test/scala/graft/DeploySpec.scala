package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.assembly.{Curation, Deploy}
import graft.core.Grounder
import graft.functions.Ids
import graft.queries.TpchWorld
import graft.querydsl._

/** Bucketed deployment: after Deploy.write, mk_hash joins between readonly
  * tables must run WITHOUT a shuffle exchange — the cluster-scale analog of
  * the reference's per-table btree indexes. Plus curation, id
  * decomposition, and AUTO grounding coverage.
  */
class DeploySpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("deploy-test")
  val dir = "/root/testdata/sf0.001"

  test("bucketed readonly tables join on mk_hash with no shuffle") {
    val ro = TpchWorld.readonly(spark, dir)
    Deploy.write(spark, ro, "graft_test", buckets = 8)
    val loaded = Deploy.load(spark, "graft_test")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = loaded.sourceMeta
        .join(loaded.agentInteractions.select("mk_hash", "agent_str"), "mk_hash")
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$p")
      assert(joined.count() > 0)
      // result parity with the in-memory layer
      assert(joined.count() ==
        ro.sourceMeta.join(
          ro.agentInteractions.select("mk_hash", "agent_str"), "mk_hash").count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("persisted dedup index: delta probe equals the fresh-index run") {
    import graft.operators.Dedup
    import graft.sources.Tables
    val docs = Tables.table(spark, dir, "documents").select("doc_id", "text")
    Dedup.writeIndex(docs, "doc_id", "text", "graft_dedup_idx", buckets = 4)
    val (sigs, sh) = Dedup.loadIndex(spark, "graft_dedup_idx")
    // near copies of every 5th doc, ids shifted
    val toks = graft.operators.TextAnalysis.tokens(col("text"))
    val newBatch = docs.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 100000).as("doc_id"),
        array_join(slice(toks, lit(1), size(toks) - 2), " ").as("text"))
    val viaIndex = Dedup.deltaNearDups(newBatch, "doc_id", "text", sigs, sh)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val freshSh = Dedup.shingleSet(docs, "doc_id", "text", 3)
    val fresh = Dedup.deltaNearDups(newBatch, "doc_id", "text",
      Dedup.bandSignatures(Dedup.minhash(freshSh, 12), 3), freshSh)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaIndex.nonEmpty, "planted near-dups must be found")
    assert(viaIndex == fresh, "persisted index must not change results")
    // the probe actually reads the bucketed tables
    val p = Dedup.deltaNearDups(newBatch, "doc_id", "text", sigs, sh)
      .queryExecution.executedPlan.toString
    assert(p.contains("band_sigs"), s"bucketed index scan missing:\n$p")
  }

  test("appendIndex replay heals a crash between the two table writes") {
    import graft.operators.Dedup
    import graft.sources.Tables
    val docs = Tables.table(spark, dir, "documents").select("doc_id", "text")
    Dedup.writeIndex(docs, "doc_id", "text", "graft_crash_idx", buckets = 4)
    val batch = docs.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 100000).as("doc_id"), col("text"))
    val shB = Dedup.shingleSet(batch, "doc_id", "text", 3)
      .select("doc_id", "sh_hash").localCheckpoint(false)
    // simulate the crash window: the FIRST append (band_sigs) lands, the
    // shingles append never runs
    Dedup.bandSignatures(Dedup.minhash(shB, 12), 3).write
      .mode("append").bucketBy(4, "band", "sig").sortBy("band", "sig")
      .format("parquet").saveAsTable("graft_crash_idx.band_sigs")
    // the at-least-once replay: per-table guards must skip band_sigs
    // (already there) and fill in exactly the missing shingles
    Dedup.appendIndex(shB, "graft_crash_idx", buckets = 4)
    val (sigs, sh) = Dedup.loadIndex(spark, "graft_crash_idx")
    assert(sigs.groupBy("doc_id", "band").count()
      .filter(col("count") > 1).count() == 0,
      "replay duplicated band signature rows")
    assert(sh.groupBy("doc_id", "sh_hash").count()
      .filter(col("count") > 1).count() == 0,
      "replay duplicated shingle rows")
    assert(sh.join(batch.select("doc_id"), Seq("doc_id"), "left_semi")
      .select("doc_id").distinct().count() == batch.count(),
      "batch shingles missing after replay")
    // a further full replay is a no-op on both tables
    val (nSigs, nSh) = (sigs.count(), sh.count())
    Dedup.appendIndex(shB, "graft_crash_idx", buckets = 4)
    val (sigs2, sh2) = Dedup.loadIndex(spark, "graft_crash_idx")
    assert(sigs2.count() == nSigs && sh2.count() == nSh)
  }

  test("dedup index compaction: one file per bucket, identical probes") {
    import graft.operators.Dedup
    import graft.sources.Tables
    val db = "graft_compact_idx"
    val docs = Tables.table(spark, dir, "documents").select("doc_id", "text")
    Dedup.writeIndex(docs, "doc_id", "text", db, buckets = 4)
    // absorb three delta batches — each appends a file per touched bucket
    for (i <- 1 to 3) {
      val b = docs.filter(col("doc_id") % 7 === i)
        .select((col("doc_id") + 200000L * i).as("doc_id"), col("text"))
      Dedup.appendIndex(
        Dedup.shingleSet(b, "doc_id", "text", 3).select("doc_id", "sh_hash"),
        db, buckets = 4)
    }
    val probe = docs.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 900000L).as("doc_id"), col("text"))
    def probeRun() = {
      val (sigs, sh) = Dedup.loadIndex(spark, db)
      Dedup.deltaNearDups(probe, "doc_id", "text", sigs, sh)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val before = probeRun()
    assert(before.nonEmpty, "planted near-dups must be found")
    val hotBefore = Dedup.indexFileCounts(spark, db).values.max
    assert(hotBefore >= 4, s"base + 3 appends expected, saw $hotBefore")
    // policy: below threshold no-op, above threshold compacts
    assert(!Dedup.compactIndexIfNeeded(spark, db, 4, maxFilesPerBucket = hotBefore))
    assert(Dedup.indexFileCounts(spark, db).values.max == hotBefore)
    assert(Dedup.compactIndexIfNeeded(spark, db, 4, maxFilesPerBucket = hotBefore - 1))
    assert(Dedup.indexFileCounts(spark, db).values.max == 1,
      "compaction should leave one file per bucket")
    assert(Dedup.indexFileCounts(spark, db, "shingles").values.max == 1)
    assert(probeRun() == before, "compaction must not change probe results")
    // the index keeps absorbing deltas after compaction (bucket spec kept)
    val late = docs.filter(col("doc_id") % 11 === 0)
      .select((col("doc_id") + 800000L).as("doc_id"), col("text"))
    Dedup.appendIndex(
      Dedup.shingleSet(late, "doc_id", "text", 3).select("doc_id", "sh_hash"),
      db, buckets = 4)
    assert(Dedup.indexFileCounts(spark, db).values.max == 2)
    // every pre-compaction pair survives; the only new pairs involve the
    // freshly indexed late batch
    val after = probeRun()
    assert(before.subsetOf(after))
    assert((after -- before).forall { case (a, _) =>
      a >= 800000L && a < 900000L })
  }

  test("compactIndex replay heals a crash between drop and rename") {
    import graft.operators.Dedup
    val db = "graft_compact_idx" // state left by the previous test
    val before = {
      val (sigs, sh) = Dedup.loadIndex(spark, db)
      (sigs.count(), sh.count())
    }
    // simulate the one non-healing-by-overwrite window: the shingles
    // rewrite completed into the side table and the original was dropped,
    // then the process died before the rename
    spark.sql(s"ALTER TABLE $db.shingles RENAME TO $db.shingles_compact")
    // replay: band_sigs takes the full rewrite path, shingles only the
    // finishing rename
    Dedup.compactIndex(spark, db, buckets = 4)
    val (sigs, sh) = Dedup.loadIndex(spark, db)
    assert((sigs.count(), sh.count()) == before,
      "healed index must hold exactly the pre-crash rows")
    assert(Dedup.indexFileCounts(spark, db).values.max == 1)
  }

  test("JDBC export round-trips the readonly layer through embedded Derby") {
    import graft.assembly.JdbcExport
    val ro = TpchWorld.readonly(spark, dir)
    val url = "jdbc:derby:memory:graftjdbc;create=true"
    JdbcExport.writeReadonly(ro, url, prefix = "", connections = 2)
    // source_meta carries the map-typed src_json — the column the
    // reference JSON-serializes by hand; compare against to_json here
    val back = spark.read.jdbc(url, "source_meta",
      new java.util.Properties())
    assert(back.count() == ro.sourceMeta.count())
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(col("mk_hash"), col("ev_count"),
        get_json_object(col("src_json"), "$").as("sj"))
      .collect().map(_.toSeq).toSet
    assert(canon(back) ==
      canon(ro.sourceMeta.withColumn("src_json", to_json(col("src_json")))))
    // the narrow metas round-trip by value
    val nmBack = spark.read.jdbc(url, "name_meta", new java.util.Properties())
    assert(nmBack.count() == ro.nameMeta.count())
    assert(nmBack.columns.sorted.toSeq == ro.nameMeta.columns.sorted.toSeq)
    // fast_raw_pa_link uses append mode: a second export doubles it,
    // everything else overwrites in place (reference modes, :603-605)
    JdbcExport.writeReadonly(ro, url, prefix = "", connections = 2)
    assert(spark.read.jdbc(url, "fast_raw_pa_link",
      new java.util.Properties()).count() == 2 * ro.fastRawPaLink.count())
    assert(spark.read.jdbc(url, "source_meta",
      new java.util.Properties()).count() == ro.sourceMeta.count())
  }

  test("persisted ANN index: both search paths equal the fresh-index runs") {
    import graft.operators.Similarity
    import graft.sources.Tables
    val emb = Tables.table(spark, dir, "embeddings")
      .select(col("vec_id").as("id"), col("embedding"))
    Similarity.writeAnnIndex(emb, "graft_ann_idx", buckets = 4,
      nCells = 16, m = 8, dim = 64, ksub = 16)
    val (cells, codes, cents, cb) = Similarity.loadAnnIndex(spark, "graft_ann_idx")
    val qs = emb.filter(col("id") < 10)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact in-cell search off the persisted layer
    val exactP = rows(Similarity.ivfTopKWith(cells, cents, qs, nProbe = 2, k = 3))
    val exactF = rows(Similarity.ivfTopKWith(
      Similarity.ivfIndex(emb, nCells = 16),
      emb.filter(col("id") < 16).select(col("id").as("cent_id"),
        col("embedding").as("cent_emb"),
        Similarity.norm(col("embedding")).as("cent_nrm")),
      qs, nProbe = 2, k = 3))
    assert(exactP.nonEmpty && exactP == exactF)
    // compressed search off the persisted layer
    val pqP = rows(Similarity.ivfPqTopK(qs, cells, codes, cents, cb,
      m = 8, dim = 64, ksub = 16, nProbe = 2, k = 3))
    val freshCb = Similarity.pqCodebooks(emb, m = 8, dim = 64, ksub = 16)
    val pqF = rows(Similarity.ivfPqTopK(qs,
      Similarity.ivfIndex(emb, nCells = 16),
      Similarity.pqEncode(emb, freshCb, m = 8, dim = 64),
      emb.filter(col("id") < 16).select(col("id").as("cent_id"),
        col("embedding").as("cent_emb"),
        Similarity.norm(col("embedding")).as("cent_nrm")),
      freshCb, m = 8, dim = 64, ksub = 16, nProbe = 2, k = 3))
    assert(pqP.nonEmpty && pqP == pqF)
  }

  test("persisted SQ8 index serves searches identical to the fresh build") {
    import graft.operators.Similarity
    import graft.sources.Tables
    val emb = Tables.table(spark, dir, "embeddings")
      .select(col("vec_id").as("id"), col("embedding"))
    Similarity.writeSqIndex(emb, "graft_sq_idx", buckets = 4, dim = 64)
    val (codes, stats) = Similarity.loadSqIndex(spark, "graft_sq_idx")
    val qs = emb.filter(col("id") < 10)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    val persisted = rows(Similarity.sqTopK(qs, codes, stats, 64, k = 3))
    val freshStats = Similarity.sqStats(emb, 64)
    val fresh = rows(Similarity.sqTopK(qs,
      Similarity.sqEncode(emb, freshStats, 64), freshStats, 64, k = 3))
    assert(persisted.nonEmpty && persisted == fresh)
  }

  test("AUTO namespace grounds through the dictionary grounder") {
    // TpchWorld ids are P<n>, unknown to the grounder -> falls back to NAME
    val ro = TpchWorld.readonly(spark, dir)
    val auto = QueryCompiler.compile(HasAgent("P5", "AUTO"), ro, TpchWorld.types)
    val name = QueryCompiler.compile(HasAgent("P5", "NAME"), ro, TpchWorld.types)
    assert(auto.collect().map(_.getLong(0)).toSet ==
      name.collect().map(_.getLong(0)).toSet)
    assert(Grounder.default.ground("erk").contains(("FPLX", "ERK")))
    // an injected grounder overrides the default resolution per call
    val custom = graft.core.DictGrounder(Map("ALIAS-5" -> ("NAME", "P5")))
    val viaCustom = QueryCompiler.compile(
      HasAgent("alias-5", "AUTO"), ro, TpchWorld.types, grounder = custom)
    assert(viaCustom.collect().map(_.getLong(0)).toSet ==
      name.collect().map(_.getLong(0)).toSet)
  }

  test("scored grounder ranks by match tier then prior (gilda shape)") {
    val g = Grounder.scoredDefault
    // exact and case-insensitive tiers
    assert(g.ground("TNFα").contains(("FPLX", "TNF")))
    assert(g.ground("erk").contains(("FPLX", "ERK")))
    // punctuation-insensitive tier: "TP-53" -> TP53; prior picks HGNC
    // over the UP entry sharing the surface form
    assert(g.ground("TP-53").contains(("HGNC", "11998")))
    assert(g.candidates("TP53").map(_._2.ns) == Seq("HGNC", "UP"))
    // greek-expansion tier: spelled-out letter reaches the α entry
    assert(g.ground("tnf-alpha").contains(("FPLX", "TNF")))
    // unknown stays unresolved
    assert(g.ground("XYZZY").isEmpty)
  }

  test("curation counts and anonymization") {
    import spark.implicits._
    val cur = Seq((1L, "alice"), (1L, "bob"), (2L, "alice"))
      .toDF("pa_hash", "curator")
    val results = Seq((1L, 5L), (2L, 3L), (3L, 1L)).toDF("mk_hash", "ev_count")
    val got = Curation.attach(results, cur)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_curations")).toMap
    assert(got == Map(1L -> 2L, 2L -> 1L, 3L -> 0L))
    val anon = cur.select(Curation.anonymizeCurator(col("curator"), "salt"))
      .distinct().count()
    assert(anon == 2)
  }

  test("grounding curations: malformed entry skips the WHOLE curation") {
    import spark.implicits._
    val cur = Seq(
      ("grounding", "[tnf] -> FPLX:TNF|HGNC:11892"), // both entries kept
      ("grounding", "[p53] -> HGNC:11998|UP"),       // UP lacks ':' -> skip all
      ("grounding", "free-form note"),               // non-matching -> skip
      ("other", "[x] -> HGNC:1"),                    // wrong tag -> skip
    ).toDF("tag", "text")
    val rows = Curation.groundingCurations(cur)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSet
    assert(rows == Set(("tnf", "FPLX", "TNF"), ("tnf", "HGNC", "11892")))
  }

  test("paper id decomposition") {
    import spark.implicits._
    val df = Seq(("12345", "PMC999.2", "10.1038/nature12373", "D012345"))
      .toDF("pmid", "pmcid", "doi", "mesh")
    val r = df.select(
      Ids.pmidNum(col("pmid")), Ids.pmcidNum(col("pmcid")),
      Ids.pmcidVersion(col("pmcid")), Ids.doiNs(col("doi")),
      Ids.doiId(col("doi")), Ids.meshNum(col("mesh")),
      Ids.meshIsConcept(col("mesh"))).collect().head
    assert(r.getLong(0) == 12345L && r.getLong(1) == 999L && r.getInt(2) == 2)
    assert(r.getLong(3) == 1038L && r.getString(4) == "nature12373")
    assert(r.getLong(5) == 12345L && !r.getBoolean(6))
    // non-digit version keeps the numeric body (process_pmcid splits on '.'
    // and still indexes an all-digit body); non-digit bodies stay null
    val r2 = Seq(("PMC123.x", "PMC12a", "123"))
      .toDF("a", "b", "c")
      .select(Ids.pmcidNum(col("a")), Ids.pmcidVersion(col("a")),
        Ids.pmcidNum(col("b")), Ids.pmcidNum(col("c"))).collect().head
    assert(r2.getLong(0) == 123L && r2.isNullAt(1))
    assert(r2.isNullAt(2) && r2.isNullAt(3))
    assert(graft.functions.Ids.parsePmcidNum("PMC123.x") == 123L)
  }
}
