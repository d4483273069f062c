package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.assembly.{Belief, IncrementalBelief, IncrementalOntologyEdges,
  IncrementalReadonly, Pipeline, Preassembly, ReadonlyBuilder, Refinement,
  StatementWorld, StoreFaults}
import graft.streaming.Streams

/** Long-run crash-injection soak for the cooperating incremental stores.
  *
  * The unit specs verify the crash-healing guards at one simulated crash
  * and two batches; the reference's supplement machinery, which these
  * stores re-express, runs for months (preassemble_db.py:481-615). This
  * soak drives many delta batches through [[Streams.streamingScoredReadonly]]
  * — readonly + belief + ontology-signature stores cooperating in one
  * foreachBatch — with crashes injected at RANDOMIZED write boundaries
  * (via [[StoreFaults]], which fires before every ShardedStore write) and
  * compactions interleaved, then asserts the final serving state equals a
  * from-scratch batch rebuild over the union world. A guard interaction
  * that only bites at batch 7 (belief updates + compaction + replay
  * interleavings) fails here and nowhere else.
  *
  * Every random draw comes from a fixed-seed generator: a failure
  * reproduces exactly.
  */
class SoakSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("soak-test")

  /** The soak's cost is fixed per-write overhead (hundreds of tiny store
    * writes across stream restarts), and streaming disables AQE so every
    * shuffle runs the full session width. Pin shuffle width down for the
    * duration of a soak — semantics are width-independent (the unit specs
    * and gates run at the session default) — and restore it after, since
    * suites share the forked JVM's session. */
  private def withNarrowShuffle[T](body: => T): T = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try body finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  private def complexJs(members: Seq[String]) =
    s"""{"type":"Complex","members":[${members.map(m =>
      s"""{"name":"$m"}""").mkString(",")}]}"""
  private def actJs(subjRefs: String, subjName: String) =
    s"""{"type":"Activation","subj":{"name":"$subjName","db_refs":{$subjRefs}},"obj":{"name":"OBJ","db_refs":{"HGNC":"999"}}}"""

  private def isInjected(e: Throwable): Boolean =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(12)
      .exists(_.isInstanceOf[StoreFaults.InjectedCrash])

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val d = if (df.columns.contains("src_json"))
      df.withColumn("src_json", graft.assembly.Sif.srcStr(col("src_json")))
    else df
    d.collect().map(_.toString).sorted.toSeq
  }

  /** Drive `waves` delta batches with `entities` complex-member names and
    * `specifics` ontology-grounded subjects; crash each wave's micro-batch
    * 0-2 times at random write boundaries before letting it drain. With
    * `ontologyDeltaAt` set, the ontology gains a new FPLX:F0 -> FPLX:SUPER
    * edge after that wave — the delta flows through
    * [[IncrementalOntologyEdges.ontologyDelta]], its exposed edges through
    * an edge-only belief upsert, and the re-scored hashes through a
    * belief-only readonly upsert; later waves emit SUPER-keyed statements
    * so old-desc x new-anc compositions actually arise, and the final
    * oracle rebuilds with the UPDATED ontology. */
  private def soak(tag: String, waves: Int, entities: Int, specifics: Int,
      stmtsPerWave: Int, seed: Long,
      ontologyDeltaAt: Option[Int] = None): Unit = {
    import spark.implicits._
    val rng = new scala.util.Random(seed)
    val rawDir = java.nio.file.Files.createTempDirectory(s"soak-$tag-raw").toString
    val ckDir = java.nio.file.Files.createTempDirectory(s"soak-$tag-ck").toString
    val db = s"graft_soak_${tag}_ro"
    val bdb = s"graft_soak_${tag}_bel"
    val odb = s"graft_soak_${tag}_ont"
    IncrementalReadonly.reset(spark, db)
    IncrementalBelief.reset(spark, bdb)
    IncrementalOntologyEdges.reset(spark, odb)
    Seq(s"${db}_c1", s"${db}_c2", s"${db}_cf")
      .foreach(IncrementalReadonly.reset(spark, _))
    // two-level ontology: HGNC:<i> specific under FPLX:F<i%3> family;
    // an ontologyDeltaAt soak later adds FPLX:F0 -> FPLX:SUPER (3 levels)
    val ontology = (0 until specifics)
      .map(i => (s"HGNC:$i", s"FPLX:F${i % 3}")).toDF("desc", "anc")
    var curOnt = ontology
    var deltaApplied = false

    val pool = (0 until entities).map(i => s"E$i")
    val srcs = Seq("reach", "medscan", "signor")
    val emitted = scala.collection.mutable.ArrayBuffer.empty[String]
    var nextSid = 1L
    def sid(): Long = { val s = nextSid; nextSid += 1; s }

    def waveRows(): Seq[(Long, String, String)] = {
      val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String)]
      // new complexes over a small pool: random subsets nest naturally,
      // exercising key-subset refinement discovery against the stored index
      (1 to stmtsPerWave).foreach { _ =>
        val size = 1 + rng.nextInt(3)
        val members = rng.shuffle(pool).take(size).sorted
        val js = complexJs(members)
        emitted += js
        rows += ((sid(), srcs(rng.nextInt(srcs.size)), js))
      }
      // ontology-grounded activations: specific and family levels arrive
      // in arbitrary wave order (old-desc->new-anc AND new-desc->old-anc)
      if (rng.nextBoolean()) {
        val i = rng.nextInt(specifics)
        val js =
          if (rng.nextBoolean()) actJs(s""""HGNC":"$i"""", s"SPEC$i")
          else actJs(s""""FPLX":"F${i % 3}"""", s"FAM${i % 3}")
        emitted += js
        rows += ((sid(), srcs(rng.nextInt(srcs.size)), js))
      }
      // after the mid-soak ontology delta: statements at the NEW top level,
      // so old F0/HGNC:0-family statements gain a strictly-more-general
      // counterpart (old-desc x new-anc through the evolved closure)
      if (deltaApplied && rng.nextBoolean()) {
        val js = actJs(""""FPLX":"SUPER"""", "SUPERFAM")
        emitted += js
        rows += ((sid(), srcs(rng.nextInt(srcs.size)), js))
      }
      // counts-only deltas: re-deliver earlier statements as new evidence
      (1 to rng.nextInt(3)).foreach { _ =>
        rows += ((sid(), srcs(rng.nextInt(srcs.size)),
          emitted(rng.nextInt(emitted.size))))
      }
      // an occasional malformed row must be rejected, never corrupt state
      if (rng.nextInt(4) == 0) rows += ((sid(), "reach", "{not json"))
      rows.toSeq
    }

    // 8 shards keeps per-write partition fan-out (the soak's dominant
    // cost at toy scale) down without changing any guard semantics
    def startStream() = Streams.streamingScoredReadonly(spark, rawDir, ckDir,
      db, bdb, shards = 8, ontology = Some(curOnt), ontologyDb = odb)

    var crashes = 0
    val allRows = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String)]
    try (1 to waves).foreach { w =>
      val rows = waveRows()
      allRows ++= rows
      rows.toDF("raw_stmt_id", "src", "raw_json")
        .coalesce(1).write.mode("append").parquet(rawDir)
      // 0-2 injected crashes, each at a random write boundary of the
      // ~20-write batch chain (ontology -> belief -> readonly); an index
      // past the batch's write count simply drains clean — also random
      var plan = List.fill(rng.nextInt(3))(1 + rng.nextInt(20))
      var done = false
      while (!done) {
        plan match {
          case n :: rest => StoreFaults.armCrashAt(n); plan = rest
          case Nil => StoreFaults.disarm()
        }
        val q = startStream()
        try { q.awaitTermination(); StoreFaults.disarm(); done = true }
        catch {
          case e: Throwable if isInjected(e) => crashes += 1
        }
      }
      // interleaved compaction: the LSM policy rewrites the store into the
      // bucketed serving form mid-soak (threshold 1 fires once pressure
      // exists); the live store must keep absorbing deltas afterwards
      if (w == waves / 2)
        IncrementalReadonly.compactIfNeeded(spark, db, s"${db}_c1",
          buckets = 4, maxFilesPerShard = 1)
      // mid-soak ontology evolution: signature-index delta -> edge-only
      // belief upsert -> belief-only readonly upsert, between two streams
      // and right after a compaction
      if (ontologyDeltaAt.contains(w)) {
        // two delta edges: F0 -> SUPER creates a NEW top level (edges only
        // arise once later waves emit SUPER-keyed statements), F1 -> F2
        // connects two EXISTING families, so the delta exposes edges
        // immediately and the edge-only belief path moves real scores
        val newEdge = Seq(("FPLX:F0", "FPLX:SUPER"), ("FPLX:F1", "FPLX:F2"))
          .toDF("desc", "anc")
        curOnt = curOnt.unionByName(newEdge).localCheckpoint(true)
        deltaApplied = true
        val d = IncrementalOntologyEdges.ontologyDelta(
          spark, newEdge, curOnt, odb, shards = 8).localCheckpoint(false)
        def emptyLike(table: String, drop: Seq[String]) =
          spark.table(s"$db.$table").drop(drop: _*).limit(0)
        val eStmts = Seq.empty[(Long, String)].toDF("mk_hash", "stype")
        val eAgents = Seq.empty[(Long, Int, String, String, Int)]
          .toDF("mk_hash", "ag_num", "db_name", "db_id", "role_num")
        val eCounts = Seq.empty[(Long, String, Long)]
          .toDF("mk_hash", "src", "cnt")
        val bu = IncrementalBelief.upsert(spark, eStmts, eAgents, eCounts,
          bdb, shards = 8, batchId = 900000L + w, extraEdges = Some(d))
          .localCheckpoint(false)
        IncrementalReadonly.upsert(spark,
          StatementWorld(
            emptyLike("p_statements", Seq("shard")),
            emptyLike("p_evidence", Seq("shard")),
            emptyLike("p_agents", Seq("shard", "batch_id")),
            emptyLike("p_mesh", Seq("shard", "mk_hash")),
            emptyLike("p_refs", Seq("shard"))),
          graft.core.TypeRegistry.indra, Seq("reach", "medscan"),
          Seq("signor"), None, db, shards = 8, batchId = 900000L + w,
          agentsPerHash = true, beliefUpdates = Some(bu))
      }
      if (w == waves - 1)
        IncrementalReadonly.compactIfNeeded(spark, db, s"${db}_c2",
          buckets = 4, maxFilesPerShard = 1)
    } finally StoreFaults.disarm() // a failing wave must not poison later suites
    assert(crashes >= 3, s"soak must actually crash (got $crashes)")

    // ---- oracle: full batch rebuild over the union world ----------------
    val all = allRows.toSeq.toDF("raw_stmt_id", "src", "raw_json")
    val (valid, _) = Preassembly.partitionValid(Preassembly.parse(all))
    val v = valid.localCheckpoint(false)
    val uniq = v.select(col("mk_hash"), col("stmt.type").as("stype")).distinct()
    val agents = Preassembly.agentRows(v)
    val closure = Refinement.transitiveClosure(
      Pipeline.refinementEdges(uniq, agents).unionByName(
        Refinement.ontologyRefinementEdges(uniq, agents, curOnt))
        .distinct())
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

    // ---- the maintained stores converged to the rebuild -----------------
    val inc = IncrementalReadonly.load(spark, db)
    assert(canon(inc.sourceMeta) == canon(full.sourceMeta))
    assert(canon(inc.nameMeta) == canon(full.nameMeta))
    assert(canon(inc.agentInteractions) == canon(full.agentInteractions))
    assert(canon(inc.fastRawPaLink) == canon(full.fastRawPaLink))
    val incBelief = IncrementalBelief.belief(spark, bdb).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val oracleBelief = belief.collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(incBelief == oracleBelief,
      "belief store diverged from the batch rebuild after the soak")
    val incClosure = IncrementalBelief.closure(spark, bdb).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val oracleClosure = closure.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(incClosure == oracleClosure,
      "refinement closure diverged from the batch rebuild after the soak")
    // forward/reverse closure copies stayed in sync through every crash
    def pairs(t: String) = spark.table(s"$bdb.$t").select("desc", "anc")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs("c_by_desc") == pairs("c_by_anc"))
    // a final compaction of the soaked store serves identical rows
    IncrementalReadonly.compactInto(spark, db, s"${db}_cf", buckets = 4)
    val compacted = graft.assembly.Deploy.load(spark, s"${db}_cf")
    assert(canon(compacted.sourceMeta) == canon(inc.sourceMeta))
    assert(canon(compacted.agentInteractions) == canon(inc.agentInteractions))
  }

  test("dedup-index soak: crashes + in-stream compaction == fresh build") {
   withNarrowShuffle {
    import graft.operators.Dedup
    import graft.sources.Tables
    val rng = new scala.util.Random(7L)
    val docsDir = java.nio.file.Files.createTempDirectory("soak-dd-docs").toString
    val ckDir = java.nio.file.Files.createTempDirectory("soak-dd-ck").toString
    val pairsDir = java.nio.file.Files.createTempDirectory("soak-dd-pairs").toString
    val idxDb = "graft_soak_dd_idx"
    val freshDb = "graft_soak_dd_fresh"
    Seq(idxDb, freshDb).foreach { d =>
      spark.sql(s"DROP DATABASE IF EXISTS $d CASCADE")
    }
    val docs = Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    // seed index, then six delta waves with crashes armed at the two
    // appendIndex write boundaries and the file-pressure compaction
    // firing in-stream (maxFilesPerBucket = 2)
    Dedup.writeIndex(docs.filter(col("doc_id") % 8 === 0),
      "doc_id", "text", idxDb, buckets = 4)
    var crashes = 0
    try (1 to 6).foreach { w =>
      docs.filter(col("doc_id") % 8 === w)
        .coalesce(1).write.mode("append").parquet(docsDir)
      var plan =
        if (rng.nextBoolean()) List(1 + rng.nextInt(2)) else Nil
      var done = false
      while (!done) {
        plan match {
          case n :: rest => StoreFaults.armCrashAt(n); plan = rest
          case Nil => StoreFaults.disarm()
        }
        val q = Streams.streamingNearDups(spark, docsDir, idxDb,
          indexBuckets = 4, ckDir, pairsDir, maxFilesPerBucket = 2)
        try { q.awaitTermination(); StoreFaults.disarm(); done = true }
        catch { case e: Throwable if isInjected(e) => crashes += 1 }
      }
    } finally StoreFaults.disarm()
    assert(crashes >= 2, s"dedup soak must actually crash (got $crashes)")

    // the soaked (crashed, replayed, compacted) index equals a fresh
    // single-shot build over the union corpus — rows and probe results
    val ingested = docs.filter(col("doc_id") % 8 <= 6)
    Dedup.writeIndex(ingested, "doc_id", "text", freshDb, buckets = 4)
    val (sigs, sh) = Dedup.loadIndex(spark, idxDb)
    val (fSigs, fSh) = Dedup.loadIndex(spark, freshDb)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    assert(rows(sigs) == rows(fSigs), "band_sigs diverged from fresh build")
    assert(rows(sh) == rows(fSh), "shingles diverged from fresh build")
    val probe = docs.filter(col("doc_id") % 8 === 7)
      .select((col("doc_id") + 700000L).as("doc_id"), col("text"))
    def pairsOf(si: org.apache.spark.sql.DataFrame,
        shi: org.apache.spark.sql.DataFrame) =
      Dedup.deltaNearDups(probe, "doc_id", "text", si, shi)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairsOf(sigs, sh) == pairsOf(fSigs, fSh))
   }
  }

  test("8-batch crash-injection soak (small world)") {
    withNarrowShuffle {
      soak("s", waves = 8, entities = 5, specifics = 4,
        stmtsPerWave = 4, seed = 41L)
    }
  }

  test("10-batch crash-injection soak (larger world, mid-soak ontology delta)") {
    withNarrowShuffle {
      soak("l", waves = 10, entities = 9, specifics = 6,
        stmtsPerWave = 12, seed = 4242L, ontologyDeltaAt = Some(5))
    }
  }
}
