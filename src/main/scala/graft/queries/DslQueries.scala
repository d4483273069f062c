package graft.queries

import org.apache.spark.sql.functions._
import graft.querydsl._

/** The statement-engine query DSL exercised end-to-end through the DuckDB
  * gate: every query here (a) assembles the readonly layer from the TPC-H
  * mapping ([[TpchWorld]]) with [[graft.assembly.ReadonlyBuilder]], then
  * (b) compiles a [[StmtQuery]] tree with [[QueryCompiler]] / [[Results]].
  * The oracles replicate the same semantics as relational SQL over a shared
  * CTE prefix.
  */
object DslQueries extends QueryPack {

  /** DuckDB CTE prefix replicating TpchWorld + ReadonlyBuilder. */
  val PREFIX: String = """WITH li AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY l_orderkey
            ORDER BY l_linenumber, l_partkey, l_suppkey, l_extendedprice) AS evn
  FROM lineitem),
ev AS (
  SELECT l_orderkey AS mk_hash,
         l_orderkey*100 + evn AS sid,
         CASE l_returnflag WHEN 'A' THEN 'reach' WHEN 'N' THEN 'medscan' ELSE 'signor' END AS src,
         l_suppkey AS pmid,
         l_orderkey*100 + evn AS rid,
         CAST(l_linenumber AS INTEGER) AS ag_num,
         CASE WHEN l_returnflag='N' THEN 'NAME' WHEN l_returnflag='R' THEN 'TEXT'
              WHEN l_linestatus='F' THEN 'CHEBI' ELSE 'HGNC' END AS db_name,
         'P' || CAST(l_partkey AS VARCHAR) AS db_id,
         CAST(l_linenumber % 3 - 1 AS INTEGER) AS role_num,
         l_partkey % 100 AS mesh_num,
         CAST(l_partkey % 2 AS INTEGER) AS is_concept,
         l_orderkey AS trid,
         l_orderkey*100 + evn + 500000 AS tcid,
         l_suppkey + 7000 AS pmcid_num,
         1000 + l_partkey % 5 AS doi_ns,
         'j' || CAST(l_partkey AS VARCHAR) AS doi_id
  FROM li),
stmt AS (
  SELECT o_orderkey AS mk_hash,
         CASE o_orderpriority WHEN '1-URGENT' THEN 0 WHEN '2-HIGH' THEN 1
              WHEN '3-MEDIUM' THEN 2 WHEN '4-NOT SPECIFIED' THEN 3 ELSE 4 END AS type_num,
         CAST(o_custkey % 1000 AS DOUBLE)/1000.0 AS belief
  FROM orders),
src_cnt AS (SELECT mk_hash, src, COUNT(*) AS c FROM ev GROUP BY 1, 2),
stmt_agg AS (
  SELECT e.mk_hash, COUNT(*) AS ev_count,
         CAST(COUNT(DISTINCT e.ag_num) AS BIGINT) AS agent_count,
         CAST(COUNT(DISTINCT e.src) AS INTEGER) AS num_srcs,
         CASE WHEN COUNT(DISTINCT e.src)=1 THEN MIN(e.src) END AS only_src,
         BOOL_OR(e.src IN ('reach','medscan')) AS has_rd,
         BOOL_OR(e.src = 'signor') AS has_db
  FROM ev e GROUP BY e.mk_hash),
meta AS (
  SELECT s.mk_hash, s.type_num, s.belief, a.ev_count, a.agent_count,
         a.num_srcs, a.only_src, a.has_rd, a.has_db
  FROM stmt s JOIN stmt_agg a ON s.mk_hash = a.mk_hash),
agent_meta AS (
  SELECT e.mk_hash, e.ag_num, e.db_name, e.db_id, e.role_num,
         m.type_num, m.ev_count, m.belief, m.agent_count
  FROM ev e JOIN meta m ON e.mk_hash = m.mk_hash),
ai AS (
  SELECT e.mk_hash,
         string_agg(CAST(e.ag_num AS VARCHAR) || ':' || e.db_id, ';'
                    ORDER BY CAST(e.ag_num AS VARCHAR) || ':' || e.db_id) AS agent_str
  FROM ev e WHERE e.db_name = 'NAME' GROUP BY e.mk_hash)
"""

  /** DuckDB replica of English.metaEnglish over the name list derived from
    * an agent_str ("ag_num:db_id;..."): the `_make_english_from_meta` shape
    * (indra_db_service/util.py:144-165). */
  private def englishSql(agentStr: String): String = {
    val nm =
      s"list_transform(string_split($agentStr, ';'), x -> string_split(x, ':')[2])"
    s"""CASE WHEN len($nm) = 0 THEN ''
         WHEN len($nm) = 1 THEN '<b>' || ($nm)[1] || '</b> is modified'
         ELSE '<b>' || ($nm)[1] || '</b> affects <b>' || ($nm)[2] || '</b>'
           || CASE WHEN len($nm) > 3 THEN ', ' || array_to_string(
                list_transform(list_slice($nm, 3, len($nm) - 1),
                  z -> '<b>' || z || '</b>'), ', ') ELSE '' END
           || CASE WHEN len($nm) > 2
              THEN ', and <b>' || ($nm)[len($nm)] || '</b>' ELSE '' END
       END"""
  }

  private def run(q: StmtQuery) =
    (s: org.apache.spark.sql.SparkSession, dir: String) =>
      QueryCompiler.compile(q, TpchWorld.readonly(s, dir), TpchWorld.types)

  /** One-time base-store builds for q_readonly_incremental, per
    * (session, dir) — see the gate's comment. */
  private val incInitDone =
    scala.collection.concurrent.TrieMap.empty[String, Unit]

  private val SEL = "SELECT DISTINCT mk_hash, ev_count, belief FROM "

  def defs: Map[String, QueryDef] = Map(

    "q_dsl_has_agent" -> QueryDef(
      run(HasAgent("P5")),
      Some(PREFIX + SEL +
        "agent_meta WHERE db_name='NAME' AND db_id='P5'"),
    ),

    // LIKE-wildcard agent id (the reference compiles db_id.like(id))
    "q_dsl_agent_like" -> QueryDef(
      run(HasAgent("P19%")),
      Some(PREFIX + SEL +
        "agent_meta WHERE db_name='NAME' AND db_id LIKE 'P19%'"),
    ),

    "q_dsl_has_agent_role" -> QueryDef(
      run(HasAgent("P7", namespace = "CHEBI", role = Some("SUBJECT"))),
      Some(PREFIX + SEL +
        "agent_meta WHERE db_name='CHEBI' AND db_id='P7' AND role_num=-1"),
    ),

    // HasSources & flag & bound leaves fuse into ONE source_meta scan
    // (SourceIntersection, query.py:1199-1345)
    "q_dsl_source_fusion" -> QueryDef(
      run(HasSources(Seq("reach", "signor")) & HasReadings() &
        HasEvidenceBound(Seq(EvBound.parse(">= 3")))),
      Some(PREFIX + """SELECT mk_hash, ev_count, belief FROM meta
        WHERE has_rd AND ev_count >= 3
          AND mk_hash IN (SELECT mk_hash FROM src_cnt WHERE src='reach')
          AND mk_hash IN (SELECT mk_hash FROM src_cnt WHERE src='signor')"""),
    ),

    "q_dsl_only_source" -> QueryDef(
      run(HasOnlySource("signor")),
      Some(PREFIX + "SELECT mk_hash, ev_count, belief FROM meta WHERE only_src = 'signor'"),
    ),

    "q_dsl_not_only_source" -> QueryDef(
      run(~HasOnlySource("medscan") & HasDatabases()),
      Some(PREFIX + """SELECT mk_hash, ev_count, belief FROM meta
        WHERE has_db AND (only_src IS NULL OR only_src <> 'medscan')"""),
    ),

    "q_dsl_union" -> QueryDef(
      run(HasAgent("P3") | FromMeshIds(Seq("D8"))),
      Some(PREFIX + """SELECT mk_hash, ev_count, belief FROM meta
        WHERE mk_hash IN (SELECT mk_hash FROM agent_meta WHERE db_name='NAME' AND db_id='P3')
           OR mk_hash IN (SELECT mk_hash FROM ev WHERE mesh_num=8 AND is_concept=0)"""),
    ),

    // inverted agent leaf -> anti-join, intrusive type pushed as predicate
    "q_dsl_invert_agent" -> QueryDef(
      run(HasType(Seq("2-HIGH")) & ~HasAgent("P3")),
      Some(PREFIX + """SELECT mk_hash, ev_count, belief FROM meta
        WHERE type_num = 1
          AND mk_hash NOT IN (SELECT mk_hash FROM agent_meta
                              WHERE db_name='NAME' AND db_id='P3')"""),
    ),

    "q_dsl_intersection" -> QueryDef(
      run(HasAgent("P2") & HasType(Seq("1-URGENT", "3-MEDIUM")) &
        HasEvidenceBound(Seq(EvBound.parse(">= 2")))),
      Some(PREFIX + """SELECT DISTINCT mk_hash, ev_count, belief FROM agent_meta
        WHERE db_name='NAME' AND db_id='P2' AND type_num IN (0, 2) AND ev_count >= 2"""),
    ),

    "q_dsl_from_papers" -> QueryDef(
      run(FromPapers(Seq("pmid" -> "5", "pmid" -> "17"))),
      Some(PREFIX + """SELECT mk_hash, ev_count, belief FROM meta
        WHERE mk_hash IN (SELECT DISTINCT mk_hash FROM ev WHERE pmid IN (5, 17))"""),
    ),

    // five paper-id types route to their numeric lookup columns: doi
    // decomposes to (ns, id), pmcid strips the PMC prefix, trid/tcid hit
    // their columns directly (query.py:1811-1900)
    "q_dsl_from_papers_doi" -> QueryDef(
      run(FromPapers(Seq(
        "doi" -> "10.1000/j5", "doi" -> "10.1002/j7",
        "pmcid" -> "PMC7003", "tcid" -> "500101", "trid" -> "3"))),
      Some(PREFIX + """SELECT mk_hash, ev_count, belief FROM meta
        WHERE mk_hash IN (SELECT DISTINCT mk_hash FROM ev
          WHERE (doi_ns = 1000 AND doi_id = 'j5')
             OR (doi_ns = 1002 AND doi_id = 'j7')
             OR pmcid_num = 7003 OR tcid = 500101 OR trid = 3)"""),
    ),

    // mixed C/D mesh list auto-splits into a Union (query.py:1926-1949)
    "q_dsl_mesh_mixed" -> QueryDef(
      run(FromMeshIds(Seq("D8", "C7"))),
      Some(PREFIX + """SELECT mk_hash, ev_count, belief FROM meta
        WHERE mk_hash IN (SELECT mk_hash FROM ev WHERE mesh_num=8 AND is_concept=0)
           OR mk_hash IN (SELECT mk_hash FROM ev WHERE mesh_num=7 AND is_concept=1)"""),
    ),

    "q_dsl_hashes" -> QueryDef(
      run(HasHash(Set(1L, 2L, 3L, 500L))),
      Some(PREFIX + "SELECT mk_hash, ev_count, belief FROM meta WHERE mk_hash IN (1,2,3,500)"),
    ),

    // compound algebra: (P2 | P3) & reach-sourced & not-only-reach
    "q_dsl_algebra" -> QueryDef(
      run((HasAgent("P2") | HasAgent("P3")) & HasSources(Seq("reach")) &
        ~HasOnlySource("reach")),
      Some(PREFIX + """SELECT mk_hash, ev_count, belief FROM meta
        WHERE (mk_hash IN (SELECT mk_hash FROM agent_meta WHERE db_name='NAME' AND db_id='P2')
            OR mk_hash IN (SELECT mk_hash FROM agent_meta WHERE db_name='NAME' AND db_id='P3'))
          AND mk_hash IN (SELECT mk_hash FROM src_cnt WHERE src='reach')
          AND (only_src IS NULL OR only_src <> 'reach')"""),
    ),

    // results layer: sorted/paged hash envelope
    "q_dsl_top_hashes" -> QueryDef(
      (s, dir) => Results.hashes(
        HasSources(Seq("medscan")), TpchWorld.readonly(s, dir), TpchWorld.types,
        sortBy = "ev_count", limit = 50),
      Some(PREFIX + """SELECT mk_hash, ev_count, belief FROM meta
        WHERE mk_hash IN (SELECT mk_hash FROM src_cnt WHERE src='medscan')
        ORDER BY ev_count DESC, mk_hash ASC LIMIT 50"""),
    ),

    // belief-sorted page 2 (offset + limit envelope)
    "q_dsl_page_belief" -> QueryDef(
      (s, dir) => Results.hashes(
        HasSources(Seq("signor")), TpchWorld.readonly(s, dir), TpchWorld.types,
        sortBy = "belief", limit = 40, offset = 20),
      Some(PREFIX + """SELECT mk_hash, ev_count, belief FROM meta
        WHERE mk_hash IN (SELECT mk_hash FROM src_cnt WHERE src='signor')
        ORDER BY belief DESC, mk_hash ASC LIMIT 40 OFFSET 20"""),
    ),

    // evidence filter by paper ids (joins reading_ref_link on demand)
    "q_dsl_ev_filter_papers" -> QueryDef(
      (s, dir) => Results.statements(
        HasAgent("P13"), TpchWorld.readonly(s, dir), TpchWorld.types,
        evLimit = 3,
        evFilter = Some(EvPapers((0L to 40L).toSeq))),
      Some(PREFIX + """SELECT mk_hash, sid, src, pmid, rn FROM (
          SELECT e.mk_hash, e.sid, e.src, e.pmid,
                 ROW_NUMBER() OVER (PARTITION BY e.mk_hash ORDER BY e.sid ASC) AS rn
          FROM ev e
          WHERE e.mk_hash IN (SELECT mk_hash FROM agent_meta
                              WHERE db_name='NAME' AND db_id='P13')
            AND e.pmid BETWEEN 0 AND 40)
        WHERE rn <= 3"""),
    ),

    // mesh_ref_counts service shape: per-hash matched mesh ids + distinct
    // paper counts, require_all keeps fully-annotated hashes only
    "q_dsl_mesh_counts" -> QueryDef(
      (s, dir) => Results.meshRefCounts(
        HasReadings(), TpchWorld.readonly(s, dir), TpchWorld.types,
        meshNums = Seq(6L, 8L), requireAll = true),
      Some(PREFIX + """, mt AS (
          SELECT e.mk_hash, e.mesh_num, COUNT(DISTINCT e.pmid) AS ref_count
          FROM ev e
          WHERE e.is_concept = 0 AND e.mesh_num IN (6, 8)
            AND e.mk_hash IN (SELECT mk_hash FROM meta WHERE has_rd)
          GROUP BY 1, 2)
        SELECT mk_hash,
          string_agg(CAST(mesh_num AS VARCHAR) || ':' || CAST(ref_count AS VARCHAR),
                     ';' ORDER BY CAST(mesh_num AS VARCHAR) || ':' || CAST(ref_count AS VARCHAR)) AS mesh_counts,
          CAST(COUNT(DISTINCT mesh_num) AS BIGINT) AS n_mesh
        FROM mt GROUP BY 1 HAVING COUNT(DISTINCT mesh_num) = 2"""),
    ),

    // results layer: evidence rows with per-statement ev_limit window
    "q_dsl_statements" -> QueryDef(
      (s, dir) => Results.statements(
        HasAgent("P11"), TpchWorld.readonly(s, dir), TpchWorld.types, evLimit = 2),
      Some(PREFIX + """SELECT mk_hash, sid, src, pmid, rn FROM (
          SELECT e.mk_hash, e.sid, e.src, e.pmid,
                 ROW_NUMBER() OVER (PARTITION BY e.mk_hash ORDER BY e.sid ASC) AS rn
          FROM ev e
          WHERE e.mk_hash IN (SELECT mk_hash FROM agent_meta
                              WHERE db_name='NAME' AND db_id='P11'))
        WHERE rn <= 2"""),
    ),

    // Incremental readonly maintenance: the world split into a base build
    // plus a 10%-of-evidence delta batch, applied through the shard-local
    // upsert; the DSL then compiles against the delta-maintained store.
    // The oracle computes over the FULL world — passing proves the
    // incrementally-maintained layer serves exactly what a from-scratch
    // rebuild would (supplement semantics at the readonly layer, which the
    // reference only achieves by rebuilding: preassemble_db.py:481-615 +
    // readonly_dumping.py RUN_ORDER).
    "q_readonly_incremental" -> QueryDef(
      (s, dir) => {
        import graft.assembly.IncrementalReadonly
        val db = "graft_ro_inc_" + math.abs(dir.hashCode).toString
        // base build once per (session, dir): repeated evaluations (bench
        // median-of-3) then measure the incremental path itself — the
        // guarded-idempotent upserts re-derive the touched shards each
        // call, which IS the per-batch maintenance cost. The delta is 5%
        // of evidence (a realistic batch:corpus ratio; the oracle is the
        // UNION world, so the split is free to choose) delivered as THREE
        // sequential batches so principal appends, belief-less derived
        // rewrites, and guards compose across batch boundaries
        incInitDone.getOrElseUpdate(
          System.identityHashCode(s) + ":" + dir, {
            val base =
              TpchWorld.world(s, dir, Some(col("l_partkey") % 20 =!= 0))
            IncrementalReadonly.reset(s, db)
            IncrementalReadonly.init(s, base, TpchWorld.types,
              TpchWorld.readerSources, TpchWorld.dbSources,
              Some(TpchWorld.complexTypeNum), db, shards = 16)
          })
        (0 to 2).foreach { b =>
          val slice = TpchWorld.world(s, dir, Some(
            col("l_partkey") % 20 === 0 && pmod(col("l_orderkey"), lit(3)) === b))
          IncrementalReadonly.upsert(s, slice, TpchWorld.types,
            TpchWorld.readerSources, TpchWorld.dbSources,
            Some(TpchWorld.complexTypeNum), db, shards = 16, batchId = 1L + b)
        }
        val ro = IncrementalReadonly.load(s, db)
        QueryCompiler.compile(
            HasAgent("P5") & HasSources(Seq("reach")), ro, TpchWorld.types)
          .join(ro.agentInteractions.filter(!col("is_complex_dup"))
            .select("mk_hash", "agent_str"), "mk_hash")
      },
      Some(PREFIX + """SELECT m.mk_hash, m.ev_count, m.belief, i.agent_str
        FROM meta m JOIN ai i ON i.mk_hash = m.mk_hash
        WHERE m.mk_hash IN (SELECT mk_hash FROM agent_meta
                            WHERE db_name='NAME' AND db_id='P5')
          AND m.mk_hash IN (SELECT mk_hash FROM src_cnt WHERE src='reach')"""),
    ),

    // SIF interaction export (util/dump_sif.py:298-466): one row per
    // directed agent pair per statement — priority grounding, names, type,
    // evidence count, residue/position, canonical source counts, belief.
    // The planted res/pos frame stands in for the Modification pa_json
    // surface (type_num 1 plays the Modification class), exercising the
    // left join + missing-hash-null semantics end to end.
    "q_sif_pairs" -> QueryDef(
      (s, dir) => {
        val ro = TpchWorld.readonly(s, dir)
        val resPos = ro.sourceMeta.filter(col("type_num") === 1)
          .select(col("mk_hash"), lit("S").as("residue"),
            (col("mk_hash") % 400).cast("string").as("position"))
        val sif = graft.assembly.Sif.dump(ro, TpchWorld.types,
          Some(TpchWorld.complexTypeNum), Some(resPos))
        sif.withColumn("source_counts",
          graft.assembly.Sif.srcStr(col("source_counts")))
      },
      Some(PREFIX + """, grounded AS (
          SELECT mk_hash, ag_num, db_name AS ns, db_id AS id FROM (
            SELECT mk_hash, ag_num, db_name, db_id,
              CASE db_name WHEN 'HGNC' THEN 2 WHEN 'CHEBI' THEN 4 END AS rank,
              ROW_NUMBER() OVER (PARTITION BY mk_hash, ag_num
                ORDER BY CASE db_name WHEN 'HGNC' THEN 2 WHEN 'CHEBI' THEN 4 END,
                         db_id) AS rn
            FROM agent_meta WHERE db_name IN ('HGNC', 'CHEBI'))
          WHERE rn = 1),
        nm AS (SELECT mk_hash, ag_num, min(db_id) AS name
               FROM agent_meta WHERE db_name = 'NAME' GROUP BY 1, 2),
        agx AS (
          SELECT g.mk_hash, g.ag_num, g.ns, g.id, nm.name,
            ROW_NUMBER() OVER (PARTITION BY g.mk_hash ORDER BY g.ag_num) AS pos,
            COUNT(*) OVER (PARTITION BY g.mk_hash) AS n
          FROM grounded g LEFT JOIN nm USING (mk_hash, ag_num)),
        lin AS (
          SELECT a.mk_hash, a.ns AS agA_ns, a.id AS agA_id, a.name AS agA_name,
                 b.ns AS agB_ns, b.id AS agB_id, b.name AS agB_name
          FROM agx a JOIN agx b ON a.mk_hash = b.mk_hash
            AND a.pos = 1 AND b.pos = 2
          JOIN meta m ON m.mk_hash = a.mk_hash AND m.type_num <> 3
          WHERE a.n >= 2),
        cx AS (
          SELECT a.mk_hash, a.ns AS agA_ns, a.id AS agA_id, a.name AS agA_name,
                 b.ns AS agB_ns, b.id AS agB_id, b.name AS agB_name
          FROM agx a JOIN agx b ON a.mk_hash = b.mk_hash AND a.pos <> b.pos
          JOIN meta m ON m.mk_hash = a.mk_hash AND m.type_num = 3
          WHERE a.n BETWEEN 2 AND 3),
        prs AS (SELECT * FROM lin UNION ALL SELECT * FROM cx),
        srcs AS (SELECT mk_hash,
            string_agg(src || ':' || CAST(c AS VARCHAR), ';' ORDER BY src)
              AS source_counts
          FROM src_cnt GROUP BY 1),
        respos AS (SELECT mk_hash, 'S' AS residue,
            CAST(mk_hash % 400 AS VARCHAR) AS position
          FROM meta WHERE type_num = 1)
        SELECT p.agA_ns, p.agA_id, p.agA_name, p.agB_ns, p.agB_id, p.agB_name,
          CASE m.type_num WHEN 0 THEN '1-URGENT' WHEN 1 THEN '2-HIGH'
            WHEN 2 THEN '3-MEDIUM' WHEN 3 THEN '4-NOT SPECIFIED'
            ELSE '5-LOW' END AS stmt_type,
          m.ev_count AS evidence_count,
          p.mk_hash AS stmt_hash,
          r.residue, r.position,
          s.source_counts,
          m.belief
        FROM prs p
        JOIN meta m ON m.mk_hash = p.mk_hash
        JOIN srcs s ON s.mk_hash = p.mk_hash
        LEFT JOIN respos r ON r.mk_hash = p.mk_hash"""),
    ),

    // StatementHashMeshId dump element (cli/dump.py:563-589): the
    // hash -> mesh_num mapping from BOTH mesh meta tables, the pickle's
    // 'terms'/'concepts' dict keys carried as a kind column
    "q_hash_mesh_dump" -> QueryDef(
      (s, dir) => graft.assembly.DumpRegistry.hashMeshIds(
        TpchWorld.readonly(s, dir)),
      Some(PREFIX + """SELECT 'terms' AS kind, mk_hash, mesh_num FROM (
          SELECT DISTINCT mk_hash, mesh_num FROM ev WHERE is_concept = 0)
        UNION ALL
        SELECT 'concepts' AS kind, mk_hash, mesh_num FROM (
          SELECT DISTINCT mk_hash, mesh_num FROM ev WHERE is_concept = 1)"""),
    ),

    // meta result layers over agent_interactions
    "q_dsl_interactions" -> QueryDef(
      (s, dir) => Results.interactions(
        HasType(Seq("1-URGENT")), TpchWorld.readonly(s, dir), TpchWorld.types)
        .select(col("mk_hash"), col("agent_str"),
          col("type_num").cast("long").as("type_num"),
          col("ev_count"), col("belief")),
      Some(PREFIX + """SELECT i.mk_hash, i.agent_str,
          CAST(m.type_num AS BIGINT) AS type_num, m.ev_count, m.belief
        FROM ai i JOIN meta m ON i.mk_hash = m.mk_hash WHERE m.type_num = 0"""),
    ),

    "q_dsl_relations" -> QueryDef(
      (s, dir) => Results.relations(
        HasSources(Seq("reach")), TpchWorld.readonly(s, dir), TpchWorld.types)
        .select(col("agent_str"), col("type_num").cast("long").as("type_num"),
          col("total_ev"), col("max_belief"), col("n_hashes"), col("src_str")),
      Some(PREFIX + """, sel AS (
          SELECT mk_hash FROM meta
          WHERE mk_hash IN (SELECT mk_hash FROM src_cnt WHERE src='reach')),
        rel AS (
          SELECT i.agent_str, CAST(m.type_num AS BIGINT) AS type_num,
            CAST(SUM(m.ev_count) AS BIGINT) AS total_ev,
            MAX(m.belief) AS max_belief, COUNT(*) AS n_hashes
          FROM ai i JOIN meta m ON i.mk_hash = m.mk_hash
          WHERE m.mk_hash IN (SELECT mk_hash FROM sel)
          GROUP BY 1, 2),
        rel_src AS (
          SELECT i.agent_str, CAST(m.type_num AS BIGINT) AS type_num,
            sc.src, SUM(sc.c) AS c
          FROM ai i
          JOIN meta m ON i.mk_hash = m.mk_hash
          JOIN src_cnt sc ON sc.mk_hash = i.mk_hash
          WHERE m.mk_hash IN (SELECT mk_hash FROM sel)
          GROUP BY 1, 2, 3),
        rel_srcstr AS (
          SELECT agent_str, type_num,
            string_agg(src || ':' || CAST(c AS VARCHAR), ';' ORDER BY src) AS src_str
          FROM rel_src GROUP BY 1, 2)
        SELECT r.agent_str, r.type_num, r.total_ev, r.max_belief, r.n_hashes,
               s.src_str
        FROM rel r JOIN rel_srcstr s
          ON r.agent_str = s.agent_str AND r.type_num = s.type_num"""),
    ),

    // evidence-level filter: restrict returned evidence rows (not the
    // statement selection) before the ev_limit window
    "q_dsl_ev_filtered" -> QueryDef(
      (s, dir) => Results.statements(
        HasAgent("P11"), TpchWorld.readonly(s, dir), TpchWorld.types,
        evLimit = 2,
        evFilter = Some(EvSource(Seq("medscan")) | EvMesh(Seq(8L)))),
      Some(PREFIX + """SELECT mk_hash, sid, src, pmid, rn FROM (
          SELECT e.mk_hash, e.sid, e.src, e.pmid,
                 ROW_NUMBER() OVER (PARTITION BY e.mk_hash ORDER BY e.sid ASC) AS rn
          FROM ev e
          WHERE e.mk_hash IN (SELECT mk_hash FROM agent_meta
                              WHERE db_name='NAME' AND db_id='P11')
            AND (e.src = 'medscan' OR (e.mesh_num = 8 AND e.is_concept = 0)))
        WHERE rn <= 2"""),
    ),

    // agents view INCLUDING complex pairs with the reference's group-level
    // complexes-covered dedup: the scan takes ALL rows (complex base rows
    // included); a group is dropped only when every hash in it is a complex
    // covered by a better-ranked group; kept groups keep FULL totals
    "q_dsl_agents_complexes" -> QueryDef(
      (s, dir) => Results.agentsWithComplexes(
        HasReadings(), TpchWorld.readonly(s, dir), TpchWorld.types,
        complexTypeNum = 3),
      Some(PREFIX + """, sel AS (SELECT mk_hash FROM meta WHERE has_rd),
        rows_ AS (
          SELECT i.mk_hash, i.agent_str, m.agent_count, m.type_num,
                 m.ev_count, m.belief
          FROM ai i JOIN meta m ON i.mk_hash = m.mk_hash
          WHERE m.mk_hash IN (SELECT mk_hash FROM sel)
          UNION
          SELECT DISTINCT a.mk_hash,
                 '0:' || a.db_id || ';1:' || b.db_id AS agent_str,
                 CAST(2 AS BIGINT) AS agent_count, m.type_num,
                 m.ev_count, m.belief
          FROM ev a
          JOIN ev b ON a.mk_hash = b.mk_hash AND a.ag_num <> b.ag_num
          JOIN meta m ON m.mk_hash = a.mk_hash
          WHERE a.db_name = 'NAME' AND b.db_name = 'NAME'
            AND m.type_num = 3 AND m.mk_hash IN (SELECT mk_hash FROM sel)
            AND NOT (m.agent_count = 2 AND a.ag_num < b.ag_num)),
        groups_ AS (
          SELECT agent_str, agent_count,
                 CAST(SUM(ev_count) AS BIGINT) AS total_ev,
                 MAX(belief) AS max_belief, COUNT(*) AS n_hashes,
                 MAX(CASE WHEN type_num <> 3 THEN 1 ELSE 0 END) AS has_other
          FROM rows_ GROUP BY 1, 2),
        cjoin AS (
          SELECT r.mk_hash, r.agent_str, r.agent_count, g.total_ev
          FROM rows_ r JOIN groups_ g
            ON r.agent_str = g.agent_str AND r.agent_count = g.agent_count
          WHERE r.type_num = 3),
        covering AS (
          SELECT DISTINCT agent_str, agent_count FROM (
            SELECT agent_str, agent_count,
              ROW_NUMBER() OVER (PARTITION BY mk_hash
                ORDER BY total_ev DESC, agent_str ASC, agent_count ASC) AS rn
            FROM cjoin) WHERE rn = 1)
        SELECT agent_str, agent_count, total_ev, max_belief, n_hashes
        FROM groups_ g
        WHERE g.has_other = 1
           OR EXISTS (SELECT 1 FROM covering c
                      WHERE c.agent_str = g.agent_str
                        AND c.agent_count = g.agent_count)"""),
    ),

    // Complex pair expansion: ordered agent pairs per statement
    "q_complex_pairs" -> QueryDef(
      (s, dir) => graft.assembly.ReadonlyBuilder.complexPairs(
        TpchWorld.world(s, dir).agents.filter(col("db_name") === "NAME")),
      Some(PREFIX + """SELECT a.mk_hash,
          CAST(a.ag_num AS BIGINT) AS subj_num, a.db_id AS subj_id,
          CAST(b.ag_num AS BIGINT) AS obj_num, b.db_id AS obj_id,
          TRUE AS is_complex_dup
        FROM ev a JOIN ev b ON a.mk_hash = b.mk_hash AND a.ag_num <> b.ag_num
        WHERE a.db_name = 'NAME' AND b.db_name = 'NAME'"""),
    ),

    // FromAgentJson drill-down leaf: exact agent-set match on
    // agent_interactions (query.py:1155-1196)
    "q_dsl_from_agent_json" -> QueryDef(
      run(FromAgentJson(Map(1 -> "P1147"))),
      Some(PREFIX + """SELECT DISTINCT m.mk_hash, m.ev_count, m.belief
        FROM ai JOIN meta m ON ai.mk_hash = m.mk_hash
        WHERE ai.agent_str = '1:P1147'"""),
    ),

    // FromAgentJson constraint variants (stmt-type and hash-list,
    // _apply_constraints query.py:1106-1120) merged through the DSL union
    "q_dsl_from_agent_json_typed" -> QueryDef(
      run(FromAgentJson(Map(1 -> "P790"), stmtType = Some("4-NOT SPECIFIED")) |
        FromAgentJson(Map(1 -> "P790"), hashes = Some(Set(7430L, 8901L)))),
      Some(PREFIX + """SELECT DISTINCT m.mk_hash, m.ev_count, m.belief
        FROM ai JOIN meta m ON ai.mk_hash = m.mk_hash
        WHERE ai.agent_str = '1:P790'
          AND (m.type_num = 3 OR m.mk_hash IN (7430, 8901))"""),
    ),

    // AgentJsonExpander.expand on a pair-shaped agent set: row filter on
    // agent_interactions (agent_str equality, dups included) — only the
    // requested set's own rows aggregate, one relations group per type
    // (_apply_constraints, query.py:1106-1137); no hash-level join back to
    // the statements' other agent sets
    "q_dsl_expand" -> QueryDef(
      (s, dir) => Results.expand(Map(0 -> "P1458", 1 -> "P920"), None,
        TpchWorld.readonly(s, dir), TpchWorld.types),
      Some(PREFIX + s""", xrows AS (
          SELECT i.mk_hash, i.agent_str FROM ai i
          WHERE i.agent_str = '0:P1458;1:P920'
          UNION
          SELECT DISTINCT a.mk_hash,
                 '0:' || a.db_id || ';1:' || b.db_id AS agent_str
          FROM ev a JOIN ev b ON a.mk_hash = b.mk_hash AND a.ag_num <> b.ag_num
          JOIN meta m ON m.mk_hash = a.mk_hash
          WHERE a.db_name = 'NAME' AND b.db_name = 'NAME' AND m.type_num = 3
            AND NOT (m.agent_count = 2 AND a.ag_num < b.ag_num)
            AND '0:' || a.db_id || ';1:' || b.db_id = '0:P1458;1:P920'),
        xrel AS (
          SELECT r.agent_str, CAST(m.type_num AS BIGINT) AS type_num,
                 CAST(SUM(m.ev_count) AS BIGINT) AS total_ev,
                 MAX(m.belief) AS max_belief, COUNT(*) AS n_hashes
          FROM xrows r JOIN meta m ON r.mk_hash = m.mk_hash
          GROUP BY 1, 2),
        xrel_src AS (
          SELECT r.agent_str, CAST(m.type_num AS BIGINT) AS type_num,
                 sc.src, SUM(sc.c) AS c
          FROM xrows r JOIN meta m ON r.mk_hash = m.mk_hash
          JOIN src_cnt sc ON sc.mk_hash = r.mk_hash
          GROUP BY 1, 2, 3),
        xrel_srcstr AS (
          SELECT agent_str, type_num,
            string_agg(src || ':' || CAST(c AS VARCHAR), ';' ORDER BY src) AS src_str
          FROM xrel_src GROUP BY 1, 2)
        SELECT r.agent_str, r.type_num, r.total_ev, r.max_belief, r.n_hashes,
               s.src_str, ${englishSql("r.agent_str")} AS english
        FROM xrel r JOIN xrel_srcstr s
          ON r.agent_str = s.agent_str AND r.type_num = s.type_num"""),
    ),

    "q_dsl_agents_view" -> QueryDef(
      (s, dir) => Results.agents(
        HasNumAgents(Seq(2, 3)), TpchWorld.readonly(s, dir), TpchWorld.types),
      Some(PREFIX + s"""SELECT i.agent_str,
          CAST(COUNT(DISTINCT m.type_num) AS BIGINT) AS n_types,
          CAST(SUM(m.ev_count) AS BIGINT) AS total_ev,
          MAX(m.belief) AS max_belief, COUNT(*) AS n_hashes,
          ${englishSql("i.agent_str")} AS english
        FROM ai i JOIN meta m ON i.mk_hash = m.mk_hash
        WHERE m.agent_count IN (2, 3)
        GROUP BY 1"""),
    ),

    // full statement-result envelope as a black box: statementJsonResult's
    // JSON is probed with get_json_object and every extracted scalar must
    // match the oracle's independent reconstruction — typed english
    // sentence, total evidence, and the first spliced evidence row's
    // text-ref ids, reassembled DOI, content source, and prior raw id
    // (query.py:551-628 field-for-field on this world's available columns)
    "q_dsl_statements_env" -> QueryDef(
      (s, dir) => {
        val env = Results.statementJsonResult(
          HasAgent("P11"), TpchWorld.readonly(s, dir), TpchWorld.types,
          evLimit = 2)
        def j(p: String) = get_json_object(col("result_json"), p)
        env.select(col("mk_hash"),
          j("$.english").as("english"),
          j("$.ev_total").cast("long").as("ev_total"),
          j("$.evidence[0].text_refs.PMCID").cast("long").as("pmcid"),
          j("$.evidence[0].text_refs.TCID").cast("long").as("tcid"),
          j("$.evidence[0].text_refs.DOI").as("doi"),
          j("$.evidence[0].annotations.content_source").as("content_source"),
          j("$.evidence[0].annotations.prior_uuids[0]").cast("long")
            .as("prior_id"))
      },
      Some(PREFIX + """, sel AS (
          SELECT DISTINCT mk_hash FROM ev WHERE db_name='NAME' AND db_id='P11'),
        first_ev AS (
          SELECT e.* FROM ev e
          JOIN (SELECT mk_hash, MIN(sid) AS sid FROM ev
                WHERE mk_hash IN (SELECT mk_hash FROM sel) GROUP BY 1) f
            ON e.mk_hash = f.mk_hash AND e.sid = f.sid),
        names AS (
          SELECT mk_hash, ag_num, MIN(db_id) AS name FROM ev
          WHERE mk_hash IN (SELECT mk_hash FROM sel) GROUP BY 1, 2),
        name_list AS (
          SELECT mk_hash, list(name ORDER BY ag_num) AS nm FROM names GROUP BY 1),
        tot AS (SELECT mk_hash, COUNT(*) AS ev_total FROM ev
                WHERE mk_hash IN (SELECT mk_hash FROM sel) GROUP BY 1)
        SELECT f.mk_hash,
          CASE WHEN len(n.nm) = 1 THEN n.nm[1] || ' affects itself.'
               ELSE n.nm[1] || ' affects ' || n.nm[2] || '.' END AS english,
          t.ev_total,
          f.pmcid_num AS pmcid,
          f.tcid,
          '10.' || CAST(f.doi_ns AS VARCHAR) || '/' || f.doi_id AS doi,
          f.src AS content_source,
          f.sid AS prior_id
        FROM first_ev f
        JOIN name_list n ON f.mk_hash = n.mk_hash
        JOIN tot t ON f.mk_hash = t.mk_hash"""),
    ),
  )
}
