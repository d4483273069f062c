package graft.querydsl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The principal-side tables the raw-statement client joins over — the
  * reference's RawStatements / RawAgents / Reading / TextContent / TextRef
  * chain (client/principal/raw_statements.py:147-165).
  *
  *   - rawStatements: raw_stmt_id L, reading_id L (null for KB/db rows),
  *     stype S, raw_json S
  *   - rawAgents: raw_stmt_id L, ag_num I, db_name S, db_id S, role S
  *     (SUBJECT/OBJECT/OTHER — util/insert.py:180-192)
  *   - readings: rid L, tcid L
  *   - textContent: tcid L, trid L
  *   - textRefs: trid L [, pmid L, pmcid_num L, doi_ns L, doi_id S]
  */
final case class PrincipalTables(
    rawStatements: DataFrame,
    rawAgents: DataFrame,
    readings: DataFrame,
    textContent: DataFrame,
    textRefs: DataFrame)

/** One agent constraint of get_raw_stmt_jsons_from_agents
  * (raw_statements.py:96-117): id matched literally (the reference escapes
  * LIKE wildcards in the id), namespace as a LIKE pattern, role exact. */
final case class RawAgentConstraint(
    dbId: String,
    namespace: Option[String] = None,
    role: Option[String] = None)

/** Principal raw-statement client — the reference's
  * client/principal/raw_statements.py re-expressed as declarative joins.
  * The reference loops rows on the driver mutating each statement's
  * evidence dict; here the fix-up is a columnar envelope (the same shape
  * as [[Results.statementJsonResult]]): the untouched statement payload
  * string rides next to the spliced text-ref struct, serialized once at
  * egress. Selection (paper ids, agent intersections) happens as
  * semi-joins before any payload is carried, so only matched rows ever
  * shuffle the JSON strings.
  */
object RawStatements {

  /** regularize_agent_id (util/insert.py:159-174): strip the redundant
    * namespace prefix (CHEBI:/GO: with colon, HMDB/PF/IP bare) and leading
    * zeros from the id body. */
  private val nsAbbrevs = Seq("CHEBI" -> ":", "GO" -> ":", "HMDB" -> "",
    "PF" -> "", "IP" -> "")

  def regularizeAgentId(idVal: String, ns: Option[String]): String =
    ns.flatMap { n =>
      nsAbbrevs.collectFirst {
        case (abbrev, div) if n.toUpperCase == abbrev &&
            idVal.startsWith(abbrev) =>
          idVal.drop(abbrev.length + div.length).dropWhile(_ == '0')
      }
    }.getOrElse(idVal)

  /** Raw-agent rows from parsed raw statements — extract_agent_data
    * (util/insert.py:177-235): one row per db_refs entry PLUS a NAME row,
    * ids regularized, role names per the binary/n-ary split that
    * [[graft.assembly.Preassembly]] encodes as role_num (-1 SUBJECT,
    * 1 OBJECT, 0 OTHER). Input is the Preassembly.parse output filtered
    * valid; output keyed by raw_stmt_id (the principal raw_agents table,
    * principal_schema.py:703-721).
    */
  def rawAgentRows(parsed: DataFrame): DataFrame = {
    val ag = col("ag.agent")
    val entries = map_entries(ag.getField("db_refs"))
    val withName = concat(
      coalesce(entries, array()),
      array(struct(lit("NAME").as("key"), ag.getField("name").as("value"))))
    val roleName = when(col("ag.role_num") === -1, "SUBJECT")
      .when(col("ag.role_num") === 1, "OBJECT").otherwise("OTHER")
    val regularized = nsAbbrevs.foldLeft(col("r.value")) {
      case (acc, (abbrev, div)) =>
        when(upper(col("r.key")) === abbrev &&
            col("r.value").startsWith(abbrev),
          regexp_replace(
            substring_index(col("r.value"), abbrev + div, -1), "^0+", ""))
          .otherwise(acc)
    }
    parsed
      .withColumn("ag", explode(graft.assembly.Preassembly.agentEntries(col("stmt"))))
      .withColumn("r", explode(withName))
      .filter(col("r.value").isNotNull)
      .select(col("raw_stmt_id"), col("ag.ag_num").as("ag_num"),
        col("r.key").as("db_name"), regularized.as("db_id"),
        roleName.as("role"))
      .distinct()
  }

  /** The outer text-ref chain of get_raw_stmt_jsons
    * (raw_statements.py:147-165): raw -> reading -> content -> text_ref,
    * every hop LEFT OUTER so KB statements (no reading) survive with null
    * refs. */
  private def withRefChain(p: PrincipalTables): DataFrame =
    p.rawStatements
      .join(p.readings.select(col("rid").as("reading_id"), col("tcid")),
        Seq("reading_id"), "left")
      .join(p.textContent, Seq("tcid"), "left")
      .join(p.textRefs, Seq("trid"), "left")

  private def optCol(df: DataFrame, c: String, t: String): Column =
    if (df.columns.contains(c)) col(c) else lit(null).cast(t)

  /** The _fix_evidence splice (raw_statements.py:198-204) as an envelope:
    * text_refs under UPPER keys (DOI reassembled from its decomposition,
    * as in Results.statementJsonResult) plus TCID and READING_ID, and the
    * evidence pmid overwritten from the text ref. Applied only to rows
    * with a reading (`if rid is not None`, :175-176). */
  private def envelope(chained: DataFrame): DataFrame = {
    val pmid = optCol(chained, "pmid", "long")
    val doiNs = optCol(chained, "doi_ns", "long")
    val doi = when(doiNs.isNotNull,
      concat(lit("10."), doiNs.cast("string"), lit("/"),
        optCol(chained, "doi_id", "string")))
    val refs = struct(
      col("trid").as("TRID"), pmid.as("PMID"),
      optCol(chained, "pmcid_num", "long").as("PMCID"), doi.as("DOI"),
      col("tcid").as("TCID"), col("reading_id").as("READING_ID"))
    chained.select(col("raw_stmt_id"),
      to_json(struct(
        col("raw_stmt_id").as("id"),
        col("raw_json").as("statement"),
        when(col("reading_id").isNotNull, refs).as("text_refs"),
        when(col("reading_id").isNotNull, pmid).as("pmid")))
        .as("result_json"))
  }

  /** get_raw_stmt_jsons (raw_statements.py:137-179): arbitrary selection
    * of raw statements with the evidence fix-up. `selected` is any frame
    * with a raw_stmt_id column; limit/offset page in raw_stmt_id order (a
    * deterministic total order — the reference's unordered LIMIT/OFFSET is
    * nondeterministic under Postgres too, so pinning the order is the
    * faithful-and-reproducible reading). */
  def rawStmtJsons(
      p: PrincipalTables,
      selected: Option[DataFrame] = None,
      maxStmts: Option[Int] = None,
      offset: Int = 0): DataFrame = {
    val base = selected match {
      case Some(sel) => withRefChain(p)
        .join(sel.select("raw_stmt_id").distinct(), Seq("raw_stmt_id"),
          "left_semi")
      case None => withRefChain(p)
    }
    val paged = maxStmts match {
      case Some(n) =>
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("raw_stmt_id").asc)
        base.withColumn("rn", row_number().over(w))
          .filter(col("rn") > offset && col("rn") <= offset + n)
          .drop("rn")
      case None => base
    }
    envelope(paged)
  }

  /** get_raw_stmt_jsons_from_papers (raw_statements.py:20-83): the INNER
    * ref chain (db.link) filtered on the requested id type; result keyed
    * by the requested id value, one row per (id_val, raw statement), with
    * the 4-type text_refs splice and the pmid fix. `ids` are raw strings
    * of the given type ('pmid'|'trid'|'pmcid'|'doi'); pmcid/doi decompose
    * through functions/Ids exactly like ingest does. */
  def fromPapers(
      p: PrincipalTables,
      ids: Seq[String],
      idType: String): DataFrame = {
    val refs = p.textRefs
    val constrained = idType match {
      case "pmid" =>
        refs.filter(col("pmid").isin(ids.flatMap(_.toLongOption): _*))
      case "trid" =>
        refs.filter(col("trid").isin(ids.flatMap(_.toLongOption): _*))
      case "pmcid" =>
        val nums = ids.map(graft.functions.Ids.parsePmcidNum)
        refs.filter(col("pmcid_num").isin(nums: _*))
      case "doi" =>
        val parts = ids.map(graft.functions.Ids.parseDoi)
        val cond = parts.map { case (ns, id) =>
          col("doi_ns") === ns && col("doi_id") === id
        }.reduceOption(_ || _).getOrElse(lit(false))
        refs.filter(cond)
      case other =>
        throw new IllegalArgumentException(s"Invalid id_type: $other")
    }
    val idVal = idType match {
      case "pmid"  => col("pmid").cast("string")
      case "trid"  => col("trid").cast("string")
      case "pmcid" => concat(lit("PMC"), col("pmcid_num").cast("string"))
      case "doi"   => concat(lit("10."), col("doi_ns").cast("string"),
        lit("/"), col("doi_id"))
    }
    val chained = p.rawStatements
      .join(p.readings.select(col("rid").as("reading_id"), col("tcid")),
        Seq("reading_id"))
      .join(p.textContent, Seq("tcid"))
      .join(constrained, Seq("trid"))
    val pmid = optCol(chained, "pmid", "long")
    val doiNs = optCol(chained, "doi_ns", "long")
    val doi = when(doiNs.isNotNull,
      concat(lit("10."), doiNs.cast("string"), lit("/"),
        optCol(chained, "doi_id", "string")))
    chained.select(idVal.as("id_val"), col("raw_stmt_id"),
      to_json(struct(
        col("raw_stmt_id").as("id"),
        col("raw_json").as("statement"),
        struct(col("trid").as("TRID"), pmid.as("PMID"),
          optCol(chained, "pmcid_num", "long").as("PMCID"), doi.as("DOI"))
          .as("text_refs"),
        pmid.as("pmid"))).as("result_json"))
  }

  /** get_pa_stmt_jsons (client/principal/pa_statements.py:14-170):
    * preassembled statements with their evidence (each raw statement's
    * payload plus the text-ref splice), per-position agent groundings, and
    * support links in both directions — the reference's three nested
    * array_agg subqueries as three independent aggregations joined on
    * mk_hash.
    *
    * The reference's driver loop also rewrites supports/supported_by into
    * statement ids "as much as possible" — a result-set-order-dependent
    * patch (which hashes resolve depends on iteration order); the stable
    * content is the hash lists, which is what the envelope carries.
    *
    * `limit` pages in mk_hash order (deterministic; the reference's bare
    * LIMIT is Postgres-order like the raw client's, see [[rawStmtJsons]]).
    * Output: (mk_hash, result_json).
    */
  def paStmtJsons(
      pa: DataFrame,
      links: DataFrame,
      p: PrincipalTables,
      supportLinks: DataFrame,
      agents: DataFrame,
      withEvidence: Boolean = true,
      limit: Int = 1000): DataFrame = {
    val core0 = pa.select(col("mk_hash"), col("pa_json"))
    val core =
      if (limit > 0)
        core0.orderBy(col("mk_hash").asc).limit(limit)
      else core0
    val evAgg =
      if (withEvidence) {
        val chained = withRefChain(p)
        val doiNs = optCol(chained, "doi_ns", "long")
        val refs = struct(
          col("trid").as("TRID"),
          optCol(chained, "pmid", "long").as("PMID"),
          optCol(chained, "pmcid_num", "long").as("PMCID"),
          when(doiNs.isNotNull,
            concat(lit("10."), doiNs.cast("string"), lit("/"),
              optCol(chained, "doi_id", "string"))).as("DOI"),
          col("tcid").as("TCID"), col("reading_id").as("READING_ID"))
        Some(chained
          .join(links.select("raw_stmt_id", "mk_hash"), "raw_stmt_id")
          .groupBy("mk_hash")
          .agg(array_sort(collect_list(struct(
            col("raw_stmt_id").as("sid"),
            col("raw_json").as("raw_json"),
            when(col("reading_id").isNotNull, refs).as("text_refs"))))
            .as("evidence")))
      } else None
    val agentAgg = agents
      .groupBy("mk_hash", "ag_num", "db_name")
      .agg(array_sort(collect_list(col("db_id"))).as("ids"))
      .groupBy("mk_hash", "ag_num")
      .agg(map_from_entries(array_sort(collect_list(
        struct(col("db_name"), col("ids"))))).as("ns_map"))
      .groupBy("mk_hash")
      // key-only comparator: the default struct ordering can't compare the
      // MAP-typed ns_map field, and the key alone determines the order
      .agg(map_from_entries(array_sort(
        collect_list(struct(col("ag_num"), col("ns_map"))),
        (l, r) => (l.getField("ag_num") - r.getField("ag_num")).cast("int")))
        .as("db_refs"))
    val supping = supportLinks
      .groupBy(col("supported").as("mk_hash"))
      .agg(array_sort(collect_set(col("supporting"))).as("supports_hashes"))
    val supped = supportLinks
      .groupBy(col("supporting").as("mk_hash"))
      .agg(array_sort(collect_set(col("supported"))).as("supported_by_hashes"))
    val joined = evAgg.foldLeft(core)((c, ev) => c.join(ev, Seq("mk_hash"), "left"))
      .join(agentAgg, Seq("mk_hash"), "left")
      .join(supping, Seq("mk_hash"), "left")
      .join(supped, Seq("mk_hash"), "left")
    joined.select(col("mk_hash"),
      to_json(struct(
        col("mk_hash"),
        col("pa_json").as("stmt"),
        col("db_refs"),
        (if (withEvidence) col("evidence")
         else lit(null).cast("string")).as("evidence"),
        coalesce(col("supports_hashes"), array().cast("array<long>"))
          .as("supports_hashes"),
        coalesce(col("supported_by_hashes"), array().cast("array<long>"))
          .as("supported_by_hashes"))).as("result_json"))
  }

  /** get_raw_stmt_jsons_from_agents (raw_statements.py:85-136): each agent
    * constraint selects statement ids from raw_agents (id literal after
    * wildcard escaping, namespace as LIKE pattern, role exact); the
    * constraints INTERSECT (intersect_all + distinct ≡ chained semi-joins,
    * shuffle-free on the bucketed id), a statement type adds one more
    * filter, and the survivors flow through [[rawStmtJsons]]. */
  def fromAgents(
      p: PrincipalTables,
      agents: Seq[RawAgentConstraint],
      stmtType: Option[String] = None,
      maxStmts: Option[Int] = None,
      offset: Int = 0): DataFrame = {
    val perConstraint = agents.map { c =>
      val idVal = regularizeAgentId(c.dbId, c.namespace)
      // the reference escapes % and _ then compiles LIKE — a literal match
      var sel = p.rawAgents.filter(col("db_id") === idVal)
      c.namespace.foreach(ns => sel = sel.filter(col("db_name").like(ns)))
      c.role.foreach(r =>
        sel = sel.filter(col("role") === r.toUpperCase))
      sel.select("raw_stmt_id")
    }
    val typed = stmtType.map(t =>
      p.rawStatements.filter(col("stype") === t).select("raw_stmt_id"))
    val allSels = perConstraint ++ typed.toSeq
    val selected = allSels.reduceOption((a, b) =>
      a.join(b, Seq("raw_stmt_id"), "left_semi"))
    rawStmtJsons(p, selected, maxStmts, offset)
  }
}
