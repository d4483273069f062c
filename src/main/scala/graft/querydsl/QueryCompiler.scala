package graft.querydsl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.{Grounder, Roles, TypeRegistry}

/** Compiles a [[StmtQuery]] tree to a DataFrame of
  * `(mk_hash, ev_count, belief)` — the reference's hash-query compilation
  * (`build_hash_query` / `_get_hash_query`, query.py:2632-2715, :2896-2937)
  * re-expressed as declarative Spark plans so Catalyst handles pushdown,
  * pruning and join selection.
  *
  * Scale notes:
  *   - intersections become chained LEFT SEMI joins on `mk_hash` (cheaper
  *     than INTERSECT: payload carried once, no double-distinct);
  *   - inverted subqueries become LEFT ANTI joins against the base scan,
  *     never a full materialized complement (query.py:1762-1766 EXCEPT);
  *   - intrusive constraints (HasType, HasNumAgents/Evidence, bounds —
  *     per-hash attribute
  *     columns present on every meta row) are pushed into every branch as
  *     plain predicates, which reach the parquet scans as PushedFilters
  *     (the reference hand-injects these, query.py:2637-2660; Catalyst +
  *     this compiler get the same effect);
  *   - all meta tables are expected bucketed by mk_hash so these joins
  *     co-locate at cluster scale.
  */
object QueryCompiler {

  private val outCols = Seq("mk_hash", "ev_count", "belief")

  /** `grounder` resolves AUTO-namespace agents (the reference runs gilda
    * there); the default is the scored tier table with the plain dictionary
    * as fallback, and a model-backed [[Grounder]] slots in per call. */
  def compile(
      q: StmtQuery,
      ro: ReadonlyTables,
      types: TypeRegistry,
      grounder: Grounder = Grounder.composite): DataFrame =
    compileCtx(q, ro, types, Nil, grounder)

  // -------------------------------------------------------------------------

  private def project(df: DataFrame): DataFrame =
    df.select(outCols.map(col): _*)

  /** The all-statements scan (one row per hash). */
  private def base(ro: ReadonlyTables, pred: Seq[Column]): DataFrame =
    project(pred.foldLeft(ro.sourceMeta)(_ filter _))

  private def emptyResult(ro: ReadonlyTables): DataFrame =
    base(ro, Seq(lit(false))) // Catalyst folds to an empty LocalRelation

  /** Per-hash attribute predicate for an intrusive constraint. Inverted
    * intrusives are plain negated predicates — valid because type_num /
    * agent_count / ev_count are functional in mk_hash on every meta table.
    */
  private def intrusivePred(iq: IntrusiveQuery, types: TypeRegistry): Column = {
    val pos = iq match {
      case HasType(ts, sub, _) =>
        val expanded =
          if (sub) ts.flatMap(t => types.withSubclasses(t, TypeRegistry.indraHierarchy))
          else ts
        col("type_num").isin(expanded.map(types.num): _*)
      case HasNumAgents(ns, _) => col("agent_count").isin(ns.map(_.toLong): _*)
      case HasNumEvidence(ns, _) => col("ev_count").isin(ns.map(_.toLong): _*)
      case HasEvidenceBound(bs, _) =>
        bs.map { b =>
          b.op match {
            case "<" => col("ev_count") < b.value
            case ">" => col("ev_count") > b.value
            case "<=" => col("ev_count") <= b.value
            case ">=" => col("ev_count") >= b.value
            case "==" => col("ev_count") === b.value
            case "!=" => col("ev_count") =!= b.value
          }
        }.reduce(_ && _)
    }
    if (iq.inverted) !pos else pos
  }

  /** Predicates on the one-row-per-hash source_meta scan; inversion is plain
    * negation there (unlike multi-row agent/mesh tables). */
  private def sourcePred(q: StmtQuery): Option[Column] = q match {
    case HasSources(srcs, inv) =>
      val pos = srcs
        .map(s => coalesce(element_at(col("src_json"), s), lit(0L)) > 0)
        .reduce(_ && _)
      Some(if (inv) !pos else pos)
    case HasOnlySource(s, inv) =>
      val pos = col("only_src") <=> lit(s)
      Some(if (inv) !pos else pos)
    case HasReadings(inv) => Some(if (inv) !col("has_rd") else col("has_rd"))
    case HasDatabases(inv) => Some(if (inv) !col("has_db") else col("has_db"))
    case HasHash(hs, inv) =>
      val pos = col("mk_hash").isin(hs.toSeq: _*)
      Some(if (inv) !pos else pos)
    case iq: IntrusiveQuery => None // handled via intrusivePred
    case _ => None
  }

  /** Strip a known namespace prefix from a grounding id
    * (`regularize_agent_id`, used at query.py:1691). */
  private[graft] def regularizeAgentId(id: String, namespace: String): String = {
    val prefixed = Set("CHEBI", "GO", "HP", "DOID", "EFO", "CHEMBL")
    if (prefixed.contains(namespace) && id.toUpperCase.startsWith(namespace + ":"))
      id.substring(namespace.length + 1)
    else id
  }

  /** Positive-sense compilation of a multi-row leaf (agent / mesh / papers):
    * a filtered scan of its routed table, deduped to one row per hash.
    */
  private def positiveLeaf(
      q: StmtQuery,
      ro: ReadonlyTables,
      types: TypeRegistry,
      intr: Seq[Column],
      grounder: Grounder): DataFrame = q match {

    case HasAgent(id0, ns0, role, agNum, _) =>
      // AUTO namespace resolves through the pluggable grounder (the
      // reference runs gilda here, query.py:1687-1700); unresolved names
      // fall back to NAME
      val (ns, id) =
        if (ns0 == "AUTO") grounder.ground(id0).getOrElse(("NAME", id0))
        else (ns0, id0)
      // namespace routes the scan (query.py:1717-1725): NAME and TEXT have
      // dedicated tables because they dominate the row count
      // (readonly_schema.py:991-1020).
      val (tbl, nsPred) = ns match {
        case "NAME" => (ro.nameMeta, None)
        case "TEXT" => (ro.textMeta, None)
        case other => (ro.otherMeta, Some(col("db_name") === other))
      }
      val regId = regularizeAgentId(id, ns)
      val idPred =
        if (regId.contains('%') || regId.contains('_'))
          col("db_id").like(regId)
        else col("db_id") === regId // equality plans better than LIKE
      val preds = Seq(idPred) ++
        nsPred ++
        role.map(r => col("role_num") === Roles.toNum(r)) ++
        agNum.map(n => col("ag_num") === n) ++
        intr
      project(preds.foldLeft(tbl)(_ filter _)).dropDuplicates("mk_hash")

    case m: FromMeshIds =>
      val tbl = if (m.isConcept) ro.meshConceptMeta else ro.meshTermMeta
      val preds = Seq(col("mesh_num").isin(m.meshNums: _*)) ++ intr
      project(preds.foldLeft(tbl)(_ filter _)).dropDuplicates("mk_hash")

    case FromPapers(papers, _) =>
      // reading_ref_link subquery -> semi-join through fast_raw_pa_link on
      // the reading id (query.py:1811-1900). Paper-id dimension is tiny;
      // the rid set is broadcast into the frpl scan. Five id types route to
      // their numeric lookup columns (pmid/trid/tcid direct; pmcid via the
      // PMC-stripped number; doi via the (ns, id) decomposition — the same
      // derivations the ingest applied, functions/Ids).
      val idPred = papers
        .groupBy(_._1)
        .map { case (idType, ids) =>
          val vals = ids.map(_._2)
          idType match {
            case "pmcid" =>
              col("pmcid_num").isin(vals.map(graft.functions.Ids.parsePmcidNum): _*)
            case "doi" =>
              vals.map { v =>
                val (ns, id) = graft.functions.Ids.parseDoi(v)
                col("doi_ns") === ns && col("doi_id") === id
              }.reduce(_ || _)
            case _ => // pmid | trid | tcid
              col(idType).isin(vals.map(_.toLong): _*)
          }
        }
        .reduce(_ || _)
      val rids = ro.readingRefLink.filter(idPred).select("rid").distinct()
      val hashes = ro.fastRawPaLink
        .join(broadcast(rids), "rid")
        .select("mk_hash")
        .distinct()
      // attach (ev_count, belief) payload + intrusive filters from the
      // one-row-per-hash statement index
      project(intr.foldLeft(ro.sourceMeta)(_ filter _).join(hashes, "mk_hash"))

    case fa @ FromAgentJson(_, stmtType, hashes, _) =>
      // exact agent-set drill-down on agent_interactions
      // (query.py:1155-1196); the table is one row per hash with the meta
      // payload columns already attached
      val preds = Seq(col("agent_str") === fa.agentStr) ++
        stmtType.map(t => col("type_num") === types.num(t)) ++
        hashes.map(hs => col("mk_hash").isin(hs.toSeq: _*)) ++
        intr
      project(preds.foldLeft(ro.agentInteractions)(_ filter _))
        .dropDuplicates("mk_hash")

    case other =>
      sys.error(s"not a multi-row leaf: $other")
  }

  private def isMultiRowLeaf(q: StmtQuery): Boolean = q match {
    case _: HasAgent | _: FromMeshIds | _: FromPapers | _: FromAgentJson => true
    case _ => false
  }

  private def compileCtx(
      q: StmtQuery,
      ro: ReadonlyTables,
      types: TypeRegistry,
      intr: Seq[Column],
      grounder: Grounder): DataFrame = q match {

    case EmptyQuery => emptyResult(ro)
    case FullQuery => base(ro, intr)

    case iq: IntrusiveQuery =>
      base(ro, intrusivePred(iq, types) +: intr)

    case leaf if sourcePred(leaf).isDefined =>
      base(ro, sourcePred(leaf).get +: intr)

    case leaf if isMultiRowLeaf(leaf) =>
      if (!leaf.inverted) positiveLeaf(leaf, ro, types, intr, grounder)
      else
        // inversion on multi-row tables must be an anti-join on the hash
        // key, not predicate negation (query.py:1752-1766 / SURVEY §7.4.5)
        base(ro, intr).join(
          positiveLeaf(leaf.invert, ro, types, Nil, grounder),
          Seq("mk_hash"), "left_anti")

    case Intersection(qs) =>
      // intrusive members become context predicates pushed into every
      // sibling branch (IntrusiveQuery injection, query.py:2637-2660)
      val (intrusives, rest) = qs.partition(_.isInstanceOf[IntrusiveQuery])
      val ctx = intr ++ intrusives.map(i =>
        intrusivePred(i.asInstanceOf[IntrusiveQuery], types))
      // mixed polarity: evaluate inverted members in their positive sense
      // and anti-join them away (positive-except-negative,
      // query.py:2663-2709) — "not MEK" is never scanned as a complement.
      val (invs, pos) = rest.partition(r => r.inverted && isMultiRowLeaf(r))
      // source_meta-routed leaves fuse into ONE multi-predicate scan instead
      // of an N-way intersect (SourceIntersection, query.py:1199-1345)
      val (fusable, joins) = pos.partition(p => sourcePred(p).isDefined)
      val fusedScan: Option[DataFrame] =
        if (fusable.nonEmpty || joins.isEmpty)
          Some(base(ro, fusable.flatMap(sourcePred) ++ ctx))
        else None
      val joined: Seq[DataFrame] =
        joins.map(j => compileCtx(j, ro, types, ctx, grounder))
      val allPos = fusedScan.toSeq ++ joined
      val positive = allPos.reduceLeft { (acc, nxt) =>
        acc.join(nxt.select("mk_hash"), Seq("mk_hash"), "left_semi")
      }
      invs.foldLeft(positive) { (acc, inv) =>
        acc.join(
          positiveLeaf(inv.invert, ro, types, Nil, grounder)
            .select("mk_hash"),
          Seq("mk_hash"), "left_anti")
      }

    case Union(qs) =>
      qs.map(sub => compileCtx(sub, ro, types, intr, grounder))
        .reduceLeft(_ union _)
        .dropDuplicates("mk_hash")
  }
}
