package graft.querydsl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.TypeRegistry

/** Result envelopes over a compiled hash query — the Spark analog of the
  * reference's StatementQueryResult / QueryResult family
  * (query.py:421-628, :630-711) and the interactions/relations/agents
  * two-phase plans (`_run_meta_sql`, query.py:845-856).
  */
object Results {

  /** Sorted/paged hash list (`_apply_limits`, query.py:858-868). ORDER BY +
    * LIMIT compiles to TakeOrderedAndProject — a distributed top-k, never a
    * global sort materialization. */
  def hashes(
      q: StmtQuery,
      ro: ReadonlyTables,
      types: TypeRegistry,
      sortBy: String = "ev_count",
      limit: Int = 0,
      offset: Int = 0): DataFrame = {
    val sel = QueryCompiler.compile(q, ro, types)
      .orderBy(col(sortBy).desc, col("mk_hash").asc)
    val off = if (offset > 0) sel.offset(offset) else sel
    if (limit > 0) off.limit(limit) else off
  }

  /** Evidence rows for the selected statements, capped at `evLimit` per
    * statement. The reference uses a LATERAL join (query.py:486-495); the
    * canonical Spark rewrite is a row_number window partitioned by the hash.
    * Text-ref metadata attaches via an outer join on the reading id
    * (content join, query.py:492-517).
    */
  def statements(
      q: StmtQuery,
      ro: ReadonlyTables,
      types: TypeRegistry,
      evLimit: Int = 10,
      evFilter: Option[EvFilter] = None): DataFrame = {
    val sel = QueryCompiler.compile(q, ro, types).select("mk_hash")
    val w = Window.partitionBy("mk_hash").orderBy(col("sid").asc)
    val evRows = ro.fastRawPaLink.join(sel, Seq("mk_hash"), "left_semi")
    // evidence filters run BEFORE the ev_limit window (query.py:476-490)
    evFilter.map(f => EvFilter(evRows, ro, f)).getOrElse(evRows)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= evLimit)
      .join(ro.readingRefLink, Seq("rid"), "left")
      .select(col("mk_hash"), col("sid"), col("src"), col("pmid"),
        col("rn").cast("long").as("rn"))
  }

  /** Full statement result envelope — the StatementQueryResult analog
    * (query.py:551-628): per selected statement one JSON document with the
    * statement payload (pa_json carried through the joins, parsed only
    * here at egress), the spliced evidence rows (ev_limit applied), total
    * evidence count, belief, and source counts. All splicing is columnar —
    * no driver-side row loops.
    */
  def statementJsonResult(
      q: StmtQuery,
      ro: ReadonlyTables,
      types: TypeRegistry,
      evLimit: Int = 10,
      evFilter: Option[EvFilter] = None): DataFrame = {
    val ev = statements(q, ro, types, evLimit, evFilter)
    val collected = ev.groupBy("mk_hash").agg(
      array_sort(collect_list(struct(
        col("rn"), col("sid"), col("src"), col("pmid")))).as("evs"),
      count(lit(1)).as("n_returned"))
    val payload =
      if (ro.fastRawPaLink.columns.contains("pa_json"))
        ro.fastRawPaLink.select("mk_hash", "pa_json").dropDuplicates("mk_hash")
      else ro.fastRawPaLink.select(col("mk_hash"),
        lit(null).cast("string").as("pa_json")).dropDuplicates("mk_hash")
    collected
      .join(ro.sourceMeta.select("mk_hash", "ev_count", "belief", "src_json"),
        "mk_hash")
      .join(payload, Seq("mk_hash"), "left")
      .select(col("mk_hash"), col("n_returned"),
        to_json(struct(
          col("mk_hash").as("matches_hash"),
          col("belief"),
          col("ev_count").as("ev_total"),
          col("src_json").as("source_counts"),
          col("pa_json").as("statement"),
          transform(col("evs"), e => struct(
            e.getField("sid").as("sid"), e.getField("src").as("source_api"),
            e.getField("pmid").as("pmid"))).as("evidence"),
        )).as("result_json"))
  }

  /** Per-hash mesh annotation summary — the mesh_ref_counts service shape
    * (client/readonly/mesh_ref_counts.py:38-59): for each selected hash,
    * the matched mesh ids with their distinct-paper counts; `requireAll`
    * keeps only hashes annotated with EVERY requested id. */
  def meshRefCounts(
      q: StmtQuery,
      ro: ReadonlyTables,
      types: TypeRegistry,
      meshNums: Seq[Long],
      concept: Boolean = false,
      requireAll: Boolean = false): DataFrame = {
    val sel = QueryCompiler.compile(q, ro, types).select("mk_hash")
    val tbl = if (concept) ro.meshConceptMeta else ro.meshTermMeta
    val matched = tbl
      .filter(col("mesh_num").isin(meshNums: _*))
      .join(sel, Seq("mk_hash"), "left_semi")
      .groupBy("mk_hash")
      .agg(
        array_join(array_sort(collect_list(
          concat(col("mesh_num").cast("string"), lit(":"),
            col("ref_count").cast("string")))), ";").as("mesh_counts"),
        countDistinct("mesh_num").as("n_mesh"))
    if (requireAll) matched.filter(col("n_mesh") === meshNums.distinct.size)
    else matched
  }

  /** Per-hash interaction rows (InteractionSQL, query.py:92-127).
    * `withComplexDups` keeps the materialized complex pair rows
    * (with_complex_dups=True, query.py:70-90); the default excludes them, as
    * every reference view except the expander does. */
  def interactions(
      q: StmtQuery,
      ro: ReadonlyTables,
      types: TypeRegistry,
      withComplexDups: Boolean = false): DataFrame = {
    val sel = QueryCompiler.compile(q, ro, types).select("mk_hash")
    val rows =
      if (withComplexDups) ro.agentInteractions
      else ro.agentInteractions.filter(!col("is_complex_dup"))
    rows.join(sel, Seq("mk_hash"), "left_semi")
  }

  /** Grouped by (agent set, type): summed evidence, max belief, hash
    * count, and the pointwise-merged per-source count map (RelationSQL
    * agg + the Python src-dict merge, query.py:130-203 — here a single
    * MapSum aggregation, with a canonical sorted string rendering for
    * engine-portable comparison). */
  def relations(
      q: StmtQuery,
      ro: ReadonlyTables,
      types: TypeRegistry,
      withComplexDups: Boolean = false): DataFrame =
    interactions(q, ro, types, withComplexDups)
      .groupBy("agent_str", "type_num")
      .agg(
        sum("ev_count").as("total_ev"),
        max("belief").as("max_belief"),
        count(lit(1)).as("n_hashes"),
        graft.functions.MapSum.map_sum(col("src_json")).as("src_merged"))
      .withColumn("src_str",
        array_join(
          transform(array_sort(map_entries(col("src_merged"))),
            e => concat(e.getField("key"), lit(":"),
              e.getField("value").cast("string"))),
          ";"))
      .drop("src_merged")

  /** AgentJsonExpander.expand (query.py:1123-1137): drill down on one exact
    * agent set. Without a statement type the result is the relations view
    * restricted to that agent set (one row per statement type); with a type
    * it is the per-hash interaction rows of that (agent set, type) — the
    * two shapes the reference's /expand endpoint serves (api.py:421-513).
    * Both run with_complex_dups=True (query.py:1128-1130), so a pair-shaped
    * agent set ("0:A;1:B") reaches the complexes that contain the pair via
    * the materialized dup rows, exactly like the reference's drill-down. */
  def expand(
      agentJson: Map[Int, String],
      stmtType: Option[String],
      ro: ReadonlyTables,
      types: TypeRegistry): DataFrame = stmtType match {
    case None =>
      relations(FromAgentJson(agentJson), ro, types, withComplexDups = true)
    case Some(_) =>
      interactions(FromAgentJson(agentJson, stmtType), ro, types,
        withComplexDups = true)
  }

  /** Grouped by agent set only (AgentSQL agg, query.py:224-344), complex
    * duplicates excluded. */
  def agents(q: StmtQuery, ro: ReadonlyTables, types: TypeRegistry): DataFrame =
    interactions(q, ro, types)
      .groupBy("agent_str")
      .agg(
        countDistinct("type_num").as("n_types"),
        sum("ev_count").as("total_ev"),
        max("belief").as("max_belief"),
        count(lit(1)).as("n_hashes"))

  /** Agents view INCLUDING complex pair rows, with the complexes-covered
    * dedup: each complex statement contributes to exactly ONE pair group —
    * the best-ranked one — instead of every pair it expands into.
    *
    * The reference implements this as a stateful pagination scan in Python
    * (skip rows whose complex hashes were already covered,
    * query.py:282-344). Set-wise Spark re-expression: rank agent groups by
    * total evidence, assign each complex hash min(group rank) over its pair
    * rows, drop its other appearances, then aggregate — two windows and
    * one join, no driver-side state.
    *
    * `complexTypeNum` selects which statement type expands into pairs (the
    * reference expands Complex statements).
    */
  def agentsWithComplexes(
      q: StmtQuery,
      ro: ReadonlyTables,
      types: TypeRegistry,
      complexTypeNum: Int): DataFrame = {
    val sel = QueryCompiler.compile(q, ro, types).select("mk_hash")
    // complex statements participate ONLY through their materialized pair
    // rows (is_complex_dup, built once in ReadonlyBuilder); every other
    // statement through its base row — the reference's AgentSQL scan with
    // complex dups included (query.py:282-344)
    val rows = ro.agentInteractions
      .join(sel, Seq("mk_hash"), "left_semi")
      .filter(
        (col("is_complex_dup") && col("type_num") === complexTypeNum) ||
        (!col("is_complex_dup") && col("type_num") =!= complexTypeNum))
      .select("mk_hash", "agent_str", "ev_count", "is_complex_dup")
    // Each complex hash keeps its best-ranked group under the total order
    // (total evidence desc, agent_str asc). Rank VALUES are never exposed,
    // so no global row_number is needed: min_by over the sortable struct
    // (-g_ev, agent_str) picks the same group per hash with an ordinary
    // two-level aggregation — no single-partition Window at any scale.
    val groupEv = rows.groupBy("agent_str")
      .agg(sum("ev_count").as("g_ev"))
    val ranked = rows.join(groupEv, "agent_str")
    val assigned = ranked.filter(col("is_complex_dup"))
      .groupBy("mk_hash")
      .agg(min_by(col("agent_str"),
        struct(negate(col("g_ev")).as("neg_ev"), col("agent_str")))
        .as("keep_agent"))
    ranked
      .join(assigned, Seq("mk_hash"), "left")
      .filter(!col("is_complex_dup") || col("agent_str") === col("keep_agent"))
      .groupBy("agent_str")
      .agg(sum("ev_count").as("total_ev"), count(lit(1)).as("n_hashes"))
  }
}
