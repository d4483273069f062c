package graft.assembly

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.TypeRegistry
import graft.querydsl.ReadonlyTables

/** SIF-style interaction export — the reference's `util/dump_sif.py`
  * artifact (`load_db_content` dump_sif.py:87-158 + `make_dataframe`
  * :298-466): one row per directed agent pair per statement, with the
  * priority grounding for each agent position, the agent names, statement
  * type, evidence count, residue/position (modifications), per-source
  * counts, and belief — the flat dataframe downstream network tools
  * (CoGEx, INDRA CoGEx SIF consumers) ingest.
  *
  * Relational form of the reference's two driver-side dict passes:
  *   - the per-position priority grounding (make_dataframe:361-385) is a
  *     rank + min_by aggregation over the agent meta rows;
  *   - the per-statement agent list (ordered by ag_num,
  *     make_dataframe:387-403) is an array_sort(collect_list);
  *   - non-Complex statements emit their first two agents as one row
  *     (make_dataframe:409-419); Complex statements with at most
  *     [[MaxComplexMembers]] members emit every ORDERED pair
  *     (permutations, :415-418) and larger complexes are skipped (:414).
  *
  * Deliberate deviations, all from the reference relying on Python
  * dict/set iteration order (nondeterministic there, deterministic here):
  * among same-rank groundings for one position the MIN db_id wins, the
  * MIN name wins per position, and [[resPosFromMods]] picks the first mod
  * row by (ag_num, mod_type) rather than last-JSON-wins.
  */
object Sif {

  /** INDRA's grounding priority (indra.statements.agent.default_ns_order,
    * public INDRA; referenced as NS_PRIORITY_LIST at dump_sif.py:39). The
    * TEXT namespace is deliberately absent: the reference's dump queries
    * NAME + this list only (NS_LIST, dump_sif.py:40). */
  val NsPriority: Seq[String] = Seq(
    "FPLX", "UPPRO", "HGNC", "UP", "CHEBI", "GO", "MESH", "MIRBASE",
    "DOID", "HP", "EFO")

  /** Complexes with more members are skipped entirely
    * (make_dataframe:413-414). */
  val MaxComplexMembers: Int = 3

  /** Dump-specific id cleanups (`fix_id`, dump_sif.py:632-648). Only the
    * ID is rewritten: the reference assigns the fixed namespace to a
    * variable it never reads (`db_nmn`, dump_sif.py:349), so the
    * UP/SL- -> UPLOC namespace rename is dead code there and not
    * replicated; the trailing identifiers-registry prefixing
    * (`ensure_prefix_if_needed`) is INDRA-internal and out of scope. */
  def fixId(ns: Column, id: Column): Column =
    when(ns === "GO" && id.rlike("^[0-9]+$"), lpad(id, 7, "0"))
      .when(ns === "EFO" && id.startsWith("EFO:"), substring(id, 5, 1 << 20))
      .when(ns === "UP" && id.contains("-") && !id.startsWith("SL-"),
        split(id, "-").getItem(0))
      .when(ns === "FPLX" && id === "TCF-LEF", lit("TCF_LEF"))
      .otherwise(id)

  /** Per-hash (residue, position) derived from the pa_mods attribute
    * table — the engine's surface for what the reference reads out of
    * each Modification statement's pa_json (`load_res_pos`,
    * dump_sif.py:160-186). Deterministic: both values come from the SAME
    * mod row, the first by (ag_num, mod_type, residue, position). */
  def resPosFromMods(paMods: DataFrame): DataFrame =
    paMods
      .filter(col("residue").isNotNull || col("position").isNotNull)
      .groupBy("mk_hash")
      .agg(min(struct(col("ag_num"), col("mod_type"), col("residue"),
        col("position"))).as("m"))
      .select(col("mk_hash"), col("m.residue").as("residue"),
        col("m.position").as("position"))

  /** The export over an assembled readonly layer. `resPos` is an optional
    * (mk_hash, residue, position) frame (see [[resPosFromMods]]); absent,
    * the columns are null like the reference's `.get(hash)` misses. */
  def dump(
      ro: ReadonlyTables,
      types: TypeRegistry,
      complexTypeNum: Option[Int] = None,
      resPos: Option[DataFrame] = None): DataFrame =
    dump(ro.nameMeta, ro.otherMeta, ro.sourceMeta, types, complexTypeNum,
      resPos)

  /** Core form over the three tables the reference queries (NameMeta /
    * OtherMeta for agents, SourceMeta for src_json + belief;
    * load_db_content:125-141, get_source_counts:186-210). TextMeta is NOT
    * an input — TEXT is outside the dump's namespace list. */
  def dump(
      nameMeta: DataFrame, otherMeta: DataFrame, sourceMeta: DataFrame,
      types: TypeRegistry,
      complexTypeNum: Option[Int],
      resPos: Option[DataFrame]): DataFrame = {
    val spark = sourceMeta.sparkSession
    // rank by priority; namespaces outside the list are dropped, exactly
    // like the reference's assert-gated NS_PRIORITY_LIST lookup (:373-374)
    val rank = NsPriority.zipWithIndex.foldRight(lit(null).cast("int")) {
      case ((ns, i), acc) => when(col("db_name") === ns, lit(i)).otherwise(acc)
    }
    // top-priority grounding per agent position; a position whose ONLY
    // rows are NAME/TEXT has no grounding and drops out of the agent list
    // (the reference skips NAME rows when collecting agents, :367-369).
    //
    // ONE exchange for the whole agent side (guide §2.4 — operations keyed
    // the same way share a partitioning): the grounding min_by, the NAME
    // aggregation and the per-statement collect_list previously cost two
    // (mk_hash, ag_num) exchanges, a join, and an mk_hash exchange — four
    // sequential stage barriers that made the query core-count-invariant
    // at ~1.5s. Unioning the (disjoint) otherMeta/nameMeta rows and
    // repartitioning by mk_hash ONCE lets both groupBys and their join-free
    // fusion ride the same partitioning: hash(mk_hash) satisfies the
    // (mk_hash, ag_num) clustering, so no further exchange is needed.
    // min_by ignores null ordering keys, so NAME rows (null rank) never
    // win the grounding and ranked rows never contribute to the name —
    // exactly the old filter + left-join semantics (otherMeta excludes
    // NAME/TEXT by construction, ReadonlyBuilder).
    val agentRows = otherMeta
      .select(col("mk_hash"), col("ag_num"), col("db_name"), col("db_id"))
      .withColumn("rank", rank)
      .filter(col("rank").isNotNull)
      .unionByName(nameMeta
        .select(col("mk_hash"), col("ag_num"), lit("NAME").as("db_name"),
          col("db_id"))
        .withColumn("rank", lit(null).cast("int")))
    val perPos = agentRows
      .repartition(col("mk_hash"))
      .groupBy("mk_hash", "ag_num")
      .agg(
        min_by(struct(col("db_name"), col("db_id")),
          when(col("rank").isNotNull, struct(col("rank"), col("db_id"))))
          .as("g"),
        min(when(col("db_name") === "NAME", col("db_id"))).as("name"))
      .filter(col("g").isNotNull)
      .select(col("mk_hash"), col("ag_num"), col("g.db_name").as("ns"),
        fixId(col("g.db_name"), col("g.db_id")).as("id"), col("name"))
    // ordered agent list per statement; positions are unique after the
    // grouping above, so the struct sort IS the ag_num sort
    val ags = perPos
      .groupBy("mk_hash")
      .agg(array_sort(collect_list(
        struct(col("ag_num"), col("ns"), col("id"), col("name")))).as("ags"))
      .filter(size(col("ags")) >= 2)
    val stmts = sourceMeta.select(col("mk_hash"), col("type_num"),
      col("ev_count"), col("belief"), col("src_json"))
    val typed = ags.join(stmts, "mk_hash")
    val isCx =
      complexTypeNum.map(ct => col("type_num") === lit(ct)).getOrElse(lit(false))
    val carry = Seq("mk_hash", "type_num", "ev_count", "belief", "src_json")
    // non-complex: the first two agents by position, one row per stmt
    val linear = typed.filter(!isCx)
      .select(carry.map(col) ++ Seq(
        element_at(col("ags"), 1).as("a"),
        element_at(col("ags"), 2).as("b")): _*)
    // complexes expand to ordered pairs; oversized complexes are skipped
    val cx = typed.filter(isCx && size(col("ags")) <= MaxComplexMembers)
      .select(carry.map(col) ++ Seq(col("ags"),
        posexplode(col("ags")).as(Seq("ia", "a"))): _*)
      .select(carry.map(col) ++ Seq(col("ia"), col("a"),
        posexplode(col("ags")).as(Seq("ib", "b"))): _*)
      .filter(col("ia") =!= col("ib"))
      .select(carry.map(col) ++ Seq(col("a"), col("b")): _*)
    val rp = resPos.getOrElse(
      spark.emptyDataFrame
        .withColumn("mk_hash", lit(null).cast("long"))
        .withColumn("residue", lit(null).cast("string"))
        .withColumn("position", lit(null).cast("string")))
    linear.unionByName(cx)
      .join(broadcast(types.toDF(spark)), "type_num")
      .join(rp.select(col("mk_hash"), col("residue"), col("position")),
        Seq("mk_hash"), "left")
      .select(
        col("a.ns").as("agA_ns"), col("a.id").as("agA_id"),
        col("a.name").as("agA_name"),
        col("b.ns").as("agB_ns"), col("b.id").as("agB_id"),
        col("b.name").as("agB_name"),
        col("stype").as("stmt_type"),
        col("ev_count").as("evidence_count"),
        col("mk_hash").as("stmt_hash"),
        col("residue"), col("position"),
        col("src_json").as("source_counts"),
        col("belief"))
  }

  /** Canonical sorted "src:count;..." rendering of the source_counts map
    * — the engine-portable comparison form every map-valued gate uses. */
  def srcStr(m: Column): Column =
    array_join(
      transform(array_sort(map_entries(m)),
        e => concat(e.getField("key"), lit(":"),
          e.getField("value").cast("string"))),
      ";")
}
