package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Statement JSON model + canonical matches-key construction.
  *
  * The reference stores each raw statement as a JSON blob with exactly one
  * evidence (principal_schema.py:632-656) and derives `mk_hash` from the
  * INDRA matches-key (preassemble_db.py:662-669, via
  * indra.statements.Statement.get_hash). Here the JSON parses once at
  * ingest with an explicit schema (`from_json`), everything downstream is
  * columnar, and the matches-key is built with codegen'd string expressions
  * + [[graft.functions.StableHash64]].
  *
  * Key-content fidelity: the key carries the SAME discriminating state as
  * INDRA's Agent.matches_key / Statement.matches_key tuples — per-agent
  * modification list, mutation list, activity condition, location and
  * bound conditions, plus the per-type statement slots (residue/position
  * for the modification family, obj_activity for regulations,
  * activity/is_active for ActiveForm, from/to for Translocation) — so two
  * statements merge here exactly when INDRA would merge them. The
  * RENDERING is a canonical flat string (not Python's `str(tuple)` repr)
  * and the hash is StableHash64 (not INDRA's 14-hex-digit truncated md5):
  * both are engine-portable choices, deliberately recomputable in plain
  * SQL by the DuckDB oracle gate. Null slots always render as `None` —
  * conditional omission would alias `residue=312` with `position=312`.
  */
object StatementModel {

  /** One agent modification (INDRA ModCondition; the pa_mods row shape,
    * principal_schema.py:915-933). */
  val modSchema: StructType = StructType(Seq(
    StructField("mod_type", StringType),
    StructField("residue", StringType),
    StructField("position", StringType),
    StructField("is_modified", BooleanType),
  ))

  /** One agent mutation (INDRA MutCondition; pa_muts,
    * principal_schema.py:935-947). */
  val mutSchema: StructType = StructType(Seq(
    StructField("position", StringType),
    StructField("residue_from", StringType),
    StructField("residue_to", StringType),
  ))

  /** Agent activity condition (INDRA ActivityCondition). */
  val activitySchema: StructType = StructType(Seq(
    StructField("activity_type", StringType),
    StructField("is_active", BooleanType),
  ))

  /** Bound condition: a bound (or explicitly unbound) partner agent. The
    * partner is modeled at entity depth (name + groundings) — INDRA's key
    * recurses into the full partner agent, but schemas cannot recurse;
    * depth-1 covers every real corpus shape. */
  val boundSchema: StructType = StructType(Seq(
    StructField("agent", StructType(Seq(
      StructField("name", StringType),
      StructField("db_refs", MapType(StringType, StringType))))),
    StructField("is_bound", BooleanType),
  ))

  /** Nested schema for statement JSON (FIXTURES.md §3 shape + the INDRA
    * agent-state fields). */
  val agentSchema: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("db_refs", MapType(StringType, StringType)),
    StructField("mods", ArrayType(modSchema)),
    StructField("mutations", ArrayType(mutSchema)),
    StructField("activity", activitySchema),
    StructField("location", StringType),
    StructField("bound_conditions", ArrayType(boundSchema)),
  ))

  val evidenceSchema: StructType = StructType(Seq(
    StructField("source_api", StringType),
    StructField("pmid", StringType),
    StructField("text", StringType),
    StructField("source_hash", LongType),
  ))

  val statementSchema: StructType = StructType(Seq(
    StructField("type", StringType),
    StructField("subj", agentSchema),
    StructField("obj", agentSchema),
    StructField("enz", agentSchema),
    StructField("sub", agentSchema),
    StructField("agent", agentSchema),
    StructField("members", ArrayType(agentSchema)),
    // Gef(gef, ras) / Gap(gap, ras) / Conversion(subj, obj_from, obj_to)
    // slots (the reference's agent-field enumeration includes them,
    // util/content_scripts.py:477)
    StructField("gef", agentSchema),
    StructField("gap", agentSchema),
    StructField("ras", agentSchema),
    StructField("obj_from", ArrayType(agentSchema)),
    StructField("obj_to", ArrayType(agentSchema)),
    StructField("residue", StringType),
    StructField("position", StringType),
    StructField("obj_activity", StringType),
    StructField("activity", StringType),
    StructField("is_active", BooleanType),
    StructField("from_location", StringType),
    StructField("to_location", StringType),
    StructField("evidence", ArrayType(evidenceSchema)),
    StructField("matches_hash", StringType),
  ))

  /** Grounding-namespace priority for the canonical agent key (INDRA agent
    * matches-key uses the best grounding, name as fallback). */
  val groundingPriority: Seq[String] =
    Seq("FPLX", "HGNC", "UP", "CHEBI", "GO", "MESH")

  /** Null-safe slot rendering: absent values are an explicit `None`, never
    * silently skipped (INDRA renders str(None) the same way). */
  private def opt(c: Column): Column = coalesce(c.cast("string"), lit("None"))

  /** Canonical entity key of one agent struct: best grounding "NS:id",
    * else the plain name (INDRA Agent.entity_matches_key). */
  def entityKey(agent: Column): Column = {
    val refs = agent.getField("db_refs")
    val best = groundingPriority.map(ns =>
      when(element_at(refs, ns).isNotNull,
        concat(lit(ns + ":"), element_at(refs, ns))))
    coalesce(best :+ agent.getField("name"): _*)
  }

  /** Key of one ModCondition: `mod_type,residue,position,is_modified`
    * (the content of INDRA ModCondition.matches_key). */
  private def modKey(m: Column): Column = concat_ws(",",
    opt(m.getField("mod_type")), opt(m.getField("residue")),
    opt(m.getField("position")), opt(m.getField("is_modified")))

  /** Key of one MutCondition: `position,residue_from,residue_to`. */
  private def mutKey(m: Column): Column = concat_ws(",",
    opt(m.getField("position")), opt(m.getField("residue_from")),
    opt(m.getField("residue_to")))

  /** Canonical agent key: the entity key plus one tagged suffix per
    * non-empty state slot — the same discriminating content, in the same
    * order, as INDRA Agent.matches_key's 7-tuple (entity, sorted mods,
    * sorted mutations, activity, location, bound conditions). Agents with
    * no state render as the bare entity key; an empty list and an absent
    * one are identical (as in INDRA, where both sort to `[]`).
    */
  def agentKey(agent: Column): Column = {
    val mods = agent.getField("mods")
    val muts = agent.getField("mutations")
    val act = agent.getField("activity")
    val loc = agent.getField("location")
    val bcs = agent.getField("bound_conditions")
    def listSuffix(tag: String, arr: Column, render: Column => Column) =
      when(arr.isNotNull && size(arr) > 0,
        concat(lit("{" + tag + "=["),
          array_join(array_sort(transform(arr, render)), "|"), lit("]}")))
        .otherwise(lit(""))
    val modsSfx = listSuffix("mods", mods, modKey)
    val mutsSfx = listSuffix("muts", muts, mutKey)
    val actSfx = when(act.isNotNull,
      concat(lit("{act="), opt(act.getField("activity_type")), lit(","),
        opt(act.getField("is_active")), lit("}"))).otherwise(lit(""))
    val locSfx = when(loc.isNotNull, concat(lit("{loc="), loc, lit("}")))
      .otherwise(lit(""))
    // INDRA sorts bound conditions by partner name; sorting the
    // (name, key) struct totalizes that order; render `entity,is_bound`
    val bcSorted = array_sort(transform(bcs, bc =>
      struct(bc.getField("agent").getField("name").as("n"),
        concat(entityKey(bc.getField("agent")), lit(","),
          opt(bc.getField("is_bound"))).as("k"))))
    val bcSfx = when(bcs.isNotNull && size(bcs) > 0,
      concat(lit("{bc=["),
        array_join(transform(bcSorted, x => x.getField("k")), "|"),
        lit("]}"))).otherwise(lit(""))
    when(agent.isNull, lit(null).cast("string"))
      .otherwise(concat(entityKey(agent), modsSfx, mutsSfx, actSfx, locSfx,
        bcSfx))
  }

  /** Canonical matches-key string for a parsed statement struct — per-type
    * slot layouts matching INDRA Statement.matches_key:
    *
    *   - Complex-like (members):  `Type(k1|k2|...)`, member keys sorted;
    *   - Modification (sub):      `Type(enz|None, sub, residue|None,
    *                               position|None)`;
    *   - SelfModification (enz, no sub): `Type(enz, residue|None,
    *                               position|None)`;
    *   - ActiveForm (agent + activity): `Type(agent, activity,
    *                               is_active|None)`;
    *   - Translocation (agent + from/to): `Type(agent, from|None, to|None)`;
    *   - single agent:            `Type(agent)`;
    *   - regulations (subj/obj):  `Type(subj|None, obj, obj_activity|None)`.
    *
    * Deterministic and engine-portable (plain string ops).
    */
  def matchesKey(stmt: Column): Column = {
    val t = stmt.getField("type")
    val members = stmt.getField("members")
    val complexKey = concat(t, lit("("),
      array_join(array_sort(transform(members, a => agentKey(a))), "|"), lit(")"))
    val enz = stmt.getField("enz")
    val sub = stmt.getField("sub")
    val residue = opt(stmt.getField("residue"))
    val position = opt(stmt.getField("position"))
    val modStmtKey = concat(t, lit("("),
      when(enz.isNotNull, agentKey(enz)).otherwise(lit("None")), lit(", "),
      agentKey(sub), lit(", "), residue, lit(", "), position, lit(")"))
    val selfModKey = concat(t, lit("("), agentKey(enz), lit(", "),
      residue, lit(", "), position, lit(")"))
    val agent = stmt.getField("agent")
    val activeFormKey = concat(t, lit("("), agentKey(agent), lit(", "),
      opt(stmt.getField("activity")), lit(", "),
      opt(stmt.getField("is_active")), lit(")"))
    val translocKey = concat(t, lit("("), agentKey(agent), lit(", "),
      opt(stmt.getField("from_location")), lit(", "),
      opt(stmt.getField("to_location")), lit(")"))
    val singleKey = concat(t, lit("("), agentKey(agent), lit(")"))
    val subj = stmt.getField("subj")
    val regKey = concat(t, lit("("),
      when(subj.isNotNull, agentKey(subj)).otherwise(lit("None")), lit(", "),
      agentKey(stmt.getField("obj")), lit(", "),
      opt(stmt.getField("obj_activity")), lit(")"))
    // Gef/Gap: `Type(catalyst, ras)` (INDRA Gef/Gap.matches_key pairs);
    // Conversion: subj plus the from/to lists IN ORDER (INDRA keeps the
    // list order, unlike Complex's sorted members)
    val gef = stmt.getField("gef")
    val gap = stmt.getField("gap")
    val gefKey = concat(t, lit("("), agentKey(gef), lit(", "),
      agentKey(stmt.getField("ras")), lit(")"))
    val gapKey = concat(t, lit("("), agentKey(gap), lit(", "),
      agentKey(stmt.getField("ras")), lit(")"))
    def keyList(arr: Column) = concat(lit("["),
      when(arr.isNotNull,
        array_join(transform(arr, a => agentKey(a)), "|")).otherwise(lit("")),
      lit("]"))
    val objFrom = stmt.getField("obj_from")
    val objTo = stmt.getField("obj_to")
    val conversionKey = concat(t, lit("("),
      when(subj.isNotNull, agentKey(subj)).otherwise(lit("None")), lit(", "),
      keyList(objFrom), lit(", "), keyList(objTo), lit(")"))
    when(members.isNotNull, complexKey)
      .when(gef.isNotNull, gefKey)
      .when(gap.isNotNull, gapKey)
      .when(objFrom.isNotNull || objTo.isNotNull, conversionKey)
      .when(sub.isNotNull, modStmtKey)
      .when(enz.isNotNull, selfModKey)
      .when(agent.isNotNull && stmt.getField("activity").isNotNull, activeFormKey)
      .when(agent.isNotNull &&
        (stmt.getField("from_location").isNotNull ||
          stmt.getField("to_location").isNotNull), translocKey)
      .when(agent.isNotNull, singleKey)
      .otherwise(regKey)
  }

  /** Parse a raw JSON column into the statement struct. (A corrupt-record
    * column would give a strict validity signal from the same parse, but
    * carrying columnNameOfCorruptRecord measured ~20× slower end-to-end —
    * from_json must then retain and re-render whole inputs — so strict
    * checking lives in Preassembly.parse on the rows that need it.) */
  def parse(rawJson: Column): Column = from_json(rawJson, statementSchema)
}
