package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Statement JSON model + canonical matches-key construction.
  *
  * The reference stores each raw statement as a JSON blob with exactly one
  * evidence (principal_schema.py:632-656) and derives `mk_hash` from the
  * INDRA matches-key (preassemble_db.py:662-669). Here the JSON parses once
  * at ingest with an explicit schema (`from_json`), everything downstream is
  * columnar, and the matches-key is built with codegen'd string expressions
  * + [[graft.functions.StableHash64]].
  */
object StatementModel {

  /** Nested schema for statement JSON (FIXTURES.md §3 shape). */
  val agentSchema: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("db_refs", MapType(StringType, StringType)),
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
    StructField("members", ArrayType(agentSchema)),
    StructField("residue", StringType),
    StructField("position", StringType),
    StructField("evidence", ArrayType(evidenceSchema)),
    StructField("matches_hash", StringType),
  ))

  /** Grounding-namespace priority for the canonical agent key (INDRA agent
    * matches-key uses the best grounding, name as fallback). */
  val groundingPriority: Seq[String] =
    Seq("FPLX", "HGNC", "UP", "CHEBI", "GO", "MESH")

  /** Canonical key of one agent struct: best grounding "NS:id", else the
    * plain name. */
  def agentKey(agent: Column): Column = {
    val refs = agent.getField("db_refs")
    val best = groundingPriority.map(ns =>
      when(element_at(refs, ns).isNotNull,
        concat(lit(ns + ":"), element_at(refs, ns))))
    coalesce(best :+ agent.getField("name"): _*)
  }

  /** Canonical matches-key string for a parsed statement struct:
    *   - Complex-like (members):  Type(k1|k2|...) with keys sorted;
    *   - modifications (enz/sub): Type(enz, sub[, residue, position]);
    *   - regulations (subj/obj):  Type(subj, obj).
    * Deterministic and engine-portable (plain string ops).
    */
  def matchesKey(stmt: Column): Column = {
    val t = stmt.getField("type")
    val members = stmt.getField("members")
    val complexKey = concat(t, lit("("),
      array_join(array_sort(transform(members, a => agentKey(a))), "|"), lit(")"))
    val enz = stmt.getField("enz")
    val modKey = concat(t, lit("("), agentKey(enz), lit(", "),
      agentKey(stmt.getField("sub")),
      when(stmt.getField("residue").isNotNull,
        concat(lit(", "), stmt.getField("residue"))).otherwise(lit("")),
      when(stmt.getField("position").isNotNull,
        concat(lit(", "), stmt.getField("position"))).otherwise(lit("")),
      lit(")"))
    val subj = stmt.getField("subj")
    val regKey = concat(t, lit("("),
      when(subj.isNotNull, agentKey(subj)).otherwise(lit("None")), lit(", "),
      agentKey(stmt.getField("obj")), lit(")"))
    when(members.isNotNull, complexKey)
      .when(enz.isNotNull, modKey)
      .otherwise(regKey)
  }

  /** Parse a raw JSON column into the statement struct. */
  def parse(rawJson: Column): Column = from_json(rawJson, statementSchema)
}
