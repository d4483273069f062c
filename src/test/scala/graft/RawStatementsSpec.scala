package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.querydsl.{PrincipalTables, RawAgentConstraint, RawStatements}

/** The principal raw/pa-statement clients over a planted principal world:
  * agent-row extraction with id regularization, paper-id selection with the
  * text-ref splice, agent-constraint intersection, deterministic paging,
  * and the pa-statement envelope.
  */
class RawStatementsSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("rawstmt-test")
  import spark.implicits._

  def js(tp: String, subj: String, obj: String, refs: String = "") =
    s"""{"type":"$tp","subj":{"name":"$subj"$refs},"obj":{"name":"$obj"}}"""

  lazy val world: PrincipalTables = PrincipalTables(
    rawStatements = Seq(
      (1L, Some(100L), "Activation",
        js("Activation", "MEK", "ERK",
          ""","db_refs":{"CHEBI":"CHEBI:0001234","HGNC":"6091"}""")),
      (2L, Some(101L), "Activation", js("Activation", "TP53", "MDM2")),
      (3L, None, "Inhibition", js("Inhibition", "MEK", "ERK")),
    ).toDF("raw_stmt_id", "reading_id", "stype", "raw_json")
      .withColumn("reading_id", col("reading_id").cast("long")),
    rawAgents = Seq(
      (1L, 0, "NAME", "MEK", "SUBJECT"),
      (1L, 1, "NAME", "ERK", "OBJECT"),
      (2L, 0, "NAME", "TP53", "SUBJECT"),
      (2L, 1, "NAME", "MDM2", "OBJECT"),
      (3L, 0, "NAME", "MEK", "SUBJECT"),
      (3L, 1, "NAME", "ERK", "OBJECT"),
    ).toDF("raw_stmt_id", "ag_num", "db_name", "db_id", "role"),
    readings = Seq((100L, 10L), (101L, 11L)).toDF("rid", "tcid"),
    textContent = Seq((10L, 1000L), (11L, 1001L)).toDF("tcid", "trid"),
    textRefs = Seq(
      (1000L, Some(555L), Some(77L), Some(1038L), Some("nature1")),
      (1001L, Some(556L), None, None, None),
    ).toDF("trid", "pmid", "pmcid_num", "doi_ns", "doi_id"),
  )

  test("rawAgentRows: db_refs entries + NAME row, ids regularized") {
    val parsed = graft.assembly.Preassembly.parse(
      world.rawStatements.select("raw_stmt_id", "raw_json"))
    val rows = RawStatements.rawAgentRows(parsed)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getString(3), r.getString(4))).toSet
    // CHEBI:0001234 loses the namespace prefix and leading zeros
    assert(rows.contains((1L, 0, "CHEBI", "1234", "SUBJECT")))
    assert(rows.contains((1L, 0, "HGNC", "6091", "SUBJECT")))
    assert(rows.contains((1L, 0, "NAME", "MEK", "SUBJECT")))
    assert(rows.contains((1L, 1, "NAME", "ERK", "OBJECT")))
  }

  test("fromPapers selects by pmid and doi with the text-ref splice") {
    val byPmid = RawStatements.fromPapers(world, Seq("555"), "pmid")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(byPmid == Set(("555", 1L)))
    val byDoi = RawStatements.fromPapers(world, Seq("10.1038/nature1"), "doi")
      .collect()
    assert(byDoi.map(_.getLong(1)).toSet == Set(1L))
    val env = byDoi.head.getString(2)
    assert(env.contains("\"PMID\":555") && env.contains("\"PMCID\":77") &&
      env.contains("\"DOI\":\"10.1038/nature1\""))
    intercept[Exception] {
      RawStatements.fromPapers(world, Seq("x"), "issn")
    }
  }

  test("fromAgents intersects constraints; KB rows keep null refs") {
    val both = RawStatements.fromAgents(world, Seq(
        RawAgentConstraint("MEK", role = Some("subject")),
        RawAgentConstraint("ERK", role = Some("object"))))
      .collect().map(_.getLong(0)).toSet
    assert(both == Set(1L, 3L)) // statement 2 lacks MEK/ERK
    val typed = RawStatements.fromAgents(world, Seq(
        RawAgentConstraint("MEK")), stmtType = Some("Inhibition"))
      .collect()
    assert(typed.map(_.getLong(0)).toSet == Set(3L))
    // raw_stmt_id 3 has no reading: text_refs and pmid stay null
    val env = typed.head.getString(1)
    assert(!env.contains("text_refs"))
  }

  test("rawStmtJsons pages deterministically in raw_stmt_id order") {
    val p1 = RawStatements.rawStmtJsons(world, maxStmts = Some(2))
      .collect().map(_.getLong(0)).toSeq
    val p2 = RawStatements.rawStmtJsons(world, maxStmts = Some(2), offset = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(p1 == Seq(1L, 2L) && p2 == Seq(3L))
  }

  test("paStmtJsons: agents map, support hashes, evidence list") {
    val pa = Seq((7L, """{"type":"Activation"}"""), (8L, """{"type":"Inhibition"}"""))
      .toDF("mk_hash", "pa_json")
    val links = Seq((1L, 7L), (2L, 7L), (3L, 8L)).toDF("raw_stmt_id", "mk_hash")
    val agents = Seq(
      (7L, 0, "NAME", "MEK"), (7L, 0, "HGNC", "6091"), (7L, 1, "NAME", "ERK"),
      (8L, 0, "NAME", "MEK"),
    ).toDF("mk_hash", "ag_num", "db_name", "db_id")
    val supports = Seq((8L, 7L)).toDF("supporting", "supported")
    val out = RawStatements.paStmtJsons(pa, links, world, supports, agents)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.keySet == Set(7L, 8L))
    val e7 = out(7L)
    assert(e7.contains("\"supports_hashes\":[8]"))
    assert(e7.contains("\"HGNC\":[\"6091\"]"))
    // two raw statements -> two evidence entries, each with its payload
    assert("\"raw_json\"".r.findAllIn(e7).size == 2)
    assert(out(8L).contains("\"supported_by_hashes\":[7]"))
    // no-evidence variant omits the evidence array
    val noEv = RawStatements.paStmtJsons(pa, links, world, supports, agents,
      withEvidence = false).collect().map(_.getString(1))
    assert(noEv.forall(!_.contains("raw_json")))
  }
}
