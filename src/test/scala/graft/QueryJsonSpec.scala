package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.querydsl._

/** JSON wire-format round-trip law: fromJson(toJson(q)) == q for every base
  * query and composite (the reference's `dq` checks,
  * tests/test_query.py:404-421).
  */
class QueryJsonSpec extends AnyFunSuite {

  val cases: Seq[StmtQuery] = Seq(
    HasAgent("MEK"),
    HasAgent("CHEBI:63637", namespace = "CHEBI", role = Some("OBJECT")),
    HasAgent("MEK", agentNum = Some(1)),
    HasHash(Set(1L, -5L, 99L)),
    HasSources(Seq("reach", "signor")),
    HasOnlySource("medscan"),
    HasReadings(), HasDatabases(),
    HasType(Seq("Phosphorylation", "Activation"), includeSubclasses = true),
    HasNumAgents(Seq(2, 3)),
    HasNumEvidence(Seq(1)),
    HasEvidenceBound(Seq(EvBound.parse("< 10"), EvBound.parse(">= 2"))),
    FromPapers(Seq("pmid" -> "12345", "doi" -> "678")),
    FromMeshIds(Seq("D000818")),
    FromMeshIds(Seq("C0001243", "D000818")), // mixed -> Union
    FromAgentJson(Map(0 -> "MEK")),
    FromAgentJson(Map(0 -> "MEK", 1 -> "ERK"), stmtType = Some("Complex"),
      hashes = Some(Set(7L, -3L))),
    EmptyQuery, FullQuery,
  )

  test("FromAgentJson agent_str matches the readonly rendering") {
    // sorted "num:id" entries ';'-joined — same order sort_array picks in
    // ReadonlyBuilder's agent_str aggregation
    assert(FromAgentJson(Map(2 -> "B", 0 -> "A", 1 -> "C")).agentStr ==
      "0:A;1:C;2:B")
    assert(FromAgentJson(Map(10 -> "X", 2 -> "Y")).agentStr == "10:X;2:Y")
  }

  test("round-trip identity for leaves") {
    for (q <- cases)
      assert(QueryJson.fromJson(QueryJson.toJson(q)) == q, s"round-trip: $q")
  }

  test("round-trip identity for inverted leaves") {
    for (q <- cases)
      assert(QueryJson.fromJson(QueryJson.toJson(~q)) == ~q, s"round-trip: ~$q")
  }

  test("round-trip identity for composites") {
    val composites = Seq(
      HasAgent("MEK") & HasType(Seq("Phosphorylation")),
      (HasAgent("MEK") | HasAgent("ERK")) & ~HasOnlySource("medscan"),
      HasSources(Seq("reach")) & HasReadings() & HasNumAgents(Seq(2)),
      ~(HasAgent("MEK") & HasDatabases()),
    )
    for (q <- composites)
      assert(QueryJson.fromJson(QueryJson.toJson(q)) == q, s"round-trip: $q")
  }

  test("simple JSON: combinators fold, invert, and use the right identity") {
    def leaf(id: String) =
      s"""{"class":"HasAgent","constraint":{"agent_id":"$id"},"inverted":false}"""
    val and = s"""{"class":"And","constraint":{"queries":[${leaf("A")},${leaf("B")}]}}"""
    assert(QueryJson.fromSimpleJson(and) == (HasAgent("A") & HasAgent("B")))
    val or = s"""{"class":"Or","constraint":{"queries":[${leaf("A")},${leaf("B")}]}}"""
    assert(QueryJson.fromSimpleJson(or) == (HasAgent("A") | HasAgent("B")))
    // nested combinator + leaf parsed by the regular path
    val nested = s"""{"class":"And","constraint":{"queries":[$or,${leaf("C")}]}}"""
    assert(QueryJson.fromSimpleJson(nested) ==
      ((HasAgent("A") | HasAgent("B")) & HasAgent("C")))
    // inverted combinator honored (not silently dropped)
    val inv = s"""{"class":"And","inverted":true,
      "constraint":{"queries":[${leaf("A")},${leaf("B")}]}}"""
    assert(QueryJson.fromSimpleJson(inv) == (HasAgent("A") & HasAgent("B")).invert)
    // identities: And-of-[] constrains nothing; Or-of-[] matches nothing
    assert(QueryJson.fromSimpleJson(
      """{"class":"And","constraint":{"queries":[]}}""") == FullQuery)
    assert(QueryJson.fromSimpleJson(
      """{"class":"Or","constraint":{"queries":[]}}""") == EmptyQuery)
  }
}
