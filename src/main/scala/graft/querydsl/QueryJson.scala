package graft.querydsl

import org.json4s._
import org.json4s.JsonDSL._
import org.json4s.jackson.JsonMethods

/** JSON wire format for the query DSL — the analog of the reference's
  * `Query.to_json` / `from_json` (query.py:870-913): a {"class": ...,
  * "constraint": {...}, "inverted": bool} envelope per node, merges carrying
  * a "queries" array. Round-trip stability (`fromJson(toJson(q)) == q`) is a
  * tested law, mirroring the reference's `dq` round-trip checks
  * (tests/test_query.py:404-421).
  */
object QueryJson {

  def toJson(q: StmtQuery): String =
    JsonMethods.compact(JsonMethods.render(render(q)))

  def fromJson(s: String): StmtQuery =
    parse(JsonMethods.parse(s))

  /** The reference's simplified wire format (`Query.from_simple_json`,
    * query.py:894-908, used by the indra_db_rest client through
    * POST /compile): explicit {"class": "And"/"Or",
    * "constraint": {"queries": [...]}} combinators whose members are
    * regular query JSON (or nested combinators); anything else parses as a
    * normal leaf. Members fold through the same `&`/`|` rewrite algebra a
    * native caller would use.
    *
    * DELIBERATE divergences from the reference (test-pinned in
    * QueryJsonSpec): an empty And folds to the combinator IDENTITY
    * (FullQuery — constrains nothing) where the reference yields an empty
    * Intersection that behaves as EmptyQuery, and an "inverted" flag ON
    * the combinator node is honored (inverting the folded result) where
    * the reference ignores it. Both choices keep the wire format a plain
    * morphism into the native algebra instead of special-casing the two
    * degenerate shapes. */
  def fromSimpleJson(s: String): StmtQuery = {
    def inverted(j: JValue): Boolean =
      (j \ "inverted") == JBool(true)
    def make(j: JValue): StmtQuery = (j \ "class") match {
      // fold with the combinator's identity (And-of-[] constrains nothing
      // -> FullQuery; Or-of-[] matches nothing -> EmptyQuery) and honor an
      // "inverted" flag on the combinator itself, like every other node
      case JString("And") =>
        val q = (j \ "constraint" \ "queries").children.map(make)
          .reduceOption(_ & _).getOrElse(FullQuery: StmtQuery)
        if (inverted(j)) q.invert else q
      case JString("Or") =>
        val q = (j \ "constraint" \ "queries").children.map(make)
          .reduceOption(_ | _).getOrElse(EmptyQuery: StmtQuery)
        if (inverted(j)) q.invert else q
      case _ => parse(j)
    }
    make(JsonMethods.parse(s))
  }

  // -------------------------------------------------------------------------

  private def render(q: StmtQuery): JObject = q match {
    case EmptyQuery => ("class" -> "EmptyQuery") ~ ("inverted" -> false)
    case FullQuery => ("class" -> "EmptyQuery") ~ ("inverted" -> true)
    case HasAgent(id, ns, role, num, inv) =>
      ("class" -> "HasAgent") ~ ("inverted" -> inv) ~
        ("constraint" -> (("agent_id" -> id) ~ ("namespace" -> ns) ~
          ("role" -> role) ~ ("agent_num" -> num)))
    case HasHash(hs, inv) =>
      ("class" -> "HasHash") ~ ("inverted" -> inv) ~
        ("constraint" -> ("stmt_hashes" -> hs.toSeq.sorted))
    case HasSources(srcs, inv) =>
      ("class" -> "HasSources") ~ ("inverted" -> inv) ~
        ("constraint" -> ("sources" -> srcs))
    case HasOnlySource(src, inv) =>
      ("class" -> "HasOnlySource") ~ ("inverted" -> inv) ~
        ("constraint" -> ("only_source" -> src))
    case HasReadings(inv) =>
      ("class" -> "HasReadings") ~ ("inverted" -> inv)
    case HasDatabases(inv) =>
      ("class" -> "HasDatabases") ~ ("inverted" -> inv)
    case HasType(ts, sub, inv) =>
      ("class" -> "HasType") ~ ("inverted" -> inv) ~
        ("constraint" -> (("types" -> ts) ~ ("include_subclasses" -> sub)))
    case HasNumAgents(ns, inv) =>
      ("class" -> "HasNumAgents") ~ ("inverted" -> inv) ~
        ("constraint" -> ("agent_nums" -> ns))
    case HasNumEvidence(ns, inv) =>
      ("class" -> "HasNumEvidence") ~ ("inverted" -> inv) ~
        ("constraint" -> ("evidence_nums" -> ns))
    case HasEvidenceBound(bs, inv) =>
      ("class" -> "HasEvidenceBound") ~ ("inverted" -> inv) ~
        ("constraint" -> ("evidence_bounds" -> bs.map(b => s"${b.op} ${b.value}")))
    case FromPapers(papers, inv) =>
      ("class" -> "FromPapers") ~ ("inverted" -> inv) ~
        ("constraint" -> ("paper_list" -> papers.map { case (t, i) =>
          JArray(List(JString(t), JString(i))) }))
    case m: FromMeshIds =>
      ("class" -> "FromMeshIds") ~ ("inverted" -> m.inverted) ~
        ("constraint" -> ("mesh_ids" -> m.meshIds))
    case FromAgentJson(aj, st, hs, inv) =>
      ("class" -> "FromAgentJson") ~ ("inverted" -> inv) ~
        ("constraint" -> (
          ("agent_json" -> aj.map { case (k, v) => k.toString -> v }) ~
            ("stmt_type" -> st) ~
            ("hashes" -> hs.map(_.toSeq.sorted))))
    case Intersection(qs) =>
      ("class" -> "Intersection") ~ ("inverted" -> false) ~
        ("queries" -> qs.map(render))
    case Union(qs) =>
      ("class" -> "Union") ~ ("inverted" -> false) ~
        ("queries" -> qs.map(render))
  }

  private implicit val fmts: Formats = DefaultFormats

  private def parse(j: JValue): StmtQuery = {
    val inv = (j \ "inverted").extractOrElse[Boolean](false)
    val c = j \ "constraint"
    def rebuild(q: StmtQuery): StmtQuery = if (inv) q.invert else q
    (j \ "class").extract[String] match {
      case "EmptyQuery" => if (inv) FullQuery else EmptyQuery
      case "HasAgent" => HasAgent(
        (c \ "agent_id").extract[String],
        (c \ "namespace").extractOrElse[String]("NAME"),
        (c \ "role").extractOpt[String],
        (c \ "agent_num").extractOpt[Int],
        inv)
      case "HasHash" => HasHash((c \ "stmt_hashes").extract[Set[Long]], inv)
      case "HasSources" => HasSources((c \ "sources").extract[Seq[String]], inv)
      case "HasOnlySource" =>
        HasOnlySource((c \ "only_source").extract[String], inv)
      case "HasReadings" => HasReadings(inv)
      case "HasDatabases" => HasDatabases(inv)
      case "HasType" => HasType(
        (c \ "types").extract[Seq[String]],
        (c \ "include_subclasses").extractOrElse[Boolean](false),
        inv)
      case "HasNumAgents" => HasNumAgents((c \ "agent_nums").extract[Seq[Int]], inv)
      case "HasNumEvidence" =>
        HasNumEvidence((c \ "evidence_nums").extract[Seq[Int]], inv)
      case "HasEvidenceBound" => HasEvidenceBound(
        (c \ "evidence_bounds").extract[Seq[String]].map(EvBound.parse), inv)
      case "FromPapers" => FromPapers(
        (c \ "paper_list").extract[Seq[Seq[String]]].map(p => (p(0), p(1))), inv)
      case "FromMeshIds" => rebuild(FromMeshIds((c \ "mesh_ids").extract[Seq[String]]))
      case "FromAgentJson" => FromAgentJson(
        (c \ "agent_json").extract[Map[String, String]]
          .map { case (k, v) => k.toInt -> v },
        (c \ "stmt_type").extractOpt[String],
        // json4s extracts an ABSENT field as Some(empty collection); an
        // absent hash list must stay None (no constraint), not Some(Set())
        // (match-nothing)
        c \ "hashes" match {
          case JNothing | JNull => None
          case hs => Some(hs.extract[Set[Long]])
        },
        inv)
      case "Intersection" =>
        rebuild(Intersection.of((j \ "queries").extract[Seq[JValue]].map(parse)))
      case "Union" =>
        rebuild(Union.of((j \ "queries").extract[Seq[JValue]].map(parse)))
      case other => sys.error(s"unknown query class: $other")
    }
  }
}
