package graft.service

import org.apache.spark.sql.DataFrame
import graft.core.TypeRegistry
import graft.querydsl._

/** Thin service facade: the REST parameter surface of the reference's API
  * (indra_db_service) mapped onto the DSL — `from_agents`-style construction
  * (call_handlers.py:472-620), global policy injection (medscan exclusion
  * for unauthorized callers, :164-211), and result-type dispatch
  * (api.py:359-418). No HTTP layer: the DSL is the API; this is the glue a
  * server would call.
  */
object QueryService {

  final case class Request(
      subject: Option[String] = None,
      obj: Option[String] = None,
      agents: Seq[String] = Nil, // role-free agent constraints
      namespace: String = "NAME",
      stmtTypes: Seq[String] = Nil,
      includeSubclasses: Boolean = false,
      meshIds: Seq[String] = Nil,
      paperIds: Seq[(String, String)] = Nil,
      hashes: Seq[Long] = Nil,
      // auth roles gate restricted sources (medscan policy)
      allowMedscan: Boolean = false,
      limit: Int = 0,
      offset: Int = 0,
      evLimit: Int = 10,
      sortBy: String = "ev_count",
  )

  /** Compose the DSL query exactly as the reference's web-query builder
    * does: conjunction of present constraints, then policy injection.
    * (The reference seeds the chain with its dual-neutral EmptyQuery; in
    * this algebra the AND-neutral element is FullQuery — no constraints
    * means scan-everything.) */
  def buildQuery(r: Request): StmtQuery = {
    var q: StmtQuery = FullQuery
    r.subject.foreach(s =>
      q = q & HasAgent(s, r.namespace, role = Some("SUBJECT")))
    r.obj.foreach(o =>
      q = q & HasAgent(o, r.namespace, role = Some("OBJECT")))
    r.agents.foreach(a => q = q & HasAgent(a, r.namespace))
    if (r.stmtTypes.nonEmpty)
      q = q & HasType(r.stmtTypes, r.includeSubclasses)
    if (r.meshIds.nonEmpty) q = q & FromMeshIds(r.meshIds)
    if (r.paperIds.nonEmpty) q = q & FromPapers(r.paperIds)
    if (r.hashes.nonEmpty) q = q & HasHash(r.hashes.toSet)
    // unauthorized callers never see medscan-only statements
    // (call_handlers.py:164-211)
    if (!r.allowMedscan) q = q & ~HasOnlySource("medscan")
    q
  }

  /** Result-type dispatch (hashes | statements | interactions | relations |
    * agents). */
  def run(
      r: Request,
      resultType: String,
      ro: ReadonlyTables,
      types: TypeRegistry): DataFrame = {
    val q = buildQuery(r)
    resultType match {
      case "hashes" =>
        Results.hashes(q, ro, types, r.sortBy, r.limit, r.offset)
      case "statements" =>
        Results.statementJsonResult(q, ro, types, r.evLimit)
      case "interactions" => Results.interactions(q, ro, types)
      case "relations" => Results.relations(q, ro, types)
      case "agents" => Results.agents(q, ro, types)
      case other => sys.error(s"unknown result type: $other")
    }
  }
}
