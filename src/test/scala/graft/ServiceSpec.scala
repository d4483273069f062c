package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.TpchWorld
import graft.querydsl._
import graft.service.QueryService
import graft.service.QueryService.Request

/** Service facade: web-parameter -> DSL construction, medscan policy
  * injection, and result-type dispatch; plus per-source belief params.
  */
class ServiceSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("service-test")
  val dir = "/root/testdata/sf0.001"

  test("request composes the expected DSL tree with policy injection") {
    val q = QueryService.buildQuery(Request(
      subject = Some("P3"), stmtTypes = Seq("2-HIGH")))
    val expected = HasAgent("P3", role = Some("SUBJECT")) &
      HasType(Seq("2-HIGH")) & ~HasOnlySource("medscan")
    assert(q == expected)
    // authorized callers skip the exclusion
    val qAuth = QueryService.buildQuery(Request(
      subject = Some("P3"), stmtTypes = Seq("2-HIGH"), allowMedscan = true))
    assert(qAuth == (HasAgent("P3", role = Some("SUBJECT")) & HasType(Seq("2-HIGH"))))
  }

  test("result-type dispatch runs against the readonly layer") {
    val ro = TpchWorld.readonly(spark, dir)
    val r = Request(agents = Seq("P5"), allowMedscan = true, limit = 10)
    val hashes = QueryService.run(r, "hashes", ro, TpchWorld.types)
    assert(hashes.columns.toSeq == Seq("mk_hash", "ev_count", "belief"))
    val n = hashes.count()
    assert(n > 0 && n <= 10)
    val rel = QueryService.run(r, "relations", ro, TpchWorld.types)
    assert(rel.columns.contains("agent_str") && rel.count() > 0)
  }

  test("per-source belief parameters override the defaults") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq((1L, Map("reach" -> 3L, "trusted" -> 1L))).toDF("mk_hash", "src_json")
    val p = graft.assembly.Belief.Params(
      perSource = Map("trusted" -> (0.01, 0.0)))
    val b = graft.assembly.Belief.score(df, p)
      .select(col("belief")).collect().head.getDouble(0)
    // 1 - (0.05 + 0.3^3) * (0.0 + 0.01^1)
    val expected = 1.0 - (0.05 + 0.3 * 0.3 * 0.3) * 0.01
    assert(math.abs(b - expected) < 1e-12)
  }

  test("grounder golden set: gilda's published examples, tier-scored") {
    import graft.core.Grounder
    val g = Grounder.scoredDefault
    // gilda README: ground("kras") -> HGNC:6407 through case
    // normalization; the exact surface scores strictly higher and the
    // dash-stripped surface strictly lower (match-quality ordering)
    assert(g.ground("kras").contains(("HGNC", "6407")))
    assert(g.candidates("KRAS").head._1 == 1.0)
    assert(g.candidates("kras").head._1 == 0.9)
    assert(g.candidates("K-RAS").head._1 == 0.8)
    assert(g.ground("K-RAS").contains(("HGNC", "6407")))
    // Greek + punctuation normalization (gilda handles unicode Greek):
    // NF-κB resolves to the FPLX NFkappaB family at the Greek tier
    assert(g.ground("NF-κB").contains(("FPLX", "NFkappaB")))
    assert(g.candidates("NF-κB").head._1 == 0.7)
    // the canonically ambiguous surface "ER" (gilda's disambiguation
    // demo): all four groundings surface, ranked by popularity prior when
    // no context model runs — family, gene, organelle, MeSH heading
    val er = g.candidates("ER").map { case (_, e) => (e.ns, e.id) }
    assert(er == Seq(("FPLX", "ESR"), ("HGNC", "3467"),
      ("GO", "GO:0005783"), ("MESH", "D004954")))
    // the reference's mesh auto-map scans the ranked list for the MESH
    // candidate even when it is not top (indra_db_service/util.py:66-74)
    assert(g.candidates("ER")
      .collectFirst { case (_, e) if e.ns == "MESH" => e.id }
      .contains("D004954"))
    // unknown surfaces stay ungrounded -> AUTO falls back to NAME
    assert(g.ground("no-such-entity-xyz").isEmpty)
  }

  test("injected context scorer re-ranks the ER candidates") {
    import graft.core.{Grounder, KeywordContextScorer, ScoredGrounder}
    // the gilda disambiguation seam: same tier table, plus a cue-word
    // scorer standing in for the per-surface ML model
    val g = ScoredGrounder(Grounder.scoredDefault.entries,
      contextScorer = Some(KeywordContextScorer(Map(
        ("GO", "GO:0005783") -> Seq("endoplasmic", "reticulum", "organelle"),
        ("HGNC", "3467") -> Seq("esr1", "gene", "transcript"),
        ("FPLX", "ESR") -> Seq("estrogen", "receptor")))))
    // without context the popularity prior ranks the family first
    assert(g.ground("ER").contains(("FPLX", "ESR")))
    // organelle context flips the ranking to the GO term...
    assert(g.groundInContext("ER",
      "unfolded protein response and endoplasmic reticulum stress")
      .contains(("GO", "GO:0005783")))
    // ...gene context to ESR1...
    assert(g.groundInContext("ER", "ESR1 gene transcript levels")
      .contains(("HGNC", "3467")))
    // ...and an uninformative context leaves the prior ranking untouched
    assert(g.groundInContext("ER", "measured in three replicates")
      .contains(("FPLX", "ESR")))
    // match quality still gates: context can only re-rank WITHIN a tier
    assert(g.candidatesInContext("KRAS", "endoplasmic reticulum")
      .head._2.id == "6407")
  }
}
