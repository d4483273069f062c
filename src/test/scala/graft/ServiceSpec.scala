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
}
