package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import graft.assembly.{IncrementalOntologyEdges, Refinement}

/** Ontology EVOLUTION against the batch rebuild: the signature index is
  * built against the ontology current at append time, so a later
  * isa/partof edge must flow through [[IncrementalOntologyEdges
  * .ontologyDelta]] — recompute gensigs for exactly the affected
  * statements, append the new ones, return the edges they expose — and
  * the union of all incrementally discovered edges must equal a
  * from-scratch [[Refinement.ontologyRefinementEdges]] run over the
  * union world with the updated ontology. */
class OntologyDeltaSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("ontology-delta-test")

  private def stmts(hs: Long*): DataFrame = {
    import spark.implicits._
    hs.map(h => (h, "t")).toDF("mk_hash", "stype")
  }
  private def agents(rows: (Long, Int, String)*): DataFrame = {
    import spark.implicits._
    rows.map { case (h, n, key) =>
      val Array(ns, id) = key.split(":", 2)
      (h, n, ns, id)
    }.toDF("mk_hash", "ag_num", "db_name", "db_id")
  }
  private def edges(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("ontology edge added after N batches == batch rebuild") {
    import spark.implicits._
    val db = "graft_ontdelta_spec"
    IncrementalOntologyEdges.reset(spark, db)
    val v1 = Seq(("HGNC:1", "FPLX:F")).toDF("desc", "anc")
    val deltaEdge = Seq(("HGNC:2", "FPLX:F")).toDF("desc", "anc")
    val v2 = v1.unionByName(deltaEdge)

    // three batches under ontology v1
    val found = scala.collection.mutable.Set.empty[(Long, Long)]
    found ++= edges(IncrementalOntologyEdges.upsert(spark,
      stmts(101L, 102L),
      agents((101L, 0, "HGNC:1"), (101L, 1, "HGNC:9"),
        (102L, 0, "FPLX:F"), (102L, 1, "HGNC:9")),
      v1, db, shards = 4))
    found ++= edges(IncrementalOntologyEdges.upsert(spark,
      stmts(103L),
      agents((103L, 0, "HGNC:2"), (103L, 1, "HGNC:9")),
      v1, db, shards = 4))
    found ++= edges(IncrementalOntologyEdges.upsert(spark,
      stmts(104L, 105L),
      agents((104L, 0, "HGNC:1"), (104L, 1, "HGNC:2"),
        (105L, 0, "FPLX:F"), (105L, 1, "FPLX:F")),
      v1, db, shards = 4))
    // under v1 only the pos-0 generalization of 101 exists
    assert(found.toSet == Set((101L, 102L)))

    // the ontology gains HGNC:2 -> FPLX:F. 103 now refines 102; 104
    // refines 105 through a MIXED combo (pos 0 via the OLD edge, pos 1
    // via the NEW one) — exactly what per-statement recomputation must
    // catch and a gensig-only patch would miss
    val d1 = edges(IncrementalOntologyEdges.ontologyDelta(
      spark, deltaEdge, v2, db, shards = 4))
    assert(d1 == Set((103L, 102L), (104L, 105L)))
    found ++= d1

    // a replayed delta heals: same edges back, no duplicate gensig rows
    val d2 = edges(IncrementalOntologyEdges.ontologyDelta(
      spark, deltaEdge, v2, db, shards = 4))
    assert(d2 == d1)
    val gensigs = spark.table(s"$db.o_gensigs")
      .groupBy("mk_hash", "stype", "gsig").count()
    assert(gensigs.filter(org.apache.spark.sql.functions.col("count") > 1)
      .count() == 0, "replayed ontology delta duplicated gensig rows")

    // a post-delta batch composes against the UPDATED index
    found ++= edges(IncrementalOntologyEdges.upsert(spark,
      stmts(106L),
      agents((106L, 0, "HGNC:2"), (106L, 1, "FPLX:F")),
      v2, db, shards = 4))

    // batch oracle: rebuild over the union world with the updated ontology
    val allS = stmts(101L, 102L, 103L, 104L, 105L, 106L)
    val allA = agents(
      (101L, 0, "HGNC:1"), (101L, 1, "HGNC:9"),
      (102L, 0, "FPLX:F"), (102L, 1, "HGNC:9"),
      (103L, 0, "HGNC:2"), (103L, 1, "HGNC:9"),
      (104L, 0, "HGNC:1"), (104L, 1, "HGNC:2"),
      (105L, 0, "FPLX:F"), (105L, 1, "FPLX:F"),
      (106L, 0, "HGNC:2"), (106L, 1, "FPLX:F"))
    val oracle = edges(
      Refinement.ontologyRefinementEdges(allS, allA, v2))
    assert(found.toSet == oracle,
      s"incremental ${found.toSet} != rebuild $oracle")
  }

  test("delta touching no stored key is a no-op") {
    import spark.implicits._
    val db = "graft_ontdelta_noop"
    IncrementalOntologyEdges.reset(spark, db)
    val v1 = Seq(("HGNC:1", "FPLX:F")).toDF("desc", "anc")
    IncrementalOntologyEdges.upsert(spark, stmts(1L),
      agents((1L, 0, "HGNC:1")), v1, db, shards = 4)
    val unrelated = Seq(("CHEBI:77", "CHEBI:ROOT")).toDF("desc", "anc")
    val out = IncrementalOntologyEdges.ontologyDelta(
      spark, unrelated, v1.unionByName(unrelated), db, shards = 4)
    assert(out.isEmpty)
  }
}
