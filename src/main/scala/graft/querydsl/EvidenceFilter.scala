package graft.querydsl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Evidence-level filters: restrict WHICH evidence rows are returned (and
  * counted toward ev_limit) without changing the statement selection — the
  * reference's `EvidenceFilter` and/or clause tree (query.py:2979-3103).
  *
  * Filters compose with `&`/`|`; compilation attaches only the auxiliary
  * tables a clause actually needs (source is already on the evidence row;
  * papers need reading_ref_link; mesh needs raw_stmt_mesh) and evaluates
  * the predicate BEFORE the per-statement ev_limit window, matching the
  * reference's staging (filters applied to cont_q before the lateral,
  * query.py:476-490 / SURVEY §7.4.7).
  */
sealed trait EvFilter {
  def &(other: EvFilter): EvFilter = EvAnd(Seq(this, other))
  def |(other: EvFilter): EvFilter = EvOr(Seq(this, other))
}
final case class EvSource(sources: Seq[String]) extends EvFilter
final case class EvPapers(pmids: Seq[Long]) extends EvFilter
final case class EvMesh(meshNums: Seq[Long], concept: Boolean = false) extends EvFilter
final case class EvAnd(filters: Seq[EvFilter]) extends EvFilter
final case class EvOr(filters: Seq[EvFilter]) extends EvFilter

object EvFilter {

  /** Which auxiliary joins a filter tree needs. */
  private def needsPapers(f: EvFilter): Boolean = f match {
    case _: EvPapers => true
    case EvAnd(fs) => fs.exists(needsPapers)
    case EvOr(fs) => fs.exists(needsPapers)
    case _ => false
  }
  private def needsMesh(f: EvFilter): Boolean = f match {
    case _: EvMesh => true
    case EvAnd(fs) => fs.exists(needsMesh)
    case EvOr(fs) => fs.exists(needsMesh)
    case _ => false
  }

  private def predicate(f: EvFilter): Column = f match {
    case EvSource(srcs) => col("src").isin(srcs: _*)
    case EvPapers(pmids) => col("ev_pmid").isin(pmids: _*)
    case EvMesh(nums, concept) =>
      col("mesh_num").isin(nums: _*) &&
        col("mesh_is_concept") === (if (concept) 1 else 0)
    case EvAnd(fs) => fs.map(predicate).reduce(_ && _)
    case EvOr(fs) => fs.map(predicate).reduce(_ || _)
  }

  /** Filter an evidence-row DataFrame (fast_raw_pa_link columns: sid,
    * mk_hash, src, rid). Aux tables join only when referenced; mesh is a
    * semi-join-style inner expansion deduped back to evidence rows.
    */
  def apply(evidence: DataFrame, ro: ReadonlyTables, f: EvFilter): DataFrame = {
    var df = evidence
    if (needsPapers(f))
      df = df.join(
        ro.readingRefLink.select(col("rid"), col("pmid").as("ev_pmid")),
        Seq("rid"), "left")
    if (needsMesh(f)) {
      // a sid can carry several mesh annotations: evaluate the predicate
      // against each, then dedup back to one row per evidence
      val withMesh = df.join(
        ro.rawStmtMesh.select(col("sid"), col("mesh_num"),
          col("is_concept").as("mesh_is_concept")),
        Seq("sid"), "left")
      return withMesh.filter(predicate(f)).dropDuplicates("sid")
        .select(evidence.columns.map(col) ++
          (if (needsPapers(f)) Seq(col("ev_pmid")) else Nil): _*)
    }
    df.filter(predicate(f))
      .select(evidence.columns.map(col) ++
        (if (needsPapers(f)) Seq(col("ev_pmid")) else Nil): _*)
  }
}
