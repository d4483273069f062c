package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Paper-identifier decomposition — the reference's process_pmid /
  * process_pmcid / process_doi mixin columns (principal_schema.py:233-239,
  * schemas/mixins.py:253+): derive sortable/joinable numeric forms from the
  * string identifiers at ingest so lookups hit numeric columns.
  */
object Ids {

  /** "12345" -> 12345L; non-numeric -> null. */
  def pmidNum(pmid: Column): Column =
    when(pmid.rlike("^[0-9]+$"), pmid.cast("long"))

  /** "PMC1234.5" -> (1234, version 5); "PMC1234" -> (1234, null). Anchored:
    * non-PMC-prefixed or non-numeric bodies ("PMC12a") yield null, as the
    * reference's process_pmcid returns None for them (mixins.py:317-336).
    * A non-numeric version suffix keeps the numeric body — the reference
    * splits on '.', discards the non-digit version, and still indexes the
    * all-digit body ("PMC123.x" -> 123, version null). */
  def pmcidNum(pmcid: Column): Column =
    when(regexp_extract(pmcid, "^PMC([0-9]+)(\\..*)?$", 1) =!= "",
      regexp_extract(pmcid, "^PMC([0-9]+)(\\..*)?$", 1).cast("long"))
  def pmcidVersion(pmcid: Column): Column =
    when(regexp_extract(pmcid, "\\.([0-9]+)$", 1) =!= "",
      regexp_extract(pmcid, "\\.([0-9]+)$", 1).cast("int"))

  /** "10.1038/nature12373" -> namespace 1038, id "nature12373". */
  def doiNs(doi: Column): Column =
    regexp_extract(doi, "^10\\.([0-9]+)/", 1).cast("long")
  def doiId(doi: Column): Column =
    when(regexp_extract(doi, "^10\\.[0-9]+/(.+)$", 1) =!= "",
      regexp_extract(doi, "^10\\.[0-9]+/(.+)$", 1))

  /** MeSH id "D012345"/"C012345" -> (num, is_concept) —
    * readonly_dumping.py:1848-1850. */
  def meshNum(mesh: Column): Column = substring(mesh, 2, 100).cast("long")
  def meshIsConcept(mesh: Column): Column = substring(mesh, 1, 1) === "C"

  // --- Scala-side parsers for user-supplied paper ids -----------------------
  // (the query layer regularizes literals the same way the ingest columns
  // were derived, so lookups always hit the numeric forms — query.py's
  // FromPapers constraint building, :1811-1900)

  private val PmcidRe = "^PMC([0-9]+)(?:\\..*)?$".r
  private val DoiRe = "^10\\.([0-9]+)/(.+)$".r

  /** "PMC1234" / "PMC1234.5" / "PMC1234.x" -> 1234. Mirrors the reference's
    * process_pmcid (mixins.py:317-336): the id must be PMC-prefixed with an
    * all-digit body; an optional "."-suffix is allowed and need not be
    * numeric (the reference discards a non-digit version but still indexes
    * the body). Anything else — bare digits, "PMC12a", "pmc123" — has no
    * numeric form and is rejected here with a descriptive error (the
    * reference silently yields None and drops the id from the lookup; a
    * user-supplied literal deserves a loud failure). */
  def parsePmcidNum(s: String): Long = s match {
    case PmcidRe(n) => n.toLong
    case other => sys.error(s"malformed PMCID (want PMC<digits>[.v]): $other")
  }

  /** "10.1038/nature12373" -> (1038, "nature12373"). */
  def parseDoi(s: String): (Long, String) = s match {
    case DoiRe(ns, id) => (ns.toLong, id)
    case other => sys.error(s"malformed DOI: $other")
  }
}
