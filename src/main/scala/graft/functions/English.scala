package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** English sentence assembly — the presentation layer the reference attaches
  * to every statement/meta row (the `english` key: indra_db_service
  * call_handlers.py:262-272, which delegates typed rows to INDRA's
  * EnglishAssembler and typeless meta rows to `_make_english_from_meta`,
  * indra_db_service/util.py:144-165).
  *
  * Re-expressed as pure codegen'd column templates — no UDF, no driver
  * loop: a 3rd-person verb per statement family (the -ion -> -es/-ed rule
  * covers the whole modification family), active/passive by subject
  * presence, a site suffix from residue/position, and the reference's
  * agents-only bold-markup fallback when no type is known.
  */
object English {

  /** 3rd-person-singular verb for a statement type: special forms first,
    * then the modification-family rule Xion -> Xes (Phosphorylation ->
    * phosphorylates). */
  private def verb3(stype: Column): Column = {
    val base = lower(stype)
    when(stype === "Activation", lit("activates"))
      .when(stype === "Inhibition", lit("inhibits"))
      .when(stype === "IncreaseAmount", lit("increases the amount of"))
      .when(stype === "DecreaseAmount", lit("decreases the amount of"))
      .when(stype === "Complex", lit("binds"))
      .when(base.endsWith("ion"),
        concat(base.substr(lit(1), length(base) - 3), lit("es")))
      .otherwise(concat(lit("affects")))
  }

  /** Past participle: Xion -> Xed (phosphorylated), with the same special
    * cases. */
  private def past(stype: Column): Column = {
    val base = lower(stype)
    when(stype === "Activation", lit("activated"))
      .when(stype === "Inhibition", lit("inhibited"))
      .when(stype === "IncreaseAmount", lit("increased"))
      .when(stype === "DecreaseAmount", lit("decreased"))
      .when(stype === "Complex", lit("bound"))
      .when(base.endsWith("ion"),
        concat(base.substr(lit(1), length(base) - 3), lit("ed")))
      .otherwise(lit("affected"))
  }

  /** Typed statement sentence (the EnglishAssembler analog).
    *
    * @param stype statement type name ("Phosphorylation", ...)
    * @param agentNames agent display names in ag_num order (nulls allowed
    *   for absent positions, e.g. subject-less modifications)
    * @param residue / position modification site slots (nullable)
    * @param activity / isActive ActiveForm slots (nullable)
    * @param fromLoc / toLoc Translocation slots (nullable)
    */
  def statementEnglish(
      stype: Column,
      agentNames: Column,
      residue: Column = lit(null).cast("string"),
      position: Column = lit(null).cast("string"),
      activity: Column = lit(null).cast("string"),
      isActive: Column = lit(null).cast("boolean"),
      fromLoc: Column = lit(null).cast("string"),
      toLoc: Column = lit(null).cast("string")): Column = {
    val names = filter(agentNames, n => n.isNotNull)
    val a0 = element_at(names, 1)
    val a1 = element_at(names, 2)
    val site =
      when(residue.isNotNull && position.isNotNull,
        concat(lit(" on "), residue, position))
        .when(residue.isNotNull, concat(lit(" on "), residue))
        .otherwise(lit(""))
    val dot = lit(".")
    when(size(names) === 0, lit(""))
      .when(stype === "ActiveForm",
        concat(a0, lit(" is "),
          when(activity.isNotNull, concat(activity, lit("-"))).otherwise(lit("")),
          when(coalesce(isActive, lit(true)), lit("active"))
            .otherwise(lit("inactive")), dot))
      .when(stype === "Translocation",
        concat(a0, lit(" translocates"),
          when(fromLoc.isNotNull, concat(lit(" from the "), fromLoc))
            .otherwise(lit("")),
          when(toLoc.isNotNull, concat(lit(" to the "), toLoc))
            .otherwise(lit("")), dot))
      .when(stype === "Complex",
        concat(a0, lit(" binds "),
          array_join(slice(names, lit(2), greatest(size(names) - 1, lit(1))),
            ", "), dot))
      .when(stype === "Gef",
        concat(a0, lit(" is a GEF for "), a1, dot))
      .when(stype === "Gap",
        concat(a0, lit(" is a GAP for "), a1, dot))
      // subject absent: passive voice over the first PRESENT agent
      // ("ERK is phosphorylated on T185.") — must precede the one-agent
      // branch, which keys on the count of present agents
      .when(element_at(agentNames, 1).isNull,
        concat(a0, lit(" is "), past(stype), site, dot))
      // one agent: self-action ("X phosphorylates itself.") — covers the
      // SelfModification family whether or not the type carries Auto-
      .when(size(names) === 1 && a0.isNotNull,
        concat(a0, lit(" "),
          verb3(regexp_replace(stype, "^Auto", "")), lit(" itself"),
          site, dot))
      .otherwise(concat(a0, lit(" "), verb3(stype), lit(" "), a1, site, dot))
  }

  /** Typeless meta fallback (`_make_english_from_meta`,
    * indra_db_service/util.py:144-165), bold markup included:
    * "<b>A</b> affects <b>B</b>, C..., and <b>Z</b>" / "<b>A</b> is
    * modified". */
  def metaEnglish(agentNames: Column): Column = {
    def b(c: Column) = concat(lit("<b>"), c, lit("</b>"))
    val names = filter(agentNames, n => n.isNotNull)
    val n = size(names)
    val middle = // names[2..n-1] each bolded, comma-joined ("" when none)
      array_join(transform(
        slice(names, lit(3), greatest(n - 3, lit(0))), b(_)), ", ")
    when(n === 0, lit(""))
      .when(n === 1, concat(b(element_at(names, 1)), lit(" is modified")))
      .otherwise(concat(
        b(element_at(names, 1)), lit(" affects "), b(element_at(names, 2)),
        when(n > 3, concat(lit(", "), middle)).otherwise(lit("")),
        when(n > 2, concat(lit(", and "), b(element_at(names, -1))))
          .otherwise(lit(""))))
  }
}
