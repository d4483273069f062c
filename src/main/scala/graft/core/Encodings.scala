package graft.core

/** Dictionary encodings for statement type and agent role.
  *
  * Mirrors the reference's derivation (readonly_schema.py:69-95): statement
  * types are the sorted class-name list enumerated to `type_num`; roles map
  * SUBJECT -> -1, OTHER -> 0, OBJECT -> 1. The registry is a plain broadcast
  * map plus a small dimension DataFrame for joins.
  */
final case class TypeRegistry(names: Seq[String]) {
  val sorted: Seq[String] = names.distinct.sorted
  val toNum: Map[String, Int] = sorted.zipWithIndex.toMap
  val fromNum: Map[Int, String] = toNum.map(_.swap)

  def num(name: String): Int =
    toNum.getOrElse(name, sys.error(s"unknown statement type: $name"))

  /** Expand a type plus its subclasses (HasType(include_subclasses),
    * query.py:2307-2362) using the registry's hierarchy. */
  def withSubclasses(name: String, hierarchy: Map[String, Seq[String]]): Seq[String] = {
    def rec(n: String): Seq[String] =
      n +: hierarchy.getOrElse(n, Nil).flatMap(rec)
    rec(name).distinct.filter(toNum.contains)
  }

  /** Small dimension table for joins (the reference inlines it as a SQL
    * VALUES clause, readonly_schema.py:61-66). */
  def toDF(spark: org.apache.spark.sql.SparkSession): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    sorted.zipWithIndex.toDF("stype", "type_num")
  }
}

object TypeRegistry {
  /** The INDRA statement class names (public INDRA ontology; the reference
    * enumerates them via get_all_descendants(Statement),
    * readonly_schema.py:72-81). */
  val indraTypes: Seq[String] = Seq(
    "Acetylation", "Activation", "ActiveForm", "Autophosphorylation",
    "Complex", "Conversion", "DecreaseAmount", "Deacetylation",
    "Defarnesylation", "Degeranylgeranylation", "Deglycosylation",
    "Dehydroxylation", "Demethylation", "Demyristoylation",
    "Depalmitoylation", "Dephosphorylation", "Deribosylation",
    "Desumoylation", "Deubiquitination", "Farnesylation", "Gap", "Gef",
    "Geranylgeranylation", "Glycosylation", "Hydroxylation",
    "IncreaseAmount", "Inhibition", "Methylation", "Migration",
    "Myristoylation", "Palmitoylation", "Phosphorylation", "Ribosylation",
    "Sumoylation", "Translocation", "Transphosphorylation", "Ubiquitination",
  )

  /** Subclass tree used by HasType(include_subclasses=true). Only the
    * abstract groupings matter for query expansion. */
  val indraHierarchy: Map[String, Seq[String]] = Map(
    "Modification" -> Seq(
      "Acetylation", "Deacetylation", "Defarnesylation",
      "Degeranylgeranylation", "Deglycosylation", "Dehydroxylation",
      "Demethylation", "Demyristoylation", "Depalmitoylation",
      "Dephosphorylation", "Deribosylation", "Desumoylation",
      "Deubiquitination", "Farnesylation", "Geranylgeranylation",
      "Glycosylation", "Hydroxylation", "Methylation", "Myristoylation",
      "Palmitoylation", "Phosphorylation", "Ribosylation", "Sumoylation",
      "Ubiquitination"),
    "RegulateActivity" -> Seq("Activation", "Inhibition"),
    "RegulateAmount" -> Seq("IncreaseAmount", "DecreaseAmount"),
    "AddModification" -> Seq(
      "Acetylation", "Farnesylation", "Geranylgeranylation", "Glycosylation",
      "Hydroxylation", "Methylation", "Myristoylation", "Palmitoylation",
      "Phosphorylation", "Ribosylation", "Sumoylation", "Ubiquitination"),
    "RemoveModification" -> Seq(
      "Deacetylation", "Defarnesylation", "Degeranylgeranylation",
      "Deglycosylation", "Dehydroxylation", "Demethylation",
      "Demyristoylation", "Depalmitoylation", "Dephosphorylation",
      "Deribosylation", "Desumoylation", "Deubiquitination"),
  )

  val indra: TypeRegistry = TypeRegistry(indraTypes)
}

object Roles {
  val Subject = -1
  val Other = 0
  val Object = 1
  val toNum: Map[String, Int] =
    Map("SUBJECT" -> Subject, "OTHER" -> Other, "OBJECT" -> Object)
  val fromNum: Map[Int, String] = toNum.map(_.swap)
}
