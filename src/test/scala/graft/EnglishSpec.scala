package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.English

/** English sentence assembly goldens — the typed EnglishAssembler analog
  * and the `_make_english_from_meta` fallback
  * (indra_db_service/util.py:144-165).
  */
class EnglishSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("english-test")

  private def typed(
      stype: String, names: Seq[Option[String]],
      residue: Option[String] = None, position: Option[String] = None,
      activity: Option[String] = None, isActive: Option[Boolean] = None,
      fromLoc: Option[String] = None, toLoc: Option[String] = None): String = {
    import spark.implicits._
    val arr = array(names.map(n =>
      n.map(lit(_)).getOrElse(lit(null).cast("string"))): _*)
    def s(o: Option[String]) = o.map(lit(_)).getOrElse(lit(null).cast("string"))
    Seq(1).toDF("x").select(English.statementEnglish(
      lit(stype), arr, s(residue), s(position), s(activity),
      isActive.map(lit(_)).getOrElse(lit(null).cast("boolean")),
      s(fromLoc), s(toLoc)).as("e")).collect().head.getString(0)
  }

  private def meta(names: Seq[String]): String = {
    import spark.implicits._
    Seq(1).toDF("x").select(
      English.metaEnglish(array(names.map(lit(_)): _*)).as("e"))
      .collect().head.getString(0)
  }

  test("typed sentences: verbs, sites, passive, self, special forms") {
    assert(typed("Phosphorylation", Seq(Some("MEK"), Some("ERK"))) ==
      "MEK phosphorylates ERK.")
    assert(typed("Phosphorylation", Seq(Some("MEK"), Some("ERK")),
      residue = Some("T"), position = Some("185")) ==
      "MEK phosphorylates ERK on T185.")
    // subject absent -> passive voice
    assert(typed("Ubiquitination", Seq(None, Some("TP53"))) ==
      "TP53 is ubiquitinated.")
    // one agent -> self action; Auto- prefix folds into the verb
    assert(typed("Autophosphorylation", Seq(Some("EGFR"))) ==
      "EGFR phosphorylates itself.")
    assert(typed("Activation", Seq(Some("RAS"), Some("RAF"))) ==
      "RAS activates RAF.")
    assert(typed("Inhibition", Seq(Some("A"), Some("B"))) == "A inhibits B.")
    assert(typed("IncreaseAmount", Seq(Some("TF"), Some("GENE"))) ==
      "TF increases the amount of GENE.")
    assert(typed("Complex", Seq(Some("A"), Some("B"), Some("C"))) ==
      "A binds B, C.")
    assert(typed("ActiveForm", Seq(Some("BRAF")), activity = Some("kinase"),
      isActive = Some(true)) == "BRAF is kinase-active.")
    assert(typed("ActiveForm", Seq(Some("BRAF")), activity = Some("kinase"),
      isActive = Some(false)) == "BRAF is kinase-inactive.")
    assert(typed("Translocation", Seq(Some("ERK")),
      fromLoc = Some("cytoplasm"), toLoc = Some("nucleus")) ==
      "ERK translocates from the cytoplasm to the nucleus.")
    assert(typed("Gef", Seq(Some("SOS1"), Some("KRAS"))) ==
      "SOS1 is a GEF for KRAS.")
    assert(typed("Gap", Seq(Some("RASA1"), Some("KRAS"))) ==
      "RASA1 is a GAP for KRAS.")
  }

  test("meta fallback matches _make_english_from_meta shapes") {
    assert(meta(Seq()) == "")
    assert(meta(Seq("A")) == "<b>A</b> is modified")
    assert(meta(Seq("A", "B")) == "<b>A</b> affects <b>B</b>")
    assert(meta(Seq("A", "B", "C")) == "<b>A</b> affects <b>B</b>, and <b>C</b>")
    assert(meta(Seq("A", "B", "C", "D")) ==
      "<b>A</b> affects <b>B</b>, <b>C</b>, and <b>D</b>")
    assert(meta(Seq("A", "B", "C", "D", "E")) ==
      "<b>A</b> affects <b>B</b>, <b>C</b>, <b>D</b>, and <b>E</b>")
  }
}
