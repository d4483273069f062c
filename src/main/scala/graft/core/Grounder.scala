package graft.core

/** Pluggable grounding for AUTO-namespace agent queries.
  *
  * The reference runs gilda when HasAgent gets namespace=AUTO
  * (query.py:1687-1700). The engine keeps that as an interface with a
  * dictionary-backed default (broadcastable; a model-backed grounder slots
  * in without touching the compiler). Unresolved names fall back to NAME.
  */
trait Grounder extends Serializable {
  /** name -> (namespace, grounding id), or None when unknown. */
  def ground(text: String): Option[(String, String)]
}

final case class DictGrounder(entries: Map[String, (String, String)]) extends Grounder {
  def ground(text: String): Option[(String, String)] =
    entries.get(text.toUpperCase)
}

object Grounder {
  /** Tiny built-in table for tests/demos; production supplies its own. */
  val default: DictGrounder = DictGrounder(Map(
    "ERK" -> ("FPLX", "ERK"),
    "MEK" -> ("FPLX", "MEK"),
    "TP53" -> ("HGNC", "11998"),
    "VEMURAFENIB" -> ("CHEBI", "63637"),
  ))
}
