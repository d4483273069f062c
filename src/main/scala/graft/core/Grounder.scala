package graft.core

/** Pluggable grounding for AUTO-namespace agent queries.
  *
  * The reference runs gilda when HasAgent gets namespace=AUTO
  * (query.py:1687-1700). The engine keeps that as an interface with
  * dictionary-backed defaults (broadcastable; a model-backed grounder
  * slots in without touching the compiler). Unresolved names fall back to
  * NAME.
  */
trait Grounder extends Serializable {
  /** name -> (namespace, grounding id), or None when unknown. */
  def ground(text: String): Option[(String, String)]
}

final case class DictGrounder(entries: Map[String, (String, String)]) extends Grounder {
  def ground(text: String): Option[(String, String)] =
    entries.get(text.toUpperCase)
}

/** One grounding-table row: the surface form it matches, its grounding,
  * and a popularity prior used to break ties (gilda ranks candidates by
  * match quality then frequency). */
final case class GroundingEntry(
    text: String, ns: String, id: String, prior: Double = 0.0)

/** Context-aware disambiguation hook — the seam gilda's ML models plug
  * into (`gilda.ground(text, context=...)` feeds the surrounding text to
  * a per-surface disambiguation classifier). No model ships in this
  * environment, so the engine keeps the INTERFACE: an injected scorer
  * re-ranks a surface's candidates within their string-match tier —
  * match quality still gates (as in gilda), the model score outranks the
  * popularity prior, and an abstaining scorer (all zeros) leaves the
  * prior ranking untouched. */
trait ContextScorer extends Serializable {
  /** Relevance of `candidate` for `text` given surrounding `context`;
    * higher wins. Return 0.0 to abstain. */
  def score(text: String, context: String, candidate: GroundingEntry): Double
}

/** Deterministic stand-in for a learned disambiguator: per grounding, a
  * bag of cue words; the score is how many cues occur in the context
  * (case-insensitive). */
final case class KeywordContextScorer(
    cues: Map[(String, String), Seq[String]]) extends ContextScorer {
  def score(text: String, context: String, c: GroundingEntry): Double = {
    val ctx = context.toLowerCase
    cues.getOrElse((c.ns, c.id), Nil).count(w => ctx.contains(w.toLowerCase))
      .toDouble
  }
}

/** Gilda-shaped scored grounding — the public gilda ranking skeleton
  * (string-match tier, then prior): candidates are scored by how much
  * normalization the match needed and ranked by (score desc, prior desc,
  * ns, id). Tiers:
  *
  *   1.0  exact surface match
  *   0.9  case-insensitive match
  *   0.8  dash/space/dot-insensitive match ("TP-53" -> "TP53")
  *   0.7  Greek-letter expansion ("TNF-α" -> "TNFALPHA")
  *
  * Gilda's ML disambiguation model has no in-container analog; the tier
  * table is the deterministic stand-in behind the same interface.
  */
final case class ScoredGrounder(
    entries: Seq[GroundingEntry],
    contextScorer: Option[ContextScorer] = None) extends Grounder {

  private def stripPunct(s: String): String = s.replaceAll("[-_. ]", "")

  private val greek = Map(
    'α' -> "ALPHA", 'β' -> "BETA", 'γ' -> "GAMMA", 'δ' -> "DELTA",
    'ε' -> "EPSILON", 'κ' -> "KAPPA", 'σ' -> "SIGMA", 'ω' -> "OMEGA",
    // uppercase forms too: toUpperCase maps α -> Α (U+0391), not "ALPHA"
    'Α' -> "ALPHA", 'Β' -> "BETA", 'Γ' -> "GAMMA", 'Δ' -> "DELTA",
    'Ε' -> "EPSILON", 'Κ' -> "KAPPA", 'Σ' -> "SIGMA", 'Ω' -> "OMEGA")

  private def expandGreek(s: String): String =
    s.flatMap(c => greek.getOrElse(c, c.toString))

  // index per tier: normalized surface form -> entries
  private def index(f: String => String): Map[String, Seq[GroundingEntry]] =
    entries.groupBy(e => f(e.text))
  private val exact = index(identity)
  private val ci = index(_.toUpperCase)
  private val punct = index(e => stripPunct(e.toUpperCase))
  private val grk = index(e => expandGreek(stripPunct(e.toUpperCase)))

  /** All candidates, best first. */
  def candidates(text: String): Seq[(Double, GroundingEntry)] = {
    val tiers = Seq(
      1.0 -> exact.getOrElse(text, Nil),
      0.9 -> ci.getOrElse(text.toUpperCase, Nil),
      0.8 -> punct.getOrElse(stripPunct(text.toUpperCase), Nil),
      0.7 -> grk.getOrElse(expandGreek(stripPunct(text.toUpperCase)), Nil))
    val best = // an entry keeps only its highest-scoring tier
      tiers.flatMap { case (s, es) => es.map(e => (s, e)) }
        .groupBy(_._2).values.map(_.maxBy(_._1)).toSeq
    best.sortBy { case (s, e) => (-s, -e.prior, e.ns, e.id) }
  }

  /** Candidates re-ranked by the injected context scorer (gilda's
    * `ground(text, context=...)`): within a string-match tier the model
    * score outranks the popularity prior; without a scorer (or an
    * abstaining one) the ranking equals [[candidates]]. */
  def candidatesInContext(
      text: String, context: String): Seq[(Double, GroundingEntry)] =
    contextScorer match {
      case None => candidates(text)
      case Some(cs) => candidates(text)
        .sortBy { case (s, e) =>
          (-s, -cs.score(text, context, e), -e.prior, e.ns, e.id) }
    }

  def groundInContext(
      text: String, context: String): Option[(String, String)] =
    candidatesInContext(text, context).headOption
      .map { case (_, e) => (e.ns, e.id) }

  def ground(text: String): Option[(String, String)] =
    candidates(text).headOption.map { case (_, e) => (e.ns, e.id) }
}

object Grounder {

  /** Default AUTO resolution: the scored tier table first, the plain
    * dictionary as fallback — what [[graft.querydsl.QueryCompiler]] uses
    * when no grounder is injected. */
  lazy val composite: Grounder = new Grounder {
    def ground(text: String): Option[(String, String)] =
      scoredDefault.ground(text).orElse(default.ground(text))
  }

  /** Tiny built-in table for tests/demos; production supplies its own. */
  val default: DictGrounder = DictGrounder(Map(
    "ERK" -> ("FPLX", "ERK"),
    "MEK" -> ("FPLX", "MEK"),
    "TP53" -> ("HGNC", "11998"),
    "VEMURAFENIB" -> ("CHEBI", "63637"),
  ))

  /** Scored demo table exercising every tier, seeded with the grounding
    * examples gilda publishes (github.com/gyorilab/gilda README + paper —
    * public): "kras"/"k-ras" -> HGNC:6407 through the case/punctuation
    * tiers, the Greek-normalized NF-κB -> FPLX:NFkappaB, and the
    * canonically ambiguous surface "ER" whose candidates (estrogen
    * receptor family, ESR1, the organelle, the MeSH heading) rank by
    * popularity prior when no disambiguation model runs. ServiceSpec pins
    * this golden set. */
  val scoredDefault: ScoredGrounder = ScoredGrounder(Seq(
    GroundingEntry("ERK", "FPLX", "ERK", prior = 5.0),
    GroundingEntry("MEK", "FPLX", "MEK", prior = 4.0),
    GroundingEntry("TP53", "HGNC", "11998", prior = 9.0),
    GroundingEntry("TP53", "UP", "P04637", prior = 2.0),
    GroundingEntry("TNFα", "FPLX", "TNF", prior = 3.0),
    GroundingEntry("Vemurafenib", "CHEBI", "63637", prior = 1.0),
    GroundingEntry("KRAS", "HGNC", "6407", prior = 8.0),
    GroundingEntry("NF-kappaB", "FPLX", "NFkappaB", prior = 6.0),
    GroundingEntry("ER", "FPLX", "ESR", prior = 7.0),
    GroundingEntry("ER", "HGNC", "3467", prior = 5.0),
    GroundingEntry("ER", "GO", "GO:0005783", prior = 3.0),
    GroundingEntry("ER", "MESH", "D004954", prior = 1.0),
  ))
}
