package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality stats, language-ID heuristic, and content
  * fingerprinting. Everything is built from codegen'd built-in functions
  * (no UDFs) so the hot path stays inside whole-stage codegen, and all
  * arithmetic is integer/exact so results are engine-portable.
  */
object TextAnalysis {

  /** Whitespace tokens of a text column. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Deterministic polynomial rolling hash of a string, mod 1e9+7.
    * `h = fold(chars)(acc * 31 + codepoint) % p` — a document fingerprint
    * cheap enough to run at ingest on every row. Backed by the codegen'd
    * [[graft.functions.PolyHashMod]] expression (an interpreted
    * `aggregate` fold was ~4x slower on the shingle path); value identical
    * across engines. */
  val HashMod = 1000000007L
  def rollingHash(text: Column): Column =
    graft.functions.exprs.poly_hash(text)

  /** Per-language marker-word profiles for the n-gram/stopword language-ID
    * heuristic. Deliberately tiny: language ID at pipeline scale is a cheap
    * prefilter, not a classifier. */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "los", "que", "y", "es"),
    "fr" -> Seq("le", "les", "et", "est", "une"),
  )

  private def profileHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(lit): _*)))

  /** Language prediction: argmax of profile hits with a fixed priority
    * order for ties ("und" when nothing matches). */
  def langId(text: Column): Column = {
    val toks = tokens(lower(text))
    val scores = langProfiles.map { case (l, ws) => l -> profileHits(toks, ws) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((l, s), acc) =>
      when(s === best && best > 0, lit(l)).otherwise(acc)
    }
  }

  /** Quality statistics: token count, distinct-token count, type-token
    * ratio, mean token length, stopword ratio. All exact-integer or
    * single-division math. */
  def qualityStats(df: DataFrame, textCol: String, stopwords: Seq[String]): DataFrame = {
    val toks = tokens(col(textCol))
    df.withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("n_uniq", size(array_distinct(toks)).cast("long"))
      .withColumn("n_stop", profileHits(toks, stopwords).cast("long"))
      .withColumn("ttr",
        col("n_uniq").cast("double") / col("n_tokens").cast("double"))
      .withColumn("mean_tok_len",
        (length(concat_ws("", toks))).cast("double") / col("n_tokens").cast("double"))
      .withColumn("stop_ratio",
        col("n_stop").cast("double") / col("n_tokens").cast("double"))
  }

  /** Token-count histogram bucket (whitespace + a BPE-ish length proxy):
    * ceil(chars/4) is the standard rough tokens-per-byte estimate used for
    * budget accounting when no tokenizer is available. */
  def approxBpeTokens(text: Column): Column =
    ceil(length(text).cast("double") / 4.0).cast("long")

  /** GPT-2-style pre-tokenizer regex, simplified to classes that behave
    * identically under Java regex and RE2: runs of letters, digits, or
    * other symbols, each optionally preceded by one space. Counting these
    * pieces is the standard "BPE-ish" token estimate. */
  val bpePattern = " ?[a-z]+| ?[0-9]+| ?[^ a-z0-9]+"
  def bpeTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit(bpePattern), lit(0))
  def bpeTokenCount(text: Column): Column = size(bpeTokens(text)).cast("long")
}
