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

  /** Finalizing 32-bit mixer (xorshift-multiply, constant 0x45d9f3b) over a
    * non-negative hash: spreads the mod-1e9+7 rolling hash — which occupies
    * under 2^30 and so leaves bits 30+ nearly always zero — across all 32
    * output bits. SimHash fingerprints vote per BIT, so a dead input bit is
    * a dead fingerprint bit and a depressed-entropy candidate byte. The
    * constant is < 2^27, keeping every intermediate product < 2^59: no
    * 64-bit overflow in Spark OR in the DuckDB oracle twin (whose BIGINT
    * multiply errors on overflow rather than wrapping). */
  def mix32(h: Column): Column = {
    val c = lit(73244475L)     // 0x45d9f3b, odd => bijective mod 2^32
    val m = lit(4294967296L)   // 2^32
    val z1 = h.bitwiseXOR(shiftright(h, 16))
    val z2 = (z1 * c) % m
    val z3 = z2.bitwiseXOR(shiftright(z2, 16))
    val z4 = (z3 * c) % m
    z4.bitwiseXOR(shiftright(z4, 16))
  }

  /** Per-language marker-word profiles for the n-gram/stopword language-ID
    * heuristic. Deliberately tiny: language ID at pipeline scale is a cheap
    * prefilter, not a classifier. */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "los", "que", "y", "es"),
    "fr" -> Seq("le", "les", "et", "est", "une"),
  )

  /** Language prediction: argmax of profile hits with a fixed priority
    * order for ties ("und" when nothing matches). Hit counting runs in the
    * compiled one-pass [[graft.functions.TextStatsKernel]] (interpreted
    * size/filter lambdas re-walked the token array per language); the
    * argmax fold stays cheap scalar Column math. */
  def langId(text: Column): Column = langId(text, Nil)

  /** As [[langId]], but building the SAME kernel expression as a
    * [[qualityStats]] call with these stopwords — codegen subexpression
    * elimination then evaluates the kernel once per row when both run in
    * one projection (unequal expressions cannot be merged). */
  def langId(text: Column, stopwords: Seq[String]): Column = {
    val hits = graft.functions.vectors
      .text_stats(text, stopwords, langProfiles.map(_._2)).getField("hits")
    val scores = langProfiles.zipWithIndex.map { case ((l, _), i) =>
      l -> element_at(hits, i + 1)
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((l, s), acc) =>
      when(s === best && best > 0, lit(l)).otherwise(acc)
    }
  }

  /** Quality statistics: token count, distinct-token count, type-token
    * ratio, mean token length, stopword ratio. Counting is ONE compiled
    * pass over the token stream ([[graft.functions.TextStatsKernel]] —
    * semantics identical to the size/array_distinct/filter formulation);
    * the ratios are single divisions over the struct fields, and codegen
    * subexpression elimination evaluates the kernel once per row. */
  def qualityStats(df: DataFrame, textCol: String, stopwords: Seq[String]): DataFrame = {
    val st = graft.functions.vectors
      .text_stats(col(textCol), stopwords, langProfiles.map(_._2))
    df.withColumn("n_tokens", st.getField("n_tokens"))
      .withColumn("n_uniq", st.getField("n_uniq"))
      .withColumn("n_stop", st.getField("n_stop"))
      .withColumn("ttr",
        col("n_uniq").cast("double") / col("n_tokens").cast("double"))
      .withColumn("mean_tok_len",
        st.getField("sum_tok_len").cast("double")
          / col("n_tokens").cast("double"))
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

  // --- n-gram language-model scoring (CCNet-style quality signal) --------

  /** Adjacent-token bigram rows: one (idCol, w1, w2) per consecutive token
    * pair. The pair array is built map-side with zip_with over two slices
    * of the SAME token array (one split per row, no self-join, no
    * positional re-join), then exploded — the standard scale shape for
    * n-gram extraction. Docs under two tokens produce nothing. */
  def bigrams(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(lower(col(textCol)))
    val withToks = df.select(col(idCol), toks.as("toks"))
      .filter(size(col("toks")) >= 2)
    val n = size(col("toks"))
    val pairs = zip_with(
      slice(col("toks"), lit(1), n - 1),
      slice(col("toks"), lit(2), n - 1),
      (a, b) => struct(a.as("w1"), b.as("w2")))
    withToks.select(col(idCol), explode(pairs).as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
  }

  /** Train a bigram LM on a corpus: (bigram counts (w1, w2, c2), context
    * counts (w1, c1)). Two partial-aggregated groupBys over one bigram
    * pass; counts are exact integers, so the model is deterministic and
    * engine-portable. At 100 TB the model side is itself large — both
    * tables stay distributed and join by key (bucket by w1 when reused);
    * training on a hash-sample of the corpus is the usual cost lever and
    * composes here as a plain filter before this call. */
  def lmTrain(corpus: DataFrame, idCol: String, textCol: String)
      : (DataFrame, DataFrame) = {
    val bg = bigrams(corpus, idCol, textCol)
    (bg.groupBy("w1", "w2").agg(count(lit(1)).as("c2")),
      bg.groupBy("w1").agg(count(lit(1)).as("c1")))
  }

  /** Per-document mean bigram log-likelihood under an add-one-smoothed
    * bigram LM — the CCNet-style fluency/quality score (docs unlike the
    * training corpus score low). `vocab` is the smoothing denominator mass.
    *
    * Determinism across engines and runs: each bigram's logprob is
    * quantized to integer MICRO-nats map-side, and only the integer sum is
    * aggregated — integer addition commutes, so shuffle order cannot
    * perturb the result (a double sum would differ run-to-run in the last
    * bits). The mean is recovered from the integer sum at the end.
    *
    * Output: (idCol, n_bigrams, lp_sum_micro, lm_score) for every doc with
    * at least one bigram; unseen bigrams/contexts count as zero. */
  def lmScore(
      df: DataFrame,
      idCol: String,
      textCol: String,
      bigramCounts: DataFrame,
      contextCounts: DataFrame,
      vocab: Long): DataFrame = {
    val bg = bigrams(df, idCol, textCol)
    val lp = log(
      (coalesce(col("c2"), lit(0L)).cast("double") + 1.0) /
        (coalesce(col("c1"), lit(0L)).cast("double") + vocab.toDouble))
    bg.join(bigramCounts, Seq("w1", "w2"), "left")
      .join(contextCounts, Seq("w1"), "left")
      .select(col(idCol), round(lp * 1e6).cast("long").as("lp_micro"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("lp_micro")).as("lp_sum_micro"))
      .withColumn("lm_score",
        round(col("lp_sum_micro").cast("double") / 1e6 /
          col("n_bigrams").cast("double"), 4))
  }

  /** Top-k characteristic terms per document by tf-idf — the classic
    * keyword/topic signal used for corpus exploration and cluster labeling
    * in training-data pipelines. tf is the raw in-doc term count; idf is
    * the smoothed ln((N+1)/(df+1)) quantized to micro-units BEFORE the
    * multiply ([[lmScore]]'s convention: both engines round the log to
    * 1e-6 first, so cross-engine libm drift in the last ulp can never
    * reach the compared value).
    *
    * Scale shape: term counting is one hash shuffle on (doc, term) with
    * map-side combine; document frequency is one shuffle on term over the
    * per-doc-distinct terms; N is a scalar broadcast; top-k is a window
    * over the doc partition — everything pre-aggregates before it moves.
    *
    * Returns (idCol, term, tf, df, tfidf) with k rows per doc, ordered
    * ties broken by term. */
  def tfIdfTopTerms(
      df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val terms = df
      .select(col(idCol), explode(tokens(col(textCol))).as("term"))
    val tf = terms.groupBy(idCol, "term").agg(count(lit(1)).as("tf"))
    val docFreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // corpus size as a broadcast one-row join, not an eager count: the
    // whole operator stays one Catalyst plan (no driver-side scan)
    val nDocs = df.select(countDistinct(col(idCol)).as("n_docs"))
    val idfMicro = round(
      log((col("n_docs").cast("double") + 1d) /
        (col("df").cast("double") + 1d)) * 1e6).cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy(col("tfidf").desc, col("term").asc)
    tf.join(docFreq, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf", round(
        col("tf").cast("double") * idfMicro.cast("double") / 1e6, 4))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"), col("tfidf"))
  }
}
