package graft.operators.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Per-document text analysis for LLM data curation: token/char counts,
  * quality heuristics, n-grams, language-ID scoring. All single-pass
  * Catalyst expressions over the text column — zero shuffles until the
  * caller aggregates, zero UDFs.
  */
object TextStats {

  /** Whitespace token count of the normalized text (0 for blank docs). */
  def tokenCount(text: Column): Column =
    when(length(Dedup.normalize(text)) === 0, lit(0))
      .otherwise(size(Dedup.tokens(text)))

  def charCount(text: Column): Column = length(text)

  def lineCount(text: Column): Column = size(split(text, "\n"))

  /** Mean token length (null for empty docs). */
  def avgTokenLen(text: Column): Column = {
    val t = Dedup.tokens(text)
    when(size(t) > 0,
      aggregate(t, lit(0L), (acc, w) => acc + length(w)).cast("double") / size(t))
  }

  /** Fraction of characters that are ASCII punctuation. */
  def punctRatio(text: Column): Column =
    when(length(text) > 0,
      length(regexp_replace(text, "[^\\p{Punct}]", "")).cast("double") / length(text))
      .otherwise(lit(0.0))

  /** Fraction of tokens found in `stopwords` (a quality / language cue). */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val t = Dedup.tokens(text)
    val sw = array(stopwords.map(lit): _*)
    when(size(t) > 0,
      size(filter(t, w => array_contains(sw, w))).cast("double") / size(t))
      .otherwise(lit(0.0))
  }

  /** BPE-ish subword count estimate: whitespace tokens plus extra units
    * for digit runs and punctuation (a cheap proxy for tokenizer cost
    * when the real tokenizer isn't available cluster-side).
    */
  def subwordCountEstimate(text: Column): Column = {
    val words = tokenCount(text)
    val punct = length(regexp_replace(text, "[^\\p{Punct}]", ""))
    val digitRuns = size(filter(split(text, "[^0-9]+"), s => length(s) > 0))
    words + punct + digitRuns
  }

  /** Composite quality score in [0, 1]: rewards mid-length documents
    * with low punctuation density and a healthy stopword rate. Weights
    * are heuristic; tune per-corpus.
    */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val lenScore = least(tokenCount(text).cast("double") / 100.0, lit(1.0))
    val punctScore = lit(1.0) - least(punctRatio(text) * 5.0, lit(1.0))
    val swScore = least(stopwordRatio(text, stopwords) * 4.0, lit(1.0))
    round(lenScore * 0.4 + punctScore * 0.3 + swScore * 0.3, 6)
  }

  /** Word n-grams of the normalized text (non-distinct, order-preserving;
    * use with explode + groupBy-count for n-gram frequency).
    */
  def wordNgrams(text: Column, n: Int): Column = {
    val w = Dedup.tokens(text)
    when(
      size(w) >= n,
      transform(
        sequence(lit(1), size(w) - lit(n - 1)),
        i => concat_ws(" ", slice(w, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Default stopword profiles for the language-ID heuristic. */
  val langProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "y", "que", "en", "un", "una", "es", "los"),
    "fr" -> Seq("le", "la", "de", "et", "que", "en", "un", "une", "est", "les"),
    "de" -> Seq("der", "die", "das", "und", "zu", "in", "ist", "den", "von", "mit"))

  /** N-gram/stopword language-ID heuristic: the profile with the highest
    * stopword hit-rate wins; "und" (undetermined) when nothing matches.
    * A real pipeline would swap in fastText — the operator shape (pure
    * per-row expression, no shuffle) is the part that must scale.
    */
  def langId(text: Column, profiles: Map[String, Seq[String]] = langProfiles): Column = {
    val scored = profiles.toSeq.sortBy(_._1).map { case (lang, sw) =>
      struct(stopwordRatio(text, sw).as("score"), lit(lang).as("lang"))
    }
    val best = greatest(scored: _*)
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }
}
