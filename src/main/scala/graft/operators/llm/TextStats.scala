package graft.operators.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Per-document text analysis for LLM data curation: token/char counts,
  * quality heuristics, n-grams, language-ID scoring. All single-pass
  * Catalyst expressions over the text column — zero shuffles until the
  * caller aggregates, zero UDFs.
  *
  * Every operator has a `...FromTokens` form taking a MATERIALIZED token
  * array column. Use those in multi-stat pipelines: higher-order-function
  * lambdas re-evaluate non-attribute subtrees per element (CodegenFallback,
  * no subexpression elimination), so feeding `tokens(text)` expressions to
  * several stats re-runs the normalize regex once per stat per row — or
  * worse, per array element. The text-input forms are one-shot conveniences.
  */
object TextStats {

  /** Whitespace token count from a materialized token array (0 for blank
    * docs — normalization of an empty/blank doc yields `[""]`).
    */
  def tokenCountFromTokens(w: Column): Column = size(array_remove(w, ""))

  /** One-shot form over raw text. */
  def tokenCount(text: Column): Column = tokenCountFromTokens(Dedup.tokens(text))

  def charCount(text: Column): Column = length(text)

  def lineCount(text: Column): Column = size(split(text, "\n"))

  /** Mean token length (null for empty docs). Numerator and denominator
    * both use the empty-token-filtered count, so arrays containing ""
    * entries don't deflate the average.
    */
  def avgTokenLenFromTokens(w: Column): Column =
    when(tokenCountFromTokens(w) > 0,
      aggregate(w, lit(0L), (acc, t) => acc + length(t)).cast("double")
        / tokenCountFromTokens(w))

  def avgTokenLen(text: Column): Column = avgTokenLenFromTokens(Dedup.tokens(text))

  /** Fraction of characters that are ASCII punctuation (native byte-scan
    * count; equals the regexp_replace-and-length formulation).
    */
  def punctRatio(text: Column): Column =
    when(length(text) > 0,
      graft.functions.exprs.punctCount(text).cast("double") / length(text))
      .otherwise(lit(0.0))

  /** Fraction of tokens found in `stopwords` (a quality / language cue).
    * Native hash-set probe per token (graft.functions.StopwordHitsExpr);
    * the array_contains-filter HOF form would linear-scan the word list
    * per token, interpreted.
    */
  def stopwordRatioFromTokens(w: Column, stopwords: Seq[String]): Column = {
    val n = tokenCountFromTokens(w)
    when(n > 0,
      graft.functions.exprs.stopwordHits(w, stopwords).cast("double") / n)
      .otherwise(lit(0.0))
  }

  def stopwordRatio(text: Column, stopwords: Seq[String]): Column =
    stopwordRatioFromTokens(Dedup.tokens(text), stopwords)

  /** BPE-ish subword count estimate: whitespace tokens plus extra units
    * for digit runs and punctuation (a cheap proxy for tokenizer cost
    * when the real tokenizer isn't available cluster-side).
    */
  def subwordCountEstimateFromTokens(text: Column, w: Column): Column =
    tokenCountFromTokens(w) +
      graft.functions.exprs.punctCount(text) +
      graft.functions.exprs.digitRuns(text)

  def subwordCountEstimate(text: Column): Column =
    subwordCountEstimateFromTokens(text, Dedup.tokens(text))

  /** Composite quality score in [0, 1]: rewards mid-length documents
    * with low punctuation density and a healthy stopword rate. Weights
    * are heuristic; tune per-corpus.
    */
  def qualityScoreFromTokens(text: Column, w: Column, stopwords: Seq[String]): Column = {
    val lenScore = least(tokenCountFromTokens(w).cast("double") / 100.0, lit(1.0))
    val punctScore = lit(1.0) - least(punctRatio(text) * 5.0, lit(1.0))
    val swScore = least(stopwordRatioFromTokens(w, stopwords) * 4.0, lit(1.0))
    round(lenScore * 0.4 + punctScore * 0.3 + swScore * 0.3, 6)
  }

  def qualityScore(text: Column, stopwords: Seq[String]): Column =
    qualityScoreFromTokens(text, Dedup.tokens(text), stopwords)

  /** Count of the most frequent element of a string array (0 for an
    * empty array): sort the copy, then one O(n) pass over equal-adjacent
    * runs with a (prev, run, best) HOF state machine. Per-row — no
    * explode, no shuffle — so "top n-gram frequency" style repetition
    * signals cost O(n log n) compute and ZERO exchange, where the
    * explode+groupBy formulation shuffles one row per n-gram occurrence.
    */
  def topRunCount(arr: Column): Column =
    aggregate(
      array_sort(arr),
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1)
          .otherwise(lit(1))
        struct(
          x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))

  /** Word n-grams from a materialized token array (non-distinct,
    * order-preserving; use with explode + groupBy-count for n-gram
    * frequency).
    */
  def ngramsFromTokens(w: Column, n: Int): Column =
    when(
      size(w) >= n,
      transform(
        sequence(lit(1), size(w) - lit(n - 1)),
        i => concat_ws(" ", slice(w, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  def wordNgrams(text: Column, n: Int): Column =
    ngramsFromTokens(Dedup.tokens(text), n)

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
  def langIdFromTokens(
      w: Column,
      profiles: Map[String, Seq[String]] = langProfiles): Column = {
    val scored = profiles.toSeq.sortBy(_._1).map { case (lang, sw) =>
      struct(stopwordRatioFromTokens(w, sw).as("score"), lit(lang).as("lang"))
    }
    val best = greatest(scored: _*)
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  def langId(text: Column, profiles: Map[String, Seq[String]] = langProfiles): Column =
    langIdFromTokens(Dedup.tokens(text), profiles)
}
