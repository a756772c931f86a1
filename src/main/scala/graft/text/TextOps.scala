package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.TextExpressions

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language ID, and document
  * fingerprinting. Every operator is a pure `Column` expression (no UDFs):
  * at 100 TB these run inside whole-stage codegen as map-only projections —
  * no shuffle, no python worker round-trips.
  *
  * The hash/marker-count hot paths are custom codegen'd Catalyst
  * expressions (graft.functions) — the `*Hof` variants kept here are the
  * round-1 higher-order-function formulations, retained ONLY as the parity
  * baseline asserted by KernelsSpec (HOF lambdas evaluate interpreted per
  * element: measured 90 s → <2 s on text_fingerprint at sf0.1).
  */
object TextOps {

  val HashPrime = 1000000007L

  /** Whitespace tokens (empty string → one empty token, like pandas
    * str.split semantics in both engines). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish pre-tokenization: letter runs, digit runs, single punctuation. */
  val BpeTokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeTokenPattern), lit(0)))

  def punctCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[^A-Za-z0-9\\s]"), lit(0)))

  /** Occurrences of a word among whitespace tokens. */
  def wordCount(text: Column, word: String): Column =
    size(filter(tokens(text), t => t === word))

  /** Quality score in [0, 1]: mean word length band, stopword presence and
    * punctuation ratio — the standard cheap pre-filters for web-scale corpus
    * cleaning. Deterministic integer/ratio arithmetic.
    */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val nChars = length(text).cast("double")
    val meanWordLen = (nChars - (nTok - 1)) / nTok // single-space assumption
    val stopwords = TextExpressions.markerCountSum(text, Seq("the", "a"))
    val punctRatio = punctCount(text).cast("double") / nChars
    val lenOk = when(meanWordLen >= 3.0 && meanWordLen <= 10.0, 0.4).otherwise(0.0)
    val stopOk = when(stopwords > 0, 0.3).otherwise(0.0)
    val punctOk = when(punctRatio < 0.1, 0.3).otherwise(0.0)
    lenOk + stopOk + punctOk
  }

  /** n-gram-heuristic language ID: score each candidate language by its
    * marker-word counts; argmax with first-listed tie-break. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of"),
    "es" -> Seq("el", "la", "de"),
    "fr" -> Seq("le", "la", "et"),
    "de" -> Seq("der", "die", "und"),
    "zh" -> Seq("de", "le", "shi"))

  def langScores(text: Column): Seq[(String, Column)] =
    LangMarkers.map { case (lang, ws) =>
      lang -> TextExpressions.markerCountSum(text, ws)
    }

  def langId(text: Column): Column = {
    val scores = langScores(text)
    // argmax, ties to the earliest language in LangMarkers
    scores.foldLeft((lit("und"), lit(-1)): (Column, Column)) {
      case ((bestLang, bestScore), (lang, score)) =>
        (when(score > bestScore, lang).otherwise(bestLang),
          when(score > bestScore, score).otherwise(bestScore))
    }._1
  }

  /** Left-fold polynomial hash over the character codes of `text`, seeded
    * with the first char (matching a no-initial-value fold):
    * h = fold(c_2..c_n; h_1 = c_1) of (h·31 + c) mod 1e9+7. Empty → 0.
    * Codegen'd kernel; value-identical to [[polyHashHof]]. */
  def polyHash(text: Column): Column = TextExpressions.polyHash(text)

  /** Rolling-hash document fingerprint (winnowing-style): the minimum
    * polynomial hash over all word 8-grams (whole text if shorter).
    * One prefix-hash pass per row; value-identical to [[fingerprintHof]]. */
  def fingerprint(text: Column): Column = TextExpressions.fingerprint(text, 8)

  // ---- round-1 HOF formulations: parity baselines for KernelsSpec ----

  def polyHashHof(text: Column): Column = {
    val n = length(text)
    val chars = transform(sequence(lit(1), n), i => ascii(substring(text, i, lit(1))))
    when(n === 0, lit(0L)).otherwise(
      aggregate(
        slice(chars, lit(2), n - 1),
        element_at(chars, 1).cast("long"),
        (acc, x) => (acc * 31 + x) % HashPrime))
  }

  def fingerprintHof(text: Column): Column = {
    val w = tokens(text)
    val n = size(w)
    val grams = transform(sequence(lit(1), greatest(n - 7, lit(1))),
      i => concat_ws(" ", slice(w, i, lit(8))))
    array_min(transform(grams, g => polyHashStrHof(g)))
  }

  private def polyHashStrHof(s: Column): Column = {
    val n = length(s)
    val chars = transform(sequence(lit(1), n), i => ascii(substring(s, i, lit(1))))
    when(n === 0, lit(0L)).otherwise(
      aggregate(slice(chars, lit(2), n - 1), element_at(chars, 1).cast("long"),
        (acc, x) => (acc * 31 + x) % HashPrime))
  }
}
