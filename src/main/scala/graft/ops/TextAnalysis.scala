package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text analysis for corpus curation (SURVEY D4): language
  * identification (stopword-profile heuristic), quality scoring,
  * fingerprinting. All built-in column expressions — codegen'd,
  * no UDFs, embarrassingly parallel per row.
  */
object TextAnalysis {

  /** Tiny per-language stopword profiles for the heuristic
    * language-ID. Deliberately small: the operator shape (profile
    * match + argmax) is the point; production swaps in full profiles
    * or character-n-gram models via the same API.
    */
  val stopwordProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "a", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "del", "se", "las"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein", "zu", "den", "mit", "nicht"),
    "fr" -> Seq("le", "la", "de", "et", "est", "un", "les", "des", "une", "dans"))

  private def words(text: Column): Column =
    split(lower(text), "\\s+")

  /** Count of words from `profile` appearing in the text. */
  def profileHits(text: Column, profile: Seq[String]): Column =
    size(filter(words(text), w => w.isInCollection(profile)))

  /** Heuristic language tag: argmax of profile hits, "und"
    * (undetermined) when nothing matches; ties break by profile order.
    */
  def langId(text: Column): Column = {
    val scores = stopwordProfiles.map { case (lang, prof) =>
      (lang, profileHits(text, prof))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, score), acc) =>
      when(score === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  def wordCount(text: Column): Column = size(split(text, " "))

  /** Mean word length, derived arithmetically from char/word counts
    * for single-spaced text.
    */
  def avgWordLen(text: Column): Column =
    (length(text) - wordCount(text) + lit(1)) * lit(1.0) / wordCount(text)

  def stopwordRatio(text: Column): Column =
    profileHits(text, stopwordProfiles.head._2) * lit(1.0) / wordCount(text)

  /** Composite quality score in [0,1]: length saturation + stopword
    * density + word-shape plausibility. The exact formula is engine
    * spec (deterministic, SQL-expressible — the conformance oracle
    * recomputes it in DuckDB).
    */
  def qualityScore(text: Column): Column =
    round(
      least(length(text), lit(500)) * lit(1.0) / 500 * 0.4 +
        stopwordRatio(text) * 0.4 +
        when(avgWordLen(text).between(3.0, 8.0), lit(0.2)).otherwise(lit(0.0)),
      6)

  /** Content fingerprint for exact-dup detection across stores:
    * md5 of whitespace-normalized lowercase text.
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(trim(lower(text)), "\\s+", " "))
}
