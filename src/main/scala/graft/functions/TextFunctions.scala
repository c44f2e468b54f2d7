package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for LLM-data pipelines, all expressed as
  * Column transforms over built-in (codegen'd) functions — no UDFs, so they
  * stay inside whole-stage codegen at 100 TB scale.
  */
object TextFunctions {

  /** RE2-compatible whitespace class: [\t\n\f\r ]. Java's \s additionally
    * matches vertical tab (0x0b), which RE2 (the DuckDB oracle's regex
    * engine) does not — the explicit class keeps both tokenizers identical
    * on every byte (see also ShingleHashes.isSpace). */
  private val ws = "[ \\t\\n\\f\\r]"

  /** One-or-more run of [[ws]] — the split pattern every whitespace
    * tokenizer in the engine must use (NOT Java's "\\s+", which also
    * matches \x0B and silently diverges from the RE2 oracle). */
  val WsRun: String = ws + "+"

  /** Whitespace tokenization. */
  def tokens(text: Column): Column = split(trim(text), WsRun)

  def tokenCount(text: Column): Column = size(tokens(text)).cast("bigint")

  /** Mean token length (chars excluding whitespace / token count). */
  def avgWordLen(text: Column): Column =
    length(regexp_replace(text, ws, "")).cast("double") /
      size(tokens(text)).cast("double")

  /** Per-language stopword lists for the n-gram/stopword language heuristic.
    * Deliberately small: language ID here is a scoring heuristic, not a model. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "of", "and", "to", "a", "in", "is", "it", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "den", "nicht", "ein"),
    "es" -> Seq("el", "la", "los", "las", "y", "es", "que", "un", "una", "por"),
    "fr" -> Seq("le", "les", "et", "est", "que", "des", "une", "dans", "pour", "sur"))

  /** Count of tokens that appear in `words`. */
  def hitCount(toks: Column, words: Seq[String]): Column = {
    val arr = array(words.map(lit): _*)
    size(filter(toks, t => array_contains(arr, t))).cast("bigint")
  }

  /** Stopword-hit language ID with a fixed tie-break priority
    * (en > de > es > fr > unknown). Deterministic and SQL-expressible, so the
    * DuckDB oracle can replay it exactly. */
  def langId(text: Column): Column = {
    val t = tokens(text)
    val e = hitCount(t, stopwords("en"))
    val d = hitCount(t, stopwords("de"))
    val s = hitCount(t, stopwords("es"))
    val f = hitCount(t, stopwords("fr"))
    when(e >= d && e >= s && e >= f && e > 0, "en")
      .when(d >= s && d >= f && d > 0, "de")
      .when(s >= f && s > 0, "es")
      .when(f > 0, "fr")
      .otherwise("unknown")
  }

  /** Quality score in [0,1]: half from length (saturating at 100 tokens),
    * half from English-stopword density (saturating at 20%). */
  def qualityScore(text: Column): Column = {
    val t = tokens(text)
    val n = size(t).cast("double")
    val stopRatio = hitCount(t, stopwords("en")).cast("double") / n
    round(least(lit(1.0), n / 100.0) * 0.5 + least(lit(1.0), stopRatio * 5.0) * 0.5, 6)
  }

  /** BPE-style PRE-tokenization counts — the units a byte-pair tokenizer
    * merges within (GPT-2's pre-tokenizer splits text into letter runs,
    * digit runs, and other-symbol runs before any merge; its exact
    * pattern uses lookaheads, so this is the class-based formulation that
    * runs identically under Java regex and RE2/DuckDB). Pre-token count
    * is the standard fast token-budget estimator: BPE can only merge
    * WITHIN a pre-token, so `n_pretokens` lower-bounds and tracks the
    * real token count far better than whitespace words on code/CJK/punct.
    * Scan-local (regexp_count per row, no shuffle). */
  val AlphaRunRe = "[A-Za-z]+"
  val DigitRunRe = "[0-9]+"
  val OtherRunRe = "[^A-Za-z0-9 \\t\\n\\f\\r]+"
  val PreTokenRe = s"$AlphaRunRe|$DigitRunRe|$OtherRunRe"

  def preTokenCounts(text: Column): Seq[(String, Column)] = Seq(
    "n_pretokens" -> regexp_count(text, lit(PreTokenRe)),
    "n_alpha" -> regexp_count(text, lit(AlphaRunRe)),
    "n_digit" -> regexp_count(text, lit(DigitRunRe)),
    "n_other" -> regexp_count(text, lit(OtherRunRe)))

  /** Word n-gram shingles (space-joined), deduplicated per document.
    * Documents shorter than `n` tokens produce an empty array (guarded:
    * Spark's sequence(1, x) with x<1 counts DOWN, it is not empty). */
  def shingles(text: Column, n: Int = 3): Column = {
    val t = tokens(text)
    val grams = transform(
      sequence(lit(1), size(t) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(k => element_at(t, i + k)): _*))
    when(size(t) >= n, array_distinct(grams))
      .otherwise(array().cast("array<string>"))
  }
}
