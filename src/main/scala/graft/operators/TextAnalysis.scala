package graft.operators

import graft.util.Hashing
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline over the
  * `documents` table: token counting, quality scoring, language ID, and
  * winnowing document fingerprints.
  *
  * Everything column-based is pure `functions._`/`expr` — whole-stage
  * codegen, no UDFs (builder rule: functions, not UDFs); only the
  * winnowing fingerprint, which is inherently imperative (rolling
  * window minimum), runs in a typed map.
  */
object TextAnalysis {

  /** Lowercased alphanumeric token stream as an array column. */
  def tokensCol(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0))

  def tokenCountCol(text: Column): Column = size(tokensCol(text))

  def punctCountCol(text: Column): Column =
    size(regexp_extract_all(text, lit("[.,;:!?]"), lit(0)))

  /** Stopword sets per language — tiny, order matters for the CASE
    * tie-break so keep them stable. */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "on", "for", "with", "a"),
    "fr" -> Seq("le", "la", "les", "et", "de", "un", "une", "dans", "est", "pour"),
    "es" -> Seq("el", "los", "las", "y", "en", "un", "una", "que", "es", "por"),
    "de" -> Seq("der", "die", "das", "und", "von", "mit", "ist", "im", "den", "zu"))

  private def hitCount(tokens: Column, words: Seq[String]): Column = {
    val arr = array(words.map(lit): _*)
    size(filter(tokens, t => array_contains(arr, t)))
  }

  /** Heuristic language guess: argmax of stopword hits with a fixed
    * tie-break order (en > fr > es > de), 'und' when no hits at all.
    * Expressed as a CASE chain of builtin functions so the identical
    * logic runs in DuckDB for the oracle. */
  def langGuessCol(text: Column): Column = {
    val toks = tokensCol(text)
    val hits = stopwords.map { case (lang, words) => lang -> hitCount(toks, words) }
    val Seq(en, fr, es, de) = hits.map(_._2)
    when(en + fr + es + de === 0, lit("und"))
      .when(en >= fr && en >= es && en >= de, lit("en"))
      .when(fr >= es && fr >= de, lit("fr"))
      .when(es >= de, lit("es"))
      .otherwise(lit("de"))
  }

  /** Simple quality score in [0,1]: penalizes very short docs, high
    * punctuation density, and high digit density. Deterministic double
    * arithmetic from exact ints — oracle-safe. */
  def qualityScoreCol(text: Column, nChars: Column): Column = {
    val len = nChars.cast("double")
    val punct = punctCountCol(text).cast("double")
    val digits = size(regexp_extract_all(text, lit("[0-9]"), lit(0))).cast("double")
    val lenScore = least(len / 200.0, lit(1.0))
    val punctPenalty = least(punct / greatest(len, lit(1.0)) * 10.0, lit(1.0))
    val digitPenalty = least(digits / greatest(len, lit(1.0)) * 5.0, lit(1.0))
    lenScore * (lit(1.0) - punctPenalty * 0.5) * (lit(1.0) - digitPenalty * 0.5)
  }

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 —
    * public algorithm): hash all k-gram token shingles, slide a window
    * of `w`, keep each window's minimum (rightmost on ties), dedupe.
    * Used for document fingerprint indexes / containment detection. */
  /** Rolling k-gram hash sequence (position i = hash of tokens
    * [i, i+k)): the input to winnowing. Public so Verify can dump it —
    * the DuckDB oracle redoes the window-minimum + dedupe over the
    * dumped sequence independently. For 0 < len < k there is one hash
    * over the whole (short) token list, matching the winnow loop. */
  def kgramHashes(tokens: Array[String], k: Int = 5): Array[Long] = {
    val n = math.max(1, tokens.length - k + 1)
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      var h = 0L
      var j = 0
      while (j < k && i + j < tokens.length) { h = Hashing.mix64(h ^ Hashing.hashString(tokens(i + j))); j += 1 }
      hs(i) = h
      i += 1
    }
    hs
  }

  def winnow(tokens: Array[String], k: Int = 5, w: Int = 4): Array[Long] = {
    if (tokens.length == 0) return Array.empty
    val hs = kgramHashes(tokens, k)
    val n = hs.length
    val out = scala.collection.mutable.LinkedHashSet.empty[Long]
    var i = 0
    val last = math.max(0, n - w)
    while (i <= last) {
      var mn = hs(i)
      var j = i + 1
      while (j < math.min(i + w, n)) { if (hs(j) <= mn) mn = hs(j); j += 1 }
      out += mn
      i += 1
    }
    out.toArray
  }

  // ---- PII redaction --------------------------------------------------------

  /** Redaction table: (kind, pattern, replacement), applied in order.
    * Patterns stay inside the regex subset Java and RE2 share (no
    * backrefs, no lookaround), so the SAME strings drive both the
    * codegen'd Spark path and the DuckDB oracle. Email runs first so
    * its domain can't later half-match the IP pattern. */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}", "<EMAIL>"),
    ("ipv4", "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}", "<IP>"),
    ("phone", "\\d{3}-\\d{4}", "<PHONE>"))

  /** Occurrences of one PII kind in `text` (pre-redaction audit count). */
  def piiCountCol(text: Column, kind: String): Column = {
    val p = piiPatterns.collectFirst { case (`kind`, pat, _) => pat }
      .getOrElse(throw new IllegalArgumentException(s"unknown PII kind: $kind"))
    size(regexp_extract_all(text, lit(p), lit(0)))
  }

  /** `text` with every pattern in [[piiPatterns]] replaced, in order —
    * a pure regexp_replace chain: whole-stage codegen, one narrow map,
    * exactly what a 100 TB scrub pass wants. */
  def redactPiiCol(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (_, pat, repl)) =>
      regexp_replace(c, pat, repl)
    }

  /** Per-document analysis frame: tokens, quality, language guess. */
  def analyze(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("lang"),
      col("source"),
      tokenCountCol(col("text")).as("n_tokens"),
      punctCountCol(col("text")).as("n_punct"),
      qualityScoreCol(col("text"), col("n_chars")).as("quality"),
      langGuessCol(col("text")).as("lang_guess"))
}
