package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Phonetic blocking: the classic record-linkage primitive of keying
  * records by a sound-alike code so spelling variants land in the same
  * block (Russell's Soundex, 1918/1922 patents — public domain; see also
  * Christen, "Data Matching", 2012, ch. 4 — a standard blocking scheme in
  * every RL toolkit). The reference library has no blocking at all
  * (SURVEY.md §3b); this complements the MinHash / size-bucket /
  * sorted-neighborhood schemes already in [[Blocking]] /
  * [[SortedNeighborhood]] with the name-field scheme those cannot cover.
  *
  * The code itself is Spark's BUILT-IN `soundex` (codegen'd, no UDF):
  * classic American Soundex with H/W transparent — adjacent letters of
  * equal code separated only by H/W collapse (Ashcraft → A261). The
  * DuckDB oracle replays the whole algorithm in SQL (translate → drop
  * H/W codes → collapse per-digit runs → drop the first letter's own
  * code group → strip vowels → pad), so the builtin's exact semantics
  * are cross-engine-verified, not assumed.
  *
  * Demonstrated here over the documents table's token VOCABULARY
  * (letter-only words): phonetic candidate pairs = same-code token pairs,
  * then verified with a bounded edit distance — the standard
  * block-then-verify shape. Scale (100 TB): the vocabulary is the
  * distinct-token set (one shuffle, sublinear in corpus size by Heaps'
  * law); blocks are capped through [[CandidateGen.pairsFromKeys]]'s
  * map-side `WindowGroupLimit` rank, so a degenerate code (e.g. all
  * vowel-only tokens → X000-style buckets) can never emit more than
  * cap·(cap−1)/2 pairs. Everything is builtin column algebra inside one
  * whole-stage-codegen span — no typed lambda in the hot path.
  */
object Phonetic {

  /** Letter-only token pattern — Soundex is undefined for digit-initial
    * strings (Spark's builtin passes them through unchanged), so the
    * phonetic vocabulary excludes the `[a-z0-9]+` stats tokenizer's
    * digit-bearing tokens by construction. ONE definition; the oracle
    * SQL interpolates [[TokenPattern]] verbatim. */
  val TokenPattern = "[a-z]+"

  /** Soundex code column (uppercased input: the builtin keeps the first
    * character as-is, so codes are canonical 'X123' form only for
    * upper-case input). */
  def code(tok: Column): Column = soundex(upper(tok))

  /** Distinct letter-only token vocabulary of `textCol`, column `tok`. */
  def vocabulary(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(regexp_extract_all(
        lower(col(textCol)), lit(TokenPattern), lit(0))).as("tok"))
      .distinct()

  /** Phonetic equivalence classes of the vocabulary: one row per Soundex
    * code with its member count and lexicographic extremes — the block
    * histogram a blocking-key designer reads before picking a scheme. */
  def codeBlocks(vocab: DataFrame): DataFrame =
    vocab
      .groupBy(code(col("tok")).as("code"))
      .agg(count(lit(1)).as("n_tokens"),
        min(col("tok")).as("first_token"),
        max(col("tok")).as("last_token"))

  /** Block-then-verify: same-code token pairs through the shared capped
    * candidate generator, each verified with Levenshtein distance (the
    * builtin — DuckDB's `levenshtein` is the identical classic DP, so
    * the verification half is cross-engine-checked too). `is_match` at
    * `maxLev` is the standard phonetic-candidate acceptance rule. */
  /** Verification bound for `is_match` — ONE definition; the oracle SQL
    * interpolates it. */
  val DefaultMaxLev = 2

  def candidatePairs(vocab: DataFrame, cap: Int = Dedup.DefaultBlockCap,
      maxLev: Int = DefaultMaxLev): DataFrame = {
    val keyed = vocab.select(code(col("tok")).as("key"), col("tok").as("id"))
    CandidateGen.pairsFromKeys(keyed, cap)
      .select(col("idA").as("tokA"), col("idB").as("tokB"))
      // the code is a pure function of the token, so the shared key is
      // recoverable from either member — no need to carry it through
      // the pair dedup
      .withColumn("code", code(col("tokA")))
      .withColumn("lev", levenshtein(col("tokA"), col("tokB")))
      .withColumn("is_match", col("lev") <= maxLev)
  }
}
