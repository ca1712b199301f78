package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Suffix-array blocking: key each value by EVERY suffix of length ≥
  * `MinSuffixLen` (Aizawa & Oyama, "A fast linkage detection scheme for
  * multi-source information integration", WIRI 2005; Christen, "Data
  * Matching", 2012, §4.8 — a standard indexing scheme in Febrl). Two
  * values land in one block when they share any sufficiently long
  * suffix, so the scheme is robust to errors near the START of a string
  * — exactly where [[Phonetic]] Soundex is maximally fragile (the first
  * letter is preserved verbatim in the code). The two schemes are the
  * textbook complementary pair; the reference library has no blocking
  * at all (SURVEY.md §3b).
  *
  * The classic robustness move is block PURGING, not capping: a suffix
  * shared by too many values ("-tion" over an English vocabulary) says
  * nothing about co-reference, so the whole block is discarded rather
  * than truncated. Purging here is the scale-safe two-pass shape — a
  * streaming count aggregate first, then a same-key join of the
  * survivors — so no executor ever materializes an unpurged hot block
  * (a `collect_set`-then-drop would buffer the "-tion" block before
  * discarding it; at 10^12 rows that is an OOM, not a plan). Suffix
  * generation is a codegen'd higher-order function (`transform` over
  * `sequence`), pair emission is [[CandidateGen.pairwise]]'s shared
  * array algebra — no UDF anywhere.
  *
  * The DuckDB oracle replays the ENTIRE scheme independently: suffix
  * generation via a list comprehension, the purge bounds, pair algebra,
  * and the Levenshtein verification.
  */
object SuffixBlocking {

  /** Minimum suffix length — suffixes shorter than this are too common
    * to be discriminative (Christen §4.8 uses 4–5 for name fields). ONE
    * definition; the oracle SQL interpolates it. */
  val MinSuffixLen = 4

  /** Purge bound: blocks with more members than this are discarded
    * entirely (suffix too common to signal co-reference). ONE
    * definition; the oracle SQL interpolates it. */
  val DefaultMaxBlock = 16

  /** All suffixes of `tok` with length ≥ [[MinSuffixLen]], as a
    * codegen'd HOF. Short tokens need the explicit empty branch:
    * Spark's `sequence(1, 0)` generates DESCENDING [1, 0], not []. */
  def suffixes(tok: Column): Column =
    when(length(tok) >= MinSuffixLen,
      transform(
        sequence(lit(1), length(tok) - lit(MinSuffixLen) + lit(1)),
        i => tok.substr(i, length(tok))))
      .otherwise(array().cast("array<string>"))

  /** (key = suffix, id = token) inverted-index rows over a vocabulary
    * with column `tok`. Suffixes of one token are pairwise distinct by
    * construction (they differ in length), so no dedup is needed. */
  def suffixKeys(vocab: DataFrame): DataFrame =
    vocab
      .where(length(col("tok")) >= MinSuffixLen)
      .select(explode(suffixes(col("tok"))).as("key"), col("tok").as("id"))

  /** Block-size histogram: how many suffix blocks exist at each member
    * count, and whether that size survives the purge — the table a
    * blocking-key designer reads before picking [[DefaultMaxBlock]]. */
  def blockHistogram(vocab: DataFrame, maxBlock: Int = DefaultMaxBlock): DataFrame =
    suffixKeys(vocab)
      .groupBy(col("key")).agg(count(lit(1)).as("n_tokens"))
      .groupBy(col("n_tokens")).agg(count(lit(1)).as("n_blocks"))
      .withColumn("alive",
        col("n_tokens") >= 2 && col("n_tokens") <= maxBlock)

  /** Block-then-verify: pairs sharing ≥ 1 surviving (non-purged) suffix
    * block, deduplicated across blocks, verified with Levenshtein. The
    * purge is two-pass (count → same-key join of survivors), so the
    * `collect_set` downstream is bounded by `maxBlock` by construction. */
  def candidatePairs(vocab: DataFrame, maxBlock: Int = DefaultMaxBlock,
      maxLev: Int = Phonetic.DefaultMaxLev): DataFrame = {
    val keyed = suffixKeys(vocab)
    val alive = keyed
      .groupBy(col("key")).agg(count(lit(1)).as("n_tokens"))
      .where(col("n_tokens").between(2, maxBlock))
      .select(col("key"))
    keyed.join(alive, "key")
      .groupBy(col("key"))
      .agg(sort_array(collect_set(col("id"))).as("ids"))
      .select(explode(CandidateGen.pairwise(col("ids"),
        (x, y) => struct(x.as("idA"), y.as("idB")))).as("p"))
      .select(col("p.idA").as("tokA"), col("p.idB").as("tokB"))
      .distinct()
      .withColumn("lev", levenshtein(col("tokA"), col("tokB")))
      .withColumn("is_match", col("lev") <= maxLev)
  }
}
