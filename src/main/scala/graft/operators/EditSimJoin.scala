package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EXACT edit-distance similarity self-join via positional q-gram prefix
  * filtering (Gravano et al., "Approximate String Joins in a Database
  * (Almost) for Free", VLDB 2001; prefix-length refinement from Xiao,
  * Wang, Lin, "Ed-Join", PVLDB 2008 — both public): all id pairs whose
  * strings are within Levenshtein distance ≤ k, with NO false negatives.
  * The string-valued complement to [[SetSimJoin]]'s token-set Jaccard —
  * the classic path/name fuzzy join of merge-purge deployments.
  *
  * Filter theorem (set form): one edit touches at most q of a string's
  * q-grams, so ed(x,y) ≤ k ⇒ |grams(x) \ grams(y)| ≤ k·q — x and y
  * share a gram among the first k·q+1 grams of EACH under any one
  * global total order (the [[SetSimJoin]] prefix argument with overlap
  * α = max(|Gx|,|Gy|) − k·q). Rare-first ordering keeps prefix blocks
  * minimal; the length filter |len(x) − len(y)| ≤ k prunes inside the
  * pair emission. Strings too short to own k·q+1 grams (len < q·(k+1))
  * can defeat the gram argument entirely, so they are routed through a
  * dedicated short-band: shorts pair with EVERY string within length k
  * of the short bound — exactness preserved because that band is
  * bounded-length (at most q·(k+1)+k−1 chars), hence a tiny fraction of
  * any real corpus. No cap anywhere: this operator's contract is
  * exactness, and block sizes are bounded by gram rarity + length
  * banding, not by a skew cap.
  *
  * Scale shape: same plan as [[SetSimJoin]] — explode→freq groupBy,
  * rare-first re-assembly, per-prefix-gram grouped pair emission, one
  * verification join; all codegen'd array/string builtins, Levenshtein
  * included (DuckDB's `levenshtein` is the identical classic DP, so the
  * verify half is cross-engine-checkable).
  */
object EditSimJoin {

  /** strs: (id, s) with unique non-null ids; s non-null (duplicate
    * string VALUES are fine — they meet at distance 0 for k ≥ 0).
    * Returns (idA, idB, dist) for every pair with
    * levenshtein(sA, sB) ≤ k, idA < idB. */
  def join(strs: DataFrame, k: Int, q: Int = 2): DataFrame = {
    require(k >= 0 && q >= 1, "need k >= 0, q >= 1")
    val minLong = q * (k + 1) // shortest length owning k·q+1 grams
    val longs = strs.where(length(col("s")) >= minLong)

    // --- gram channel (long strings only) ----------------------------
    val grams = longs
      .select(col("id"), col("s"), explode(distinctGrams(col("s"), q)).as("g"))
    val freq = grams.groupBy(col("g")).agg(count(lit(1)).as("freq"))
    val prefix = grams.join(freq, "g")
      .groupBy(col("id"))
      .agg(first(col("s")).as("s"),
        slice(transform(
          array_sort(collect_list(struct(col("freq"), col("g")))),
          e => e("g")), 1, k * q + 1).as("pfx"))
      .select(col("id"), length(col("s")).as("n"), explode(col("pfx")).as("g"))
    val gramCands = prefix.groupBy(col("g"))
      .agg(sort_array(collect_set(struct(col("id"), col("n")))).as("ms"))
      .where(size(col("ms")) >= 2)
      .select(explode(CandidateGen.pairwise(col("ms"),
        (x, y) => struct(x("id").as("idA"), y("id").as("idB")),
        (x, y) => abs(x("n") - y("n")) <= k)).as("p"))
      .select(col("p.idA"), col("p.idB"))

    // --- short band: len(x) < minLong pairs with every string within
    // length k of it (covers short×short AND short×long without
    // asymmetry holes); both sides bounded-length by construction.
    // Expanded to an EQUI-join on the partner length (each short probes
    // its 2k+1 admissible lengths), so this is a hash join distributed
    // by length key, never a nested-loop product
    val shorts = strs.where(length(col("s")) < minLong)
      .select(col("id"),
        explode(sequence(length(col("s")) - k, length(col("s")) + k)).as("lk"))
    val band = strs.where(length(col("s")) <= minLong - 1 + k)
      .select(col("id").as("idO"), length(col("s")).as("lk"))
    val shortCands = shorts.join(band, "lk")
      .where(col("id") =!= col("idO"))
      .select(least(col("id"), col("idO")).as("idA"),
        greatest(col("id"), col("idO")).as("idB"))

    // --- verify ------------------------------------------------------
    val slim = strs.select(col("id"), col("s"))
    gramCands.unionByName(shortCands).distinct()
      .join(slim.withColumnRenamed("id", "idA").withColumnRenamed("s", "sA"), "idA")
      .join(slim.withColumnRenamed("id", "idB").withColumnRenamed("s", "sB"), "idB")
      // bounded verify: the 3-arg builtin runs the banded O(n·k) DP and
      // returns −1 past the bound — exact distances for every kept row,
      // so the output is identical to the unbounded verify + filter
      .select(col("idA"), col("idB"),
        levenshtein(col("sA"), col("sB"), k).as("dist"))
      .where(col("dist") >= 0)
  }

  /** DISTINCT q-grams of `s` (set semantics — the filter theorem above
    * is stated and proven for gram SETS). Only ever called on strings
    * with length ≥ q·(k+1) ≥ q, so the position sequence is non-empty
    * and ascending. */
  private def distinctGrams(s: Column, q: Int): Column =
    array_distinct(transform(
      sequence(lit(1), length(s) - lit(q - 1)),
      i => s.substr(i, lit(q))))
}
