package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact, skew-balanced intra-block pair enumeration — the
  * recall-LOSSLESS complement to [[CandidateGen.pairsFromKeys]].
  *
  * The capped generator guards against hot blocks by dropping members
  * beyond `cap` (bounded work, bounded recall loss). When the contract
  * is "every within-block pair MUST be compared" (a legal-hold linkage,
  * a dedup whose misses are unrecoverable), capping is not an option —
  * and the naive alternative, `groupBy(key).collect_list`, places a hot
  * block's entire C(n,2) enumeration (and its n-member array) on ONE
  * task: a 10^6-member block at corpus scale is 5·10^11 pairs on a
  * single core. The load-balancing literature for MapReduce ER
  * (Kolb, Thor & Rahm, "Load Balancing for MapReduce-based Entity
  * Resolution", ICDE 2012 — BlockSplit/PairRange) splits oversized
  * blocks into bounded sub-tasks instead.
  *
  * This implementation gets the same effect with a CIRCULAR PAIRING
  * rule that needs no planning pass: member `idx` of an n-block emits
  * partners `(idx + d) mod n` for `d = 1..D(idx, n)` where
  *
  *   D = (n-1)/2                 when n is odd
  *   D = n/2     if idx < n/2    when n is even
  *   D = n/2 - 1 otherwise
  *
  * Every unordered pair {i, j} is emitted EXACTLY once (of the two
  * circular distances d and n-d, exactly one passes its emitter's
  * bound — for the tie d = n/2 at even n, exactly one endpoint sits in
  * the low half), and every row emits ⌈(n-1)/2⌉ or ⌊(n-1)/2⌋ pairs —
  * per-row imbalance ≤ 1 by construction. Each emission row then
  * resolves its partner id through a join on `(key, jdx)`, so a hot
  * block's pairs hash-distribute over the WHOLE cluster by partner
  * index instead of collapsing onto the block's single reducer. No
  * driver-side block-size planning, no second pass, no recall loss.
  *
  * Scale shape: two exchanges (the member-index window; the partner
  * join) regardless of skew. Per-row emission arrays are ~n/2 long —
  * at the extreme (n ≳ 10^7) chunk the `sequence` by an outer explode
  * of d-ranges; at every realistic block size the single sequence is
  * codegen'd array algebra.
  */
object BlockSplit {

  /** `(key, id)` → `(key, id, idx, n)`: the 0-based position of each
    * DISTINCT member within its block (ordered by id) plus the block
    * size, in ONE exchange — the rank window and the size window share
    * `partitionBy(key)`, so Catalyst plans a single hash partitioning
    * for both.
    */
  def indexed(keyed: DataFrame): DataFrame = {
    val byKey = Window.partitionBy(col("key"))
    keyed.select(col("key"), col("id")).distinct()
      .withColumn("idx", (row_number().over(byKey.orderBy(col("id"))) - lit(1)).cast("long"))
      .withColumn("n", count(lit(1)).over(byKey))
  }

  /** The circular-rule emission bound D(idx, n) (see object doc). */
  private def dMax(idx: Column, n: Column): Column =
    when(pmod(n, lit(2L)) === 1L, shiftright(n - 1L, 1))
      .otherwise(when(idx < shiftright(n, 1), shiftright(n, 1))
        .otherwise(shiftright(n, 1) - 1L))

  /** All C(n,2) intra-block pairs of `keyed (key, id)`, each exactly
    * once, annotated with the emitting member's index and circular
    * distance: `(key, idA, idB, emitter_idx, d)` with idA < idB.
    * Deterministic given the input set — the oracle replays the rule
    * from the raw `(key, id)` table and must reproduce every row.
    */
  def balancedPairs(keyed: DataFrame): DataFrame = {
    val ix = indexed(keyed)
    val em = ix
      .where(col("n") >= 2L)
      .withColumn("dmax", dMax(col("idx"), col("n")))
      // n = 2, idx = 1 has dmax = 0 — and Spark's sequence(1, 0)
      // DESCENDS rather than returning empty, so the guard is load-bearing
      .where(col("dmax") >= 1L)
      // spread the block's MEMBERS before emission: after the index
      // window a hot block's n rows sit in one hash(key) partition, and
      // if the partner side broadcasts, nothing downstream would ever
      // redistribute them — the whole C(n,2) explode would run on one
      // task (measured: n = 10^4 ⇒ 5·10^7 pairs on a single core).
      // This exchange ships only the n narrow member rows, spreading
      // them by (key, idx) so each task explodes an even share of the
      // block's deltas; with a broadcast partner the output inherits
      // this spread, with SMJ the join's own (key, jdx) exchange
      // re-spreads by partner. The partition count is pinned because
      // AQE would coalesce this exchange by its INPUT bytes (narrow
      // member rows) and hand the ~n/2-fanout explode back to one task
      .repartition(keyed.sparkSession.sessionState.conf.numShufflePartitions,
        col("key"), col("idx"))
      .select(col("key"), col("id"), col("idx"), col("n"),
        explode(sequence(lit(1L), col("dmax"))).as("d"))
      .withColumn("jdx", pmod(col("idx") + col("d"), col("n")))
    em.join(
        ix.select(col("key"), col("idx").as("jdx"), col("id").as("pid")),
        Seq("key", "jdx"))
      .select(col("key"),
        least(col("id"), col("pid")).as("idA"),
        greatest(col("id"), col("pid")).as("idB"),
        col("idx").as("emitter_idx"), col("d"))
  }

  /** The user-facing candidate set: balanced exact pairs deduplicated
    * across blocks (a pair sharing several keys is compared once), same
    * output shape as [[CandidateGen.pairsFromKeys]] but with ZERO recall
    * loss — drop-in for the capped path when completeness is mandatory.
    */
  def pairs(keyed: DataFrame): DataFrame =
    balancedPairs(keyed).select(col("idA"), col("idB")).distinct()
}
