package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Collective (relational) entity resolution: pairwise decisions that
  * feed back through shared CONTEXT CHANNELS (Bhattacharya & Getoor,
  * "Collective Entity Resolution in Relational Data", TKDD 2007; Dong
  * et al., SIGMOD'05 — public papers). Attribute similarity alone
  * decides confident pairs; borderline pairs are accepted only when
  * the contexts they connect already exhibit independent matched pairs
  * — relational evidence no per-pair comparator can see.
  *
  * Contexts are multi-channel (here: the repo pair AND the directory
  * pair a file pair connects). Multi-channel is what makes the
  * iteration genuinely multi-round: a pair rescued through its repo
  * channel contributes evidence to its directory channel, which can
  * rescue a second pair that shares only the directory context — a
  * propagation chain. (With a single static channel every pair in a
  * context pair sees the same count, so the decision fixpoint is
  * reached in one round — the degenerate case.)
  *
  * Semantics (deterministic, monotone): with dist the pair's
  * normalized distance,
  *  - base match: dist ≤ tauHi (confident on attributes alone);
  *  - round k ≥ 1: match if base, OR dist ≤ tauLo AND
  *    support_k ≥ minSupport, where support_k sums over the pair's
  *    channels the count of OTHER pairs matched at round k−1 sharing
  *    that channel context pair (the pair itself is excluded from its
  *    own support in every channel, so a borderline pair can never
  *    bootstrap itself and two borderline pairs can never bootstrap
  *    each other from nothing).
  * The match set only grows and support is monotone in it, so the
  * iteration reaches a fixpoint; a fixed small `rounds` keeps the
  * computation exactly unrollable by the DuckDB oracle.
  *
  * Scale shape: the per-channel context attach is two narrow joins
  * done ONCE; each round is one groupBy over (channel, cA, cB) of the
  * matched subset (tiny — one row per active context pair), one join
  * back, one per-pair sum — no re-scoring, no state growth. At 10^12
  * files this iterates over the persisted scores table only, and the
  * affinity table is orders of magnitude smaller than the pair table.
  */
object CollectiveEr {

  /** pairs: (idA, idB, dist); ctx: (id, channel, ctx) — one row per
    * context channel per record. Returns one row per input pair:
    * (idA, idB, dist, base_match, support, final_match) with `support`
    * the cross-channel evidence sum at the final round boundary. */
  def resolve(pairs: DataFrame, ctx: DataFrame, tauHi: Double, tauLo: Double,
      minSupport: Int = 1, rounds: Int = 3): DataFrame = {
    require(tauHi <= tauLo, "tauHi must be the stricter (smaller) threshold")
    require(rounds >= 1 && minSupport >= 1)
    val base = pairs.select(col("idA"), col("idB"), col("dist"),
      (col("dist") <= tauHi).as("base_match"))
    // static per-channel context pairs: (idA, idB, channel, cA, cB) —
    // built once, reused every round
    val pairCh = base.select(col("idA"), col("idB"))
      .join(ctx.select(col("id").as("idA"), col("channel"), col("ctx").as("ctxA")), "idA")
      .join(ctx.select(col("id").as("idB"), col("channel"), col("ctx").as("ctxB")),
        Seq("idB", "channel"))
      .select(col("idA"), col("idB"), col("channel"),
        least(col("ctxA"), col("ctxB")).as("cA"),
        greatest(col("ctxA"), col("ctxB")).as("cB"))
      .localCheckpoint(true)
    var cur = base
      .withColumn("support", lit(0L))
      .withColumn("m", col("base_match"))
      .localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val ch = pairCh.join(cur.select(col("idA"), col("idB"), col("m")),
        Seq("idA", "idB"))
      val aff = ch.where(col("m"))
        .groupBy(col("channel"), col("cA"), col("cB"))
        .agg(count(lit(1)).as("n_matched"))
      // per-channel evidence with self-exclusion, summed per pair;
      // left join: a pair with no channels (or channels never matched)
      // keeps support 0
      val sup = ch.join(aff, Seq("channel", "cA", "cB"), "left")
        .select(col("idA"), col("idB"),
          (coalesce(col("n_matched"), lit(0L))
            - when(col("m"), 1L).otherwise(0L)).as("s"))
        .groupBy(col("idA"), col("idB"))
        .agg(sum(col("s")).as("support"))
      cur = base
        .join(sup, Seq("idA", "idB"), "left")
        .withColumn("support", coalesce(col("support"), lit(0L)))
        .withColumn("m", col("base_match") ||
          (col("dist") <= tauLo && col("support") >= minSupport))
        .localCheckpoint(true)
    }
    cur.select(col("idA"), col("idB"), col("dist"),
      col("base_match"), col("support"), col("m").as("final_match"))
  }
}
