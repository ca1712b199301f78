package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Truth discovery / conflict resolution with SOURCE RELIABILITY — the
  * data-integration step after clustering + survivorship when the merged
  * records carry CONFLICTING field values from sources of unequal
  * quality. [[Survivorship]] resolves conflicts with deterministic rules
  * (modal value, longest content); truth discovery instead ESTIMATES
  * each source's reliability from cross-entity agreement and lets
  * reliable sources outvote a careless majority.
  *
  * Two fixpoints from Pasternack & Roth, "Knowing What to Believe
  * (when you already know something)", COLING 2010, both run a FIXED
  * number of rounds (no data-dependent stop — the oracle unrolls the
  * exact same chain) from T_0 ≡ 1:
  *
  *  - [[sums]] — the linear hubs-and-authorities shape:
  *    {{{
  *    B_i(e,v) = Σ_{s claims (e,v)} T_{i-1}(s)     then B_i /= max(B_i)
  *    T_i(s)   = Σ_{(e,v) claimed by s} B_i(e,v)   then T_i /= max(T_i)
  *    }}}
  *  - [[investment]] — trust split across claims, pooled investment
  *    grown QUADRATICALLY, returns proportional to invested share; the
  *    primary scheme (see its doc for why the quadratic emphasis is
  *    what breaks careless-majority collusion).
  *
  * Winner per entity = arg max_v belief with ties to the smallest
  * value string. Every operation in both schemes is +, ×, /, max over
  * doubles — no transcendentals — so an independent engine replays the
  * fixpoint to within reordering noise (~1e-13 after 5 rounds), 6-dp
  * rounding makes the dumped numbers bit-stable across engines, and
  * the winner pick orders by a 9-dp rounding so reordering noise can
  * never flip it.
  *
  * No counterpart in the reference (zhang-shasha stops at pairwise
  * distance; SURVEY.md §3b) — this is the north_rule's "pipeline a user
  * of the reference would need around it" category.
  *
  * Scale shape: `claims` is the only big table (one row per
  * source-entity-value assertion, 10^12-scale in a real deployment).
  * Per round: belief = ONE aggregate of claims joined to the BROADCAST
  * trust table (sources ≪ claims — trust is |sources| rows); trust =
  * ONE aggregate of claims shuffle-joined to beliefs on (entity, value),
  * map-side combinable both ways. The two max's are single-row
  * aggregates (the same O(1)-row driver touch as the CC convergence
  * signature). Lineage never chains: each round's trust/belief frames
  * are rebuilt from `claims` + the previous SMALL trust table, and the
  * small table is eagerly checkpointed, so estimated stats cannot
  * compound (see [[graft.util.Checkpoints]]).
  */
object TruthDiscovery {

  /** Fixed round count — shared by the operator, the DuckDB oracle's
    * unrolled CTE chain, and the spec's hand replay. */
  val Rounds = 5

  final case class Result(trust: DataFrame, beliefs: DataFrame)

  /** Investment fixpoint (Pasternack & Roth 2010) with growth exponent
    * g = 2 — the scheme [[resolve]] uses. Each source splits its trust
    * evenly across its claims (`inv = T(s)/|C(s)|`); a claim's pooled
    * investment `base(c) = Σ_s inv(s,c)` GROWS quadratically
    * (`grown = base²`), and each investor gets back its share of the
    * grown value: `T'(s) = Σ_c grown(c)·inv(s,c)/base(c) = Σ_c
    * base(c)·inv(s,c)` (the g = 2 algebraic simplification — still no
    * transcendentals, so the oracle replays it exactly). Trust is
    * max-normalized per round (an O(1)-row driver touch, same class as
    * the CC convergence signature). The quadratic growth is what
    * separates colluding careless sources from a reliable minority —
    * the linear Sums scheme compresses that gap (measured in the spec
    * and the er_source_trust query: with half the sources 80 % noisy,
    * Investment drives their trust to ~0.05 while Sums leaves them
    * above 0.8).
    *
    * Final `beliefs` = round-R claim share `base² / Σ_{v'} base²` per
    * entity — a (0,1] posterior-like mass whose per-entity argmax is
    * the resolved value. */
  def investment(claims: DataFrame, rounds: Int = Rounds,
                 onRound: (Int, Double) => Unit = (_, _) => ()): Result = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val c = claims.select(col("source"), col("entity"), col("value"))
    val nClaims = c.groupBy(col("source")).agg(count(lit(1)).as("nclaims"))
    var trust = nClaims.select(col("source"), lit(1.0).as("trust"))
      .localCheckpoint(true) // |sources| rows
    var baseR: DataFrame = null
    var i = 0
    while (i < rounds) {
      val t0 = System.nanoTime()
      val inv = c.join(broadcast(trust.join(nClaims, "source")), "source")
        .select(col("source"), col("entity"), col("value"),
          (col("trust") / col("nclaims")).as("inv"))
      val base = inv.groupBy(col("entity"), col("value"))
        .agg(sum(col("inv")).as("base"))
      baseR = base.localCheckpoint(true)
      // checkpoint the tiny per-source aggregate FIRST — reading the max
      // and deriving the normalized trust from the checkpointed frame
      // runs the claims-wide join+aggregate chain exactly once per round
      val tCp = inv.join(baseR, Seq("entity", "value"))
        .groupBy(col("source"))
        .agg(sum(col("base") * col("inv")).as("t"))
        .localCheckpoint(true)
      val tMax = tCp.agg(max(col("t"))).head().getDouble(0)
      trust = tCp.select(col("source"), (col("t") / lit(tMax)).as("trust"))
      i += 1
      onRound(i, (System.nanoTime() - t0) / 1e9)
    }
    val wE = org.apache.spark.sql.expressions.Window.partitionBy(col("entity"))
    val beliefs = baseR
      .withColumn("belief",
        col("base") * col("base") /
          sum(col("base") * col("base")).over(wE))
      .select(col("entity"), col("value"), col("belief"))
    Result(trust, beliefs)
  }

  /** Run the Sums fixpoint. `claims`: (source, entity, value) — distinct
    * assertion rows. Returns final per-source trust (source, trust) and
    * per-claim beliefs (entity, value, belief), both normalized to
    * max = 1.0, un-rounded. */
  def sums(claims: DataFrame, rounds: Int = Rounds): Result = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val c = claims.select(col("source"), col("entity"), col("value"))
    var trust = c.select(col("source")).distinct()
      .select(col("source"), lit(1.0).as("trust"))
      .localCheckpoint(true) // tiny (|sources| rows); truncate eagerly
    var beliefs: DataFrame = null
    var i = 0
    while (i < rounds) {
      // checkpoint each raw aggregate BEFORE reading its max, so the
      // claims-wide chain behind it runs once per round, not twice
      val bCp = c.join(broadcast(trust), "source")
        .groupBy(col("entity"), col("value"))
        .agg(sum(col("trust")).as("b"))
        .localCheckpoint(true)
      val bMax = bCp.agg(max(col("b"))).head().getDouble(0)
      beliefs = bCp.select(col("entity"), col("value"),
        (col("b") / lit(bMax)).as("belief"))
      val tCp = c.join(beliefs, Seq("entity", "value"))
        .groupBy(col("source")).agg(sum(col("belief")).as("t"))
        .localCheckpoint(true)
      val tMax = tCp.agg(max(col("t"))).head().getDouble(0)
      trust = tCp.select(col("source"), (col("t") / lit(tMax)).as("trust"))
      i += 1
    }
    Result(trust, beliefs)
  }

  /** Resolve each entity to its highest-belief value under the
    * [[investment]] fixpoint (ties to the smallest value string —
    * never "whichever partition answered first"). Returns (entity,
    * value, belief, n_values, n_sources): the winning value, its final
    * per-entity belief share, how many distinct values competed, and
    * how many sources backed the winner. */
  def resolve(claims: DataFrame, rounds: Int = Rounds): DataFrame =
    resolveFrom(claims, investment(claims, rounds))

  /** [[resolve]] over an already-computed fixpoint [[Result]] — the ONE
    * definition of the winner/tie/support algebra, reusable by callers
    * that cache the fixpoint (er_truth_discovery) without re-running it. */
  def resolveFrom(claims: DataFrame, r: Result): DataFrame = {
    val support = claims.groupBy(col("entity"), col("value"))
      .agg(countDistinct(col("source")).as("n_sources"))
    val nVals = claims.groupBy(col("entity"))
      .agg(countDistinct(col("value")).as("n_values"))
    // belief ordering uses a 9-dp rounding so cross-engine reordering
    // noise (≤ ~1e-13 after 5 rounds) can never flip the winner pick
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("entity"))
      .orderBy(round(col("belief"), 9).desc, col("value"))
    r.beliefs
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .join(support, Seq("entity", "value"))
      .join(nVals, Seq("entity"))
      .select(col("entity"), col("value"), col("belief"),
        col("n_values"), col("n_sources"))
  }

  /** Unweighted majority-vote baseline: per entity, the value claimed by
    * the most sources (ties to the smallest value). The comparison
    * column er_truth_discovery carries — trust-weighting beats this
    * exactly where a careless majority outnumbers a reliable minority. */
  def majorityVote(claims: DataFrame): DataFrame = {
    val cnt = claims.groupBy(col("entity"), col("value"))
      .agg(countDistinct(col("source")).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("entity")).orderBy(col("n").desc, col("value"))
    cnt.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(col("entity"), col("value").as("vote_value"))
  }
}
