package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
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
  * value string.
  *
  * ==Fixed-point arithmetic (cross-engine bit-determinism)==
  * Both fixpoints run ENTIRELY in scaled integers: trust is a long in
  * units of 1/[[Scale]] (10^-9), per-claim investments are integer
  * floor-divisions, and every per-group sum is an EXACT decimal(38,0)
  * integer sum — associative and therefore independent of partition
  * count, task order, and aggregation threading. Normalizations are
  * single integer floor-divisions `(x * Scale) div max(x)`. A floating
  * fixpoint is correct only "to reordering noise (~1e-13)", which made
  * the dumped trust columns flip their last rounded digit between runs
  * whenever a value sat near a decimal boundary (round-4 scoreboard:
  * er_source_trust hash-red while rows/schema green); the integer chain
  * has NO noise — DuckDB replays it with HUGEINT arithmetic to exact
  * equality, and any engine at any parallelism produces the same bits.
  * Quantization error vs the real-valued fixpoint is ≤ 1 unit (1e-9)
  * per operation — invisible next to the trust separation the schemes
  * exist to measure (careless ~0.05–0.23 vs careful ~0.89–1.0), and
  * the spec's BigInt replay differential asserts the dataflow EXACTLY.
  *
  * Overflow envelope (decimal(38,0) / HUGEINT intermediates): the
  * largest intermediate is Investment's `traw·Scale` ≤ (claims/source)
  * · sources · Scale³ — with Scale = 10^9 that stays under 10^38 up to
  * ~10^11 total claims; past that, lower [[Scale]] to 10^8 (the specs'
  * behavior pins need only ~10^-6 resolution).
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
  * map-side combinable both ways (integer partial sums combine exactly).
  * The two max's are single-row aggregates (the same O(1)-row driver
  * touch as the CC convergence signature). Lineage never chains: each
  * round's trust/belief frames are rebuilt from `claims` + the previous
  * SMALL trust table, and the small table is eagerly checkpointed, so
  * estimated stats cannot compound (see [[graft.util.Checkpoints]]).
  */
object TruthDiscovery {

  /** Fixed round count — shared by the operator, the DuckDB oracle's
    * unrolled CTE chain, and the spec's hand replay. */
  val Rounds = 5

  /** Fixed-point scale: trust/belief live in [0, Scale] longs
    * (1 unit = 10^-9). Shared with the oracle SQL builders. */
  val Scale = 1000000000L

  private val Dec = "decimal(38,0)"

  /** trust: (source, trust: double, trust_fp: long);
    * beliefs: (entity, value, belief: double, belief_fp: long).
    * The `_fp` columns are the authoritative integers; the doubles are
    * their exact /Scale renderings (every value ≤ Scale < 2^53, so the
    * long→double conversion is exact and the division is one correctly
    * rounded IEEE op — identical in any engine). */
  final case class Result(trust: DataFrame, beliefs: DataFrame)

  /** Read a max over one decimal column, requiring a non-empty frame —
    * max over zero rows is NULL and would otherwise surface as an
    * opaque NPE deep in the round chain (reachable: an empty first
    * streaming batch). */
  private def maxDecimal(df: DataFrame, c: String, what: String): java.math.BigDecimal = {
    val row: Row = df.agg(max(col(c)), count(lit(1)), count(col(c))).head()
    require(!row.isNullAt(0),
      s"TruthDiscovery.$what: empty claims frame (no rows to aggregate)")
    // fail LOUDLY on the two silent-divergence modes the round-5 advisor
    // flagged: (1) a decimal(38,0) sum past the documented ~10^38
    // envelope nulls under non-ANSI Spark while the oracle's HUGEINT
    // raises — a null count here surfaces the breach as an error;
    // (2) an all-zero round (every source floored to 0) would make the
    // div-by-max yield NULL trust/belief silently while DuckDB's `//`
    // errors — reject a zero max with the same loud contract.
    require(row.getLong(1) == row.getLong(2),
      s"TruthDiscovery.$what: ${row.getLong(1) - row.getLong(2)} null $c " +
        "rows — decimal(38,0) overflow envelope breached (ANSI-off Spark " +
        "nulls silently; the oracle would error instead)")
    val m = row.getDecimal(0)
    require(m.signum != 0,
      s"TruthDiscovery.$what: max $c is 0 — every source's trust floored " +
        "to zero; normalizing would divide by zero (NULL under ANSI-off " +
        "Spark, an error in the oracle engine)")
    m
  }

  private def renderFp(df: DataFrame, key: Seq[String], fp: String,
                       out: String): DataFrame =
    df.select(key.map(col) ++ Seq(
      (col(fp).cast("double") / lit(Scale.toDouble)).as(out),
      col(fp).as(s"${out}_fp")): _*)

  /** Investment fixpoint (Pasternack & Roth 2010) with growth exponent
    * g = 2 — the scheme [[resolve]] uses. Each source splits its trust
    * evenly across its claims (`inv = T(s) div |C(s)|`, an integer
    * floor); a claim's pooled investment `base(c) = Σ_s inv(s,c)` GROWS
    * quadratically (`grown = base²`), and each investor gets back its
    * share of the grown value: `T'(s) = Σ_c grown(c)·inv(s,c)/base(c)
    * = Σ_c base(c)·inv(s,c)` (the g = 2 algebraic simplification — all
    * integer products, so the oracle replays it exactly). Trust is
    * max-normalized per round by ONE integer floor-division (an O(1)-row
    * driver touch, same class as the CC convergence signature). The
    * quadratic growth is what separates colluding careless sources from
    * a reliable minority — the linear Sums scheme compresses that gap
    * (measured in the spec and the er_source_trust query: with half the
    * sources 80 % noisy, Investment drives their trust to ~0.05 while
    * Sums leaves them above 0.8).
    *
    * Final `beliefs` = round-R claim share `base²·Scale div Σ_{v'}
    * base²` per entity — a (0, Scale] integer mass whose per-entity
    * argmax is the resolved value. */
  def investment(claims: DataFrame, rounds: Int = Rounds,
                 onRound: (Int, Double) => Unit = (_, _) => ()): Result = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val c = claims.select(col("source"), col("entity"), col("value"))
    val nClaims = c.groupBy(col("source")).agg(count(lit(1)).as("nclaims"))
    var trust = nClaims.select(col("source"), lit(Scale).as("tq"))
      .localCheckpoint(true) // |sources| rows
    var baseR: DataFrame = null
    var i = 0
    while (i < rounds) {
      val t0 = System.nanoTime()
      val inv = c.join(broadcast(trust.join(nClaims, "source")), "source")
        .select(col("source"), col("entity"), col("value"),
          expr("tq div nclaims").as("invq")) // long floor-division
      val base = inv.groupBy(col("entity"), col("value"))
        .agg(sum(col("invq").cast(Dec)).as("base")) // exact integer sum
      baseR = base.localCheckpoint(true)
      // checkpoint the tiny per-source aggregate FIRST — reading the max
      // and deriving the normalized trust from the checkpointed frame
      // runs the claims-wide join+aggregate chain exactly once per round
      val tCp = inv.join(baseR, Seq("entity", "value"))
        .groupBy(col("source"))
        .agg(sum(col("base") * col("invq").cast(Dec)).as("traw"))
        .localCheckpoint(true)
      val tMax = maxDecimal(tCp, "traw", "investment")
      trust = tCp.withColumn("__tmax", lit(tMax))
        .selectExpr("source", s"(traw * ${Scale}L) div __tmax AS tq")
      i += 1
      onRound(i, (System.nanoTime() - t0) / 1e9)
    }
    val wE = org.apache.spark.sql.expressions.Window.partitionBy(col("entity"))
    // den = 0 iff every claimant of the entity has zero (floored) trust
    // — no trusted support, so every value's belief mass is 0 (the
    // real-valued fixpoint's 0/0 here, defined to 0; reachable only in
    // fixed point, where trust can floor to exactly 0)
    val beliefs = baseR
      .withColumn("__den", sum(col("base") * col("base")).over(wE))
      .selectExpr("entity", "value",
        s"CASE WHEN __den = 0 THEN 0L ELSE (base * base * ${Scale}L) div __den END AS bq")
    Result(renderFp(trust.toDF("source", "tq"), Seq("source"), "tq", "trust"),
      renderFp(beliefs, Seq("entity", "value"), "bq", "belief"))
  }

  /** Run the Sums fixpoint. `claims`: (source, entity, value) — distinct
    * assertion rows. Returns final per-source trust and per-claim
    * beliefs, both max-normalized to Scale (double rendering = 1.0). */
  def sums(claims: DataFrame, rounds: Int = Rounds): Result = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val c = claims.select(col("source"), col("entity"), col("value"))
    var trust = c.select(col("source")).distinct()
      .select(col("source"), lit(Scale).as("tq"))
      .localCheckpoint(true) // tiny (|sources| rows); truncate eagerly
    var beliefs: DataFrame = null
    var i = 0
    while (i < rounds) {
      // checkpoint each raw aggregate BEFORE reading its max, so the
      // claims-wide chain behind it runs once per round, not twice
      val bCp = c.join(broadcast(trust), "source")
        .groupBy(col("entity"), col("value"))
        .agg(sum(col("tq").cast(Dec)).as("braw"))
        .localCheckpoint(true)
      val bMax = maxDecimal(bCp, "braw", "sums")
      beliefs = bCp.withColumn("__bmax", lit(bMax))
        .selectExpr("entity", "value", s"(braw * ${Scale}L) div __bmax AS bq")
      val tCp = c.join(beliefs, Seq("entity", "value"))
        .groupBy(col("source")).agg(sum(col("bq").cast(Dec)).as("traw"))
        .localCheckpoint(true)
      val tMax = maxDecimal(tCp, "traw", "sums")
      trust = tCp.withColumn("__tmax", lit(tMax))
        .selectExpr("source", s"(traw * ${Scale}L) div __tmax AS tq")
      i += 1
    }
    Result(renderFp(trust, Seq("source"), "tq", "trust"),
      renderFp(beliefs, Seq("entity", "value"), "bq", "belief"))
  }

  /** Resolve each entity to its highest-belief value under the
    * [[investment]] fixpoint (ties to the smallest value string —
    * never "whichever partition answered first"). Returns (entity,
    * value, belief, belief_fp, n_values, n_sources): the winning value,
    * its final per-entity belief share, how many distinct values
    * competed, and how many sources backed the winner. */
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
    // belief ordering is on the EXACT integer belief_fp — equal masses
    // tie exactly (never a float hair apart) and fall to the value
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("entity"))
      .orderBy(col("belief_fp").desc, col("value"))
    r.beliefs
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .join(support, Seq("entity", "value"))
      .join(nVals, Seq("entity"))
      .select(col("entity"), col("value"), col("belief"), col("belief_fp"),
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
