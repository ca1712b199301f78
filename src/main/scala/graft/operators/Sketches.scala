package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate aggregation sketches — the cardinality/quantile answers
  * a 100 TB engine serves without an exact (shuffle-every-value) pass.
  *
  * The reference library has no aggregation layer at all (SURVEY.md
  * §3a); these are pipeline-category operators. Two properties carry
  * the scale story:
  *
  *   - **Single-pass, map-side-combinable.** `approx_count_distinct`
  *     (HyperLogLog++) and `percentile_approx` (Greenwald–Khanna) are
  *     Spark aggregate functions: each partition folds its rows into a
  *     fixed-size sketch and only sketches cross the exchange. An
  *     exact countDistinct by contrast expands to a distinct shuffle
  *     of every (group, value) pair first.
  *
  *   - **Mergeable sketch tables.** [[hllPartials]] persists one
  *     Datasketches HLL sketch per (group, shard) — e.g. per day, per
  *     ingest batch — and [[hllMergeEstimate]] answers a distinct-count
  *     query by unioning ONLY the sketches. At 100 TB this turns
  *     "distinct users last 90 days" from a 90-day data scan into a
  *     union of 90 kilobyte-sized rows per group, and a new day is one
  *     incremental partial, never a recount. The union is exactly
  *     estimate-invariant: merging per-shard sketches gives the SAME
  *     estimate as one sketch over all rows (SketchesSpec asserts
  *     equality, not approximation).
  *
  * Error discipline: estimates are verified, not trusted —
  * SketchQueries emits the estimate NEXT TO the exact value (small SF)
  * or rank bound, and the DuckDB oracle recomputes the exact side and
  * re-judges the bound from the dumped estimate.
  */
object Sketches {

  /** Per-group HLL++ distinct estimate alongside the exact count and a
    * relative-error verdict (|est − exact| ≤ `relErrBound`·exact). The
    * exact column is the verification yardstick — at production scale
    * you would drop it and keep only the single-pass estimate. */
  def approxDistinctChecked(df: DataFrame, groupCols: Seq[String],
                            valueCol: String, rsd: Double,
                            relErrBound: Double): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(
        approx_count_distinct(col(valueCol), rsd).as("est"),
        countDistinct(col(valueCol)).as("exact"))
      .withColumn("within",
        abs(col("est") - col("exact")) <= lit(relErrBound) * col("exact"))

  /** One Datasketches HLL sketch per (group, shard) — the persistable
    * sketch-table row. `shard` is any expression (day, batch id, …). */
  def hllPartials(df: DataFrame, groupCols: Seq[String], shard: Column,
                  valueCol: String): DataFrame =
    df.groupBy((groupCols.map(col) :+ shard.as("shard")): _*)
      .agg(hll_sketch_agg(col(valueCol)).as("sketch"))

  /** Merge per-shard sketches back to one estimate per group. Only the
    * fixed-size sketches move; no re-scan of the underlying rows. */
  def hllMergeEstimate(partials: DataFrame, groupCols: Seq[String]): DataFrame =
    partials.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_shards"),
        hll_sketch_estimate(hll_union_agg(col("sketch"))).as("est"))

  /** Direct (unsharded) Datasketches estimate — the equality yardstick
    * for [[hllMergeEstimate]]. */
  def hllDirectEstimate(df: DataFrame, groupCols: Seq[String],
                        valueCol: String): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_estimate(hll_sketch_agg(col(valueCol))).as("est"))

  /** Build a count-min sketch over `valueCol` (long keys) in ONE
    * distributed pass — partials merge map-side, only the fixed
    * (w·d counters) sketch reaches the driver. The CMS answers
    * point-frequency queries for ANY key in O(1) with the one-sided
    * guarantee est ≥ exact and est ≤ exact + eps·N (w.p. `confidence`)
    * — heavy-hitter detection without a per-key groupBy state. */
  def cmsBuild(df: DataFrame, valueCol: String, eps: Double,
               confidence: Double, seed: Int): Array[Byte] =
    df.agg(count_min_sketch(col(valueCol), lit(eps), lit(confidence),
      lit(seed)).as("s")).head().getAs[Array[Byte]](0)

  /** Probe the sketch for each candidate key next to the exact count
    * and the two CMS guarantee verdicts. `candidates` must be a
    * metadata-sized key set (it is collected to probe the driver-held
    * sketch — same residency class as a pruned file list); the exact
    * side is the verification yardstick, dropped at production scale.
    */
  def cmsChecked(df: DataFrame, valueCol: String, candidates: DataFrame,
                 eps: Double, confidence: Double, seed: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(cmsBuild(df, valueCol, eps, confidence, seed)))
    val keys = candidates.select(col(candidates.columns.head).cast("long"))
      .distinct().as[Long].collect().sorted
    val est = keys.map(k => (k, cms.estimateCount(java.lang.Long.valueOf(k))))
      .toSeq.toDF("key", "est")
    val exact = df.groupBy(col(valueCol).cast("long").as("key"))
      .agg(count(lit(1)).as("exact"))
    val total = df.where(col(valueCol).isNotNull).count()
    est.join(exact, Seq("key"), "left")
      .na.fill(0L, Seq("exact"))
      .withColumn("no_underestimate", col("est") >= col("exact"))
      .withColumn("bound_ok", col("est") <= col("exact") + lit(eps * total))
  }

  /** Per-group approximate quantiles with a rank-error verdict. For
    * each requested p, the Greenwald–Khanna sketch (`accuracy` = 1/ε)
    * guarantees the returned element's rank r satisfies
    * |r/n − p| ≤ ε; `rank_ok` re-checks that against the group's
    * actual rank of the estimate (one broadcast-join verification
    * pass — a test-side yardstick, not part of the production read). */
  def approxQuantilesChecked(df: DataFrame, groupCols: Seq[String],
                             valueCol: String, ps: Seq[Double],
                             accuracy: Int): DataFrame = {
    val gs = groupCols.map(col)
    val est = df.groupBy(gs: _*)
      .agg(percentile_approx(col(valueCol),
        array(ps.map(lit): _*), lit(accuracy)).as("ests"))
      .select(gs :+ posexplode(col("ests")): _*)
      .withColumn("p", element_at(array(ps.map(lit): _*), col("pos") + 1))
      .select(gs ++ Seq(col("p"), col("col").as("est")): _*)
    val eps = 1.0 / accuracy
    df.join(broadcast(est), groupCols)
      .groupBy((gs ++ Seq(col("p"), col("est"))): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(when(col(valueCol) <= col("est"), 1L).otherwise(0L)).as("rnk"))
      .withColumn("rank_ok",
        abs(col("rnk").cast("double") / col("n") - col("p")) <=
          lit(eps) + lit(1.0) / col("n"))
  }
}
