package graft

import graft.operators.Sketches
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate-sketch coverage (HLL++ distinct, Datasketches HLL
  * merge, Greenwald–Khanna quantiles) over the events table.
  *
  * Sketch estimates cannot be recomputed cross-engine (DuckDB's HLL is
  * a different implementation), so the oracle pattern differs from the
  * exact queries: each query emits the estimate NEXT TO independently
  * recomputable columns (exact count, shard count, rank of the
  * estimate) and an error-bound verdict; the DuckDB oracle takes the
  * DUMPED estimate as given, recomputes everything else from the base
  * table, and re-judges the verdict. A wrong exact value, wrong rank,
  * or out-of-bound estimate all hash-mismatch. The sketch-internal
  * properties the oracle can't see (merge ≡ direct equality) are
  * asserted exactly in SketchesSpec.
  */
object SketchQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** ONE definition each for the Scala queries and the interpolated
    * oracle SQL — a drift here would silently desynchronize them. */
  private val AcdRsd = 0.05
  private val AcdRelErrBound = 0.15
  private val QuantilePs = Seq(0.25, 0.5, 0.75)
  private val QuantileAccuracy = 1000
  private val CmsEps = 0.005
  private val CmsConfidence = 0.99
  private val CmsSeed = 42
  /** Deterministic metadata-sized candidate key set for CMS probes. */
  private val CmsKeyMod = 17

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // single-pass HLL++ distinct per group, verified against exact
    "q_approx_distinct" -> ((s, dir) => {
      Sketches.approxDistinctChecked(t(s, dir, "events"),
          Seq("event_type"), "event_id", AcdRsd, AcdRelErrBound)
        .orderBy(col("event_type"))
    }),

    // mergeable sketch table: per-(type, day) partials unioned back to
    // one estimate — only sketches cross the second exchange
    "q_hll_merge" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val partials = Sketches.hllPartials(ev, Seq("event_type"),
        to_date(col("ts")), "event_id")
      Sketches.hllMergeEstimate(partials, Seq("event_type"))
        .join(ev.groupBy(col("event_type"))
          .agg(countDistinct(col("event_id")).as("exact")), Seq("event_type"))
        .withColumn("within",
          abs(col("est") - col("exact")) <= lit(AcdRelErrBound) * col("exact"))
        .orderBy(col("event_type"))
    }),

    // count-min point-frequency estimates for a deterministic candidate
    // key set, next to exact counts and the two CMS guarantees
    // (no underestimate; overestimate ≤ eps·N at the sketch confidence)
    "q_cms_freq" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      Sketches.cmsChecked(ev, "user_id",
          ev.where(pmod(col("user_id"), lit(CmsKeyMod)) === 0).select(col("user_id")),
          CmsEps, CmsConfidence, CmsSeed)
        .orderBy(col("key"))
    }),

    // GK approximate quantiles with a rank-error verdict per (group, p)
    "q_approx_quantiles" -> ((s, dir) => {
      Sketches.approxQuantilesChecked(t(s, dir, "events"),
          Seq("event_type"), "value", QuantilePs, QuantileAccuracy)
        .orderBy(col("event_type"), col("p"))
    })
  )

  /** Estimate-bearing stage dumps the oracle reads back (it cannot
    * recompute a sketch, only judge one). */
  def dumpAux(spark: SparkSession, sfDir: String, outDir: String): Unit = {
    def dump(df: DataFrame, name: String): Unit =
      df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    val ev = t(spark, sfDir, "events")
    dump(Sketches.approxDistinctChecked(ev, Seq("event_type"), "event_id",
      AcdRsd, AcdRelErrBound).select(col("event_type"), col("est")), "acd_est")
    dump(Sketches.hllMergeEstimate(
      Sketches.hllPartials(ev, Seq("event_type"), to_date(col("ts")), "event_id"),
      Seq("event_type")).select(col("event_type"), col("est")), "hll_merge_est")
    dump(Sketches.approxQuantilesChecked(ev, Seq("event_type"), "value",
        QuantilePs, QuantileAccuracy)
      .select(col("event_type"), col("p"), col("est")), "gk_est")
    dump(Sketches.cmsChecked(ev, "user_id",
        ev.where(pmod(col("user_id"), lit(CmsKeyMod)) === 0).select(col("user_id")),
        CmsEps, CmsConfidence, CmsSeed)
      .select(col("key"), col("est")), "cms_est")
  }

  def oracleSql: Map[String, String] = Map(
    // est is taken from the dump; exact and the bound verdict are
    // DuckDB's own
    "q_approx_distinct" ->
      s"""WITH a AS (SELECT event_type, est
         |           FROM read_parquet('{OUT}/_aux/acd_est/*.parquet')),
         |x AS (SELECT event_type, count(DISTINCT event_id) AS exact
         |      FROM events GROUP BY event_type)
         |SELECT a.event_type, a.est, x.exact,
         |  abs(a.est - x.exact) <= $AcdRelErrBound * x.exact AS within
         |FROM a JOIN x USING (event_type) ORDER BY a.event_type""".stripMargin,
    // n_shards (distinct days) and exact are recomputed; the merged
    // estimate is judged against the bound
    "q_hll_merge" ->
      s"""WITH a AS (SELECT event_type, est
         |           FROM read_parquet('{OUT}/_aux/hll_merge_est/*.parquet')),
         |x AS (SELECT event_type,
         |        count(DISTINCT CAST(ts AS DATE)) AS n_shards,
         |        count(DISTINCT event_id) AS exact
         |      FROM events GROUP BY event_type)
         |SELECT a.event_type, x.n_shards, a.est, x.exact,
         |  abs(a.est - x.exact) <= $AcdRelErrBound * x.exact AS within
         |FROM a JOIN x USING (event_type) ORDER BY a.event_type""".stripMargin,
    // the dumped CMS estimate is judged against DuckDB's own exact
    // count and total-N bound arithmetic
    "q_cms_freq" ->
      s"""WITH a AS (SELECT key, est
         |           FROM read_parquet('{OUT}/_aux/cms_est/*.parquet')),
         |x AS (SELECT user_id AS key, count(*) AS exact
         |      FROM events WHERE user_id % $CmsKeyMod = 0 GROUP BY user_id),
         |n AS (SELECT count(*) AS total FROM events WHERE user_id IS NOT NULL)
         |SELECT a.key, a.est, x.exact,
         |  a.est >= x.exact AS no_underestimate,
         |  a.est <= x.exact + $CmsEps * n.total AS bound_ok
         |FROM a JOIN x USING (key) CROSS JOIN n ORDER BY a.key""".stripMargin,
    // the rank of the dumped estimate within its group is recomputed
    // from the raw values; the GK guarantee |rank/n − p| ≤ ε + 1/n is
    // re-judged in DuckDB arithmetic
    "q_approx_quantiles" ->
      s"""WITH a AS (SELECT event_type, p, est
         |           FROM read_parquet('{OUT}/_aux/gk_est/*.parquet')),
         |r AS (SELECT a.event_type, a.p, a.est,
         |        count(*) AS n,
         |        CAST(sum(CASE WHEN e.value <= a.est THEN 1 ELSE 0 END) AS BIGINT) AS rnk
         |      FROM a JOIN events e USING (event_type)
         |      GROUP BY a.event_type, a.p, a.est)
         |SELECT event_type, p, est, n, rnk,
         |  abs(CAST(rnk AS DOUBLE) / n - p)
         |    <= ${1.0 / QuantileAccuracy} + 1.0 / n AS rank_ok
         |FROM r ORDER BY event_type, p""".stripMargin
  )
}
