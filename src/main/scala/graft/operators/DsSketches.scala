package graft.operators

import graft.functions.DsSketchAggs
import org.apache.datasketches.frequencies.{ErrorType, LongsSketch}
import org.apache.datasketches.kll.{KllDoublesSketch, KllSketch}
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.datasketches.theta.SetOperation
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** Mergeable-sketch operators over the Datasketches aggregates
  * ([[graft.functions.DsSketchAggs]]) — theta set algebra, KLL quantile
  * sketch tables, and Misra–Gries heavy hitters.
  *
  * Scale shape shared by all three: the only distributed passes are
  * map-side-combinable aggregations (per-partition native sketches,
  * only kilobyte sketch bytes cross the exchange); everything after
  * operates on SKETCH TABLES — one row per (group, shard), metadata-
  * sized — so set algebra over 100 TB cohorts is arithmetic over a few
  * KB of bytes. The scalar set-op/estimate functions below are Scala
  * UDFs by design: they run on sketch-table rows (#groups², never row
  * data), outside any hot path, where a native Expression would buy
  * nothing.
  *
  * Determinism note (matters for the oracle): theta sketches are exact
  * and order-insensitive below 2^lgK distinct values, but KLL compaction
  * is randomized and Misra–Gries eviction is arrival-order-dependent, so
  * re-evaluating the same plan can legally produce slightly different
  * (still in-bounds) estimates. At scale a sketch table is built ONCE
  * and persisted — consumers read bytes, they never re-aggregate — and
  * the query layer (DsSketchQueries) mirrors that by materializing each
  * estimate table once per run before the verification joins.
  */
object DsSketches {

  /** log2 nominal entries: theta sketches are EXACT below 4096 distinct
    * values and ~1.6 KB compact at or above it. */
  val ThetaLgK = 12

  /** KLL k: ~1.65 % normalized rank error; exact below 200 values. */
  val KllK = 200

  /** Misra–Gries map size (power of 2). Deliberately small so eviction
    * (and therefore the error-bound machinery) actually engages on the
    * test tables; at 100 TB you would size this to the heavy-hitter
    * count you care about (memory is 16·maxMapSize bytes). */
  val FreqMapSize = 8

  /** Bound width for theta estimate intervals (±2 std dev ≈ 95.4 %). */
  val ThetaStdDev = 2

  def register(spark: SparkSession): Unit = DsSketchAggs.register(spark)

  // ---- theta: sketch building -------------------------------------------

  /** One compact theta sketch per group over `valueCol`'s distinct set. */
  def thetaSketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  lgK: Int = ThetaLgK): DataFrame = {
    register(df.sparkSession)
    df.groupBy(groupCols.map(col): _*)
      .agg(call_function("graft_theta_agg", col(valueCol), lit(lgK)).as("sketch"))
  }

  /** Per-(group, shard) theta partials — the persistable sketch table. */
  def thetaPartials(df: DataFrame, groupCols: Seq[String], shard: Column,
                    valueCol: String, lgK: Int = ThetaLgK): DataFrame = {
    register(df.sparkSession)
    df.groupBy((groupCols.map(col) :+ shard.as("shard")): _*)
      .agg(call_function("graft_theta_agg", col(valueCol), lit(lgK)).as("sketch"))
  }

  /** Merge per-shard partials back to one sketch per group: the SAME
    * aggregate, binary input = pre-built-sketch union mode. */
  def thetaMerge(partials: DataFrame, groupCols: Seq[String],
                 lgK: Int = ThetaLgK): DataFrame = {
    register(partials.sparkSession)
    partials.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_shards"),
        call_function("graft_theta_agg", col("sketch"), lit(lgK)).as("sketch"))
  }

  // ---- theta: estimates + set algebra (sketch-table domain) --------------

  val thetaEstimate: UserDefinedFunction =
    udf((b: Array[Byte]) => DsSketchAggs.wrapTheta(b).getEstimate)
  val thetaLower: UserDefinedFunction =
    udf((b: Array[Byte]) => DsSketchAggs.wrapTheta(b).getLowerBound(ThetaStdDev))
  val thetaUpper: UserDefinedFunction =
    udf((b: Array[Byte]) => DsSketchAggs.wrapTheta(b).getUpperBound(ThetaStdDev))

  val thetaUnionPair: UserDefinedFunction = udf((a: Array[Byte], b: Array[Byte]) => {
    val u = SetOperation.builder().setLogNominalEntries(ThetaLgK).buildUnion()
    u.union(DsSketchAggs.wrapTheta(a)); u.union(DsSketchAggs.wrapTheta(b))
    u.getResult.toByteArray
  })
  val thetaIntersectPair: UserDefinedFunction = udf((a: Array[Byte], b: Array[Byte]) => {
    val i = SetOperation.builder().buildIntersection()
    i.intersect(DsSketchAggs.wrapTheta(a)); i.intersect(DsSketchAggs.wrapTheta(b))
    i.getResult.toByteArray
  })
  val thetaDiffPair: UserDefinedFunction = udf((a: Array[Byte], b: Array[Byte]) =>
    SetOperation.builder().buildANotB()
      .aNotB(DsSketchAggs.wrapTheta(a), DsSketchAggs.wrapTheta(b)).toByteArray)

  /** Full pairwise set-algebra table over per-cohort sketches: for each
    * cohort pair (a < b), the union / intersection / A-not-B estimates
    * with ±2σ bounds. Input = the base rows; one distributed sketch agg,
    * then #cohorts² sketch-row arithmetic (metadata-sized). */
  def thetaCohortSetOps(df: DataFrame, cohortCol: String,
                        valueCol: String): DataFrame = {
    // ONE distributed sketch aggregation, then localize: the per-cohort
    // sketch table is metadata-sized by construction (#cohorts rows of
    // ~2^lgK·8 bytes), and referencing a lazy aggregation from both
    // sides of the self-join would recompute the full input scan twice
    val skDist = thetaSketch(df, Seq(cohortCol), valueCol)
    val sk = df.sparkSession.createDataFrame(
      java.util.Arrays.asList(skDist.collect(): _*), skDist.schema)
    val a = sk.select(col(cohortCol).as("cohort_a"), col("sketch").as("sk_a"))
    val b = sk.select(col(cohortCol).as("cohort_b"), col("sketch").as("sk_b"))
    def triple(prefix: String, c: Column): Seq[Column] = Seq(
      thetaEstimate(c).as(s"est_$prefix"),
      thetaLower(c).as(s"lb_$prefix"),
      thetaUpper(c).as(s"ub_$prefix"))
    a.join(b, col("cohort_a") < col("cohort_b"))
      .withColumn("sk_union", thetaUnionPair(col("sk_a"), col("sk_b")))
      .withColumn("sk_intersect", thetaIntersectPair(col("sk_a"), col("sk_b")))
      .withColumn("sk_diff", thetaDiffPair(col("sk_a"), col("sk_b")))
      .select(Seq(col("cohort_a"), col("cohort_b")) ++
        triple("union", col("sk_union")) ++
        triple("intersect", col("sk_intersect")) ++
        triple("diff", col("sk_diff")): _*)
  }

  /** Merged-estimate table with bounds: (group…, n_shards, est, lb, ub). */
  def thetaMergeEstimate(partials: DataFrame, groupCols: Seq[String]): DataFrame =
    thetaMerge(partials, groupCols)
      .select(groupCols.map(col) ++ Seq(col("n_shards"),
        thetaEstimate(col("sketch")).as("est"),
        thetaLower(col("sketch")).as("lb"),
        thetaUpper(col("sketch")).as("ub")): _*)

  // ---- KLL: mergeable quantile sketch table ------------------------------

  /** Per-(group, shard) KLL partials over a numeric column. */
  def kllPartials(df: DataFrame, groupCols: Seq[String], shard: Column,
                  valueCol: String, k: Int = KllK): DataFrame = {
    register(df.sparkSession)
    df.groupBy((groupCols.map(col) :+ shard.as("shard")): _*)
      .agg(call_function("graft_kll_agg", col(valueCol).cast("double"), lit(k))
        .as("sketch"))
  }

  /** Shared merge-then-read scaffolding for both KLL item types: merge
    * partials per group (binary-input mode of `aggName`), explode the
    * requested quantile points, and read each via `quantile` —
    * (group…, n_shards, p, est). Only sketches cross the exchange. */
  private def mergedQuantilesWith(partials: DataFrame, groupCols: Seq[String],
      ps: Seq[Double], aggName: String, k: Int,
      quantile: UserDefinedFunction): DataFrame = {
    register(partials.sparkSession)
    partials.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_shards"),
        call_function(aggName, col("sketch"), lit(k)).as("sketch"))
      .select(groupCols.map(col) ++
        Seq(col("n_shards"), explode(array(ps.map(lit): _*)).as("p"),
          col("sketch")): _*)
      .withColumn("est", quantile(col("sketch"), col("p")))
      .drop("sketch")
  }

  /** Merge partials per group and read the requested quantiles. */
  def kllMergedQuantiles(partials: DataFrame, groupCols: Seq[String],
                         ps: Seq[Double], k: Int = KllK): DataFrame =
    // an all-NULL group yields an EMPTY merged sketch; getQuantile
    // throws on those, so surface NULL for that group instead of
    // aborting the whole read
    mergedQuantilesWith(partials, groupCols, ps, "graft_kll_agg", k,
      udf((b: Array[Byte], p: Double) => {
        val sk = KllDoublesSketch.heapify(Memory.wrap(b))
        if (sk.isEmpty) null
        else java.lang.Double.valueOf(sk.getQuantile(p, QuantileSearchCriteria.INCLUSIVE))
      }))

  /** KLL's published normalized rank error for `k` (quantile mode). */
  def kllRankEps(k: Int = KllK): Double = KllSketch.getNormalizedRankError(k, false)

  /** Re-check each (group, p, est) against the RAW rows: the actual rank
    * of est within its group must sit within eps (+1/n discretization)
    * of p. One broadcast-join pass — a verification yardstick, not part
    * of the production read (consumers read the sketch table alone). */
  def rankCheck(df: DataFrame, est: DataFrame, groupCols: Seq[String],
                valueCol: String, eps: Double): DataFrame = {
    val gs = groupCols.map(col)
    df.join(broadcast(est), groupCols)
      .groupBy(gs ++ Seq(col("n_shards"), col("p"), col("est")): _*)
      .agg(count(lit(1)).as("n"),
        sum(when(col(valueCol) <= col("est"), 1L).otherwise(0L)).as("rnk"))
      .withColumn("rank_ok",
        abs(col("rnk").cast("double") / col("n") - col("p")) <=
          lit(eps) + lit(1.0) / col("n"))
  }

  // ---- tuple (theta-with-summaries) ----------------------------------------

  /** log2 nominal entries for tuple sketches (exact below 4096 keys). */
  val TupleLgK = 12

  private def heapifyTuple(b: Array[Byte]) =
    org.apache.datasketches.tuple.arrayofdoubles.ArrayOfDoublesSketch
      .heapify(org.apache.datasketches.memory.Memory.wrap(b))

  /** One tuple sketch per group: distinct `keyCol` set, each retained
    * key carrying the SUM of its `valueCol` as the summary. */
  def tupleSketch(df: DataFrame, groupCols: Seq[String], keyCol: String,
                  valueCol: String, lgK: Int = TupleLgK): DataFrame = {
    register(df.sparkSession)
    df.groupBy(groupCols.map(col): _*)
      .agg(call_function("graft_tuple_agg", col(keyCol),
        col(valueCol).cast("double"), lit(lgK)).as("sketch"))
  }

  /** Merge per-shard tuple partials back to one sketch per group (binary
    * input = pre-built-sketch union mode; summaries element-wise-SUM). */
  def tupleMerge(partials: DataFrame, groupCols: Seq[String],
                 lgK: Int = TupleLgK): DataFrame = {
    register(partials.sparkSession)
    partials.groupBy(groupCols.map(col): _*)
      .agg(call_function("graft_tuple_agg", col("sketch"),
        lit(0.0), lit(lgK)).as("sketch"))
  }

  val tupleEstimate: UserDefinedFunction =
    udf((b: Array[Byte]) => heapifyTuple(b).getEstimate)
  val tupleLower: UserDefinedFunction =
    udf((b: Array[Byte]) => heapifyTuple(b).getLowerBound(ThetaStdDev))
  val tupleUpper: UserDefinedFunction =
    udf((b: Array[Byte]) => heapifyTuple(b).getUpperBound(ThetaStdDev))

  /** Estimated population total of the summaries: Σ retained sums / θ.
    * In exact mode (θ = 1) this IS the exact sum over all keys. */
  val tupleSumEstimate: UserDefinedFunction = udf((b: Array[Byte]) => {
    val sk = heapifyTuple(b)
    var s = 0.0
    val it = sk.iterator()
    while (it.next()) s += it.getValues()(0)
    s / sk.getTheta
  })

  /** Intersection of two tuple sketches with element-wise-SUM summary
    * combining: the result's keys are the cohort overlap, each carrying
    * the combined metric from BOTH sides. */
  val tupleIntersectPair: UserDefinedFunction = udf((a: Array[Byte], b: Array[Byte]) => {
    val sum = new org.apache.datasketches.tuple.arrayofdoubles.ArrayOfDoublesCombiner {
      def combine(x: Array[Double], y: Array[Double]): Array[Double] =
        Array(x(0) + y(0))
    }
    val i = new org.apache.datasketches.tuple.arrayofdoubles
      .ArrayOfDoublesSetOperationBuilder().setNumberOfValues(1).buildIntersection()
    i.intersect(heapifyTuple(a), sum)
    i.intersect(heapifyTuple(b), sum)
    i.getResult.toByteArray
  })

  // ---- mergeable reservoir sample -------------------------------------------

  /** Default reservoir size. */
  val ReservoirK = 32

  private def heapifyReservoir(b: Array[Byte]) =
    org.apache.datasketches.sampling.ReservoirLongsSketch
      .heapify(org.apache.datasketches.memory.Memory.wrap(b))

  /** One k-slot uniform reservoir per group over a long column — the
    * ONE-PASS distributed sample (per-partition reservoirs union with
    * n-weighting, which is what keeps the combined sample uniform;
    * `limit(k)` or per-partition take(k) is NOT). Complements the
    * deterministic hash samplers (q_stratified_sample/q_sample_exact_k):
    * those trade uniformity-per-retry for replay stability; the
    * reservoir gives true uniform inclusion at fixed memory. */
  def reservoirSketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
                      k: Int = ReservoirK): DataFrame = {
    register(df.sparkSession)
    df.groupBy(groupCols.map(col): _*)
      .agg(call_function("graft_reservoir_agg", col(valueCol), lit(k)).as("sketch"))
  }

  /** Merge per-shard reservoir partials back to one valid k-sample per
    * group (binary input = n-weighted union mode). */
  def reservoirMerge(partials: DataFrame, groupCols: Seq[String],
                     k: Int = ReservoirK): DataFrame = {
    register(partials.sparkSession)
    partials.groupBy(groupCols.map(col): _*)
      .agg(call_function("graft_reservoir_agg", col("sketch"), lit(k)).as("sketch"))
  }

  /** Total stream length the reservoir has seen (exact). */
  val reservoirN: UserDefinedFunction =
    udf((b: Array[Byte]) => heapifyReservoir(b).getN)

  /** The retained sample values (min(k, n) of them; empty reservoirs
    * report null from the library — normalized to an empty array). */
  val reservoirSamples: UserDefinedFunction =
    udf((b: Array[Byte]) =>
      Option(heapifyReservoir(b).getSamples).getOrElse(Array.empty[Long]))

  // ---- VarOpt weighted sample -----------------------------------------------

  /** Default VarOpt sample size. */
  val VarOptK = 32

  private def varoptSerde = new org.apache.datasketches.common.ArrayOfLongsSerDe()

  private def heapifyVarOpt(b: Array[Byte]) =
    org.apache.datasketches.sampling.VarOptItemsSketch
      .heapify(org.apache.datasketches.memory.Memory.wrap(b), varoptSerde)

  /** One k-slot WEIGHTED sample per group: inclusion ∝ `weightCol`,
    * adjusted weights preserve the total and estimate subset sums
    * unbiasedly. Rows with NULL/non-positive weight are skipped
    * (SQL parity: `WHERE weight > 0`). */
  def varoptSketch(df: DataFrame, groupCols: Seq[String], keyCol: String,
                   weightCol: String, k: Int = VarOptK): DataFrame = {
    register(df.sparkSession)
    df.groupBy(groupCols.map(col): _*)
      .agg(call_function("graft_varopt_agg", col(keyCol),
        col(weightCol).cast("double"), lit(k)).as("sketch"))
  }

  /** Merge per-shard VarOpt partials back to one weighted k-sample per
    * group (binary input = union mode; total weight still preserved). */
  def varoptMerge(partials: DataFrame, groupCols: Seq[String],
                  k: Int = VarOptK): DataFrame = {
    register(partials.sparkSession)
    partials.groupBy(groupCols.map(col): _*)
      .agg(call_function("graft_varopt_agg", col("sketch"),
        lit(1.0), lit(k)).as("sketch"))
  }

  /** Exact count of (positive-weight) stream rows the sketch saw. */
  val varoptN: UserDefinedFunction =
    udf((b: Array[Byte]) => heapifyVarOpt(b).getN)

  /** The stream's total weight — VarOpt preserves it through sampling
    * (up to double addition order). */
  val varoptTotalWeight: UserDefinedFunction =
    udf((b: Array[Byte]) =>
      heapifyVarOpt(b).estimateSubsetSum(_ => true).getTotalSketchWeight)

  /** Retained (item, adjusted weight) pairs. */
  val varoptSamples: UserDefinedFunction = udf((b: Array[Byte]) => {
    val s = heapifyVarOpt(b).getSketchSamples
    val items = s.items()
    val ws = s.weights()
    if (items == null) Array.empty[(Long, Double)]
    else items.indices.map(i => (items(i).longValue, ws(i))).toArray
  })

  // ---- string-item sketches (ArrayOfStringsSerDe families) ---------------

  /** Misra–Gries map size for string items. Larger than [[FreqMapSize]]:
    * token vocabularies are big, and the reported set (NO_FALSE_NEGATIVES)
    * should hold the real head without drowning it in purge survivors. */
  val FreqStrMapSize = 64

  /** KLL k for string quantiles (same rank error as [[KllK]]). */
  val KllStrK = 200

  /** One merged string-items frequency sketch over `itemsExpr` — a
    * StringType column (one item per row) or an ArrayType(StringType)
    * column, whose ELEMENTS update the sketch directly: corpus-wide
    * token heavy hitters in one narrow pass, no token-grain explode or
    * shuffle anywhere (only kilobyte sketch bytes cross the exchange,
    * and only the one merged sketch reaches the driver). */
  def freqStringsSketch(df: DataFrame, itemsExpr: Column,
                        maxMapSize: Int = FreqStrMapSize): Array[Byte] = {
    register(df.sparkSession)
    df.agg(call_function("graft_freq_strings_agg", itemsExpr, lit(maxMapSize)).as("s"))
      .head().getAs[Array[Byte]](0)
  }

  private def strSerde = new org.apache.datasketches.common.ArrayOfStringsSerDe()

  private def heapifyFreqStrings(b: Array[Byte]) =
    org.apache.datasketches.frequencies.ItemsSketch.getInstance[String](
      Memory.wrap(b), strSerde)

  /** The string sketch's deterministic error bound. */
  def freqStringsMaxError(bytes: Array[Byte]): Long =
    heapifyFreqStrings(bytes).getMaximumError

  /** Frequent string items under NO_FALSE_NEGATIVES: (item, est, lb, ub). */
  def freqStringItems(spark: SparkSession, bytes: Array[Byte]): DataFrame = {
    import spark.implicits._
    heapifyFreqStrings(bytes)
      .getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
      .map(r => (r.getItem, r.getEstimate, r.getLowerBound, r.getUpperBound))
      .toSeq.toDF("item", "est", "lb", "ub")
  }

  /** Per-(group, shard) KLL string-quantile partials — mergeable split
    * points for a string sort key (keep keys ASCII: the sketch orders by
    * Java natural String order, which equals the byte order Spark's and
    * DuckDB's `<=` use only there). */
  def kllStringsPartials(df: DataFrame, groupCols: Seq[String], shard: Column,
                         valueCol: String, k: Int = KllStrK): DataFrame = {
    register(df.sparkSession)
    df.groupBy((groupCols.map(col) :+ shard.as("shard")): _*)
      .agg(call_function("graft_kll_strings_agg", col(valueCol), lit(k)).as("sketch"))
  }

  private def heapifyKllStrings(b: Array[Byte]) =
    org.apache.datasketches.kll.KllItemsSketch.heapify[String](
      Memory.wrap(b), java.util.Comparator.naturalOrder[String](), strSerde)

  /** Merge string partials per group and read the requested quantiles:
    * (group…, n_shards, p, est) — the distributed way to pick
    * range-partition SPLIT POINTS for a string key (RangePartitioner's
    * row sample replaced by a mergeable sketch table). */
  def kllStringsMergedQuantiles(partials: DataFrame, groupCols: Seq[String],
                                ps: Seq[Double], k: Int = KllStrK): DataFrame =
    mergedQuantilesWith(partials, groupCols, ps, "graft_kll_strings_agg", k,
      udf((b: Array[Byte], p: Double) => {
        val sk = heapifyKllStrings(b)
        if (sk.isEmpty) null
        else sk.getQuantile(p, QuantileSearchCriteria.INCLUSIVE)
      }))

  // ---- KLL range count from a per-tile sketch sidecar ---------------------

  /** Metadata-only approximate range count: merge a per-file/tile KLL
    * partial table (e.g. shard = z-tile id, the same sidecar shape as
    * the min/max and bloom indexes) and answer
    * `count(lo <= v AND v <= hi)` from sketch ranks alone — one row of
    * (n_files, n, est, lb, ub), no data scan. At 100 TB the partial
    * table is index-sized (one KB row per file), so a range-count probe
    * reads kilobytes instead of terabytes; lb/ub budget the published
    * normalized rank error once per endpoint (+1 retained-weight
    * discretization step each). */
  def kllRangeCount(partials: DataFrame, lo: Double, hi: Double,
                    k: Int = KllK): DataFrame = {
    register(partials.sparkSession)
    val eps = kllRankEps(k)
    val read = udf((b: Array[Byte]) => {
      val sk = KllDoublesSketch.heapify(Memory.wrap(b))
      if (sk.isEmpty) (0L, 0.0, 0L, 0L)
      else {
        val n = sk.getN
        val rHi = sk.getRank(hi, QuantileSearchCriteria.INCLUSIVE)
        val rLo = sk.getRank(lo, QuantileSearchCriteria.EXCLUSIVE)
        val est = (rHi - rLo) * n
        val margin = 2.0 * eps * n + 2.0
        (n, est, math.max(0L, math.floor(est - margin).toLong),
          math.min(n, math.ceil(est + margin).toLong))
      }
    })
    partials
      .agg(count(lit(1)).as("n_files"),
        call_function("graft_kll_agg", col("sketch"), lit(k)).as("sketch"))
      .withColumn("r", read(col("sketch")))
      .select(col("n_files"), col("r._1").as("n"), col("r._2").as("est"),
        col("r._3").as("lb"), col("r._4").as("ub"))
  }

  /** Per-tile scan-planning read over a [lo, hi] range probe: one row
    * per tile with (n, mn, mx, est, lb, ub, pruned). `mn`/`mx` are
    * EXACT — a KLL sketch retains its min and max items — so `pruned`
    * (mx < lo ∨ mn > hi) is a GUARANTEED file skip: the sidecar
    * subsumes a per-file min/max index. On top of the envelope, the
    * rank reads give the rows-in-range CARDINALITY per tile (est with
    * lb/ub budgeting the published rank error per endpoint), which a
    * min/max envelope cannot provide: under skew the planner orders or
    * batches the surviving files by expected hits instead of treating
    * every overlapping file as equal. Pure per-row sketch reads on an
    * index-sized table — at 100 TB the whole probe costs kilobytes of
    * metadata, no data scan. */
  def kllTileStats(partials: DataFrame, lo: Double, hi: Double,
                   k: Int = KllK): DataFrame = {
    val eps = kllRankEps(k)
    val read = udf((b: Array[Byte]) => {
      val sk = KllDoublesSketch.heapify(Memory.wrap(b))
      if (sk.isEmpty) (0L, 0.0, 0.0, 0.0, 0L, 0L, true)
      else {
        val n = sk.getN
        val mn = sk.getMinItem
        val mx = sk.getMaxItem
        val pruned = mx < lo || mn > hi
        if (pruned) (n, mn, mx, 0.0, 0L, 0L, true)
        else {
          val est = (sk.getRank(hi, QuantileSearchCriteria.INCLUSIVE) -
            sk.getRank(lo, QuantileSearchCriteria.EXCLUSIVE)) * n
          val margin = 2.0 * eps * n + 2.0
          (n, mn, mx, est, math.max(0L, math.floor(est - margin).toLong),
            math.min(n, math.ceil(est + margin).toLong), false)
        }
      }
    })
    partials.withColumn("r", read(col("sketch")))
      .select(partials.columns.filterNot(_ == "sketch").map(col) ++ Seq(
        col("r._1").as("n"), col("r._2").as("mn"), col("r._3").as("mx"),
        col("r._4").as("est"), col("r._5").as("lb"), col("r._6").as("ub"),
        col("r._7").as("pruned")): _*)
  }

  // ---- Misra–Gries frequent items ----------------------------------------

  /** One merged LongsSketch over `keyExpr` — a single distributed
    * aggregation; only the fixed-size sketch reaches the driver (same
    * residency class as a broadcast bloom). */
  def freqSketch(df: DataFrame, keyExpr: Column,
                 maxMapSize: Int = FreqMapSize): Array[Byte] = {
    register(df.sparkSession)
    df.agg(call_function("graft_freq_agg", keyExpr, lit(maxMapSize)).as("s"))
      .head().getAs[Array[Byte]](0)
  }

  /** The sketch's deterministic error bound: true − est ≤ maxError. */
  def freqMaxError(bytes: Array[Byte]): Long =
    LongsSketch.getInstance(Memory.wrap(bytes)).getMaximumError

  /** Frequent items under NO_FALSE_NEGATIVES: every key whose true
    * count exceeds the sketch's maxError is guaranteed present; each row
    * carries lb ≤ true ≤ ub. Returns (item, est, lb, ub). */
  def freqItems(spark: SparkSession, bytes: Array[Byte]): DataFrame = {
    import spark.implicits._
    LongsSketch.getInstance(Memory.wrap(bytes))
      .getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
      .map(r => (r.getItem, r.getEstimate, r.getLowerBound, r.getUpperBound))
      .toSeq.toDF("item", "est", "lb", "ub")
  }
}
