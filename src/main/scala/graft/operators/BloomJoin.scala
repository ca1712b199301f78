package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join reduction: prune the big side of a shuffle
  * join BEFORE the exchange.
  *
  * A broadcast join already avoids shuffling the big side — but only
  * while the small side's exact rows fit in every executor. The bloom
  * regime is the gap above that: the dimension's ROWS are too big to
  * broadcast, yet a fixed-size bit-array sketch of its join keys is a
  * few MB regardless of row width. At 100 TB this is the difference
  * between shuffling every probe row and shuffling only the ~matching
  * fraction: build the bloom over the dim keys DISTRIBUTEDLY (one
  * aggregation — partials merge map-side, only sketches move), ship
  * the one resulting sketch to the probe side's scan, and drop
  * non-matching rows before they ever reach the exchange. False
  * positives pass through and are removed by the real join; false
  * negatives are impossible, so the result is EXACTLY the plain join
  * (q_bloom_join's oracle is DuckDB's plain join — an exact compare,
  * not a bound check).
  *
  * Uses Spark's own runtime-filter expression pair
  * (`BloomFilterAggregate` / `BloomFilterMightContain` over XxHash64
  * keys — the same machinery `spark.sql.optimizer.runtime.bloomFilter`
  * injects), registered as SQL functions; the probe-side filter is
  * whole-stage-codegen'd and sits directly on the scan
  * (BloomJoinSpec locks that plan shape). The only driver residency
  * is the merged sketch itself — `numBits/8` bytes, size-capped, the
  * same class of footprint as a broadcast variable, never row data.
  */
object BloomJoin {

  /** Standard optimal bit count for `n` items at false-positive rate
    * `fpp`: −n·ln(fpp)/ln²2. */
  def optimalNumBits(n: Long, fpp: Double): Long =
    math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2))).toLong

  /** Register `graft_bloom_agg(key, items, bits)` and
    * `graft_bloom_might_contain(bloom, key)` for Column/SQL use. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_agg",
      exprs => new BloomFilterAggregate(new XxHash64(Seq(exprs.head)),
        exprs(1), exprs(2)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_might_contain",
      exprs => BloomFilterMightContain(exprs.head, new XxHash64(Seq(exprs(1)))),
      "scala_udf")
  }

  /** Build a bloom over `small`'s `smallKey` (distributed aggregation;
    * only the fixed-size sketch reaches the driver). */
  def buildBloom(small: DataFrame, smallKey: String,
                 expectedItems: Long, fpp: Double): Array[Byte] = {
    register(small.sparkSession)
    small.agg(call_function("graft_bloom_agg", col(smallKey),
        lit(expectedItems), lit(optimalNumBits(expectedItems, fpp)))
      .as("bloom")).head().getAs[Array[Byte]](0)
  }

  /** `big` rows whose `bigKey` might be in the bloom — the pre-shuffle
    * prune. Null keys are dropped (inner-join semantics downstream). */
  def prefilter(big: DataFrame, bigKey: String, bloom: Array[Byte]): DataFrame = {
    register(big.sparkSession)
    big.where(col(bigKey).isNotNull &&
      call_function("graft_bloom_might_contain", lit(bloom), col(bigKey)))
  }

  /** The full pattern: bloom-prune `big`, then the real shuffle join
    * (merge-hinted — this operator exists precisely for the small side
    * too big to broadcast). Result ≡ plain inner join. */
  def prefilteredJoin(big: DataFrame, small: DataFrame,
                      bigKey: String, smallKey: String,
                      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bloom = buildBloom(small, smallKey, expectedItems, fpp)
    prefilter(big, bigKey, bloom)
      .join(small.hint("merge"), col(bigKey) === col(smallKey))
  }
}
