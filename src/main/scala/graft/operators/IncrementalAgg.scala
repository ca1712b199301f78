package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of an EXACT aggregate table (materialized
  * view): fold an append-only delta into a persisted per-group
  * (count, sum…) state without rescanning history.
  *
  * The algebra is the same partial/final split Spark's own hash
  * aggregate uses — count and decimal sum are commutative monoids, so
  * state ⊕ agg(delta) = agg(full data) EXACTLY (decimal, not float:
  * addition order cannot perturb the result, which is also what makes
  * the DuckDB oracle compare exact). At 100 TB this is the difference
  * between an O(delta) nightly refresh and an O(history) rescan; the
  * merge shuffles only (#groups + #delta-groups) narrow rows.
  * Append-only by design — retractions need a signed delta (add a
  * negated row), which the same monoid absorbs.
  *
  * Derived averages are NOT stored (avg is not a monoid) — they are a
  * final projection sum/count at read time, [[withAvg]].
  */
object IncrementalAgg {

  /** Aggregate a batch into state-shaped rows: (groups…, n, sum_<c>). */
  def aggregate(df: DataFrame, groupCols: Seq[String], sumCols: Seq[String]): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sumCols.map(c => sum(col(c).cast("decimal(28,6)")).as(s"sum_$c")): _*)

  /** state ⊕ aggregate(delta): union + re-sum. Touches only the state
    * table (#groups rows) and the delta — never the raw history. */
  def merge(state: DataFrame, deltaAgg: DataFrame, groupCols: Seq[String],
            sumCols: Seq[String]): DataFrame =
    state.unionByName(deltaAgg)
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("n")).as("n"),
        sumCols.map(c => sum(col(s"sum_$c")).as(s"sum_$c")): _*)

  /** Read-time projection of derived averages (double, rounded). */
  def withAvg(state: DataFrame, sumCols: Seq[String]): DataFrame =
    sumCols.foldLeft(state)((d, c) =>
      d.withColumn(s"avg_$c",
        round(col(s"sum_$c").cast("double") / col("n"), 6)))
}
