package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Progressive (pay-as-you-go) entity resolution: order the candidate
  * pairs so a budget-limited run verifies the likeliest matches FIRST
  * (Whang, Marmaros & Garcia-Molina, "Pay-as-you-go entity resolution",
  * TKDE'13; Papenbrock, Heise & Naumann, "Progressive duplicate
  * detection", TKDE'15). The cheap likelihood proxy is the CBS
  * co-occurrence weight [[MetaBlocking.pairWeights]] already computes —
  * a pair sharing several independent block keys is far likelier to
  * match than a one-key coincidence, and the signal is free (no content
  * read). The deliverable is the schedule's QUALITY CURVE: cumulative
  * ground-truth recall at each spend decile — the chart that tells an
  * operator "80 % of the duplicates for 20 % of the comparisons" and
  * when to stop.
  *
  * Scale shape: the global rank is [[SortedNeighborhood.withGlobalRank]]
  * (range-repartition + per-partition row_number + broadcast offsets —
  * no single-partition sort); decile assignment is integer arithmetic
  * (`(rank·10 + N − 1) div N` — no float boundary for two engines to
  * disagree on); the curve itself is a 10-row aggregate. The DuckDB
  * oracle replays the whole derivation — weights from the dumped block
  * index, its own truth labels, rank, deciles, cumulative recall.
  */
object Progressive {

  /** `weights`: (idA, idB, weight) candidate pairs with the cheap proxy;
    * `labels`: (id, groupId), groupId ≥ 0 marking true duplicate groups.
    * Returns one row per non-empty spend decile — all 10 whenever the
    * schedule holds ≥ 10 pairs (with fewer, ranks skip deciles):
    * decile, n_pairs_cum, n_true_cum,
    * recall_captured (vs truth pairs present in the candidate set) and
    * recall_total (vs ALL truth pairs — blocking misses included, so the
    * curve cannot hide upstream recall loss). */
  def curve(weights: DataFrame, labels: DataFrame, parts: Int = 32): DataFrame = {
    // rank 1 = most promising; ties broken by (idA, idB) so the
    // schedule is a deterministic total order
    val ranked = SortedNeighborhood.withGlobalRank(
        weights.withColumn("negw", -col("weight")),
        Seq("negw", "idA", "idB"), parts)
      .drop("negw")
    val tagged = ranked
      .join(labels.select(col("id").as("idA"), col("groupId").as("gA")), "idA")
      .join(labels.select(col("id").as("idB"), col("groupId").as("gB")), "idB")
      .withColumn("is_dup", col("gA") === col("gB") && col("gA") >= 0)
    val nTot = weights.agg(count(lit(1)).as("n_total"))
    val nCaptured = tagged.agg(
      sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_true_captured"))
    val nTruth = labels.where(col("groupId") >= 0)
      .groupBy(col("groupId")).agg(count(lit(1)).as("m"))
      .agg(coalesce(sum(shiftright(col("m") * (col("m") - lit(1L)), 1)), lit(0L))
        .as("n_truth_total"))
    val wcum = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged.crossJoin(nTot)
      .withColumn("decile",
        expr("CAST((rank * 10 + n_total - 1) DIV n_total AS INT)"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_true"))
      .withColumn("n_pairs_cum", sum(col("n_pairs")).over(wcum))
      .withColumn("n_true_cum", sum(col("n_true")).over(wcum))
      .crossJoin(nCaptured)
      .crossJoin(nTruth)
      .select(col("decile"), col("n_pairs_cum"), col("n_true_cum"),
        round(col("n_true_cum").cast("double") / col("n_true_captured"), 6)
          .as("recall_captured"),
        round(col("n_true_cum").cast("double") / col("n_truth_total"), 6)
          .as("recall_total"))
  }
}
