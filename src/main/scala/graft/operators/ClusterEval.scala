package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Clustering-quality metrics for entity resolution beyond pairwise
  * F1: B-cubed precision/recall/F1 (Bagga & Baldwin 1998 — the
  * per-record average that weights large clusters fairly) and the
  * Adjusted Rand Index (Hubert & Arabie 1985 — chance-corrected pair
  * agreement). The reference library has no evaluation layer at all
  * (SURVEY.md §3b); these are the two scores ER papers report when
  * pairwise F1 saturates.
  *
  * Everything reduces to the contingency table n_ct =
  * |predicted cluster c ∩ truth cluster t|, built with ONE shuffle
  * (groupBy the label pair); cluster/truth marginals re-aggregate the
  * table itself (kilobytes), never the records again. All pair counts
  * are exact integers; floats appear only in the final ratios, so the
  * DuckDB oracle reproduces every column at 6 dp.
  *
  * Scale shape (100 TB): contingency rows ≤ #records and in practice
  * ≈ #clusters; the final metric row is a constant-size crossJoin of
  * four scalar aggregates. C(n,2) is computed by integer shift (the
  * product of consecutive integers is even), so pair counts stay
  * BIGINT-exact up to ~3·10^9-member clusters (where n·(n−1) itself
  * overflows); beyond that switch the C(n,2) sums to DECIMAL(38,0).
  */
object ClusterEval {

  /** assign: (id, clusterId) — the predicted assignment; truth:
    * (id, truthId) — gold labels over the SAME id set. Returns one row:
    * n, a_pairs (same-predicted-cluster pairs), b_pairs (same-truth
    * pairs), index_pairs (pairs together in both), b3_precision,
    * b3_recall, b3_f1, ari. */
  def evaluate(assign: DataFrame, truth: DataFrame): DataFrame = {
    // integer-exact C(n,2): shift, never `/` (Spark `/` is double
    // division and loses exactness past 2^53)
    def pairs(c: org.apache.spark.sql.Column) =
      shiftright(c * (c - lit(1L)), 1)
    // eager localCheckpoint, not persist: three aggregates read the
    // table within this call and the blocks are released on GC instead
    // of pinning the block manager per invocation
    val ct = assign.join(truth, "id")
      .groupBy(col("clusterId"), col("truthId"))
      .agg(count(lit(1)).as("n_ct"))
      .localCheckpoint(true)
    val c = ct.groupBy(col("clusterId")).agg(sum(col("n_ct")).as("n_c"))
    val t = ct.groupBy(col("truthId")).agg(sum(col("n_ct")).as("n_t"))
    val cells = ct.join(c, "clusterId").join(t, "truthId").agg(
      sum(col("n_ct")).as("n"),
      sum(pairs(col("n_ct"))).as("index_pairs"),
      sum(col("n_ct") * col("n_ct") / col("n_c").cast("double")).as("b3p_sum"),
      sum(col("n_ct") * col("n_ct") / col("n_t").cast("double")).as("b3r_sum"))
    val aP = c.agg(sum(pairs(col("n_c"))).as("a_pairs"))
    val bP = t.agg(sum(pairs(col("n_t"))).as("b_pairs"))
    cells.crossJoin(aP).crossJoin(bP)
      .withColumn("total_pairs", pairs(col("n")))
      // cast the factors BEFORE multiplying: a_pairs·b_pairs as BIGINT
      // would overflow long before the double product loses anything
      // that survives the final rounding
      .withColumn("expected",
        col("a_pairs").cast("double") * col("b_pairs").cast("double") /
          col("total_pairs").cast("double"))
      .withColumn("max_idx", (col("a_pairs") + col("b_pairs")) / lit(2.0))
      .withColumn("b3_precision", round(col("b3p_sum") / col("n"), 6))
      .withColumn("b3_recall", round(col("b3r_sum") / col("n"), 6))
      .withColumn("b3_f1", round(
        lit(2.0) * (col("b3p_sum") / col("n")) * (col("b3r_sum") / col("n")) /
          (col("b3p_sum") / col("n") + col("b3r_sum") / col("n")), 6))
      // max == expected only when BOTH partitions are all singletons
      // (a = b = 0) — identical trivial clusterings, ARI = 1 by
      // convention rather than 0/0
      .withColumn("ari", when(col("max_idx") === col("expected"), lit(1.0))
        .otherwise(round((col("index_pairs") - col("expected")) /
          (col("max_idx") - col("expected")), 6)))
      .select(col("n"), col("a_pairs"), col("b_pairs"), col("index_pairs"),
        col("b3_precision"), col("b3_recall"), col("b3_f1"), col("ari"))
  }

  /** [[evaluate]] for SEVERAL assignments against one truth in a single
    * pass: the assignments are tagged and unioned, the contingency
    * table built with ONE shuffle grouped by (method, c, t), and every
    * downstream aggregate carries the method key — one plan instead of
    * per-assignment checkpoint + three aggregates each (the
    * clustering-compare query evaluated five families one by one).
    * Per-method output values are identical to [[evaluate]]'s: every
    * aggregation is grouped by the tag, so the cell sets per method are
    * exactly the single-run ones. Returns one row per method:
    * (method, n, a_pairs, b_pairs, index_pairs, b3_precision,
    * b3_recall, b3_f1, ari). */
  def evaluateMany(assigns: Seq[(String, DataFrame)],
                   truth: DataFrame): DataFrame = {
    def pairs(c: org.apache.spark.sql.Column) =
      shiftright(c * (c - lit(1L)), 1)
    val tagged = assigns.map { case (nm, a) =>
      a.select(lit(nm).as("method"), col("id"), col("clusterId"))
    }.reduce(_ unionByName _)
    val ct = tagged.join(truth, "id")
      .groupBy(col("method"), col("clusterId"), col("truthId"))
      .agg(count(lit(1)).as("n_ct"))
      .localCheckpoint(true)
    val c = ct.groupBy(col("method"), col("clusterId"))
      .agg(sum(col("n_ct")).as("n_c"))
    val t = ct.groupBy(col("method"), col("truthId"))
      .agg(sum(col("n_ct")).as("n_t"))
    val cells = ct.join(c, Seq("method", "clusterId"))
      .join(t, Seq("method", "truthId"))
      .groupBy(col("method")).agg(
        sum(col("n_ct")).as("n"),
        sum(pairs(col("n_ct"))).as("index_pairs"),
        sum(col("n_ct") * col("n_ct") / col("n_c").cast("double")).as("b3p_sum"),
        sum(col("n_ct") * col("n_ct") / col("n_t").cast("double")).as("b3r_sum"))
    val aP = c.groupBy(col("method")).agg(sum(pairs(col("n_c"))).as("a_pairs"))
    val bP = t.groupBy(col("method")).agg(sum(pairs(col("n_t"))).as("b_pairs"))
    cells.join(aP, "method").join(bP, "method")
      .withColumn("total_pairs", pairs(col("n")))
      .withColumn("expected",
        col("a_pairs").cast("double") * col("b_pairs").cast("double") /
          col("total_pairs").cast("double"))
      .withColumn("max_idx", (col("a_pairs") + col("b_pairs")) / lit(2.0))
      .withColumn("b3_precision", round(col("b3p_sum") / col("n"), 6))
      .withColumn("b3_recall", round(col("b3r_sum") / col("n"), 6))
      .withColumn("b3_f1", round(
        lit(2.0) * (col("b3p_sum") / col("n")) * (col("b3r_sum") / col("n")) /
          (col("b3p_sum") / col("n") + col("b3r_sum") / col("n")), 6))
      .withColumn("ari", when(col("max_idx") === col("expected"), lit(1.0))
        .otherwise(round((col("index_pairs") - col("expected")) /
          (col("max_idx") - col("expected")), 6)))
      .select(col("method"), col("n"), col("a_pairs"), col("b_pairs"),
        col("index_pairs"), col("b3_precision"), col("b3_recall"),
        col("b3_f1"), col("ari"))
  }

  /** Homogeneity / completeness / V-measure (Rosenberg & Hirschberg,
    * "V-Measure: a conditional entropy-based external cluster
    * evaluation measure", EMNLP 2007) — the information-theoretic
    * complement to [[evaluate]]'s pair-counting scores (V-measure is
    * exactly NMI with arithmetic normalization). From the SAME
    * one-shuffle contingency table:
    *   homogeneity  h = 1 − H(T|C)/H(T)  (each cluster ⊆ one truth class)
    *   completeness c = 1 − H(C|T)/H(C)  (each truth class ⊆ one cluster)
    *   v = 2hc/(h+c)
    * with the paper's conventions h = 1 when H(T) = 0, c = 1 when
    * H(C) = 0, v = 0 when h + c = 0. Natural-log entropies; every sum
    * is over contingency cells (≤ #records rows, ≈ #clusters in
    * practice), so the DuckDB oracle reproduces all columns at 6 dp. */
  def vMeasure(assign: DataFrame, truth: DataFrame): DataFrame = {
    val ct = assign.join(truth, "id")
      .groupBy(col("clusterId"), col("truthId"))
      .agg(count(lit(1)).as("n_ct"))
      .localCheckpoint(true)
    val c = ct.groupBy(col("clusterId")).agg(sum(col("n_ct")).as("n_c"))
    val t = ct.groupBy(col("truthId")).agg(sum(col("n_ct")).as("n_t"))
    // n·H(T|C) = −Σ_ct n_ct·ln(n_ct/n_c); a 1-member cell contributes
    // exactly 0 (ln 1), so no epsilon guards are needed anywhere
    val joint = ct.join(c, "clusterId").join(t, "truthId").agg(
      sum(col("n_ct")).as("n"),
      sum(-col("n_ct").cast("double") *
        log(col("n_ct").cast("double") / col("n_c"))).as("n_htc"),
      sum(-col("n_ct").cast("double") *
        log(col("n_ct").cast("double") / col("n_t"))).as("n_hct"))
    val hc = c.crossJoin(joint.select(col("n").as("nn")))
      .agg(sum(-col("n_c").cast("double") / col("nn") *
        log(col("n_c").cast("double") / col("nn"))).as("h_clusters"))
    val ht = t.crossJoin(joint.select(col("n").as("nn")))
      .agg(sum(-col("n_t").cast("double") / col("nn") *
        log(col("n_t").cast("double") / col("nn"))).as("h_truth"))
    joint.crossJoin(hc).crossJoin(ht)
      .withColumn("h_t_given_c", col("n_htc") / col("n"))
      .withColumn("h_c_given_t", col("n_hct") / col("n"))
      .withColumn("homogeneity", when(col("h_truth") === 0d, lit(1.0))
        .otherwise(lit(1.0) - col("h_t_given_c") / col("h_truth")))
      .withColumn("completeness", when(col("h_clusters") === 0d, lit(1.0))
        .otherwise(lit(1.0) - col("h_c_given_t") / col("h_clusters")))
      .withColumn("v_measure",
        when(col("homogeneity") + col("completeness") === 0d, lit(0.0))
          .otherwise(lit(2.0) * col("homogeneity") * col("completeness") /
            (col("homogeneity") + col("completeness"))))
      .select(col("n"),
        round(col("h_truth"), 6).as("h_truth"),
        round(col("h_clusters"), 6).as("h_clusters"),
        round(col("h_t_given_c"), 6).as("h_t_given_c"),
        round(col("h_c_given_t"), 6).as("h_c_given_t"),
        round(col("homogeneity"), 6).as("homogeneity"),
        round(col("completeness"), 6).as("completeness"),
        round(col("v_measure"), 6).as("v_measure"))
  }
}
