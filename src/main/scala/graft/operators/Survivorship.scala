package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Survivorship / golden-record construction: collapse each entity
  * cluster to ONE canonical row under deterministic merge rules — the
  * step after clustering in every record-linkage deployment (the "merge"
  * of merge-purge; the reference stops at pairwise distance, SURVEY.md
  * §3b). Rules:
  *   - canonical_id   lowest member id (stable across runs);
  *   - lang           modal value, ties to the lexicographically
  *                    smallest — never "whichever partition answered
  *                    first";
  *   - rep_sha        sha256 of the longest content, ties to the
  *                    smallest sha then id (best-source rule);
  *   - first_commit   minimum commit id;
  *   - total_bytes / n_members roll-ups.
  *
  * Scale shape: one equi-join clusters⋈attrs on id (both narrow), then
  * per-cluster aggregates; the mode and best-source picks are windows
  * over per-cluster groups whose size the upstream block cap bounds. No
  * collect, no cross product, every rule SQL-exact (integer/string
  * comparisons only) so an independent engine reproduces each canonical
  * row bit-for-bit.
  */
object Survivorship {

  /** Default eval bound for [[leakageSafeSplit]] — md5 hex prefix
    * < "40" ⇒ eval (25 % of clusters). */
  val DefaultEvalBound = "40"

  /** clusters: (id, clusterId); attrs: (id, lang, commit, sha256,
    * content_len). One output row per cluster. */
  def goldenRecords(clusters: DataFrame, attrs: DataFrame): DataFrame = {
    val j = clusters.join(attrs, "id")
    val base = j.groupBy(col("clusterId"))
      .agg(count(lit(1)).as("n_members"),
        min(col("id")).as("canonical_id"),
        min(col("commit")).as("first_commit"),
        sum(col("content_len")).as("total_bytes"))
    val langCnt = j.groupBy(col("clusterId"), col("lang")).agg(count(lit(1)).as("cnt"))
    val modalLang = langCnt
      .withColumn("__rn", row_number().over(Window.partitionBy(col("clusterId"))
        .orderBy(col("cnt").desc, col("lang"))))
      .where(col("__rn") === 1)
      .select(col("clusterId"), col("lang"))
    val rep = j
      .withColumn("__rn", row_number().over(Window.partitionBy(col("clusterId"))
        .orderBy(col("content_len").desc, col("sha256"), col("id"))))
      .where(col("__rn") === 1)
      .select(col("clusterId"), col("sha256").as("rep_sha"))
    base.join(modalLang, "clusterId").join(rep, "clusterId")
  }

  /** Leakage-safe train/eval split: assign WHOLE clusters to splits by a
    * deterministic hash of the cluster id, so near-duplicate members can
    * never straddle the boundary — the eval-hygiene rule a dedup-aware
    * training pipeline enforces (a train example's near-dup sitting in
    * the eval set is leakage that row-level random splits cannot
    * prevent). md5 hex-prefix thresholding is the sampling operators'
    * engine-portable idiom; `evalBound` is the 2-hex-digit exclusive
    * upper bound ([[DefaultEvalBound]] "40" ⇒ 64/256 = 25 % of clusters
    * land in eval — the ONE definition; query and oracle interpolate
    * it). Zero shuffle: one narrow projection over the cluster table. */
  def leakageSafeSplit(clusters: DataFrame, evalBound: String = DefaultEvalBound): DataFrame =
    clusters.select(col("id"), col("clusterId"),
      when(substring(md5(concat(lit("split:"), col("clusterId"))), 1, 2)
        < evalBound, "eval").otherwise("train").as("split"))
}
