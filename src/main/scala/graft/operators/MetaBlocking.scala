package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Meta-blocking (Papadakis et al., "Meta-Blocking: Taking Entity
  * Resolution to the Next Level", TKDE'14 — public paper): weight each
  * candidate pair by how many capped blocks it co-occurs in (CBS — the
  * common-blocks scheme), then prune pairs below their endpoints' mean
  * weight (weighted node pruning). Redundancy-positive blocking — the
  * MinHash bands, dual size buckets and the sha key upstream — makes
  * co-occurrence count a free match-likelihood signal: a pair sharing
  * several independent keys is far likelier to match than a one-key
  * coincidence, so the DP scorer's candidate load drops without reading
  * any content.
  *
  * Scale shape: pair emission is the standard capped-block algebra
  * (≤ cap·(cap−1)/2 pairs per key, skew-proof), the weight is ONE extra
  * groupBy over the emitted (narrow) pairs, and node pruning is a
  * per-endpoint aggregate over the weighted pair table. The kept rule is
  * integer-exact — `weight ≥ mean(endpoint weights)` is evaluated as
  * `weight·count ≥ sum` — so there is no float boundary for two engines
  * to disagree on.
  */
object MetaBlocking {

  /** (idA, idB, weight): weight = number of distinct capped block keys
    * the pair co-occurs in. `keyed` = (key, id) rows; cap semantics are
    * exactly [[CandidateGen.capByKey]]'s (lowest ids survive). */
  def pairWeights(keyed: DataFrame, cap: Int): DataFrame =
    CandidateGen.capByKey(keyed.dropDuplicates("key", "id"), cap)
      .groupBy(col("key"))
      .agg(sort_array(collect_set(col("id"))).as("ids"))
      .where(size(col("ids")) >= 2)
      .select(explode(CandidateGen.pairwise(col("ids"),
        (x, y) => struct(x.as("idA"), y.as("idB")))).as("p"))
      .groupBy(col("p.idA").as("idA"), col("p.idB").as("idB"))
      .agg(count(lit(1)).as("weight"))

  /** Weighted node pruning: keep a pair iff its weight reaches the mean
    * weight of EITHER endpoint's pairs (OR, not AND — Papadakis' WNP
    * keeps the redundancy graph connected enough for recall). Adds a
    * `kept` column rather than filtering, so recall audits can read the
    * pruned set too. */
  def prune(weights: DataFrame): DataFrame = {
    val byNode = weights
      .select(explode(array(col("idA"), col("idB"))).as("id"), col("weight"))
      .groupBy(col("id"))
      .agg(sum(col("weight")).as("wsum"), count(lit(1)).as("wcnt"))
    weights
      .join(byNode.select(col("id").as("idA"),
        col("wsum").as("sumA"), col("wcnt").as("cntA")), "idA")
      .join(byNode.select(col("id").as("idB"),
        col("wsum").as("sumB"), col("wcnt").as("cntB")), "idB")
      .select(col("idA"), col("idB"), col("weight"),
        (col("weight") * col("cntA") >= col("sumA") ||
          col("weight") * col("cntB") >= col("sumB")).as("kept"))
  }
}
