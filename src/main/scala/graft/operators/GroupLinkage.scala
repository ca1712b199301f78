package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Group linkage: lift record-level match edges between two catalogs to
  * GROUP-level similarity and a one-to-one group assignment (On, Koudas,
  * Lee, Srivastava, "Group Linkage", ICDE 2007 — public). The unit being
  * linked is a set of records (a repository of files, a household of
  * people, an album of tracks); two groups are similar when many of
  * their members match, normalized by group size — the bipartite-graph
  * Jaccard of the paper's §3 (matched members over the union), plus the
  * Dice and overlap coefficients a deployment tunes between.
  *
  * The reference library scores single trees; it has no notion of a
  * record group at all (SURVEY.md §3b). Here group linkage composes the
  * existing layers: record edges come from any pairwise scorer (FS
  * decisions, ZSS matches), the group-level 1:1 assignment reuses
  * [[OneToOneMatching.greedyMatch]] unchanged — same locally-dominant
  * round chain, same oracle story.
  *
  * Scale shape (100 TB): `groupWeights` is two broadcast-sized
  * dimension joins (group-size tables are |groups| rows, orders of
  * magnitude smaller than records) around ONE groupBy over the match
  * edges — the edge table is already the smallest relation in the
  * pipeline (post-blocking, post-threshold). No all-pairs group product
  * is ever formed: group pairs exist only where at least one record
  * edge exists, exactly the paper's candidate-pruning observation.
  */
object GroupLinkage {

  /** er_group_matches acceptance threshold — ONE definition; the oracle
    * SQL interpolates it. Deliberately low: the 1:1 assignment, not the
    * threshold, is the precision mechanism (the paper's setup). */
  val DefaultMinJaccard = 0.05

  /** Record-level edges (lft, rgt) × group maps → group-pair weights.
    *
    * `edges`: one row per matched record pair, left ids in `lft`, right
    * ids in `rgt`. For the Jaccard/Dice semantics below each record
    * should appear at most once per side (feed a 1:1 matching like
    * [[OneToOneMatching.greedyMatch]]'s output; raw many-to-many edges
    * are deduplicated per (lft,rgt) but can still count one record into
    * several group pairs — the paper's "soft" variant).
    * `leftGroups` / `rightGroups`: (id, gid) membership of EVERY record
    * of that catalog (sizes are denominators, so unmatched members must
    * be present).
    *
    * Returns (glft, grgt, n_matched, size_l, size_r, jaccard, dice,
    * overlap) for every group pair with ≥ 1 matched record pair. */
  def groupWeights(edges: DataFrame, leftGroups: DataFrame,
      rightGroups: DataFrame): DataFrame = {
    val szL = leftGroups.groupBy(col("gid").as("glft"))
      .agg(count(lit(1)).as("size_l"))
    val szR = rightGroups.groupBy(col("gid").as("grgt"))
      .agg(count(lit(1)).as("size_r"))
    edges.select(col("lft"), col("rgt")).distinct()
      .join(leftGroups.select(col("id").as("lft"), col("gid").as("glft")), "lft")
      .join(rightGroups.select(col("id").as("rgt"), col("gid").as("grgt")), "rgt")
      .groupBy(col("glft"), col("grgt"))
      .agg(count(lit(1)).as("n_matched"))
      .join(broadcast(szL), "glft")
      .join(broadcast(szR), "grgt")
      .select(col("glft"), col("grgt"), col("n_matched"),
        col("size_l"), col("size_r"),
        round(col("n_matched") /
          (col("size_l") + col("size_r") - col("n_matched")), 6).as("jaccard"),
        round(col("n_matched") * 2 /
          (col("size_l") + col("size_r")), 6).as("dice"),
        round(col("n_matched") /
          least(col("size_l"), col("size_r")), 6).as("overlap"))
  }

  /** One-to-one group assignment over the weight table: greedy
    * maximum-weight matching on Jaccard (6-dp rounded by
    * [[groupWeights]], so the greedy total order is cross-engine exact —
    * the [[graft.ErQueries]] LinkResults precedent), thresholded at
    * `minJaccard`. Returns (glft, grgt, w, round). */
  def matchGroups(weights: DataFrame, minJaccard: Double): DataFrame =
    OneToOneMatching.greedyMatch(
      weights.where(col("jaccard") >= minJaccard)
        .select(col("glft").as("lft"), col("grgt").as("rgt"),
          col("jaccard").as("w")))
      .select(col("lft").as("glft"), col("rgt").as("grgt"),
        col("w"), col("round"))
}
